"""Approximate aggregates — the sketch path for the KPI family.

The reference computes exact COUNT(DISTINCT)/percentile-free KPIs
(fine at its scale); at 100 TB the distinct-count and quantile KPIs
move to sketches: HyperLogLog++ (`approx_count_distinct`) and
Greenwald-Khanna (`approx_percentile`) are both one-pass,
partial-aggregable (map-side combine, no second shuffle), and
mergeable across partitions — exactly what a 1000-executor rollup
needs. Exactness contracts live in tests (relative-error bounds vs
the exact kernels) rather than DuckDB oracles, since sketch values
are engine-specific.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.keys import hash_key
from ..registry import register


def approx_user_stats(events: DataFrame, rsd: float = 0.02) -> DataFrame:
    """Per event_type: HLL++ distinct users + GK value quantiles."""
    return (
        events.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=rsd).alias("approx_users"),
            F.percentile_approx("value", [0.5, 0.95, 0.99], 10000).alias("value_q"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "event_type",
            "approx_users",
            F.col("value_q")[0].alias("value_p50"),
            F.col("value_q")[1].alias("value_p95"),
            F.col("value_q")[2].alias("value_p99"),
            "n_events",
        )
        .orderBy("event_type")
    )


@register(
    "q35_approx_user_stats",
    oracle=None,  # FINAL (round-5 judgment): the ENGINE-NATIVE sketch
    # path stays rows-only by design — HLL++/GK internals are Spark's;
    # the deterministic from-scratch twin q106 carries the full oracle,
    # and error bounds vs exact kernels are pinned in tests/test_approx.py
    doc="HLL++ distinct users + approx quantiles per event_type — the "
    "one-pass mergeable-sketch path the exact KPIs switch to at 100TB.",
)
def q35_approx_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return approx_user_stats(load(spark, sf_dir, "events"))


def sketch_rollup_daily_monthly(events: DataFrame) -> DataFrame:
    """Mergeable-sketch rollup: per-day HLL sketches of distinct users
    (Apache DataSketches via ``hll_sketch_agg``), merged with
    ``hll_union_agg`` into monthly estimates WITHOUT rescanning the
    fact — next to a direct monthly sketch for comparison.

    This is the incremental-distinct pattern a 100 TB warehouse runs:
    daily partials are tiny (KBs) and commutatively mergeable, so the
    monthly/quarterly rollup is a metadata-sized job instead of a
    fact-table rescan, and late days just re-merge. Union of per-day
    sketches over a partition of the data is mathematically the same
    sketch as one pass (same lgK), so merged == direct exactly —
    pinned in tests; registered rows-only (sketch internals are
    engine-specific, no DuckDB oracle).
    """
    day = F.date_format("ts", "yyyy-MM-dd").alias("day")
    month = F.date_format("ts", "yyyy-MM").alias("month")
    daily = events.select(day, month, "user_id").groupBy("day", "month").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = daily.groupBy("month").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("bigint").alias("merged_users"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
    direct = events.select(month, "user_id").groupBy("month").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).cast("bigint").alias("direct_users")
    )
    return (
        merged.join(direct, "month")
        .select(
            "month",
            "n_days",
            "merged_users",
            "direct_users",
            (F.col("merged_users") == F.col("direct_users")).alias("merge_exact"),
        )
        .orderBy("month")
    )


_CMS_DEPTH = 4
_CMS_WIDTH = 256


def _cms_bucket(row_j: int, key: "F.Column") -> "F.Column":
    """Bucket of ``key`` in CMS hash row ``row_j``: md5 of the salted
    key, first 8 hex chars folded to an int, mod width — reproducible
    in any engine (the q09 surrogate-key trick)."""
    salted = F.concat(F.lit(f"{row_j}:"), key.cast("string"))
    return (F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("long") % _CMS_WIDTH).alias(
        f"b{row_j}"
    )


def _cms_cells(key: Column) -> Column:
    """The depth probe cells of one key — the ONE definition both the
    sketch build and the heavy-hitter probes use (review r8: two
    verbatim copies; a salt/shape change missed in one would silently
    break the probe-to-sketch join into no-matches rather than error)."""
    return F.array(
        *[
            F.struct(F.lit(j).alias("row_j"), _cms_bucket(j, key).alias("bucket"))
            for j in range(_CMS_DEPTH)
        ]
    )


def cms_sketch(df: DataFrame, key_col: str) -> DataFrame:
    """Count-min sketch of ``key_col`` frequencies, from scratch: a
    depth×width grid of counters, each row counting under an
    independent hash. Returned as (row_j, bucket, cnt) cells.

    Scale shape: the explode multiplies rows by depth (4) BEFORE the
    groupBy, but map-side partial aggregation collapses every task to
    ≤ depth×width (1024) cells pre-shuffle, so the exchange moves
    O(tasks × 1024) rows regardless of corpus size — the sketch is
    mergeable by cell-wise SUM, which is exactly what the partial agg
    does. Point estimates read MIN over the depth rows (each row only
    overestimates, by collisions), the classic CM guarantee."""
    return (
        df.select(F.explode(_cms_cells(F.col(key_col))).alias("c"))
        .groupBy(F.col("c.row_j").alias("row_j"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate_heavy_hitters(events: DataFrame, top_n: int = 10) -> DataFrame:
    """Heavy hitters with their CMS point estimates next to exact
    counts. The candidate set (exact top-N users) is tiny, so its
    4 probe cells join the 1024-cell sketch by broadcast; the only
    corpus-sized work is two groupBys over user_id — everything after
    is KB-scale."""
    sketch = cms_sketch(events, "user_id")
    exact = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_n"))
    cand = exact.orderBy(F.desc("exact_n"), "user_id").limit(top_n)
    probes = cand.select(
        "user_id",
        "exact_n",
        F.explode(_cms_cells(F.col("user_id"))).alias("p"),
    ).select("user_id", "exact_n", F.col("p.row_j").alias("row_j"), F.col("p.bucket").alias("bucket"))
    est = (
        F.broadcast(probes)
        .join(sketch, ["row_j", "bucket"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("cnt").alias("cms_estimate"))
    )
    return est.select(
        "user_id",
        F.col("exact_n").cast("bigint").alias("exact_n"),
        F.col("cms_estimate").cast("bigint").alias("cms_estimate"),
        (F.col("cms_estimate") >= F.col("exact_n")).alias("never_underestimates"),
    ).orderBy(F.desc("exact_n"), "user_id")


@register(
    "q77_cms_heavy_hitters",
    oracle=f"""
WITH rows_j AS (SELECT unnest(range({_CMS_DEPTH})) AS row_j),
cells AS (
  SELECT r.row_j,
         CAST(('0x' || substr(md5(CAST(r.row_j AS VARCHAR) || ':' || CAST(e.user_id AS VARCHAR)),
               1, 8)) AS BIGINT) % {_CMS_WIDTH} AS bucket,
         COUNT(*) AS cnt
  FROM events e CROSS JOIN rows_j r
  GROUP BY 1, 2
),
exact AS (SELECT user_id, COUNT(*) AS exact_n FROM events GROUP BY 1),
cand AS (SELECT * FROM exact ORDER BY exact_n DESC, user_id LIMIT 10),
probes AS (
  SELECT c.user_id, c.exact_n, r.row_j,
         CAST(('0x' || substr(md5(CAST(r.row_j AS VARCHAR) || ':' || CAST(c.user_id AS VARCHAR)),
               1, 8)) AS BIGINT) % {_CMS_WIDTH} AS bucket
  FROM cand c CROSS JOIN rows_j r
)
SELECT p.user_id, CAST(p.exact_n AS BIGINT) AS exact_n,
       CAST(MIN(s.cnt) AS BIGINT) AS cms_estimate,
       MIN(s.cnt) >= p.exact_n AS never_underestimates
FROM probes p JOIN cells s ON p.row_j = s.row_j AND p.bucket = s.bucket
GROUP BY p.user_id, p.exact_n
ORDER BY exact_n DESC, user_id
""",
    doc="From-scratch count-min sketch (4×256 md5-hashed counter grid, "
    "cell-wise-SUM mergeable, map-side-collapsed before the shuffle) "
    "with point estimates for the exact top-10 users — estimate ≥ "
    "exact (the CM overestimate-only guarantee) asserted in-row. The "
    "streaming/distributed heavy-hitter path when exact per-key "
    "counting stops fitting.",
)
def q77_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cms_estimate_heavy_hitters(load(spark, sf_dir, "events"))


@register(
    "q73_sketch_rollup",
    oracle=None,  # FINAL (round-5 judgment): sketch bytes are
    # DataSketches-specific, rows-only by design; the deterministic
    # from-scratch twin q107 proves merged == direct in a full oracle,
    # and the in-row/test contract here covers the native path
    doc="Mergeable HLL sketch rollup: daily user sketches union-merged "
    "into monthly distinct estimates without rescanning the fact table "
    "— the incremental-distinct pattern; merged == direct is asserted "
    "in-row and test-pinned.",
)
def q73_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return sketch_rollup_daily_monthly(ev)


# ---------------------------------------------------------------------------
# From-scratch deterministic HLL (q106/q107): the q25/q34 determinization
# trick applied to sketches. q35/q73 keep the ENGINE-NATIVE kernels
# (HLL++ / DataSketches — the production path, rows-only by nature);
# these twins rebuild the same algorithm from md5 + integer arithmetic
# so DuckDB replays register state bit-for-bit and the driver hash-checks
# the whole sketch pipeline, not just row counts.
#
# Determinism budget:
# - hash = first 15 md5 hex chars -> 60-bit non-negative BIGINT
#   (bucket = low 10 bits, w = high 50 bits) — engine-exact.
# - register m_j = max rho, rho = 51 - bit_length(w) (w=0 -> 51):
#   integers via base-2 string length, no float log2 — engine-exact.
# - register digest = Σ 2^(51-m_j) over ALL 1024 registers, SCALED TO
#   BIGINT (empty register term = 2^51; total < 2^61): the float form
#   Σ 2^-m_j needs ~60 mantissa bits and would be summation-order-
#   dependent — the integer sum is exact and order-free.
# - estimate = floor(C / digest) with C = alpha_m * m^2 * 2^51 embedded
#   as ONE identical double literal in both engines: a single IEEE
#   division + floor, deterministic cross-engine (raw HLL estimator;
#   no small/large-range correction — documented, and the error bound
#   vs exact is pinned in tests).
# ---------------------------------------------------------------------------

_HLL_B = 10
_HLL_M = 1 << _HLL_B  # 1024 registers
_HLL_W = 50  # hash bits above the bucket
_HLL_EMPTY_TERM = 1 << (_HLL_W + 1)  # 2^51, the m_j = 0 register term
_HLL_ALPHA = 0.7213 / (1 + 1.079 / _HLL_M)
_HLL_C = _HLL_ALPHA * float(1 << (2 * _HLL_B + _HLL_W + 1))  # alpha*m^2*2^51


def _hll_bucket_rho(key: "F.Column") -> "F.Column":
    """(bucket, rho) struct of a key under the deterministic HLL hash
    — the hash IS functions.keys.hash_key (the 60-bit md5 fold used
    for surrogate keys), so sketch and key hashing share one engine-
    exact primitive."""
    h = hash_key(key)
    w = F.shiftright(h, _HLL_B)
    rho = F.when(w == 0, F.lit(_HLL_W + 1)).otherwise(
        F.lit(_HLL_W + 1) - F.length(F.conv(w, 10, 2)).cast("bigint")
    )
    return F.struct(
        h.bitwiseAND(F.lit(_HLL_M - 1)).alias("bucket"), rho.cast("int").alias("rho")
    )


def hll_registers(df: DataFrame, group_cols: list[str], key_col: str) -> DataFrame:
    """Non-empty HLL registers per group: (group..., bucket, m_j).
    One shuffle keyed by (group, bucket) with map-side max-combine;
    output is <= 1024 rows per group no matter the corpus size."""
    cell = _hll_bucket_rho(F.col(key_col))
    return (
        df.select(*group_cols, cell.alias("c"))
        .groupBy(*group_cols, F.col("c.bucket").alias("bucket"))
        .agg(F.max("c.rho").alias("m_j"))
    )


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Registers -> (n_registers, reg_digest, hll_users) per group.
    The digest is the exact BIGINT register sum (the mergeable sketch
    state, order-free); the estimate is one double division + floor."""
    return (
        registers.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_registers"),
            F.sum(F.expr(f"shiftleft(1L, {_HLL_W + 1} - m_j)")).alias("_nonempty_sum"),
        )
        .select(
            *group_cols,
            "n_registers",
            F.expr(
                f"CAST(({_HLL_M}L - n_registers) * {_HLL_EMPTY_TERM}L + _nonempty_sum AS BIGINT)"
            ).alias("reg_digest"),
        )
        .withColumn(
            "hll_users",
            F.expr(f"CAST(FLOOR({_HLL_C!r} / CAST(reg_digest AS DOUBLE)) AS BIGINT)"),
        )
    )


def _duck_hll_cells(key_sql: str) -> str:
    """DuckDB CTE body computing (bucket, rho) for ``key_sql`` —
    the exact twin of _hll_bucket_rho."""
    h = f"CAST(('0x' || substr(md5(CAST({key_sql} AS VARCHAR)), 1, 15)) AS BIGINT)"
    return (
        f"({h} & {_HLL_M - 1}) AS bucket, "
        f"CASE WHEN ({h} >> {_HLL_B}) = 0 THEN {_HLL_W + 1} "
        f"ELSE {_HLL_W + 1} - length(format('{{:b}}', {h} >> {_HLL_B})) END AS rho"
    )


_HLL_ORACLE_Q106 = f"""
WITH cells AS (
  SELECT event_type, {_duck_hll_cells("user_id")}
  FROM events
), regs AS (
  SELECT event_type, bucket, MAX(rho) AS m_j FROM cells GROUP BY 1, 2
), est AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_registers,
         CAST(({_HLL_M} - COUNT(*)) * {_HLL_EMPTY_TERM}
              + SUM(CAST(1 AS BIGINT) << ({_HLL_W + 1} - m_j)) AS BIGINT) AS reg_digest
  FROM regs GROUP BY 1
), exact AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
  FROM events GROUP BY 1
)
SELECT e.event_type, e.n_registers, e.reg_digest,
       CAST(FLOOR({_HLL_C!r} / CAST(e.reg_digest AS DOUBLE)) AS BIGINT) AS hll_users,
       x.exact_users
FROM est e JOIN exact x USING (event_type)
ORDER BY e.event_type
"""


@register(
    "q106_hll_from_scratch",
    oracle=_HLL_ORACLE_Q106,
    doc="From-scratch deterministic HLL (md5 hash, 1024 registers, "
    "BIGINT-exact register digest, single-division raw estimator) per "
    "event_type, next to the exact distinct count — the q25/q34 "
    "determinization applied to sketches, so the whole register state "
    "hash-checks against a DuckDB replay. The small-range linear-"
    "counting correction uses ln() (not bit-stable cross-engine), so "
    "readers apply it post-hoc from (n_registers, digest) — done and "
    "error-bound-pinned in tests. Engine-native twin: q35.",
)
def q106_hll_from_scratch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    regs = hll_registers(ev, ["event_type"], "user_id")
    est = hll_estimate(regs, ["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("bigint").alias("exact_users")
    )
    return est.join(exact, "event_type").orderBy("event_type")


_HLL_ORACLE_Q107 = f"""
WITH cells AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, strftime(ts, '%Y-%m') AS month,
         {_duck_hll_cells("user_id")}
  FROM events
), daily AS (
  SELECT day, month, bucket, MAX(rho) AS m_j FROM cells GROUP BY 1, 2, 3
), merged_regs AS (
  SELECT month, bucket, MAX(m_j) AS m_j FROM daily GROUP BY 1, 2
), merged AS (
  SELECT month,
         CAST(({_HLL_M} - COUNT(*)) * {_HLL_EMPTY_TERM}
              + SUM(CAST(1 AS BIGINT) << ({_HLL_W + 1} - m_j)) AS BIGINT) AS merged_digest
  FROM merged_regs GROUP BY 1
), direct_regs AS (
  SELECT month, bucket, MAX(rho) AS m_j FROM cells GROUP BY 1, 2
), direct AS (
  SELECT month,
         CAST(({_HLL_M} - COUNT(*)) * {_HLL_EMPTY_TERM}
              + SUM(CAST(1 AS BIGINT) << ({_HLL_W + 1} - m_j)) AS BIGINT) AS direct_digest
  FROM direct_regs GROUP BY 1
), days AS (
  SELECT month, CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days FROM cells GROUP BY 1
)
SELECT m.month, d.n_days,
       CAST(FLOOR({_HLL_C!r} / CAST(m.merged_digest AS DOUBLE)) AS BIGINT) AS merged_users,
       CAST(FLOOR({_HLL_C!r} / CAST(x.direct_digest AS DOUBLE)) AS BIGINT) AS direct_users,
       m.merged_digest = x.direct_digest AS merge_exact
FROM merged m JOIN direct x USING (month) JOIN days d USING (month)
ORDER BY m.month
"""


@register(
    "q107_hll_merge_rollup",
    oracle=_HLL_ORACLE_Q107,
    doc="Deterministic-HLL daily->monthly rollup: per-day registers "
    "max-merged into monthly estimates WITHOUT rescanning the fact, "
    "vs an independent direct monthly pass — merged == direct exactly "
    "(register max is associative), now PROVABLE in the oracle, not "
    "just asserted. Engine-native twin: q73.",
)
def q107_hll_merge_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    day = F.date_format("ts", "yyyy-MM-dd").alias("day")
    month = F.date_format("ts", "yyyy-MM").alias("month")
    base = ev.select(day, month, "user_id")
    daily = hll_registers(base, ["day", "month"], "user_id")
    merged_regs = daily.groupBy("month", "bucket").agg(F.max("m_j").alias("m_j"))
    merged = hll_estimate(merged_regs, ["month"]).select(
        "month", F.col("reg_digest").alias("merged_digest"),
        F.col("hll_users").alias("merged_users"),
    )
    direct = hll_estimate(hll_registers(base, ["month"], "user_id"), ["month"]).select(
        "month", F.col("reg_digest").alias("direct_digest"),
        F.col("hll_users").alias("direct_users"),
    )
    days = base.groupBy("month").agg(F.count_distinct("day").cast("bigint").alias("n_days"))
    return (
        merged.join(direct, "month")
        .join(days, "month")
        .select(
            "month", "n_days", "merged_users", "direct_users",
            (F.col("merged_digest") == F.col("direct_digest")).alias("merge_exact"),
        )
        .orderBy("month")
    )
