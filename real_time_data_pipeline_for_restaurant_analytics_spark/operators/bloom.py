"""Bloom-filter join pruning: ship a ~KB bitmask instead of shuffling
the fact table.

The 100 TB problem: a semi-join of a huge fact table against a
filtered dimension normally shuffles BOTH sides on the join key. A
Bloom filter built from the dimension's surviving keys is a few KB —
broadcast it (here: inlined as a literal long-array in the plan, like
the IVF centroids) and the fact side drops non-matching rows AT THE
SCAN, map-side, before any exchange. The exact semi-join still runs
after the pre-filter, but on the tiny surviving fraction, so its
shuffle is proportional to the match volume, not the corpus.

Correctness is unconditional: Bloom filters have no false negatives,
so pre-filter + exact semi-join ≡ exact semi-join (the oracle checks
exactly that — the filter is pure pruning, invisible in the result).
False positives only cost extra join input (~1% at the default
sizing: k=7, ~9.6 bits/key). This is the explicit form of what
Snowflake's join pruning and Spark's AQE runtime filters do
implicitly — surfaced as an operator so a pipeline can apply it
across stages/jobs where the optimizer can't see the connection.

Built from scratch on public primitives (xxhash64 + integer bit ops;
Spark's internal ``bloom_filter_agg`` is not in the public function
registry), so every bit decision is a plain JVM expression inside
whole-stage codegen.

Reference anchor: the reference's fact⋈dim joins (J1/J5,
`order_proc.sql`) all have small filtered dim sides; this is the same
join family with the build side reduced to a sketch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

N_HASHES = 7
DEFAULT_NUM_BITS = 48_000  # ~1% fpp for ≈5k keys at k=7; 750 longs ≈ 6 KB
_BITS_PER_KEY = 10  # ≈1% fpp at k=7
_MIN_NUM_BITS = 4_096


def sized_num_bits(n_keys: int) -> int:
    """Filter size for a key count at ~1% fpp (review r8: the fixed
    48k-bit default saturates past ~5k keys — at 30k keys the fill
    fraction hits 0.99 and the "pre-filter" passes ~91% of
    non-matching rows while still paying 7 hashes per row). 10 bits
    per key, rounded up to whole 64-bit words, floor 4096."""
    return max(_MIN_NUM_BITS, ((int(n_keys) * _BITS_PER_KEY + 63) // 64) * 64)


def _canon(key_sql: str) -> str:
    """Canonical hash input: CAST(key AS STRING). xxhash64 is
    TYPE-SENSITIVE (an int32 and an int64 of the same value hash
    differently), so a fact/dim key dtype mismatch — e.g. a parquet
    source written with int32 keys probed against a bigint dim —
    would produce FALSE NEGATIVES: silently dropped matching rows
    (review r8). Hashing the string form makes build and probe agree
    for any integer/string key widths at the cost of one in-codegen
    cast per row. Fractional keys are REJECTED before this point
    (:func:`_assert_bloomable_key`): an int 5 casts to '5' while a
    double 5.0 casts to '5.0', so a float/decimal-vs-int key pair
    would still false-negative rows the exact join's implicit numeric
    cast matches (ADVICE r9)."""
    return f"CAST({key_sql} AS STRING)"


_INTEGRAL_TYPES = {"tinyint", "smallint", "int", "bigint"}


#: Atomic non-fractional dtypes OUTSIDE the merged integral family:
#: each is its own single-dtype family (a same-dtype pair canonicalizes
#: identically by construction — boolean 'true'='true', equal binary
#: bytes render equal). timestamp and timestamp_ntz are DISTINCT
#: families (ADVICE r10): their CAST-to-string forms agree only when
#: the session timezone happens to make the ltz rendering match the
#: ntz wall clock, so a mixed pair would silently prune matches under
#: any other timezone.
_SELF_FAMILIES = {"string", "date", "boolean", "binary", "timestamp", "timestamp_ntz"}


def _key_family(df: DataFrame, key: str) -> str:
    """The key's string-canonicalization FAMILY: every dtype inside one
    family renders equal values as equal strings ('5' for any integral
    width or scale-0 decimal), while dtypes across families do not
    (int 5 → '5' vs string '05'/' 5', DATE '2024-01-01' vs TIMESTAMP
    '2024-01-01 00:00:00'). Fractional types raise EVEN same-dtype
    (not just cross-family): SQL equality is value-based while the
    string cast is representation-based — double -0.0 = 0.0 joins but
    renders '-0.0' vs '0.0', a silent false negative no family rule
    can repair."""
    name = df.select(F.expr(key)).schema[0].dataType.simpleString()
    if name in _INTEGRAL_TYPES or (name.startswith("decimal(") and name.endswith(",0)")):
        return "integral"
    if name in _SELF_FAMILIES:
        return name
    raise TypeError(
        f"bloom key {key!r} has dtype {name}: fractional "
        "(float/double/decimal with scale>0 — -0.0 = 0.0 joins but "
        "renders '-0.0' vs '0.0') and complex keys do not canonicalize "
        "stably to strings, so the Bloom pre-filter could silently "
        "drop rows the exact join matches. Cast the key to an "
        "integral/string type first, or use the plain semi-join."
    )


def _assert_bloomable_key(df: DataFrame, key: str, side: str) -> None:
    """Single-side guard (ADVICE r9): fail LOUDLY on dtypes with no
    stable string form. The standalone build/prune halves can only see
    their own side; callers composing them manually must keep build
    and probe keys in the SAME family — :func:`bloom_semi_join`, which
    holds both frames, enforces that cross-side check itself
    (review r9)."""
    try:
        _key_family(df, key)
    except TypeError as e:
        raise TypeError(f"bloom {side} key: {e}") from None


def _assert_same_family(
    fact: DataFrame, fact_key: str, dim: DataFrame, dim_key: str
) -> None:
    """Cross-side guard (review r9): individually-fine dtypes from
    DIFFERENT families (date vs timestamp, int vs string) still
    canonicalize equal values to different strings — every matching
    row would silently hash to different bit positions and be pruned
    while the exact join (implicit cast) would have matched it."""
    ff = _key_family(fact, fact_key)
    df_ = _key_family(dim, dim_key)
    if ff != df_:
        raise TypeError(
            f"bloom build/probe key families differ: probe {fact_key!r} "
            f"is {ff}, build {dim_key!r} is {df_} — equal values "
            "canonicalize to different strings across families (int 5 "
            "vs string '05', date vs timestamp), so matching rows "
            "would be silently pruned. Cast both keys to one family "
            "first."
        )


def _positions(key_col: str, num_bits: int) -> list[Column]:
    """The k bit positions of a key: pmod(xxhash64(seed_j,
    string(key)), m). Same expression on build and probe side by
    construction (see :func:`_canon` for why the string cast is
    load-bearing)."""
    return [
        F.pmod(
            F.xxhash64(F.lit(j).cast("long"), F.expr(_canon(key_col))),
            F.lit(num_bits),
        )
        for j in range(N_HASHES)
    ]


def build_key_bloom(dim: DataFrame, dim_key: str, num_bits: int = DEFAULT_NUM_BITS) -> list[int]:
    """Build the filter as a list of signed-64 words. The distributed
    part is one explode + distinct over the dim's k·n bit positions —
    dimension-sized, never fact-sized; the driver then ORs ≤ k·n bits
    into a num_bits/64-word mask (a scalar "build" step, like fetching
    IVF centroids)."""
    assert num_bits % 64 == 0
    _assert_bloomable_key(dim, dim_key, "build")
    pos = (
        dim.select(F.explode(F.array(*_positions(dim_key, num_bits))).alias("p"))
        .distinct()
        .collect()
    )
    words = [0] * (num_bits // 64)
    for r in pos:
        words[r["p"] // 64] |= 1 << (r["p"] % 64)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_prune(
    fact: DataFrame, fact_key: str, words: list[int], num_bits: int = DEFAULT_NUM_BITS
) -> DataFrame:
    """Map-side pre-filter: keep rows where all k probed bits are set.
    The mask is a literal array column; each probe is element_at +
    shiftrightunsigned — pure integer expressions that stay inside
    whole-stage codegen, evaluated before any exchange. No false
    negatives ⇒ safe before any exact join."""
    _assert_bloomable_key(fact, fact_key, "probe")
    from .similarity import sql_bigint_array

    # one SQL string, not len(words) Py4J F.lit round trips (driver-side
    # plan-build cost) — the literal-encoding rule lives in ONE place
    mask = F.expr(sql_bigint_array(words))
    probes = [
        (
            F.expr(
                f"(shiftrightunsigned(element_at(_bloom_mask, CAST({p_sql} div 64 AS INT) + 1),"
                f" CAST({p_sql} % 64 AS INT)) & 1) = 1"
            )
        )
        for p_sql in (
            f"pmod(xxhash64(CAST({j} AS BIGINT), {_canon(fact_key)}), {num_bits})"
            for j in range(N_HASHES)
        )
    ]
    cond = probes[0]
    for p in probes[1:]:
        cond = cond & p
    return fact.withColumn("_bloom_mask", mask).filter(cond).drop("_bloom_mask")


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    num_bits: int | None = None,
) -> DataFrame:
    """Exact semi-join with Bloom pre-pruning: build the filter from
    the dim keys, prune the fact scan map-side, then run the exact
    left-semi join on the survivors. Result is identical to the plain
    semi-join at any false-positive rate.

    ``num_bits=None`` (default) sizes the filter from the dim's actual
    key count (:func:`sized_num_bits` — review r8: a fixed size
    saturates as the dim grows and the pre-filter degrades to pure
    overhead). The count is one extra dimension-sized job next to the
    dimension-sized build."""
    _assert_same_family(fact, fact_key, dim, dim_key)
    if num_bits is None:
        num_bits = sized_num_bits(dim.select(dim_key).distinct().count())
    words = build_key_bloom(dim, dim_key, num_bits)
    pruned = bloom_prune(fact, fact_key, words, num_bits)
    keys = dim.select(F.col(dim_key).alias(fact_key)).distinct()
    return pruned.join(keys, fact_key, "left_semi")


def _cents(col: str) -> Column:
    """Double money → exact integer cents (round-half-up, the engine-
    stable form for DOUBLE inputs)."""
    return F.floor(F.col(col) * 100 + F.lit(0.5)).cast("bigint")


@register(
    "q70_bloom_pruned_semi_join",
    oracle="""
SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS ym,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
GROUP BY 1 ORDER BY ym
""",
    doc="Bloom-pruned semi-join: monthly order volume/revenue for one "
    "customer segment, with the fact scan pre-filtered by an inlined "
    "Bloom bitmask of the segment's keys — identical results to the "
    "plain semi-join (no false negatives), shuffle sized by matches "
    "instead of corpus.",
)
def q70_bloom_pruned_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    seg = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "AUTOMOBILE")
    matched = bloom_semi_join(orders, seg, "o_custkey", "c_custkey")
    return (
        matched.groupBy(
            (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("bigint").alias("ym")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(_cents("o_totalprice")).cast("bigint").alias("revenue_cents"),
        )
        .orderBy("ym")
    )
