"""Deterministic splitting & sampling for training-data curation.

`df.randomSplit`/`df.sample` are seed-dependent AND
partitioning-dependent — rerun the job with different parallelism and
a document changes splits, which silently contaminates eval sets. At
100 TB the only safe split is a pure function of the row's identity:

- hash-based split assignment: fraction = md5(id) first 8 hex as a
  uniform [0,1) draw; split boundaries are cumulative weights. Stable
  under reruns, repartitioning, engine changes (md5 is universal —
  which also makes it DuckDB-oracle-checkable, unlike xxhash64).
- stratified deterministic sample: rank rows inside each stratum by
  the same hash draw, keep top-k — every engine and every rerun picks
  the same k docs per stratum. One shuffle (the per-stratum window).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


def hash_draw(id_col: str) -> Column:
    """THE module's one deterministic draw: first 8 hex chars of
    md5(id) as a BIGINT in [0, 2^32). Every sampler derives from this
    single definition (review r8: three hand-maintained copies — one
    of them a raw SQL string — had crept in; the determinism
    guarantees require them bit-identical)."""
    return F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("bigint")


def hash_fraction(id_col: str) -> Column:
    """Uniform [0,1) draw as a pure function of the id:
    :func:`hash_draw` over 2^32. Engine-reproducible."""
    return hash_draw(id_col).cast("double") / F.lit(4294967296.0)


def split_assign(
    df: DataFrame, id_col: str, weights: dict[str, float]
) -> DataFrame:
    """Adds a `split` column; weights must sum to 1. Boundaries are
    cumulative, so adding a new split later only moves rows at the
    tail boundary."""
    frac = hash_fraction(id_col)
    names = list(weights)
    if len(names) == 1:
        return df.withColumn("split", F.lit(names[0]))
    cum = weights[names[0]]
    expr = F.when(frac < cum, F.lit(names[0]))
    for name in names[1:-1]:
        cum += weights[name]
        expr = expr.when(frac < cum, F.lit(name))
    return df.withColumn("split", expr.otherwise(F.lit(names[-1])))


def stratified_sample(
    df: DataFrame, id_col: str, stratum_col: str, k: int
) -> DataFrame:
    """Deterministic k-per-stratum sample: rank by the hash draw
    inside each stratum, keep the first k."""
    w = Window.partitionBy(stratum_col).orderBy(hash_fraction(id_col), F.col(id_col))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


_FRAC_SQL = "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) / 4294967296.0"


@register(
    "q42_split_assign",
    oracle=f"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN {_FRAC_SQL} < 0.9 THEN 'train'
              WHEN {_FRAC_SQL} < 0.95 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT split, COUNT(*) AS n_docs, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM t GROUP BY split ORDER BY split
""",
    doc="Deterministic hash-based train/val/test split (90/5/5) — stable "
    "under reruns, repartitioning, and engine changes.",
)
def q42_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id")
    s = split_assign(d, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05})
    return (
        s.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("split")
    )


@register(
    "q43_stratified_sample",
    oracle=f"""
WITH q AS (
  SELECT doc_id,
         CASE WHEN len(string_split(text, ' ')) >= 20 THEN 'long'
              WHEN len(string_split(text, ' ')) >= 10 THEN 'mid'
              ELSE 'short' END AS bucket
  FROM documents
), ranked AS (
  SELECT doc_id, bucket,
         ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY {_FRAC_SQL}, doc_id) AS rk
  FROM q
)
SELECT bucket, doc_id FROM ranked WHERE rk <= 25 ORDER BY bucket, doc_id
""",
    doc="Deterministic stratified sample: 25 docs per length bucket, "
    "ranked by the id-hash draw (same picks on any engine/rerun).",
)
def q43_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    n_toks = F.size(F.split("text", " "))
    bucketed = d.select(
        "doc_id",
        F.when(n_toks >= 20, "long").when(n_toks >= 10, "mid").otherwise("short").alias(
            "bucket"
        ),
    )
    return (
        stratified_sample(bucketed, "doc_id", "bucket", k=25)
        .select("bucket", "doc_id")
        .orderBy("bucket", "doc_id")
    )


_BINS_PER_SHARD = 1_000_000


def pack_into_token_bins(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    bin_tokens: int,
    shard_size: int = 200,
) -> DataFrame:
    """Assign rows to fixed-token-budget bins: shard by id range
    (`shard = id div shard_size`), run the token cumsum *inside* each
    shard, local bin = floor(cumsum_before / bin_tokens), global
    ``bin_id = shard * 1e6 + local_bin``.

    The window is PARTITIONED by shard, so no single reducer ever sees
    the whole corpus — the scale-correct formulation of sequence
    packing (a global ``Window.orderBy`` cumsum funnels 100 TB through
    one task). Bins stay shard-local, which is what a sharded training
    dataset wants anyway; the id-offset keeps them globally unique as
    long as a shard never produces ≥1e6 bins (i.e. shard_size ×
    max-doc-tokens < 1e6 × bin_tokens — pick shard_size accordingly).
    Partial trailing bins at shard boundaries are the standard
    sharded-packing trade.
    """
    shard = F.expr(f"CAST({id_col} AS BIGINT) div {shard_size}")
    w = (
        Window.partitionBy(shard)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(token_count_col).over(w), F.lit(0))
    return df.withColumn(
        "bin_id",
        (shard * _BINS_PER_SHARD + F.floor(cum_before / bin_tokens)).cast("bigint"),
    )


@register(
    "q44_token_packing",
    oracle="""
WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
), packed AS (
  SELECT doc_id, n_tokens,
         CAST(doc_id // 200 AS BIGINT) * 1000000
         + CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (PARTITION BY doc_id // 200 ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2048) AS BIGINT) AS bin_id
  FROM t
)
SELECT bin_id, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM packed GROUP BY bin_id ORDER BY bin_id
""",
    doc="Token-budget packing: contiguous docs binned into ~2048-token "
    "buckets via a SHARD-PARTITIONED running-sum window (pretraining "
    "sequence-packing prep; no global single-reducer sort).",
)
def q44_token_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    packed = pack_into_token_bins(d, "doc_id", "n_tokens", bin_tokens=2048, shard_size=200)
    return (
        packed.groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("bin_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("bin_id")
    )


def corpus_shuffle_shards(
    df: DataFrame, id_col: str, n_shards: int
) -> DataFrame:
    """Deterministic global shuffle for training: shard assignment +
    within-shard position, both pure functions of the id.

    ``shard_id`` = md5-derived hash mod n_shards (uniform, rerun- and
    engine-stable); ``pos`` = rank within the shard ordered by the md5
    draw — together they define a reproducible random permutation of
    the corpus WITHOUT a global sort: the only window is partitioned
    by shard, so each task orders corpus/n_shards rows. At 100 TB pick
    n_shards ~ O(10k) so a shard fits one task; a global
    ``ROW_NUMBER() OVER (ORDER BY hash)`` — the naive permutation —
    would funnel everything through one reducer.
    """
    w = Window.partitionBy("shard_id").orderBy(F.md5(F.col(id_col).cast("string")), id_col)
    return (
        df.withColumn("shard_id", (hash_draw(id_col) % n_shards).cast("bigint"))
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
    )


@register(
    "q55_corpus_shuffle_shards",
    oracle="""
WITH h AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 16 AS shard_id,
         md5(CAST(doc_id AS VARCHAR)) AS draw
  FROM documents
)
SELECT doc_id, shard_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard_id ORDER BY draw, doc_id) AS BIGINT) AS pos
FROM h ORDER BY shard_id, pos
""",
    doc="Deterministic corpus shuffle: md5-hash shard assignment + "
    "within-shard position — a reproducible random permutation with "
    "no global sort (window partitioned by shard).",
)
def q55_corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id")
    return (
        corpus_shuffle_shards(d, "doc_id", n_shards=16)
        .select("doc_id", "shard_id", "pos")
        .orderBy("shard_id", "pos")
    )


def resample_by_weight(
    df: DataFrame, id_col: str, stratum_col: str, weights: dict[str, float]
) -> DataFrame:
    """Deterministic dataset-mixture resampling: stratum weight w
    emits floor(w) full copies of each row plus one more copy with
    probability frac(w), decided by the id-hash draw (so reruns and
    engines agree row-for-row). w<1 is plain downsampling; w>1 is
    upsampling with an epoch column distinguishing the copies.
    Entirely map-side: a per-row sequence/explode, no shuffle.
    """
    w_expr = None
    for name, w in weights.items():
        branch = F.lit(float(w))
        w_expr = (
            F.when(F.col(stratum_col) == name, branch)
            if w_expr is None
            else w_expr.when(F.col(stratum_col) == name, branch)
        )
    # empty weights = every stratum at the documented default of 1.0
    # (review r8: None.otherwise would AttributeError on a generated
    # empty mixture config)
    w_col = w_expr.otherwise(F.lit(1.0)) if w_expr is not None else F.lit(1.0)
    n_copies = (
        F.floor(w_col) + F.when(hash_fraction(id_col) < w_col - F.floor(w_col), 1).otherwise(0)
    ).cast("int")
    return (
        df.withColumn("_n", n_copies)
        .filter(F.col("_n") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(0), F.col("_n") - 1)))
        .drop("_n")
    )


@register(
    "q47_weighted_mixture",
    oracle=f"""
WITH q AS (
  SELECT doc_id,
         CASE WHEN len(string_split(text, ' ')) >= 20 THEN 'long'
              WHEN len(string_split(text, ' ')) >= 10 THEN 'mid'
              ELSE 'short' END AS bucket
  FROM documents
), weighted AS (
  SELECT doc_id, bucket,
         CASE bucket WHEN 'long' THEN 2.5 WHEN 'mid' THEN 1.0 ELSE 0.25 END AS w
  FROM q
), counted AS (
  SELECT doc_id, bucket,
         CAST(FLOOR(w) + CASE WHEN {_FRAC_SQL} < w - FLOOR(w) THEN 1 ELSE 0 END AS INT) AS n
  FROM weighted
)
SELECT bucket,
       CAST(SUM(n) AS BIGINT) AS n_rows_out,
       COUNT(CASE WHEN n > 0 THEN 1 END) AS n_docs_kept,
       COUNT(*) AS n_docs_in
FROM counted GROUP BY bucket ORDER BY bucket
""",
    doc="Deterministic weighted mixture resampling (upsample long docs "
    "2.5x, keep mid, downsample short to 25%) — map-side, rerun-stable.",
)
def q47_weighted_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    # let-bound token count: the bucket CASE is inlined into every
    # downstream weight branch by CollapseProject, so an unbound
    # size(split(text)) would re-split the text ~20× per row (plan
    # audit finding); binding n evaluates the split once per CASE.
    bucketed = d.select(
        "doc_id",
        F.expr(
            "element_at(transform(array(size(split(text, ' '))), n ->"
            " CASE WHEN n >= 20 THEN 'long' WHEN n >= 10 THEN 'mid'"
            " ELSE 'short' END), 1)"
        ).alias("bucket"),
    )
    mixed = resample_by_weight(
        bucketed, "doc_id", "bucket", {"long": 2.5, "mid": 1.0, "short": 0.25}
    )
    per_doc = mixed.groupBy("doc_id", "bucket").agg(F.count(F.lit(1)).alias("n"))
    kept = per_doc.groupBy("bucket").agg(
        F.sum("n").cast("bigint").alias("n_rows_out"),
        F.count(F.lit(1)).alias("n_docs_kept"),
    )
    totals = bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_docs_in"))
    return (
        totals.join(kept, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_rows_out", F.lit(0)).alias("n_rows_out"),
            F.coalesce("n_docs_kept", F.lit(0)).alias("n_docs_kept"),
            "n_docs_in",
        )
        .orderBy("bucket")
    )


def mixture_allocation(
    df: DataFrame,
    stratum_col: str,
    token_count_col: str,
    target_ppm: dict[str, int],
    default_ppm: int = 0,
) -> DataFrame:
    """Token-budget allocation for dataset mixing: given target corpus
    shares (ppm per stratum), compute each stratum's current share and
    the deterministic sampling rate that hits the target.

    ``sample_rate_ppm`` = min(1e6, target_tokens/stratum_tokens) —
    strata over their target get downsampled, strata at/under keep
    everything (rate 1e6; upsampling is resample_by_weight's job).
    One aggregation + a window sum over the per-stratum frame (tiny:
    one row per stratum); the corpus is scanned once. Feed the rates
    into hash_fraction for a rerun-stable subsample.
    """
    per = df.groupBy(stratum_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count_col).cast("bigint").alias("n_tokens"),
    )
    target = None
    for name, ppm in target_ppm.items():
        branch = F.lit(int(ppm))
        target = (
            F.when(F.col(stratum_col) == name, branch)
            if target is None
            else target.when(F.col(stratum_col) == name, branch)
        )
    target = target.otherwise(F.lit(int(default_ppm))) if target is not None else F.lit(int(default_ppm))
    total = F.sum("n_tokens").over(Window.partitionBy())
    # DOUBLE arithmetic in the oracle's exact operation order (review
    # r8): the previous BIGINT products 1e6*n_tokens and target*total
    # silently wrap past 2^63 at ~1e13 corpus tokens — the 100 TB scale
    # this module targets — turning share/rate negative, and only in
    # production (DuckDB's HUGEINT promotion means the oracle never
    # sees it). The oracle already computes in double (the 1000000.0
    # literals), so mirroring its expression order keeps the engines
    # IEEE-754-identical at every scale while the products stay exact
    # far past any real corpus (doubles are exact to 2^53 per factor
    # and the quotient is a ratio of same-magnitude terms).
    return per.select(
        stratum_col,
        F.col("n_docs").cast("bigint").alias("n_docs"),
        "n_tokens",
        F.floor(F.lit(1000000.0) * F.col("n_tokens") / total)
        .cast("bigint")
        .alias("share_ppm"),
        target.cast("bigint").alias("target_ppm"),
        F.least(
            F.lit(1000000).cast("bigint"),
            F.floor(
                # cast BEFORE the product: target*total as BIGINT is
                # the wrapping term; both engines promote to double at
                # the same position so the IEEE results stay identical
                target.cast("double")
                * total
                / F.lit(1000000.0)
                * F.lit(1000000.0)
                / F.col("n_tokens")
            ).cast("bigint"),
        ).alias("sample_rate_ppm"),
    )


# a deliberately skewed target: halve src0-src3, boost src4, rest equal
_MIX_TARGETS = {"src0": 25000, "src1": 25000, "src2": 25000, "src3": 25000, "src4": 100000}
_MIX_DEFAULT = 53333  # (1e6 - 200k) / 15 remaining sources


def _mix_target_sql() -> str:
    whens = " ".join(f"WHEN source = '{s}' THEN {p}" for s, p in _MIX_TARGETS.items())
    return f"CASE {whens} ELSE {_MIX_DEFAULT} END"


@register(
    "q59_source_mixture_allocation",
    oracle=f"""
WITH per AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM per)
SELECT source,
       CAST(n_docs AS BIGINT) AS n_docs,
       n_tokens,
       CAST(FLOOR(1000000.0 * n_tokens / total) AS BIGINT) AS share_ppm,
       CAST({_mix_target_sql()} AS BIGINT) AS target_ppm,
       least(1000000,
             CAST(FLOOR(CAST({_mix_target_sql()} AS DOUBLE) * total / 1000000.0 * 1000000.0 / n_tokens) AS BIGINT)
       ) AS sample_rate_ppm
FROM per, tot ORDER BY source
""",
    doc="Dataset-mixing allocation: per-source token share vs target "
    "share (ppm) and the deterministic downsampling rate that hits the "
    "target — one corpus scan + a window sum over the per-source frame.",
)
def q59_source_mixture_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "source", F.size(F.split("text", " ")).alias("n_toks")
    )
    return mixture_allocation(
        d, "source", "n_toks", _MIX_TARGETS, default_ppm=_MIX_DEFAULT
    ).orderBy("source")


def weighted_priority_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: keep the k
    rows with the smallest integer priority

        priority = (u * 1_000_000) DIV w,   u = md5(id) first 8 hex

    — an integer-exact Efraimidis–Spirakis-style scheme (key u^(1/w)
    replaced by its monotone integer proxy u/w): a row with twice the
    weight halves its priority and doubles its selection odds, and the
    draw is a pure function of the id, so reruns, repartitioning, and
    engines all pick the same k rows. All arithmetic is BIGINT
    (u < 2^32, ×1e6 < 2^52 — no float rounding anywhere).

    Scale shape: priority is map-side; global top-k is TakeOrdered
    (per-partition partial top-k, then a k-row merge on the driver
    path of the sort-limit operator) — never a full global sort.

    Rows with weight <= 0 are excluded: Spark's integer DIV yields NULL
    on a zero divisor and NULLs sort first ascending, so a zero-weight
    row would otherwise win a slot ahead of every real row (and the
    DuckDB oracle errors outright on division by zero).
    """
    return (
        df.filter(F.col(weight_col).cast("bigint") > 0)
        .select(
            F.col(id_col),
            F.col(weight_col).cast("bigint").alias("weight"),
            # the draw comes from the shared helper; only the integer
            # DIV (no Column-API operator) stays as SQL text
            (hash_draw(id_col) * F.lit(1000000)).alias("_num"),
        )
        .withColumn("priority", F.expr("_num DIV weight"))
        .drop("_num")
        .orderBy("priority", id_col)
        .limit(k)
    )


_WPS_K = 25

_WPS_ORACLE = f"""
SELECT doc_id,
       CAST(n_chars AS BIGINT) AS weight,
       (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) * 1000000)
         // n_chars AS priority
FROM documents
WHERE n_chars > 0
ORDER BY priority, doc_id
LIMIT {_WPS_K}
"""


@register(
    "q89_weighted_sample",
    oracle=_WPS_ORACLE,
    doc="Deterministic weighted sampling without replacement: integer "
    "Efraimidis–Spirakis priority (md5 draw DIV weight), global top-k "
    "via TakeOrdered — length-weighted corpus subsampling that is "
    "rerun- and engine-stable.",
)
def q89_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return weighted_priority_sample(d, "doc_id", "n_chars", _WPS_K)


def token_budget_sample(
    docs: DataFrame,
    budget_tokens: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-source TOKEN-budget cap — how a training mixture is
    actually specified ("N billion tokens of source X"), where q78's
    domain cap counts documents: walk each source's docs in the
    deterministic md5-rank order and keep every doc whose running
    token total BEFORE it is still under the budget (next-fit
    boundary, same start-offset convention as q137's packer — the doc
    that crosses the line is the last one kept, so the budget is
    always reached when the source can fill it).

    One shuffle, partitioned by source, ROWS-frame running sum over
    the rank order (the q137 lesson: the default RANGE frame would
    pool md5-tie peers). Token counts are whitespace tokens here; any
    token-count column can be supplied upstream. Returns the kept
    docs with their token count and pre-doc start offset."""
    return _token_budget_frame(docs, source_col, id_col, text_col).filter(
        F.col("start_tokens") < F.lit(int(budget_tokens))
    )


def _token_budget_frame(
    docs: DataFrame, source_col: str, id_col: str, text_col: str
) -> DataFrame:
    """The budget walk's SINGLE arithmetic source (review r8: the
    operator and q143's audit carried verbatim copies of the salt,
    window, and running sum — a change to either would silently
    diverge from the other): every doc with its whitespace token count
    and the ROWS-frame running total BEFORE it in the deterministic
    md5('tok:'+id) rank order. The operator filters this frame; the
    q143 audit aggregates it (it needs dropped-doc accounting, so it
    cannot consume the filtered output)."""
    rnd = F.md5(F.concat(F.lit("tok:"), F.col(id_col).cast("string")))
    w = (
        Window.partitionBy(source_col)
        .orderBy(rnd, id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_tok = F.size(F.split(F.col(text_col), " ")).cast("bigint")
    return docs.withColumn("n_tokens", n_tok).withColumn(
        "start_tokens", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )


_TOKEN_BUDGET = 8000  # per-source token budget at gate scale


@register(
    "q143_token_budget_sample",
    oracle=f"""
WITH t AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens,
         md5('tok:' || CAST(doc_id AS VARCHAR)) AS rnd
  FROM documents
),
r AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY rnd, doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS start_tokens
  FROM t
)
SELECT source,
       CAST(COUNT(CASE WHEN start_tokens < {_TOKEN_BUDGET} THEN 1 END) AS BIGINT) AS kept_docs,
       CAST(SUM(CASE WHEN start_tokens < {_TOKEN_BUDGET} THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens,
       CAST(COUNT(CASE WHEN start_tokens >= {_TOKEN_BUDGET} THEN 1 END) AS BIGINT) AS dropped_docs
FROM r GROUP BY source ORDER BY source
""",
    doc="Per-source token-budget sampling (the mixture spec 'N tokens "
    "of source X'): deterministic md5-rank walk keeps docs while the "
    "running pre-doc token total is under budget (next-fit boundary); "
    "per-source kept/dropped accounting. One source-keyed shuffle with "
    "a ROWS-frame running sum.",
)
def q143_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    kept_flag = F.col("start_tokens") < _TOKEN_BUDGET
    # the registered AUDIT needs dropped-doc accounting too, so it
    # aggregates the UNFILTERED budget frame — the same arithmetic
    # source the filtering operator consumes (_token_budget_frame)
    all_docs = _token_budget_frame(d, "source", "doc_id", "text")
    return (
        all_docs.groupBy("source")
        .agg(
            F.sum(F.when(kept_flag, 1).otherwise(0)).cast("bigint").alias("kept_docs"),
            F.sum(F.when(kept_flag, F.col("n_tokens")).otherwise(0))
            .cast("bigint")
            .alias("kept_tokens"),
            F.sum(F.when(kept_flag, 0).otherwise(1)).cast("bigint").alias("dropped_docs"),
        )
        .orderBy("source")
    )
