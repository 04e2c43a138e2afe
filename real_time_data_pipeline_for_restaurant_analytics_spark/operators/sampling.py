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


def hash_fraction(id_col: str) -> Column:
    """Uniform [0,1) draw as a pure function of the id: first 8 hex
    chars of md5 over 2^32. Engine-reproducible."""
    return F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
        "double"
    ) / F.lit(4294967296.0)


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
