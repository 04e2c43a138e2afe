"""Structured Streaming ingest: the reference's stream→MERGE loop
made literal (SURVEY §2.7, §3.1).

The reference's "real-time" is a daily task draining Snowflake
streams into MERGEs (C1-C4). Here the same per-entity pipeline body
(clean transform → SCD1 → SCD2 from pipeline/runner.py) runs inside
``foreachBatch`` over a file-source stream:

- `readStream` file source over the entity's landing directory =
  the append-only stage stream (C1). The checkpoint gives exactly-once
  file consumption — the transactional offset-advance Snowflake
  provides natively.
- each micro-batch is one "day" of the reference's cadence; the merge
  bodies are *identical* to the batch path (one library, two drivers —
  the design SURVEY §7/M5 calls for).
- swap the file source for Kafka (`spark.readStream.format("kafka")`)
  and nothing below the source changes: ``ingest_stream`` takes any
  streaming DataFrame with the entity's source columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions.keys import hash_key
from ..operators.merge import Scd2Config, apply_scd2, latest_per_key, merge_upsert
from ..pipeline.entities import EntitySpec
from ..pipeline.runner import Warehouse
from ..sources.readers import text_schema, with_audit_columns


def stage_file_stream(spark: SparkSession, spec: EntitySpec, landing_dir: str) -> DataFrame:
    """C1: append-only stage stream from a landing directory.
    Kafka-ready seam: return any streaming DF with spec.source_columns."""
    if spec.ext == "json":
        reader = spark.readStream.schema(text_schema(spec.source_columns)).json(landing_dir)
    else:
        reader = (
            spark.readStream.schema(text_schema(spec.source_columns))
            .option("header", "true")
            .option("quote", '"')
            .option("nullValue", "\\N")
            .csv(landing_dir)
        )
    return with_audit_columns(reader)


def with_stream_audit_columns(df: DataFrame, source_label: str) -> DataFrame:
    """Audit columns for non-file streaming sources (Kafka etc.):
    there is no file name/mtime, so the label + ingest timestamp stand
    in (for Kafka you'd fold topic/partition/offset into the label)."""
    return (
        df.withColumn("_stg_file_name", F.lit(source_label))
        .withColumn("_stg_file_load_ts", F.current_timestamp())
        .withColumn("_stg_file_md5", F.md5(F.lit(source_label)))
        .withColumn("_copy_data_ts", F.current_timestamp())
    )


def merge_microbatch(spark: SparkSession, wh: Warehouse, spec: EntitySpec, batch: DataFrame) -> None:
    """The foreachBatch body: same SCD1/SCD2 merges as the batch
    runner — one merge library, two drivers."""
    if not batch.head(1):
        return
    typed = spec.clean(batch)
    if spec.dedup_source:
        typed = typed.dropDuplicates()
    order_cols = (
        [F.col(spec.modified_col).desc_nulls_last(), F.col(spec.created_col).desc_nulls_last()]
        if spec.modified_col and spec.created_col
        else [F.lit(1)]
    )
    typed = latest_per_key(typed, spec.key, order_cols).localCheckpoint()

    clean_tbl = wh.clean(spec.name)
    prev = clean_tbl.read(spark)
    attrs = [c for c in typed.columns if c not in spec.key]
    clean_tbl.write(merge_upsert(prev, typed, spec.key, attrs))

    dim_tbl = wh.dim(spec.name)
    hk = f"{spec.name}_hk"
    with_hk = typed.withColumn(hk, hash_key(*spec.key, *spec.scd2_attrs))
    if spec.scd1_only:
        dim_tbl.write(merge_upsert(dim_tbl.read(spark), with_hk, spec.key, spec.scd2_attrs))
    else:
        cfg = Scd2Config(
            key=spec.key,
            attrs=spec.scd2_attrs,
            created_col=spec.created_col,
            first_start_from_created=True,
        )
        dim_tbl.write(apply_scd2(dim_tbl.read(spark), with_hk, cfg, F.current_timestamp()))


def ingest_stream(
    spark: SparkSession,
    wh: Warehouse,
    spec: EntitySpec,
    landing_dir: str | None,
    checkpoint_dir: str,
    available_now: bool = True,
    source: DataFrame | None = None,
) -> StreamingQuery:
    """Launch the stream→merge loop for one entity.

    ``available_now=True`` drains everything currently in the landing
    dir then stops (deterministic batch-incremental, like the daily
    task); False keeps the query live for true continuous ingest.

    ``source`` is the Kafka seam: pass ANY streaming DataFrame with
    spec.source_columns + the four audit columns (e.g.
    ``readStream.format("kafka")`` → ``from_json(value)`` →
    ``with_stream_audit_columns``) and the merge loop below is
    unchanged; ``landing_dir`` is then ignored.
    """
    stream = source if source is not None else stage_file_stream(spark, spec, landing_dir)

    def _body(batch: DataFrame, _batch_id: int) -> None:
        merge_microbatch(spark, wh, spec, batch)

    writer = (
        stream.writeStream.foreachBatch(_body)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
