"""Streaming deployment of the incremental passage scrub — q142's
batch×base discipline inside ``foreachBatch`` (round-8, verdict item
5).

The production shape: a file-source stream watches a landing
directory of daily crawl drops; each micro-batch scrubs the new
documents against the STORED passage-vocabulary index (the corpus's
passage md5 set, appended per drop — never recomputed from the base
corpus, never joined base×base), writes the cleaned documents, and
appends the drop's own vocabulary so the next drop dedups against it.
Reference analog: the C1→C4 stream→merge loop (`with procedures/
order_proc.sql:96-309`) — a stream drained per cadence into an
idempotent state-advancing merge; here the "dim" is the passage
index and the "merge" is the scrub rewrite.

Exactly-once discipline (same contract as ``ingest_stream``):

- the CHECKPOINT makes file consumption exactly-once — a restarted
  stream never re-reads a consumed drop;
- the foreachBatch body is IDEMPOTENT under replay (Structured
  Streaming re-runs a batch whose commit didn't land): both sinks
  are hive-partitioned by ``batch_id`` and written with dynamic
  partition overwrite, so a replay overwrites its own partition
  byte-for-byte instead of appending duplicates;
- the index read EXCLUDES the current batch_id partition — a crash
  after the index write but before the checkpoint commit would
  otherwise replay the batch against its OWN vocabulary and scrub
  every passage it contains (the -1 sentinel beats every in-batch
  key). The partition filter prunes at the directory level, so the
  exclusion is free.

Scale: identical to q142 — the index contributes one distinct-ph
frame per prior drop (the stored corpus index), the shuffle is keyed
by ph over index+batch passages, and reassembly shuffles only the
batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import (
    PASSAGE_W,
    _passage_segments,
    _scrub_assemble,
    _SCRUB_FINAL_SELECT,
    scrub_out_cte,
    scrub_seg_cte,
)
from ..catalog import load
from ..registry import register

DOC_SCHEMA = "doc_id long, text string"


def _index_exists(index_dir: str) -> bool:
    return os.path.isdir(index_dir) and any(
        e.startswith("batch_id=") for e in os.listdir(index_dir)
    )


def scrub_microbatch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    out_dir: str,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = PASSAGE_W,
) -> None:
    """One drop's scrub: q142's kernel with the stored index as the
    base vocabulary. Idempotent under replay (see module docstring);
    callable directly for crash-replay tests."""
    # persist the segmentation: it feeds the scrub write AND the
    # vocabulary write — without it each sink re-reads and re-explodes
    # the micro-batch, doubling the segmentation cost of every drop
    segs = _passage_segments(batch, id_col, text_col, w).persist()
    batch_mins = (
        segs.filter(~F.col("is_tail")).groupBy("ph").agg(F.min("k").alias("mk"))
    )
    if _index_exists(index_dir):
        base_ph = (
            spark.read.parquet(index_dir)
            # exclude our own (possibly crash-leftover) partition:
            # replay must scrub against PRIOR drops only
            .filter(F.col("batch_id") != F.lit(int(batch_id)))
            .select("ph")
            .distinct()
            .withColumn("mk", F.lit(-1).cast("bigint"))
        )
        mins = (
            base_ph.unionByName(batch_mins).groupBy("ph").agg(F.min("mk").alias("mk"))
        )
    else:
        mins = batch_mins
    out = _scrub_assemble(segs.join(mins, "ph", "left"), id_col).withColumn(
        "batch_id", F.lit(int(batch_id)).cast("bigint")
    )
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(out_dir)
    )
    # vocabulary append AFTER the scrub write: a crash between the two
    # replays into the same partitions, converging to the same state.
    # batch_mins.select("ph") IS the batch's distinct full-passage
    # vocabulary (reuses the persisted segs + the same aggregation
    # shape instead of a third derivation).
    (
        batch_mins.select("ph")
        .withColumn("batch_id", F.lit(int(batch_id)).cast("bigint"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(index_dir)
    )
    segs.unpersist()


def scrub_stream(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = PASSAGE_W,
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """Start the scrub loop over a landing dir of JSON-lines drops
    (``{"doc_id": ..., "text": ...}``), one micro-batch per drop by
    default (``maxFilesPerTrigger=1`` — each daily file scrubs against
    everything before it, exactly like replaying q142 day by day).
    ``availableNow`` drains the backlog and stops — the daily-task
    cadence of the reference, run on demand."""
    docs = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(landing_dir)
    )

    def _body(batch: DataFrame, batch_id: int) -> None:
        scrub_microbatch(
            spark, batch, batch_id, out_dir, index_dir, id_col, text_col, w
        )

    return (
        docs.writeStream.foreachBatch(_body)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# q144: the streaming deployment REGISTERED and fully oracled — a
# deterministic 2-drop replay of scrub_stream over the documents table,
# hash-checked against a DuckDB oracle that replays the same two
# micro-batches as CTEs. The first streaming operator in the registry
# with a full value-hash oracle (streaming ops are allowed rows-only
# by the driver contract; this one doesn't need the concession).
# ---------------------------------------------------------------------------

_REPLAY_ORACLE = (
    f"WITH {scrub_seg_cte('WHERE doc_id % 5 = 3', 'a', PASSAGE_W).lstrip()},"
    f"{scrub_seg_cte('WHERE doc_id % 5 = 4', 'b', PASSAGE_W)},\n"
    "minsa AS (SELECT ph, MIN(k) AS mk FROM keyeda WHERE NOT is_tail GROUP BY ph),"
    f"{scrub_out_cte('a', 'minsa')},\n"
    "minsb AS (\n"
    "  SELECT ph, MIN(mk) AS mk FROM (\n"
    "    SELECT DISTINCT ph, CAST(-1 AS BIGINT) AS mk FROM keyeda WHERE NOT is_tail\n"
    "    UNION ALL\n"
    "    SELECT ph, MIN(k) AS mk FROM keyedb WHERE NOT is_tail GROUP BY ph\n"
    "  ) GROUP BY ph\n"
    "),"
    f"{scrub_out_cte('b', 'minsb')}"
    f"{_SCRUB_FINAL_SELECT.format(src='(SELECT * FROM oa UNION ALL SELECT * FROM ob)')}"
)


@register(
    "q144_streaming_scrub_replay",
    oracle=_REPLAY_ORACLE,
    doc="Streaming incremental passage scrub, REPLAYED end to end and "
    "fully oracled: two deterministic daily drops (doc_id%5=3, then "
    "%5=4) land as JSON files, scrub_stream drains them as two ordered "
    "foreachBatch micro-batches against the stored vocabulary index "
    "(drop 1 scrubs standalone, drop 2 against drop 1's passages by "
    "-1 seniority), and the parquet sink is read back and hash-checked "
    "against a DuckDB oracle replaying the same two batches as CTEs — "
    "the stream->merge loop of the reference "
    "(`with procedures/order_proc.sql:96-309`) with the scrub as the "
    "merge body, exactly-once by checkpoint + batch_id-partition "
    "idempotent sinks.",
)
def q144_streaming_scrub_replay(spark: SparkSession, sf_dir: str) -> DataFrame:

    from ..workdirs import replay_workdir

    # scratch OUTSIDE the repo tree ($SPARK_GRAFT_TMPDIR or the system
    # tempdir, age-based cleanup — verdict r8 item 7); the returned
    # DataFrame lazily reads this run's parquet, so the dir outlives
    # the query
    work = replay_workdir("stream_replay")
    landing = os.path.join(work, "drops")
    os.makedirs(landing)

    d = load(spark, sf_dir, "documents")
    drops = (
        d.filter(F.col("doc_id") % 5 == 3).select("doc_id", "text"),
        d.filter(F.col("doc_id") % 5 == 4).select("doc_id", "text"),
    )
    # one JSON file per drop + pinned mtimes: the file source orders
    # micro-batches by modification time, so each drop is exactly one
    # batch and drop 0 always precedes drop 1 (drops written
    # concurrently — see _write_json_drops)
    from .windows import _write_json_drops

    _write_json_drops(work, [(landing, i, f) for i, f in enumerate(drops)])

    q = scrub_stream(
        spark,
        landing,
        os.path.join(work, "clean"),
        os.path.join(work, "index"),
        os.path.join(work, "ckpt"),
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError(
            "q144_streaming_scrub_replay: availableNow drain did not "
            "finish within 600 s"
        )
    return (
        spark.read.parquet(os.path.join(work, "clean"))
        .select(
            "doc_id",
            "n_passages",
            "n_removed",
            F.md5("clean_text").alias("clean_md5"),
            "clean_chars",
        )
        .orderBy("doc_id")
    )
