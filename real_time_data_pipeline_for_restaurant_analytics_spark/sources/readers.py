"""Stage-layer file readers honoring the reference's file-format
contract (S1-S4, SURVEY §2.1).

The reference's named CSV format (`01 Create DB+Schema.sql:28-35`):
skip_header=1, field_optionally_enclosed_by='"', null_if='\\N',
delimiter ','. Its COPY binds columns positionally ($1..$n,
`03:51-67`) and appends four audit columns (`02:42-45`):
metadata$filename, metadata$file_last_modified,
metadata$file_content_key, current_timestamp.

Spark mapping: explicit all-string StructType (never inferSchema —
schema-on-load-as-text is the reference's stage contract AND a real
perf win at scale: no inference pass over 100 TB), positional rename,
`_metadata` hidden columns for the file audit fields.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

AUDIT_COLS = ("_stg_file_name", "_stg_file_load_ts", "_stg_file_md5", "_copy_data_ts")


def text_schema(columns: list[str]) -> StructType:
    """All-text stage schema (`02:12-27`: 'all the columns are text')."""
    return StructType([StructField(c, StringType(), True) for c in columns])


def with_audit_columns(df: DataFrame) -> DataFrame:
    """Append the reference's four audit columns (S4, `02:42-45`).

    `_metadata` is Spark's hidden file-source struct —
    file_name/file_modification_time map 1:1 to metadata$filename /
    metadata$file_last_modified; the content key is derived from the
    (name, size, mtime) triple since Spark exposes no file digest.
    """
    return (
        df.withColumn("_stg_file_name", F.col("_metadata.file_name"))
        .withColumn("_stg_file_load_ts", F.col("_metadata.file_modification_time"))
        .withColumn(
            "_stg_file_md5",
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("_metadata.file_path"),
                    F.col("_metadata.file_size"),
                    F.col("_metadata.file_modification_time").cast("long"),
                )
            ),
        )
        .withColumn("_copy_data_ts", F.current_timestamp())
    )


def read_stage_csv(
    spark: SparkSession,
    path: str,
    columns: list[str],
    audit: bool = True,
    on_error: str = "abort",
) -> DataFrame:
    """S1+S2: CSV stage scan with the named-format options and
    positional column binding.

    ``on_error`` mirrors COPY's clause (`03:76`:
    ``on_error=abort_statement``): "abort" → FAILFAST (a malformed
    row fails the load), "continue" → PERMISSIVE (malformed rows
    land as nulls).
    """
    df = (
        spark.read.schema(text_schema(columns))
        .option("header", "true")  # skip_header = 1
        .option("quote", '"')  # field_optionally_enclosed_by
        .option("nullValue", "\\N")  # null_if = ('\\N')
        .option("sep", ",")
        .option("mode", "FAILFAST" if on_error == "abort" else "PERMISSIVE")
        .csv(path)
    )
    return with_audit_columns(df) if audit else df


def read_stage_json(
    spark: SparkSession,
    path: str,
    columns: list[str],
    audit: bool = True,
) -> DataFrame:
    """S3: JSON stage scan with path extraction to text columns
    (`delivery_agent_proc.sql:115-133`: `$1:Field::text`)."""
    raw = spark.read.json(path)
    # JSON fields bind by (case-insensitive) name, like Snowflake's
    # $1:Field::text path extraction.
    present = {c.lower(): c for c in raw.columns}
    df = raw.select(
        *[
            (
                F.col(present[c.lower()]).cast("string")
                if c.lower() in present
                else F.lit(None).cast("string")
            ).alias(c)
            for c in columns
        ],
        "_metadata",
    )
    return with_audit_columns(df).drop("_metadata") if audit else df.drop("_metadata")
