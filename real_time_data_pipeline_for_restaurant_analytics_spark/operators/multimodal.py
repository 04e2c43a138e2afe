"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata (training-data-pipeline surface).

The decode/feature-extract kernels need codec libraries that are not
in this container, so the *decode step* is a clearly-marked
deterministic stub — but everything Spark-side is real and tested:
the binary column schema, the Arrow-batched ``mapInPandas`` UDF
signature, batch shapes, and the partitioning story (binary payloads
hash-partition on the id, payload bytes never shuffle more than
once).

At 100 TB the pattern is: keep payloads in parquet binary columns (or
pointers to object storage), run mapInPandas with modest
``maxRecordsPerBatch`` so a batch of payloads fits executor memory,
and emit narrow typed metadata that downstream joins/filters use —
the heavy bytes are touched exactly once.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

META_SCHEMA = (
    "doc_id bigint, n_bytes bigint, content_md5 string, fake_width int, fake_height int"
)


def decode_image_stub(payload: bytes) -> tuple[int, int]:
    """STUB: real implementation would decode the image header (PIL/
    libvips) and return (width, height). Container has no codec libs,
    so this derives a deterministic fake from the payload bytes —
    replace the body, keep the signature.
    """
    w = 1 + payload[0] % 64 if payload else 0
    h = 1 + payload[-1] % 64 if payload else 0
    return (w * 16, h * 16)


def _meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched metadata extraction over binary payloads."""
    for pdf in batches:
        payloads = pdf["payload"]
        dims = [decode_image_stub(p) for p in payloads]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len),
                "content_md5": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                "fake_width": [d[0] for d in dims],
                "fake_height": [d[1] for d in dims],
            }
        )


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Manufacture the opaque binary column (in production this IS the
    stored image/audio bytes; here utf-8 bytes of the text stand in)."""
    return df.select("doc_id", F.encode(F.col(text_col), "utf-8").alias("payload"))


def extract_metadata(binary_df: DataFrame) -> DataFrame:
    """mapInPandas over the binary column → typed metadata."""
    return binary_df.mapInPandas(_meta_batches, schema=META_SCHEMA)


THUMB_SCHEMA = "doc_id bigint, thumb binary, thumb_bytes bigint, thumb_md5 string"


def resize_stub(payload: bytes, max_bytes: int = 64) -> bytes:
    """STUB: real implementation decodes, resizes (PIL/libvips), and
    re-encodes. Deterministic fake: keep a bounded prefix — preserving
    the transform's contract (binary in → smaller binary out)."""
    return payload[:max_bytes]


def _thumb_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        thumbs = pdf["payload"].map(resize_stub)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "thumb": thumbs,
                "thumb_bytes": thumbs.map(len),
                "thumb_md5": thumbs.map(lambda b: hashlib.md5(b).hexdigest()),
            }
        )


def make_thumbnails(binary_df: DataFrame) -> DataFrame:
    """Binary→binary transform over mapInPandas (resize/frame-sample
    shape): payloads stream through Arrow in bounded batches and are
    touched exactly once; output is a new bounded binary column, so
    downstream stages shuffle thumbnails, never the originals."""
    return binary_df.mapInPandas(_thumb_batches, schema=THUMB_SCHEMA)


@register(
    "q37_multimodal_thumbnails",
    oracle="""
SELECT doc_id,
       CAST(octet_length(CAST(substr(text, 1, 64) AS BLOB)) AS BIGINT) AS thumb_bytes,
       md5(substr(text, 1, 64)) AS thumb_md5
FROM documents ORDER BY doc_id
""",
    doc="Binary→binary multimodal transform (resize/frame-sample plumbing; "
    "stub kernel keeps a bounded prefix, so the oracle can verify bytes).",
)
def q37_multimodal_thumbnails(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    thumbs = make_thumbnails(with_binary_payload(d))
    # ascii-only synthetic text ⇒ utf-8 byte prefix == char prefix, so
    # the DuckDB substr oracle checks the Spark-side bytes exactly.
    return thumbs.select("doc_id", "thumb_bytes", "thumb_md5").orderBy("doc_id")


@register(
    "q30_multimodal_metadata",
    oracle="""
SELECT doc_id,
       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
       md5(text) AS content_md5
FROM documents ORDER BY doc_id
""",
    doc="Binary-column metadata extraction via Arrow-batched mapInPandas "
    "(decode kernel stubbed; plumbing real).",
)
def q30_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    meta = extract_metadata(with_binary_payload(d))
    # fake_width/height come from the stub → excluded from the oracle
    # contract; byte-length and digest are real and engine-checkable.
    return meta.select("doc_id", "n_bytes", "content_md5").orderBy("doc_id")
