"""Versioned Parquet snapshot tables — the Delta-substitute storage
layer for the three-layer warehouse.

Snowflake gives the reference transactional tables + streams; OSS
Spark + Parquet has neither, so each managed table is a directory of
immutable versioned snapshots:

    <root>/<layer>/<table>/v=<n>/   (parquet)
    <root>/<layer>/<table>/_latest  (atomic pointer file)

Writes produce v=n+1 and then atomically swap the pointer (write
tmp + rename — atomic on POSIX and object stores with atomic rename;
on S3 you'd point this at a manifest commit, same contract). Readers
resolve the pointer once, so a concurrent writer never tears a read.
Keeping the previous version online is also what powers the
standard-stream change feed (C2): diff v_latest against v_latest-1.

At 100 TB you would swap this class for Delta/Iceberg and keep every
caller unchanged — the API (read/write/read_previous) is the contract.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    def __init__(self, root: str, name: str):
        self.dir = os.path.join(root, name)
        self.name = name

    def _pointer(self) -> str:
        return os.path.join(self.dir, "_latest")

    def latest_version(self) -> int | None:
        try:
            with open(self._pointer()) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def exists(self) -> bool:
        return self.latest_version() is not None

    def _path(self, version: int) -> str:
        return os.path.join(self.dir, f"v={version}")

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame | None:
        v = self.latest_version() if version is None else version
        if v is None:
            return None
        return spark.read.parquet(self._path(v))

    def read_previous(self, spark: SparkSession) -> DataFrame | None:
        v = self.latest_version()
        if v is None or v <= 0:
            return None
        prev = self._path(v - 1)
        return spark.read.parquet(prev) if os.path.exists(prev) else None

    def write(self, df: DataFrame, keep_versions: int = 2) -> int:
        """Write the next snapshot version and swing the pointer.
        Returns the new version number."""
        v = self.latest_version()
        new_v = 0 if v is None else v + 1
        df.write.mode("overwrite").parquet(self._path(new_v))
        tmp = self._pointer() + ".tmp"
        os.makedirs(self.dir, exist_ok=True)
        with open(tmp, "w") as f:
            f.write(str(new_v))
        os.replace(tmp, self._pointer())  # atomic pointer swap
        self._prune(new_v, keep_versions)
        return new_v

    def _prune(self, latest: int, keep: int) -> None:
        import shutil

        for entry in os.listdir(self.dir):
            if entry.startswith("v="):
                ver = int(entry.split("=", 1)[1])
                if ver <= latest - keep:
                    shutil.rmtree(os.path.join(self.dir, entry), ignore_errors=True)
