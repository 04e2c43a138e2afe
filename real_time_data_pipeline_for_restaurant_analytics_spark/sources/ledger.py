"""Processed-file ledger: exactly-once bulk load without COPY INTO.

Snowflake's COPY tracks loaded files per table and skips re-loads
(S5, `03:44-77`); `information_schema.copy_history` exposes the log
(S6, `06:78-79`). Here the same contract is a ledger file per stage
table listing every ingested file's path+size+mtime fingerprint. A
batch load = "list candidates → subtract ledger → append the rest →
extend ledger". Re-running a load is a no-op (idempotence test in
tests/test_pipeline.py).

Structured Streaming's file-source checkpoint provides this natively
for the streaming path (streaming/ingest.py); the ledger is the
batch-mode equivalent, like the reference's task-driven daily COPY.
"""

from __future__ import annotations

import json
import os


class FileLedger:
    def __init__(self, path: str):
        self.path = path

    def _entries(self) -> dict[str, dict]:
        if not os.path.exists(self.path):
            return {}
        out: dict[str, dict] = {}
        with open(self.path) as f:
            for line in f:
                if line.strip():
                    e = json.loads(line)
                    out[e["path"]] = e
        return out

    @staticmethod
    def fingerprint(path: str) -> dict:
        st = os.stat(path)
        return {"path": os.path.abspath(path), "size": st.st_size, "mtime": st.st_mtime}

    def unprocessed(self, candidates: list[str]) -> list[str]:
        seen = self._entries()
        out = []
        for c in candidates:
            fp = self.fingerprint(c)
            prev = seen.get(fp["path"])
            if prev is None or (prev["size"], prev["mtime"]) != (fp["size"], fp["mtime"]):
                out.append(c)
        return out

    def mark(self, paths: list[str]) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "a") as f:
            for p in paths:
                f.write(json.dumps(self.fingerprint(p)) + "\n")

    def history(self) -> list[dict]:
        """copy_history-style introspection (S6)."""
        return list(self._entries().values())
