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
        # fingerprints captured at DECISION time (unprocessed), keyed
        # by abspath — what mark() must record. Re-statting at mark
        # time would fingerprint content the load never read: a file
        # appended to DURING the load would be marked with its NEW
        # size/mtime although only the OLD rows were ingested, and the
        # appended rows would be skipped forever (review r8).
        self._pending: dict[str, dict] = {}

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
                self._pending[fp["path"]] = fp
        return out

    def pending_fingerprint(self, path: str) -> dict:
        """The fingerprint captured when :meth:`unprocessed` DECIDED to
        load ``path`` (fresh stat only for a path that never went
        through unprocessed). run_entity keys its stage partition by
        THIS fingerprint so the ingest tag and the ledger entry can
        never diverge: re-statting there would tag rows with a
        fingerprint of content appended AFTER the decision, splitting
        the retry-overwrite key from what mark() records (ADVICE r9)."""
        return dict(self._pending.get(os.path.abspath(path)) or self.fingerprint(path))

    def mark(self, paths: list[str]) -> None:
        """Record the fingerprints taken when ``unprocessed`` DECIDED
        to load these paths (falling back to a fresh stat only for a
        path never seen by unprocessed): content appended between the
        decision and the mark keeps a stale fingerprint on record, so
        the next run correctly re-loads the grown file instead of
        silently skipping the new rows."""
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "a") as f:
            for p in paths:
                key = os.path.abspath(p)
                fp = self._pending.pop(key, None) or self.fingerprint(p)
                f.write(json.dumps(fp) + "\n")

    def history(self) -> list[dict]:
        """copy_history-style introspection (S6)."""
        return list(self._entries().values())
