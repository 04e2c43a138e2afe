"""Round-7: hashed-n-gram linear quality classifier (q140) — crafted
edges the corpus doesn't exercise plus an independent pure-Python
replica of the hash/weight/floor algebra (hashlib md5, not Spark's),
so a drift in the bucket arithmetic or the floored mean cannot pass.
"""

from __future__ import annotations

import hashlib
import math

from real_time_data_pipeline_for_restaurant_analytics_spark.operators.text import (
    quality_classifier_score,
)


def _w(feature: str) -> int:
    bucket = int(hashlib.md5(feature.encode()).hexdigest()[:8], 16)
    return bucket % 2001 - 1000


def _replica(text: str):
    toks = [t for t in text.split(" ") if t]
    feats = toks + [f"{x} {y}" for x, y in zip(toks, toks[1:])]
    if not feats:
        return (0, None, None)
    ws = [_w(f) for f in feats]
    logit = math.floor(sum(ws) * 1000 / len(ws))
    return (len(feats), logit, logit >= 0)


def test_matches_python_replica_and_edges(spark):
    texts = ["", "word", "a b", "  ", "the cat sat on the mat", "x " * 50]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_features, r.logit_milli, r.keep)
        for r in quality_classifier_score(docs).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _replica(t), (i, t)


def test_threshold_moves_the_keep_boundary(spark):
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat")], "doc_id long, text string"
    )
    base = quality_classifier_score(docs).collect()[0]
    assert base.keep == (base.logit_milli >= 0)
    strict = quality_classifier_score(
        docs, threshold_milli=base.logit_milli + 1
    ).collect()[0]
    assert strict.keep is False
    loose = quality_classifier_score(
        docs, threshold_milli=base.logit_milli
    ).collect()[0]
    assert loose.keep is True


def test_trained_weight_array_path_same_plan_shape(spark):
    """The docstring's 'trained model drops in' claim, executed: an
    explicit weight table gives w(f) = weights[bucket % len] via a
    constant-folded array literal — same single-projection plan (no
    join, no Python), and a replica pins the lookup arithmetic."""
    table = [(i * 37) % 500 - 250 for i in range(64)]
    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, ""), (3, "aa bb")], "doc_id long, text string"
    )
    out = {
        r.doc_id: (r.n_features, r.logit_milli, r.keep)
        for r in quality_classifier_score(docs, weights=table).collect()
    }

    def rep(text):
        toks = [t for t in text.split(" ") if t]
        feats = toks + [f"{x} {y}" for x, y in zip(toks, toks[1:])]
        if not feats:
            return (0, None, None)
        ws = [
            table[int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % len(table)]
            for f in feats
        ]
        logit = math.floor(sum(ws) * 1000 / len(ws))
        return (len(feats), logit, logit >= 0)

    for i, t in ((1, "the cat sat"), (2, ""), (3, "aa bb")):
        assert out[i] == rep(t), (i, t)
    plan = (
        quality_classifier_score(docs, weights=table)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan and "BatchEvalPython" not in plan


def test_plan_is_single_pass_no_shuffle(spark):
    """The operator's 100 TB contract: one map-side projection — the
    physical plan before the output sort must contain no join, no
    Python evaluation, and no KEY-partitioned Exchange. The ONLY
    exchange allowed is spread()'s single round-robin scan-spread
    (no data movement keyed by value, a no-op on a real cluster) —
    asserted literally, not just implied by the absence of joins."""
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    df = quality_classifier_score(docs)
    # drop the presentation orderBy: the operator body is what scales
    body = df.select("doc_id", "n_features", "logit_milli", "keep").limit(1)
    plan = body._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    exchange_lines = [
        ln for ln in plan.splitlines() if "Exchange" in ln and "Reused" not in ln
    ]
    assert len(exchange_lines) <= 1, plan
    assert all("RoundRobinPartitioning" in ln for ln in exchange_lines), plan
