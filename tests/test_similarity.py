"""ANN invariants that the rows-only driver check can't see.

The LSH and IVF paths are registered without SQL oracles (bucket /
probe membership is float-sign sensitive cross-engine), so their
exactness contracts are pinned here instead:

- IVF with n_probe == n_cells is an exhaustive scan ⇒ must equal the
  brute-force top-k exactly.
- Every (query, neighbor) the LSH path returns must carry the same
  cosine the exact kernel computes (re-rank is exact within buckets).
"""

from __future__ import annotations

from real_time_data_pipeline_for_restaurant_analytics_spark.catalog import load
from real_time_data_pipeline_for_restaurant_analytics_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_bucket_ann,
)

from .conftest import SF_SMOKE


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_ivf_full_probe_equals_brute_force(spark):
    emb = load(spark, SF_SMOKE, "embeddings")
    n_cells = 8
    ivf = ivf_topk(emb, k=5, n_cells=n_cells, n_probe=n_cells, query_max_id=10)
    qids = [r[0] for r in emb.select("vec_id").filter("vec_id < 10").collect()]
    bf = brute_force_topk(emb, qids, k=5)
    assert _rows(ivf) == _rows(bf)


def test_lsh_scores_match_exact_kernel(spark):
    emb = load(spark, SF_SMOKE, "embeddings")
    lsh = lsh_bucket_ann(emb, k=3)
    qids = [r["query_id"] for r in lsh.select("query_id").distinct().collect()]
    assert qids, "LSH produced no candidates at smoke scale"
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cos_r"]
        for r in brute_force_topk(emb, qids, k=len(qids) + 10_000).collect()
    }
    for r in lsh.collect():
        assert abs(exact[(r["query_id"], r["neighbor_id"])] - r["cos_r"]) < 1e-9
