"""Section-level timing for q160/q168 (guide §1): replays the
ivf_pq_recall_audit internals by hand with a timer between sections.
Measurement tooling only — never on any query path.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from real_time_data_pipeline_for_restaurant_analytics_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ivfpq_probe")
    spark.sparkContext.setLogLevel("ERROR")

    import real_time_data_pipeline_for_restaurant_analytics_spark.operators.similarity as sim
    from real_time_data_pipeline_for_restaurant_analytics_spark.catalog import load
    from real_time_data_pipeline_for_restaurant_analytics_spark.registry import all_queries

    qs = all_queries()
    t0 = time.perf_counter()
    qs["q160_ivfpq_recall_audit"].build(spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()
    print(f"warm q160: {time.perf_counter() - t0:.2f}s", flush=True)

    emb = qs["q160_ivfpq_recall_audit"].build  # not used; emb below
    # mirror the q160 registration's source frame
    src = load(spark, sf_dir, "embeddings")

    for rep in range(2):
        marks = [("t0", time.perf_counter())]
        n_cells, n_sub, n_codes, train_rounds = 16, 8, 32, 2
        query_max_id, maxp, k, refine_r = 50, 4, 5, 100
        dim = sim._vec_dim(src, "embedding") or 64
        sub = dim // n_sub
        base = sim._int8_base(src, "vec_id", "embedding")
        cores = spark.sparkContext.defaultParallelism
        nparts = base.rdd.getNumPartitions()
        if nparts < cores:
            want = int(min(cores, max(1, base.count() // 512)))
            if nparts < want:
                base = base.repartition(want)
        marks.append(("size_base", time.perf_counter()))
        cents = (
            base.filter(F.col("vec_id") < n_cells)
            .select(F.col("vec_id").alias("cell"), "qv")
            .collect()
        )
        marks.append(("cent_collect", time.perf_counter()))
        train_src = base.filter(F.col("vec_id") < 2000)
        cb = sim._pq_train_codebook(train_src, "vec_id", n_sub, sub, n_codes, train_rounds)
        cb.count()
        marks.append(("train_cb", time.perf_counter()))

        cent_lits = [(int(r["cell"]), [int(x) for x in r["qv"]]) for r in cents]

        def best_cells(n):
            structs = ", ".join(
                "struct(aggregate(zip_with(qv, array({lits}), (x, y) -> (x - y) * (x - y)),"
                " 0L, (a, v) -> a + v) AS d, {cell} AS c)".format(
                    lits=", ".join(f"{int(x)}L" for x in cm), cell=int(cell)
                )
                for cell, cm in cent_lits
            )
            return F.expr(
                f"transform(slice(array_sort(array({structs})), 1, {n}), st -> st.c)"
            )

        coded = base.crossJoin(F.broadcast(cb)).select(
            F.col("vec_id").alias("neighbor_id"),
            F.coalesce(best_cells(1)[0], F.lit(-1)).alias("cell"),
            sim._pq_codes_expr(sub).alias("codes"),
        )
        probes = (
            base.filter(F.col("vec_id") < query_max_id)
            .crossJoin(F.broadcast(cb))
            .select(
                F.col("vec_id").alias("query_id"),
                sim._pq_lut_expr(sub).alias("lut"),
                F.posexplode(best_cells(maxp)).alias("_pos", "cell"),
            )
            .select("query_id", "lut", (F.col("_pos") + 1).cast("int").alias("cell_rank"), "cell")
        )
        scored = (
            F.broadcast(probes)
            .join(coded, "cell")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id", "cell_rank",
                    sim._pq_adc_expr(n_sub, n_codes).alias("adc_dist"))
        )
        scored = scored.localCheckpoint()
        marks.append(("scored_ckpt", time.perf_counter()))

        qside = base.filter(F.col("vec_id") < query_max_id).select(
            F.col("vec_id").alias("query_id"), F.col("qv").alias("qqv")
        )
        d2 = F.expr(
            "aggregate(zip_with(qqv, qv, (a, b) -> (a - b) * (a - b)),"
            " CAST(0 AS BIGINT), (s, x) -> s + x)"
        )
        we = Window.partitionBy("query_id").orderBy("d2", "neighbor_id")
        exact = (
            F.broadcast(qside)
            .crossJoin(base.select(F.col("vec_id").alias("neighbor_id"), "qv"))
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id", d2.alias("d2"))
            .withColumn("rank", F.row_number().over(we))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id")
            .localCheckpoint()
        )
        marks.append(("exact_ckpt", time.perf_counter()))

        possible = exact.agg(F.count(F.lit(1)).cast("bigint").alias("possible"))
        wa = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
        neigh_vecs = base.select(F.col("vec_id").alias("neighbor_id"), "qv")
        out = None
        for p in (1, 2, 4):
            lvl = scored.filter(F.col("cell_rank") <= p)
            scanned = lvl.agg(F.count(F.lit(1)).cast("bigint").alias("scanned"))
            short = (
                lvl.withColumn("rank", F.row_number().over(wa))
                .filter(F.col("rank") <= refine_r)
                .select("query_id", "neighbor_id", "rank")
            )
            hits_adc = (
                short.filter(F.col("rank") <= k)
                .join(exact, ["query_id", "neighbor_id"])
                .agg(F.count(F.lit(1)).cast("bigint").alias("hits_adc"))
            )
            refined = (
                F.broadcast(short.drop("rank"))
                .join(neigh_vecs, "neighbor_id")
                .join(F.broadcast(qside), "query_id")
                .select("query_id", "neighbor_id", d2.alias("d2"))
                .withColumn("rank", F.row_number().over(we))
                .filter(F.col("rank") <= k)
                .select("query_id", "neighbor_id")
            )
            hits_ref = refined.join(exact, ["query_id", "neighbor_id"]).agg(
                F.count(F.lit(1)).cast("bigint").alias("hits_refined")
            )
            row = (
                scanned.crossJoin(F.broadcast(hits_adc))
                .crossJoin(F.broadcast(hits_ref))
                .crossJoin(F.broadcast(possible))
                .select(
                    F.lit(p).cast("bigint").alias("n_probe"),
                    "scanned", "hits_adc", "hits_refined", "possible",
                    F.expr("CAST((hits_adc * 1000) div possible AS BIGINT)").alias("ra"),
                    F.expr("CAST((hits_refined * 1000) div possible AS BIGINT)").alias("rr"),
                )
            )
            out = row if out is None else out.unionByName(row)
        out.orderBy("n_probe").write.format("noop").mode("overwrite").save()
        marks.append(("levels+noop", time.perf_counter()))

        line = "  ".join(f"{n}={t1 - t0:.2f}s" for (_, t0), (n, t1) in zip(marks, marks[1:]))
        print(f"rep{rep + 1}: {line}  TOTAL={marks[-1][1] - marks[0][1]:.2f}s", flush=True)


if __name__ == "__main__":
    main()
