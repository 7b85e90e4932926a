"""100× scale-up measurement: run the SHIPPED registry queries against a
synthetic 100×-sf0.1 star schema (60M lineitem rows, keyspace spread
100-fold with FK-consistent remapping), and report wall times + the join
strategies AQE actually picked.

This is the evidence behind SCALE.md's "Scale-up measurement" table:
the same plans, zero code change, 100× data — if a query is
fixed-overhead-bound at sf0.1, the 100× run shows it; if a plan decision
(broadcast vs sort-merge) is size-dependent, the 100× run shows which
way AQE resolves it when the dims are genuinely big.

Usage: python tools/scale_measure.py [--regen]
Writes the scaled tables once to /tmp/scale100 (reused across runs).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/scale100")
FACTOR = 100

# FK-consistent key remap: key' = key*FACTOR + i, applied to BOTH sides
# of every foreign key, so join selectivity structure is preserved while
# each table grows 100× and the keyspace spreads 100× (no artificial
# key collisions inflating join outputs).
SCALED_KEYS = {
    "lineitem": ["l_orderkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPIED = ["region", "nation", "part"]


def build(spark):
    from pyspark.sql import functions as F

    # Write the scaled tables across many files: the sf0.1 sources are
    # single-row-group files, and the x100 explode is map-side, so a
    # naive write emits ONE file with ONE row group per table — parquet
    # splits at row-group granularity, so every later scan of e.g.
    # documents (500k rows of text) ran as ONE task regardless of
    # cores. CPU-heavy map stages (5-gram explosion, minhash) then
    # bottleneck on file layout, not the engine: decontamination_hits
    # measured 376s with the 1-file layout. A real 100x corpus arrives
    # as thousands of files; 64 files reproduces that property.
    for name, keys in SCALED_KEYS.items():
        df = spark.read.parquet(f"{SRC}/{name}.parquet")
        rep = df.withColumn("__i__", F.explode(F.sequence(F.lit(0), F.lit(FACTOR - 1))))
        for k in keys:
            rep = rep.withColumn(k, F.col(k) * FACTOR + F.col("__i__"))
        rep.drop("__i__").repartition(64).write.mode("overwrite").parquet(
            f"{DST}/{name}.parquet"
        )
        print(f"scaled {name}: x{FACTOR}")
    for name in COPIED:
        spark.read.parquet(f"{SRC}/{name}.parquet").write.mode("overwrite").parquet(
            f"{DST}/{name}.parquet"
        )
    build_events(spark)
    with open(f"{DST}/_done", "w") as fh:
        fh.write("ok")


def build_events(spark):
    """Scale the events stream 100×: user_id remapped FK-style so
    per-user session structure is preserved (100× the users, same events
    per user), timestamps untouched so window density grows 100× — the
    stressful direction for windowed/stateful operators. Loaded through
    load_events (the nanos-as-long sniffer); written as ordinary
    TIMESTAMP parquet across 64 files, which doubles as the micro-batch
    replay source (64 files -> N micro-batches via maxFilesPerTrigger).
    """
    from pyspark.sql import functions as F

    from dataframe_kotlin_spark.session import load_events

    ev = load_events(spark, SRC)
    rep = ev.withColumn("__i__", F.explode(F.sequence(F.lit(0), F.lit(FACTOR - 1))))
    rep = rep.withColumn("user_id", F.col("user_id") * FACTOR + F.col("__i__"))
    rep.drop("__i__").repartition(64).write.mode("overwrite").parquet(
        f"{DST}/events.parquet"
    )
    print(f"scaled events: x{FACTOR}")


def joins_in_plan(df) -> list[str]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sorted(
        {tok for tok in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin") if tok in plan}
    )


def main():
    from dataframe_kotlin_spark.session import get_spark

    spark = get_spark("scale-measure")
    # whole-run load context (VERDICT r7 item 5): every summary dict this
    # tool prints carries loadavg_start/_end so SCALE.md rows quote their
    # own ambient-load context instead of a prose normalizer note.
    run_load_start = round(os.getloadavg()[0], 2)
    # A pre-existing table set (e.g. SPARK_GRAFT_SCALE_DIR pointed at a
    # read-only sf dir to collect same-harness baselines) is used as-is;
    # only a missing/incomplete scaled build is (re)generated.
    have_tables = all(
        os.path.exists(f"{DST}/{t}.parquet")
        for t in list(SCALED_KEYS) + COPIED + ["events"]
    )
    if "--regen" in sys.argv or (not os.path.exists(f"{DST}/_done") and not have_tables):
        t0 = time.time()
        build(spark)
        print(f"build took {time.time()-t0:.0f}s")
    elif not os.path.exists(f"{DST}/events.parquet"):
        # events joined the scaled set in round 6 — top up older builds
        build_events(spark)

    import __spark_entry__ as m

    qs = m.queries()
    workloads = [
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_local_supplier",
        "minhash_signatures",
        # round-3/4 pipeline flagships: the blocked-join claims that
        # matter most at scale (100x documents = 500k docs)
        "dsir_log_weights",
        "decontamination_hits",
        "training_mix_report",
        # round-4/5 positional family: distributed two-pass row number —
        # measured here so the "scales like one shuffle" claim has a
        # 6M-row observation behind it (bucket histogram printed below)
        "slice_rows_page",
        "chunked_groups",
        # round-6 (VERDICT r5 item 5): the last flagships with
        # sf0.1-only timings — ANN over 200k embeddings (registry-pinned
        # parameters; the k∝N posture is semdedup_k_scaled below) and
        # the batch sessionize that anchors the streaming replay
        "ann_ivf_topk",
        "ann_ivf_trained",
        # round-7 (VERDICT r6 item 2): the registered scale-posture ANN —
        # k = max(4, N/500) learned cells (400 at 100x, auto-dgemm) +
        # nprobe=2 probing + the brute-force recall audit it carries
        "ann_ivf_scaled",
        "sessionize",
        # round-6 family coverage under honest (noop) forcing: one pivot,
        # one range-frame window, one exact-dedup representative
        "pivot_sum_segments",
        "rolling_range_revenue",
        "dedup_exact",
        # round-9 (VERDICT r8 item 6): the r8-registered dedup-family
        # scale postures join the standard sweep — their first numbers
        # were ad-hoc harness calls under load 2.5-4.3; living here they
        # get per-row loadavg stamps and round-over-round comparability
        "semdedup_scaled",
        "simhash_hamming_scaled",
        "dedup_then_jaccard",
        # round-9: the executor-resident-model search posture (frame
        # Lloyd + frame probe/assign/score + brute-force recall audit)
        "ann_ivf_frame_topk",
    ]
    reps = 1 if "--quick" in sys.argv else 3
    only = [a for a in sys.argv[1:] if not a.startswith("--")]
    # minutes-long pipeline DAGs: warm reps add nothing at that duration
    # (ann_ivf_trained: the PINNED k=4 sequential-fold query runs ~370 s
    # at 100x by design — 4 reps of it bought nothing but wall clock)
    heavy = {
        "decontamination_hits",
        "training_mix_report",
        "ann_ivf_scaled",
        "ann_ivf_trained",
        "semdedup_scaled",
        "simhash_hamming_scaled",
        "dedup_then_jaccard",
        "ann_ivf_frame_topk",
    }
    out = {}

    # Timed action: noop write, NOT count() — count() lets Catalyst prune
    # anything that doesn't change the row count, so a map-only workload
    # (minhash_signatures) timed as a parquet metadata read and a weights
    # query ending in a left join onto unique keys lost its whole
    # join+aggregate subtree (round-6 finding: the r5 "~1x at 100x" rows
    # for minhash/dsir measured the optimizer's shortcut, not the work).
    def _force(df):
        df.write.format("noop").mode("overwrite").save()

    for name in workloads:
        if only and name not in only:
            continue
        # 1-min loadavg BEFORE the row runs (VERDICT r7 item 5, bench.py
        # pattern): ambient load inflates unchanged-code rows 1.3-1.8x
        # (the r7 sweep needed a prose normalizer paragraph in SCALE.md) —
        # quoting it per row makes each number carry its own context.
        row_load = round(os.getloadavg()[0], 2)
        if name not in heavy:
            _force(qs[name](spark, DST))  # warm codegen/scan
        times = []
        last = None
        for _ in range(1 if name in heavy else reps):
            t0 = time.time()
            last = qs[name](spark, DST)
            _force(last)
            times.append(time.time() - t0)
        best = min(times)
        out[name] = best
        print(
            f"{name}: {best:.2f}s (joins={joins_in_plan(last)}, "
            f"loadavg_start={row_load}, loadavg_end={round(os.getloadavg()[0], 2)})"
        )

    # positional-op bucket histogram at 100x: the distributed row number
    # is only as parallel as its value-derived buckets are balanced —
    # report populated-bucket count and per-bucket min/max rows for the
    # numeric (o_orderkey) and a constant-prefix STRING key
    if not only or "bucket_histogram" in only:
        from pyspark.sql import functions as F

        from dataframe_kotlin_spark.core.frame import _order_bucket_tagged

        orders = spark.read.parquet(f"{DST}/orders.parquet")
        for label, frame, key in [
            ("numeric o_orderkey", orders, "o_orderkey"),
            (
                "string ORDER-%012d",
                orders.select(
                    F.format_string("ORDER-%012d", F.col("o_orderkey")).alias("k")
                ),
                "k",
            ),
        ]:
            t0 = time.time()
            hist = (
                _order_bucket_tagged(frame, [key], nbuckets=128)
                .groupBy("__gbkt__")
                .count()
                .agg(
                    F.count(F.lit(1)).alias("populated"),
                    F.min("count").alias("min_rows"),
                    F.max("count").alias("max_rows"),
                )
                .collect()[0]
            )
            print(
                f"bucket_histogram[{label}]: populated={hist['populated']}/128, "
                f"rows/bucket {hist['min_rows']}..{hist['max_rows']} "
                f"({time.time()-t0:.2f}s)"
            )

    # streaming micro-batch replay at 100x (VERDICT r5 item 5): drain the
    # 10M-event scaled stream through the tumbling job in 8-file
    # micro-batches (64 part files / 8 per trigger = 8 batches) with a
    # real checkpoint — the wall time covers state store updates,
    # watermark advancement, and the no-data flush batch.
    if not only or "stream_replay" in only:
        import shutil
        import tempfile

        from dataframe_kotlin_spark.streaming import stream_jobs as sj

        ckpt = tempfile.mkdtemp(prefix="scale100-ckpt-")
        try:
            t0 = time.time()
            stream = sj.tumbling_stream(
                sj.read_event_stream(
                    spark, f"{DST}/events.parquet", max_files_per_trigger=8
                ),
                3600,
                watermark="0 seconds",
            )
            sj.run_to_memory(stream, "scale_tumbling", ckpt)
            n = spark.table("scale_tumbling").count()
            out["stream_replay"] = time.time() - t0
            print(
                f"stream_replay (10M events, 8 micro-batches): "
                f"{out['stream_replay']:.2f}s (closed windows={n})"
            )
        finally:
            shutil.rmtree(ckpt, ignore_errors=True)

    # training_mix_report per-stage attribution (VERDICT r5 item 6): the
    # pipeline is ONE lazy DAG, so stages are timed as cumulative
    # prefixes (count() after each) and attributed by delta — the prefix
    # re-executes upstream stages, so a delta ~0 means the added stage is
    # cheap relative to what it reads, and the final delta vs the
    # standalone training_mix_report timing shows aggregation cost.
    if not only or "training_mix_stages" in only:
        from pyspark.sql import functions as F

        from dataframe_kotlin_spark.core.frame import KDataFrame
        from dataframe_kotlin_spark.functions.text import normalize
        from dataframe_kotlin_spark.operators import sampling, textpipe
        from dataframe_kotlin_spark.queries.pipeline import _t

        docs = _t(spark, DST, "documents")
        evalset = docs.filter(F.col("source") == "src0")
        corpus = docs.filter(F.col("source") != "src0")

        def stage_pool():
            return textpipe.decontaminate(corpus, evalset, "text", "doc_id", n=5)

        def stage_selected():
            # mirrors the shipped query: persisted pool + target_pred
            # (one md5-gram pass) — queries/pipeline.py training_mix_report
            from pyspark import StorageLevel

            pool = (
                stage_pool()
                .repartition(spark.sparkContext.defaultParallelism)
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            w = sampling.dsir_log_weights(
                pool, target_pred=F.col("lang") == "en", buckets=256
            )
            return pool.join(
                w.filter(F.col("log_weight") > -1.0).select("doc_id"), "doc_id"
            )

        def stage_kept():
            return KDataFrame(
                stage_selected().withColumn("__fp__", F.md5(normalize(F.col("text"))))
            ).distinct_by(["__fp__"], order_by=["doc_id"]).df

        cum = {}
        for label, fn in [
            ("decontaminate", stage_pool),
            ("dsir_select", stage_selected),
            ("exact_dedup", stage_kept),
        ]:
            t0 = time.time()
            n = fn().count()
            cum[label] = time.time() - t0
            print(f"training_mix cumulative[{label}]: {cum[label]:.1f}s (rows={n})")
        prev = 0.0
        for label, t in cum.items():
            print(f"training_mix stage delta[{label}]: {t - prev:.1f}s")
            prev = t

    # dsir_log_weights per-stage attribution (VERDICT r6 item 1): the
    # heaviest standalone component gets noop-forced stage timing
    # (count() would let Catalyst prune the very stage under
    # measurement). The ROUND-7 finding this produced: the old
    # single-lazy-plan form relied on ReuseExchange to collapse the five
    # consumers of the feature-bag subtree, and under AQE that reuse
    # does not happen (0 ReusedExchange in the executed plan; the
    # distribution build alone measured 121.5 s of the query's 146 s
    # because the corpus-wide gram explode ran once per consumer). The
    # shipped form now COLLECTS the two 256-row distributions (model
    # parameters, like k-means centroids) in one eager conditional-agg
    # job and scores against a literal log-ratio array — exactly two
    # gram passes at any scale. Stages timed:
    #   gram_rows   tokenize + bigram + explode + md5 bucket hash
    #               (map-only, one row per gram occurrence)
    #   feats       + the (doc_id, bucket) count aggregation (the
    #               corpus-sized shuffle the scoring pass pays)
    #   dist_job    the eager distribution job (gram pass + broadcast
    #               flag join + 256-group conditional agg + collect),
    #               measured as the build cost of the query's plan
    #   full        dist_job + the scoring action (the registered query
    #               end-to-end); full - dist_job = scoring pass
    if not only or "dsir_stages" in only:
        from pyspark.sql import functions as F

        from dataframe_kotlin_spark.operators import sampling

        docs = spark.read.parquet(f"{DST}/documents.parquet")

        out_t = {}
        for label, fn in [
            ("gram_rows", lambda: sampling.gram_bucket_rows(docs, "text", "doc_id", 256)),
            ("feats", lambda: sampling.hashed_ngram_buckets(docs, "text", "doc_id", 256)),
        ]:
            t0 = time.time()
            _force(fn())
            out_t[label] = time.time() - t0
            print(f"dsir stage[{label}]: {out_t[label]:.1f}s")
        t0 = time.time()
        plan = qs["dsir_log_weights"](spark, DST)  # runs the eager dist job
        out_t["dist_job"] = time.time() - t0
        print(f"dsir stage[dist_job]: {out_t['dist_job']:.1f}s")
        t0 = time.time()
        _force(plan)
        out_t["scoring"] = time.time() - t0
        print(f"dsir stage[scoring]: {out_t['scoring']:.1f}s")
        print(
            f"dsir stage[full = dist_job + scoring]: "
            f"{out_t['dist_job'] + out_t['scoring']:.1f}s"
        )

    # ANN with k ∝ N (round 6): the registry ANN queries pin tiny cell
    # counts for oracle determinism (ivf_topk's 10 labels,
    # ann_ivf_trained's k_cells=4 sequential-fold Lloyd), so at 100x the
    # per-cell candidate set grows 100x and the search goes quadratic —
    # that is the PINNED-PARAMETER cost, not the design's. The design
    # (SCALE.md ANN rule) holds cell size constant by scaling the cell
    # count with the data: measure the same 200k-vector search with
    # k = 4*FACTOR learned cells and nprobe=2.
    if not only or "ann_ivf_k_scaled" in only:
        from pyspark.sql import functions as F

        from dataframe_kotlin_spark.operators import similarity

        emb = spark.read.parquet(f"{DST}/embeddings.parquet")
        queries_df = emb.filter(F.col("vec_id") % 100 == 0)
        t0 = time.time()
        cents = similarity.train_ivf_centroids(
            emb, "embedding", "vec_id", k=4 * FACTOR, iters=1
        )
        t_train = time.time() - t0
        t0 = time.time()
        res = similarity.ivf_topk_trained(
            emb, queries_df, cents, k=5, nprobe=2
        )
        n = res.count()
        t_search = time.time() - t0
        out["ann_ivf_k_scaled"] = t_train + t_search
        print(
            f"ann_ivf_k_scaled (k={4 * FACTOR} cells, nprobe=2): "
            f"train {t_train:.2f}s + search {t_search:.2f}s "
            f"(rows={n}, joins={joins_in_plan(res)})"
        )

    # executor-resident centroids (r9, VERDICT r8 item 2): same 100x
    # corpus, k=400, iters=1 — the model-as-DataFrame path (salted
    # cogroup dgemm argmin; nothing model-sized ever reaches the
    # driver/closure) A/B'd against the driver-list path, plus an
    # assignment-agreement count (both paths argmin the same squared
    # distances; disagreement = razor-edge ulp ties only).
    if not only or "centroid_frame_scaled" in only:
        from pyspark.sql import functions as F

        from dataframe_kotlin_spark.operators import similarity

        emb = spark.read.parquet(f"{DST}/embeddings.parquet")
        row_load = round(os.getloadavg()[0], 2)
        t0 = time.time()
        cents_f = similarity.train_ivf_centroids_frame(
            emb, "embedding", "vec_id", k=4 * FACTOR, iters=1
        )
        t_train_f = time.time() - t0
        t0 = time.time()
        amap_f = similarity._assign_frame_map(
            emb, cents_f, "embedding", "vec_id", "cell_f"
        )
        _force(amap_f)
        t_assign_f = time.time() - t0
        t0 = time.time()
        cents_l = similarity.train_ivf_centroids(
            emb, "embedding", "vec_id", k=4 * FACTOR, iters=1, output="list"
        )
        t_train_l = time.time() - t0
        t0 = time.time()
        tag_l = similarity.assign_cells(emb, cents_l, "embedding", "cell_l")
        _force(tag_l.select("vec_id", "cell_l"))
        t_assign_l = time.time() - t0
        diff = (
            tag_l.select("vec_id", "cell_l")
            .join(amap_f, "vec_id")
            .filter(F.col("cell_l") != F.col("cell_f"))
            .count()
        )
        out["centroid_frame_scaled"] = t_train_f + t_assign_f
        print(
            f"centroid_frame_scaled (k={4 * FACTOR}, iters=1): frame "
            f"train {t_train_f:.2f}s + assign {t_assign_f:.2f}s vs list "
            f"train {t_train_l:.2f}s + assign {t_assign_l:.2f}s; "
            f"assignment disagreements={diff} "
            f"(loadavg_start={row_load}, loadavg_end={round(os.getloadavg()[0], 2)})"
        )
        # chunked-model path at 100x: force ~8 chunks (the layout a
        # model beyond chunk_bytes takes). r10: the default layout is
        # the two-level coarse-routed one (data routes to O(1) chunks);
        # A/B it against the r9 replicate layout (data explodes G-fold)
        # and against the unchunked map — both disagreement counts are
        # the 0-of-200k done-criterion (VERDICT r9 item 1).
        from dataframe_kotlin_spark.operators.similarity import (
            centroid_model_bytes,
        )

        dim_row = emb.select(F.size("embedding").alias("d")).first()
        chunk = centroid_model_bytes(4 * FACTOR // 8, int(dim_row["d"]))
        t0 = time.time()
        amap_c = similarity._assign_frame_map(
            emb, cents_f, "embedding", "vec_id", "cell_c", chunk_bytes=chunk
        )
        _force(amap_c)
        t_assign_c = time.time() - t0
        # warm rep: the first routed run pays the one-off coarse-layer
        # build (memoized per model lineage)
        t0 = time.time()
        _force(
            similarity._assign_frame_map(
                emb, cents_f, "embedding", "vec_id", "cell_c", chunk_bytes=chunk
            )
        )
        t_assign_c_warm = time.time() - t0
        t0 = time.time()
        amap_r = similarity._assign_frame_map(
            emb, cents_f, "embedding", "vec_id", "cell_p",
            chunk_bytes=chunk, route="replicate",
        )
        _force(amap_r)
        t_assign_rep = time.time() - t0
        cdiff = (
            amap_f.join(amap_c, "vec_id")
            .filter(F.col("cell_f") != F.col("cell_c"))
            .count()
        )
        rdiff = (
            amap_r.join(amap_c, "vec_id")
            .filter(F.col("cell_p") != F.col("cell_c"))
            .count()
        )
        out["centroid_frame_chunked"] = t_assign_c
        print(
            f"centroid_frame_chunked (8 chunks, coarse-routed): assign "
            f"{t_assign_c:.2f}s cold / {t_assign_c_warm:.2f}s warm vs "
            f"replicate {t_assign_rep:.2f}s; disagreements vs "
            f"unchunked={cdiff}, vs replicate={rdiff} "
            f"(loadavg_end={round(os.getloadavg()[0], 2)})"
        )
        # routed vs replicate on a HIERARCHICALLY clustered corpus
        # (r10): the sf embeddings are random unit vectors — near-equal
        # pairwise distances, the geometric worst case where exact
        # pruning cannot engage and route='auto' correctly falls back
        # to replicate. Note iid-random CENTERS don't fix that either:
        # two-level pruning needs the FINE CENTROIDS to group under the
        # coarse layer, and 400 iid Gaussian centers in 64-dim are
        # themselves concentrated (fan-out measured 7.9/8 on that
        # variant). Real embedding manifolds have topic/subtopic
        # hierarchy; model it: 20 super-centers (scale 10), 20
        # sub-centers each (offset 0.5), points at sigma 0.05 —
        # fan-out ~1 chunk/row, routed beats replicate, 0
        # disagreements.
        clus_path = f"{DST}/embeddings_clustered2.parquet"
        if not os.path.exists(clus_path):
            import pandas as pd

            def gen(batches):
                import numpy as np

                rng0 = np.random.RandomState(42)
                supers = rng0.randn(20, 64) * 10.0
                subs = supers[:, None, :] + rng0.randn(20, 20, 64) * 0.5
                centers = subs.reshape(400, 64)
                for pdf in batches:
                    ids = pdf["id"].to_numpy()
                    seed = int(ids[0]) % (2**31) if len(ids) else 0
                    noise = np.random.RandomState(seed).randn(len(ids), 64) * 0.05
                    emb = centers[ids % 400] + noise
                    yield pd.DataFrame(
                        {"vec_id": ids, "embedding": [list(r) for r in emb]}
                    )

            spark.range(200_000).repartition(32).mapInPandas(
                gen, "vec_id long, embedding array<double>"
            ).write.parquet(clus_path)
        clus = spark.read.parquet(clus_path)
        cents_cl = similarity.train_ivf_centroids_frame(
            clus, "embedding", "vec_id", k=400, iters=1
        )
        chunk_cl = centroid_model_bytes(400 // 8, 64)
        fanout = similarity._routing_fanout(
            clus, cents_cl, "embedding", "vec_id", "cell", "centroid", 8, 400, 1
        )
        t0 = time.time()
        amap_cl = similarity._assign_frame_map(
            clus, cents_cl, "embedding", "vec_id", "cell_c", chunk_bytes=chunk_cl
        )
        _force(amap_cl)
        t_cl_cold = time.time() - t0
        t0 = time.time()
        _force(
            similarity._assign_frame_map(
                clus, cents_cl, "embedding", "vec_id", "cell_c", chunk_bytes=chunk_cl
            )
        )
        t_cl_warm = time.time() - t0
        t0 = time.time()
        amap_cr = similarity._assign_frame_map(
            clus, cents_cl, "embedding", "vec_id", "cell_p",
            chunk_bytes=chunk_cl, route="replicate",
        )
        _force(amap_cr)
        t_cl_rep = time.time() - t0
        cldiff = (
            amap_cl.join(amap_cr, "vec_id")
            .filter(F.col("cell_c") != F.col("cell_p"))
            .count()
        )
        out["centroid_frame_routed_clustered"] = t_cl_warm
        fanout_s = "n/a" if fanout is None else f"{fanout:.2f}"
        print(
            f"centroid_frame_routed_clustered (200k x 64, 400 centers, 8 "
            f"chunks): fanout={fanout_s} chunks/row; routed "
            f"{t_cl_cold:.2f}s cold / {t_cl_warm:.2f}s warm vs replicate "
            f"{t_cl_rep:.2f}s; disagreements={cldiff} "
            f"(loadavg_end={round(os.getloadavg()[0], 2)})"
        )
        # probe-path (SEARCH) A/B on the same chunked clustered model
        # (r10): ivf_topk_frame's probe map generalizes the argmin to
        # top-nprobe — verify the routed probe keeps rank identity with
        # the replicate layout at 100x, not just in the sf0.01 tests
        queries_cl = clus.filter(F.col("vec_id") % 100 == 0)
        t0 = time.time()
        top_r = similarity.ivf_topk_frame(
            clus, queries_cl, cents_cl, "embedding", "vec_id",
            k=10, nprobe=2, chunk_bytes=chunk_cl,
        )
        _force(top_r)
        t_topk_routed = time.time() - t0
        t0 = time.time()
        top_p = similarity.ivf_topk_frame(
            clus, queries_cl, cents_cl, "embedding", "vec_id",
            k=10, nprobe=2, chunk_bytes=chunk_cl, route="replicate",
        )
        _force(top_p)
        t_topk_rep = time.time() - t0
        rankdiff = (
            top_r.select("query_id", "rank", F.col("neighbor_id").alias("n_r"))
            .join(
                top_p.select("query_id", "rank", F.col("neighbor_id").alias("n_p")),
                ["query_id", "rank"],
                "full",
            )
            .filter(
                F.col("n_r").isNull()
                | F.col("n_p").isNull()
                | (F.col("n_r") != F.col("n_p"))
            )
            .count()
        )
        out["ivf_topk_frame_routed_clustered"] = t_topk_routed
        print(
            f"ivf_topk_frame_routed_clustered (2k queries, top-10, "
            f"nprobe=2, 8 chunks): routed {t_topk_routed:.2f}s vs "
            f"replicate {t_topk_rep:.2f}s; rank disagreements={rankdiff} "
            f"(loadavg_end={round(os.getloadavg()[0], 2)})"
        )
        # salt_parts sizing (VERDICT r9 item 7): the auto default now
        # derives from the scan-split estimate instead of
        # spark.sql.shuffle.partitions — sweep manual bucket counts
        # around it so the chosen value's cost has context.
        from dataframe_kotlin_spark.operators.similarity import (
            _estimate_scan_splits,
        )

        auto_salt = max(
            spark.sparkContext.defaultParallelism, _estimate_scan_splits(emb) or 0
        )
        for label, sp in [
            ("8", 8), ("auto", None), ("64", 64), ("200", 200),
        ]:
            t0 = time.time()
            _force(
                similarity._assign_frame_map(
                    emb, cents_f, "embedding", "vec_id", "cell_s", salt_parts=sp
                )
            )
            print(
                f"salt_sweep[{label}{'=' + str(auto_salt) if sp is None else ''}]: "
                f"{time.time()-t0:.2f}s"
            )

    # semdedup: the registry query pins k=4 k-means cells, which makes the
    # within-cell cosine self-join quadratic in N/k — the correct scale
    # posture (and the SemDeDup paper's) is k ∝ N so cell size stays
    # bounded. Measure exactly that: 100x embeddings with k scaled 100x.
    from dataframe_kotlin_spark.operators import dedup, similarity

    if not only or "semdedup_k_scaled" in only:
        emb = spark.read.parquet(f"{DST}/embeddings.parquet")
        k_cells = 4 * FACTOR
        t0 = time.time()
        cents = similarity.train_ivf_centroids(
            emb, "embedding", "vec_id", k=k_cells, iters=1
        )
        tagged = similarity.assign_cells(emb, cents, "embedding", "cell")
        # deployment method (r8): per-cell dgemm — see cosine_neardup_pairs
        surv = dedup.semdedup_prune(
            tagged, "cell", "embedding", "vec_id", threshold=0.35, method="dgemm"
        )
        n = surv.count()
        out["semdedup_k_scaled"] = time.time() - t0
        print(
            f"semdedup_k_scaled (k={k_cells}, fast-path kmeans): "
            f"{out['semdedup_k_scaled']:.2f}s (survivors={n}, joins={joins_in_plan(surv)})"
        )

    # r11: the duplicated-SPAN family at 100x documents (500k docs) —
    # detection on the hash-key posture (8-byte shuffle keys), the
    # per-doc share signal (one window construction, three narrow keyed
    # shuffles), and the keep-one excision transform (noop-forced so
    # the full rebuild executes).
    if not only or "span_family_scaled" in only:
        docs100 = spark.read.parquet(f"{DST}/documents.parquet")
        row_load = round(os.getloadavg()[0], 2)
        t0 = time.time()
        ndup = dedup.duplicate_spans(
            docs100, "doc_id", "text", span_tokens=8, key="hash"
        ).count()
        out["duplicate_spans_scaled"] = time.time() - t0
        t0 = time.time()
        share = dedup.span_dup_fraction(
            docs100, "doc_id", "text", span_tokens=8, key="hash"
        )
        nshare = share.count()
        out["span_dup_share_scaled"] = time.time() - t0
        t0 = time.time()
        exc = dedup.excise_duplicate_spans(
            docs100, "doc_id", "text", span_tokens=8
        ).select("doc_id", "text_deduped")
        _force(exc)
        out["excise_spans_scaled"] = time.time() - t0
        print(
            f"span_family_scaled (500k docs, n=8, key=hash): detect "
            f"{out['duplicate_spans_scaled']:.2f}s ({ndup} dup spans) · "
            f"share {out['span_dup_share_scaled']:.2f}s ({nshare} docs) · "
            f"excise {out['excise_spans_scaled']:.2f}s "
            f"(loadavg_start={row_load}, loadavg_end={round(os.getloadavg()[0], 2)})"
        )

    # r12 (VERDICT r11 item 1 done-criterion): full-window explosion vs
    # the winnowed candidate pipeline at 100x. The comparison the knob
    # exists for — candidate generation's shuffle volume: the exact path
    # puts EVERY n-token window on the span-key shuffle (~doc_tokens
    # rows/doc), the winnowed path ~2/(w+1) of them with the SIGMOD'03
    # shared-run guarantee (runs >= n+w-1 tokens always detected).
    if not only or "winnow_pipeline_scaled" in only:
        from pyspark.sql import functions as F

        docs100 = spark.read.parquet(f"{DST}/documents.parquet")
        row_load = round(os.getloadavg()[0], 2)
        n_tok, w_win = 8, 4
        # shuffle-volume ratio, computed cheaply (two aggregates)
        from dataframe_kotlin_spark.operators.dedup import (
            winnow_fingerprints,
            winnowed_duplicate_pairs,
        )
        from dataframe_kotlin_spark.functions.text import tokens as _tokens

        n_windows = docs100.select(
            F.sum(
                F.greatest(F.size(_tokens(F.col("text"))) - n_tok + 1, F.lit(0))
            ).alias("n")
        ).first()["n"]
        t0 = time.time()
        n_fp = winnow_fingerprints(
            docs100, "doc_id", "text", n=n_tok, w=w_win
        ).count()
        t_fp = time.time() - t0
        # the 100x fixture replicates each sf0.1 document ~100-fold, so
        # EVERY fingerprint bucket is 65-512 members (measured) — the
        # degenerate shape _cap_buckets' docstring sends to an
        # exact-dup pass first. Measure the documented composition:
        # exact_dedup survivors (one md5 shuffle) feed the winnowed
        # pair pipeline — pair granularity is for NEAR-dup structure,
        # not wholesale replication.
        from dataframe_kotlin_spark.operators.dedup import exact_dedup

        t0 = time.time()
        keep = exact_dedup(docs100, "text", "doc_id").select(
            F.col("keep_id").alias("doc_id")
        )
        surv = docs100.join(keep, "doc_id", "left_semi")
        n_pairs = winnowed_duplicate_pairs(
            surv, "doc_id", "text", n=n_tok, w=w_win, max_bucket=64
        ).count()
        out["winnow_pipeline_scaled"] = time.time() - t0
        print(
            f"winnow_pipeline_scaled (500k docs, n={n_tok}, w={w_win}, "
            f"max_bucket=64): exact-dedup + candidates + verify "
            f"{out['winnow_pipeline_scaled']:.2f}s ({n_pairs} verified "
            f"pairs among exact-dedup survivors); fingerprint selection "
            f"{t_fp:.2f}s full-corpus — {n_fp} fingerprints vs "
            f"{n_windows} full windows = "
            f"{n_windows / max(n_fp, 1):.2f}x shuffle-volume reduction "
            f"(theory ~(w+1)/2 = {(w_win + 1) / 2:.1f}x before "
            f"distinct; compare duplicate_spans_scaled for the "
            f"full-explosion detect cost) "
            f"(loadavg_start={row_load}, loadavg_end={round(os.getloadavg()[0], 2)})"
        )

    # r12: the incremental store-based dedup pair at 100x — history =
    # even doc_ids (its fingerprint/span stores), batch = odd. The
    # production crawl-ingest shape: per-batch cost must be
    # batch-sized + one store join, never a history text re-read.
    if not only or "incremental_scaled" in only:
        from pyspark.sql import functions as F

        from dataframe_kotlin_spark.operators.dedup import (
            exact_dedup,
            incremental_new_docs,
            incremental_span_contamination,
            span_store,
        )

        docs100 = spark.read.parquet(f"{DST}/documents.parquet")
        hist = docs100.filter(F.col("doc_id") % 2 == 0)
        batch = docs100.filter(F.col("doc_id") % 2 == 1)
        row_load = round(os.getloadavg()[0], 2)
        t0 = time.time()
        fstore = exact_dedup(hist, "text", "doc_id").select("fingerprint")
        n_new = incremental_new_docs(batch, fstore, "doc_id", "text").count()
        t_exact = time.time() - t0
        t0 = time.time()
        sstore = span_store(hist, "text", span_tokens=8, key="hash")
        cont = incremental_span_contamination(
            batch, sstore, "doc_id", "text", span_tokens=8, key="hash"
        )
        stats = cont.agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("seen_fraction").alias("avg_seen"),
        ).collect()[0]
        t_span = time.time() - t0
        out["incremental_scaled"] = t_exact + t_span
        print(
            f"incremental_scaled (250k-doc batch vs 250k-doc history): "
            f"exact store+anti-join {t_exact:.2f}s ({n_new} novel docs) · "
            f"span store+contamination {t_span:.2f}s "
            f"({stats['n']} batch docs, avg seen_fraction "
            f"{stats['avg_seen']:.3f}) "
            f"(loadavg_start={row_load}, loadavg_end={round(os.getloadavg()[0], 2)})"
        )

    out["loadavg_start"], out["loadavg_end"] = run_load_start, round(os.getloadavg()[0], 2)
    print({k: round(v, 2) for k, v in out.items()})


if __name__ == "__main__":
    main()
