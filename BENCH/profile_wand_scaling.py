"""Profile the 2->8-core WAND scaling residual: decompose the measured
phase time into (a) pure Spark job-dispatch/planning overhead (trivial
same-shape jobs on the same session), (b) the scan floor (decode-free
pass over the same postings partitions), and (c) engine scoring work —
so the campaign's raw-vs-ceiling gap can be attributed to task
dispatch vs engine plans with numbers instead of argument.

Usage: python BENCH/profile_wand_scaling.py <cores> <n_shards> [n_queries]
Prints one JSON line; run once per core level from a fresh process
(same discipline as bench.py --scaling legs).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

REPS = 3


def main() -> None:
    cores = int(sys.argv[1])
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_queries = int(sys.argv[3]) if len(sys.argv) > 3 else 1024

    from bench import SCALING_PAGES, query_batch
    from embed_rerank_spark.operators.wand import wand_topk
    from embed_rerank_spark.plans.build_index import build_incremental, merge_segments
    from embed_rerank_spark.session import get_spark
    from embed_rerank_spark.sources.pages import generate_pages

    spark = get_spark(app_name="wand-profile", cores=cores)
    tmp = tempfile.mkdtemp(prefix="erspark_wandprof_")
    out: dict = {
        "cores": cores,
        "n_shards": n_shards,
        "n_queries": n_queries,
        "n_pages": SCALING_PAGES,
    }
    try:
        pages = generate_pages(spark, SCALING_PAGES, seed=42, n_snapshots=4)
        pages.write.mode("overwrite").parquet(f"{tmp}/pages")
        pages = spark.read.parquet(f"{tmp}/pages")
        build_incremental(
            spark, pages, f"{tmp}/index", n_shards=n_shards, resume=False
        )
        index = merge_segments(spark, f"{tmp}/index")
        qb = query_batch(n_queries)

        # 1) pure dispatch floor: a 1-task and an n_shards-task no-op
        #    job (no data read) — planning + scheduling + collect only
        def t_min(fn):
            ts = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                fn()
                ts.append(time.perf_counter() - t0)
            return min(ts)

        sc = spark.sparkContext
        out["noop_1task_s"] = round(
            t_min(lambda: sc.parallelize([0], 1).count()), 3
        )
        out["noop_shards_tasks_s"] = round(
            t_min(lambda: sc.parallelize(range(n_shards), n_shards).count()), 3
        )

        # 2) scan floor: pass over the SAME postings partitions the
        #    WAND kernel reads, no varbyte decode / scoring — isolates
        #    IO + task layout from engine work
        post = index.postings
        out["postings_scan_s"] = round(
            t_min(lambda: post.count()), 3
        )

        # 3) the real phase, bench-identical (write parquet, min of 3)
        def wand_once(rep):
            wand_topk(index, qb, k=10).write.mode("overwrite").parquet(
                f"{tmp}/wand{rep}"
            )

        ts = []
        for rep in range(REPS):
            t0 = time.perf_counter()
            wand_once(rep)
            ts.append(time.perf_counter() - t0)
        out["wand_topk_s"] = round(min(ts), 3)
        out["wand_reps_s"] = [round(t, 3) for t in ts]

        # 4) plan-only floor: the same wand_topk DataFrame, but count()
        #    instead of parquet write (drops the commit/rename cost)
        out["wand_count_s"] = round(
            t_min(lambda: wand_topk(index, qb, k=10).count()), 3
        )

        # 5) second batch size: per-job FIXED cost falls out as the
        #    intercept of time-vs-queries between the two points
        qb4 = query_batch(n_queries * 4)
        ts4 = []
        for rep in range(REPS):
            t0 = time.perf_counter()
            wand_topk(index, qb4, k=10).write.mode("overwrite").parquet(
                f"{tmp}/wand4x{rep}"
            )
            ts4.append(time.perf_counter() - t0)
        out["wand_topk_4x_s"] = round(min(ts4), 3)
        out["wand_4x_reps_s"] = [round(t, 3) for t in ts4]
        # t(q) = fixed + m*q  =>  fixed = (4*t1 - t4) / 3
        out["fixed_cost_est_s"] = round(
            max(0.0, (4 * min(ts) - min(ts4)) / 3.0), 3
        )
    finally:
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
