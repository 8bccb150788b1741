#!/usr/bin/env python
"""Benchmark harness: headline engine workloads at a given scale.

Default mode prints ONE JSON line:
  {"metric": "e2e_suite_sec", "value": <total sec>, "unit": "sec",
   "queries": {phase: sec, ...}, "sf": <sf>, ...}

Env:
  SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[N] cores (default 32)

Phases (each a real end-to-end job, nothing cached between phases):
  extract        pages -> byte-identical extraction UDF (full scan)
  index_build    pages -> compressed sharded postings written to disk
  index_merge    snapshot segments -> merged index (incremental path)
  wand_topk      64-query batch, block-max WAND over the on-disk index
  bm25_brute     same 64 queries, brute-force DataFrame scorer
  rerank         cross-encoder-lite rerank of top-50 pools (64 queries)
  docs_bm25      reference QUERY_SET over the driver documents table

The synthetic pages corpus size scales with sf (sf0.1 -> 40k pages).

Contention handling: the suite brackets itself with a single-thread
memory-bandwidth probe; if before/after probes disagree >2x or sit in
the derated band, the whole suite re-runs (bounded by
SPARK_GRAFT_BENCH_RETRIES, default 3) and every attempt's probes are
recorded in the output, so one co-tenant burst can't silently poison
the round's artifact.

``--scaling`` runs the same fixed workload at two parallelism levels
(local[8] vs local[32] by default) in fresh subprocesses and reports
throughput at both plus scaling efficiency — the sandbox stand-in for
the north rule's N vs 4N executor criterion.

``--weak-scaling`` holds cores fixed and quadruples the corpus
(SPARK_GRAFT_WEAK_SIZES); ``--phrase-scaling`` races the positional
vs next-word phrase plans along the same ladder; ``--compare FILE``
appends a phase-regression block against a prior BENCH_r{N}.json.
SPARK_GRAFT_SHARDS overrides the shard count (oversharding runs).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# shard count is a CLUSTER-size constant, not a data-size one: WAND
# parallelism = shards, so it must be >= the largest core count tested
# (thousands on a real cluster; 32 here). Env-overridable so the
# oversharding experiment (shards >> cores, emulating "shard count
# scales with the corpus" on a fixed-core box) can be measured.
# int, or None for the pinned corpus-scaled rule (sized_shards:
# max(8, cores, ceil(docs/20k))) — SPARK_GRAFT_SHARDS=auto
_SHARDS_ENV = os.environ.get("SPARK_GRAFT_SHARDS", "32")
N_SHARDS = None if _SHARDS_ENV.strip().lower() == "auto" else int(_SHARDS_ENV)
RERANK_HIDDEN = 1024
N_QUERIES = int(os.environ.get("SPARK_GRAFT_QUERIES", "256"))
# scaling mode needs a compute-bound workload: identical input at both
# parallelism levels, big enough that per-job fixed costs (session,
# task launch, file commits) are a small fraction of wall time
SCALING_PAGES = int(os.environ.get("SPARK_GRAFT_SCALING_PAGES", "160000"))


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


SF = _sf_from_dir(SF_DIR)
N_PAGES = int(
    os.environ.get("SPARK_GRAFT_N_PAGES", str(max(2000, int(400_000 * SF))))
)


def query_batch(n: int = N_QUERIES) -> list[tuple[int, str]]:
    """Deterministic query batch over the synthetic vocabulary:
    hot+mid, mid-only, and rare-term shapes."""
    qs = []
    for i in range(n):
        a, b, c = (i * 7) % 9973, (i * 131 + 17) % 9973, (i * 389 + 101) % 9973
        if i % 8 == 0:
            qs.append((i, f"the w{a} w{b}"))
        elif i % 8 == 7:
            qs.append((i, f"zyzzyva w{a}"))
        else:
            qs.append((i, f"w{a} w{b} w{c}"))
    return qs


def run_suite(cpus: int, n_pages: int) -> dict:
    from pyspark.sql import functions as F

    from embed_rerank_spark.operators.bm25 import bm25_topk_bruteforce
    from embed_rerank_spark.operators.postings import InvertedIndex
    from embed_rerank_spark.operators.rerank import rerank_candidates
    from embed_rerank_spark.operators.wand import wand_topk
    from embed_rerank_spark.plans.build_index import (
        build_incremental,
        extract_pages,
        merge_segments,
    )
    from embed_rerank_spark.queryset import QUERY_SET
    from embed_rerank_spark.session import get_spark
    from embed_rerank_spark.sources.pages import generate_pages

    spark = get_spark(app_name="embed-rerank-bench", cores=cpus)
    # resolve 'auto' through the pinned rule so every build in the
    # suite (main index, positional, next-word, impact, snap5 segment)
    # runs the shard count the rule itself produces
    from embed_rerank_spark.plans.build_index import sized_shards

    eff_shards = N_SHARDS if N_SHARDS is not None else sized_shards(spark, n_pages)
    timings: dict[str, float] = {"_n_shards": eff_shards}
    tmp = tempfile.mkdtemp(prefix="erspark_bench_")
    try:
        pages = generate_pages(spark, n_pages, seed=42, n_snapshots=4)
        pages.write.mode("overwrite").parquet(f"{tmp}/pages")
        pages = spark.read.parquet(f"{tmp}/pages")

        # SPARK_GRAFT_SKIP: comma list of phases to drop (bm25_brute,
        # rerank, docs_bm25, extract). Skipping extract requires also
        # skipping the phases that read the extracted corpus
        # (bm25_brute, rerank). Used by the scaling/oversharding legs
        # where the brute-force oracle would dominate wall time while
        # measuring nothing about the engine.
        skip = set(filter(None, os.environ.get("SPARK_GRAFT_SKIP", "").split(",")))
        if "extract" in skip and not {"bm25_brute", "rerank"} <= skip:
            raise SystemExit("SPARK_GRAFT_SKIP=extract requires bm25_brute,rerank too")

        if "extract" not in skip:
            # warm the Python workers / module imports on a tiny slice
            # first: the cold start costs ~3 s ONCE per session (measured
            # reps on identical input: 4.18 / 1.23 / 1.09 s) and extract
            # is the first Python stage the suite runs — on a real
            # deployment that one-time cost amortizes over hours, so
            # timing it inside a 1-2 s phase only adds a bimodal ±3 s
            # artifact to round-over-round comparisons
            # sample() keeps the partitioning, so EVERY worker runs one
            # warm task (limit() would collapse to a handful of
            # partitions and leave most workers cold)
            extract_pages(pages.sample(False, 0.005, seed=1)).count()
            t0 = time.perf_counter()
            extracted = extract_pages(pages).filter(F.col("error").isNull())
            extracted.write.mode("overwrite").parquet(f"{tmp}/extracted")
            timings["extract"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        build_incremental(spark, pages, f"{tmp}/index", n_shards=eff_shards, resume=False)
        timings["index_build"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        index = merge_segments(spark, f"{tmp}/index")
        timings["index_merge"] = time.perf_counter() - t0

        qb = query_batch()
        # headline QPS metric: min of 3 repeats — this host has
        # multi-second noise windows (see BENCH/BASELINE.md) and min
        # over repeats is the standard de-noising for short phases
        wand_times = []
        for rep in range(3):
            t0 = time.perf_counter()
            wand_topk(index, qb, k=10).write.mode("overwrite").parquet(
                f"{tmp}/wand{rep}"
            )
            wand_times.append(time.perf_counter() - t0)
        timings["wand_topk"] = min(wand_times)

        if "bm25_brute" not in skip or "rerank" not in skip:
            corpus = spark.read.parquet(f"{tmp}/extracted").select("doc_id", "text")
        if "bm25_brute" not in skip:
            t0 = time.perf_counter()
            bm25_topk_bruteforce(spark, corpus, qb, k=10).write.mode(
                "overwrite"
            ).parquet(f"{tmp}/brute")
            timings["bm25_brute"] = time.perf_counter() - t0

        if "rerank" not in skip:
            t0 = time.perf_counter()
            cands = wand_topk(index, qb, k=50)
            rerank_candidates(
                cands, corpus, qb, top_k=10, hidden=RERANK_HIDDEN
            ).write.mode("overwrite").parquet(f"{tmp}/rerank")
            timings["rerank"] = time.perf_counter() - t0

        if "docs_bm25" not in skip:
            docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
            t0 = time.perf_counter()
            bm25_topk_bruteforce(spark, docs, QUERY_SET, k=10).write.mode(
                "overwrite"
            ).parquet(f"{tmp}/docs_bm25")
            timings["docs_bm25"] = time.perf_counter() - t0

        # --- round-2 query-mode side metrics (reported under "extra",
        # NOT in the headline suite total, to keep rounds comparable):
        # conjunctive AND retrieval (leapfrog + block skipping) and
        # exact phrase retrieval over a positional index.
        if os.environ.get("SPARK_GRAFT_TIERED", "1") != "0":
            from embed_rerank_spark.operators.positions import (  # noqa: PLC0415
                build_positional_postings,
                phrase_topk,
            )
            from embed_rerank_spark.operators.wand import conjunctive_topk  # noqa: PLC0415

            from embed_rerank_spark.operators.postings import (  # noqa: PLC0415
                write_index,
            )

            extra: dict[str, float] = {}
            # small-batch serving latency: at 64 queries the per-batch
            # FIXED cost dominates, so this is the metric the
            # shuffle-free shard-file scan path (whole_shard_scan_ok)
            # moves — measured against the explicit-repartition
            # fallback on the SAME index (identical results; only the
            # physical plan differs)
            from dataclasses import replace as _dc_replace  # noqa: PLC0415

            qb64 = query_batch(64)
            fallback = _dc_replace(index, shard_files=False, _scan_ok=None)
            for label, handle in (
                ("wand_64q_shardfile_scan", index),
                ("wand_64q_repartition", fallback),
            ):
                times = []
                for rep in range(3):
                    t0 = time.perf_counter()
                    wand_topk(handle, qb64, k=10).write.mode("overwrite").parquet(
                        f"{tmp}/{label}{rep}"
                    )
                    times.append(time.perf_counter() - t0)
                extra[label] = round(min(times), 3)
            t0 = time.perf_counter()
            conjunctive_topk(index, qb, k=10).write.mode("overwrite").parquet(
                f"{tmp}/conj"
            )
            extra["conjunctive_topk"] = round(time.perf_counter() - t0, 3)
            # write the positional index like a real deployment — the
            # phrase phase must measure QUERY cost, not a lazy rebuild
            t0 = time.perf_counter()
            write_index(
                build_positional_postings(
                    spark.read.parquet(f"{tmp}/extracted").select("doc_id", "text"),
                    n_shards=eff_shards,
                ),
                f"{tmp}/posindex",
            )
            extra["positional_build"] = round(time.perf_counter() - t0, 3)
            pos_index = InvertedIndex.load(spark, f"{tmp}/posindex")
            phrases = [
                (i, f"w{(i * 7) % 9973} w{(i * 131 + 17) % 9973}") for i in range(64)
            ]
            t0 = time.perf_counter()
            phrase_topk(pos_index, phrases, k=10).write.mode("overwrite").parquet(
                f"{tmp}/phrase"
            )
            extra["phrase_topk_64"] = round(time.perf_counter() - t0, 3)
            # COMBINED next-word (bigram) index over the same corpus,
            # then the same phrase batch plus a hot-phrase batch
            # ("the w{k}": the unigram path must decode every position
            # of the hottest term) through the bigram-adjacency
            # kernel. Results are identical to phrase_topk; the delta
            # is pure plan cost (sparser intersection streams, skipped
            # unigram position decode, same shuffle-free scan).
            from embed_rerank_spark.operators.positions import (  # noqa: PLC0415
                build_combined_phrase_index,
                phrase_topk_nextword,
            )

            t0 = time.perf_counter()
            write_index(
                build_combined_phrase_index(
                    spark.read.parquet(f"{tmp}/extracted").select("doc_id", "text"),
                    n_shards=eff_shards,
                ),
                f"{tmp}/nwindex",
            )
            extra["nextword_build"] = round(time.perf_counter() - t0, 3)
            nw_index = InvertedIndex.load(spark, f"{tmp}/nwindex")
            t0 = time.perf_counter()
            phrase_topk_nextword(nw_index, None, phrases, k=10).write.mode(
                "overwrite"
            ).parquet(f"{tmp}/phrase_nw")
            extra["phrase_nextword_64"] = round(time.perf_counter() - t0, 3)
            # "w1" is the zipf head (tf ~ 15/doc, df ~ everywhere): its
            # position lists are the decode-heavy case the next-word
            # path exists for ("the" here has tf ~ 1/doc and is cheap)
            hot_phrases = [(i, f"w1 w{(i * 7) % 9973}") for i in range(64)]
            t0 = time.perf_counter()
            phrase_topk(pos_index, hot_phrases, k=10).write.mode(
                "overwrite"
            ).parquet(f"{tmp}/phrase_hot_uni")
            extra["phrase_hot_topk_64"] = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            phrase_topk_nextword(nw_index, None, hot_phrases, k=10).write.mode(
                "overwrite"
            ).parquet(f"{tmp}/phrase_hot_nw")
            extra["phrase_hot_nextword_64"] = round(time.perf_counter() - t0, 3)
            # Lucene ordered intervals (max_gaps=4) over the same
            # positional index and phrase pairs: same decode cost as
            # phrase_topk plus the searchsorted chain per start
            from embed_rerank_spark.operators.positions import (  # noqa: PLC0415
                interval_topk,
            )

            intervals = [(i, p, 4) for i, p in phrases]
            t0 = time.perf_counter()
            interval_topk(pos_index, intervals, k=10).write.mode(
                "overwrite"
            ).parquet(f"{tmp}/intervals")
            extra["interval_topk_64"] = round(time.perf_counter() - t0, 3)
            # front-coded dictionary: build + size evidence + one
            # pruned prefix lookup (headers prune to the term range)
            from embed_rerank_spark.plans.dictionary import (  # noqa: PLC0415
                dictionary_sizes,
                prefix_lookup_fc,
                write_front_coded_dictionary,
            )

            t0 = time.perf_counter()
            write_front_coded_dictionary(spark, f"{tmp}/index")
            extra["dict_fc_build"] = round(time.perf_counter() - t0, 3)
            sizes = dictionary_sizes(spark, f"{tmp}/index")
            extra["dict_raw_bytes"] = sizes["raw_bytes"]
            extra["dict_fc_bytes"] = sizes["fc_bytes"]
            t0 = time.perf_counter()
            prefix_lookup_fc(spark, f"{tmp}/index", "w12", max_expansion=64)
            extra["dict_fc_prefix_lookup"] = round(time.perf_counter() - t0, 3)
            # PRF (RM3-lite): two WAND passes + feedback-term mining
            from embed_rerank_spark.operators.prf import prf_topk  # noqa: PLC0415

            corpus_df = spark.read.parquet(f"{tmp}/extracted").select(
                "doc_id", "text"
            )
            t0 = time.perf_counter()
            prf_topk(index, corpus_df, qb[:64], k=10).write.mode(
                "overwrite"
            ).parquet(f"{tmp}/prf")
            extra["prf_topk_64"] = round(time.perf_counter() - t0, 3)
            # exact-substring span dedup over the full extracted corpus
            from embed_rerank_spark.operators.dedup import (  # noqa: PLC0415
                duplicate_span_coverage,
            )

            t0 = time.perf_counter()
            duplicate_span_coverage(corpus_df, window=16).write.mode(
                "overwrite"
            ).parquet(f"{tmp}/spans")
            extra["span_dedup"] = round(time.perf_counter() - t0, 3)
            # IVF-PQ ANN over a synthetic 100k x 64 vector table:
            # exercises coarse assignment, PQ encode, and the
            # vectorized ADC gather at a candidate-set size where the
            # kernel actually matters (~12k codes/query at nprobe=8)
            from embed_rerank_spark.operators.similarity import (  # noqa: PLC0415
                ivf_pq_topk,
            )

            n_vec = 100_000
            vecs = spark.range(n_vec).select(
                F.col("id").alias("vec_id"),
                F.transform(
                    F.sequence(F.lit(0), F.lit(63)),
                    lambda i: (
                        F.pmod(F.xxhash64(F.col("id"), i), F.lit(1000)) / 500.0 - 1.0
                    ).cast("float"),
                ).alias("embedding"),
            )
            vecs.write.mode("overwrite").parquet(f"{tmp}/vecs")
            vecs = spark.read.parquet(f"{tmp}/vecs")
            pq_queries = vecs.limit(64).select(
                F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
            )
            t0 = time.perf_counter()
            ivf_pq_topk(
                vecs, pq_queries, k=10, n_centroids=64, nprobe=8, m=16,
                ksub=16, refine=50,
            ).write.mode("overwrite").parquet(f"{tmp}/ivfpq")
            extra["ivf_pq_topk_64"] = round(time.perf_counter() - t0, 3)
            # LLM-pipeline throughput: DSIR selection toward the
            # first-source subset, and 8 BPE merges (one corpus pass +
            # vocabulary-sized iterations) over the extracted corpus
            from embed_rerank_spark.operators.bpe import bpe_train  # noqa: PLC0415
            from embed_rerank_spark.operators.dsir import dsir_select  # noqa: PLC0415

            docs_tbl = spark.read.parquet(f"{SF_DIR}/documents.parquet")
            t0 = time.perf_counter()
            dsir_select(
                docs_tbl, docs_tbl.filter(F.col("source") == "src0"),
                budget=1000,
            ).write.mode("overwrite").parquet(f"{tmp}/dsir")
            extra["dsir_select"] = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            bpe_train(spark, corpus_df, n_merges=8)
            extra["bpe_train_8"] = round(time.perf_counter() - t0, 3)
            # index-sorting early termination: impact-ordered build
            # over the documents table + a 64-query top-k-by-static
            # batch that decodes only the first blocks per (term,shard)
            from embed_rerank_spark.operators.impact import (  # noqa: PLC0415
                impact_dictionary,
                impact_ordered_topk,
                with_impact_ids,
            )
            from embed_rerank_spark.operators.postings import (  # noqa: PLC0415
                InvertedIndex,
                build_postings,
            )

            t0 = time.perf_counter()
            idict = impact_dictionary(docs_tbl, score_col="n_chars")
            ibuilt = build_postings(
                with_impact_ids(docs_tbl, idict), n_shards=eff_shards
            )
            ibuilt["postings"].write.mode("overwrite").parquet(f"{tmp}/impact_postings")
            idict.write.mode("overwrite").parquet(f"{tmp}/impact_dict")
            ics = ibuilt["corpus_stats"].collect()[0]
            extra["impact_build"] = round(time.perf_counter() - t0, 3)
            ihandle = InvertedIndex(
                postings=spark.read.parquet(f"{tmp}/impact_postings"),
                term_stats=ibuilt["term_stats"],
                doc_stats=ibuilt["doc_stats"],
                n_docs=ics["n_docs"],
                avgdl=float(ics["avgdl"]),
            )
            doc_vocab = [
                "join", "hash", "row", "batch", "scan", "filter", "merge",
                "order",
            ]
            iq = [
                (i, f"{doc_vocab[i % 8]} {doc_vocab[(i + 3) % 8]}")
                for i in range(64)
            ]
            t0 = time.perf_counter()
            impact_ordered_topk(
                ihandle, spark.read.parquet(f"{tmp}/impact_dict"), iq, k=10
            ).write.mode("overwrite").parquet(f"{tmp}/impact_topk")
            extra["impact_topk_64"] = round(time.perf_counter() - t0, 3)
            timings["_extra"] = extra

        # --- tiered-compaction side metrics (reported under "tiered",
        # NOT in the headline suite total, to keep rounds comparable):
        # the marginal cost of snapshot N+1 under the LSM layout is one
        # SEGMENT build + (usually) zero merge, vs merge_segments'
        # full-index rewrite measured above as index_merge.
        if os.environ.get("SPARK_GRAFT_TIERED", "1") == "0":
            return timings  # scaling mode: skip side metrics (cost!)
        import datetime as dt  # noqa: PLC0415

        from embed_rerank_spark.plans.build_index import build_segment  # noqa: PLC0415
        from embed_rerank_spark.plans.tiered import compact, load_tiered  # noqa: PLC0415
        from embed_rerank_spark.sources.pages import BASE_DAY  # noqa: PLC0415

        tiered: dict[str, float] = {}
        t0 = time.perf_counter()
        compact(spark, f"{tmp}/index", fanout=4)  # 4 L0 -> one L1 tier
        tiered["compact_4_segments"] = round(time.perf_counter() - t0, 3)

        extra = generate_pages(
            spark, int(n_pages * 1.25), seed=42, n_snapshots=4
        ).filter(F.substring("url", -12, 12).cast("long") >= n_pages).withColumn(
            "warc_ts", F.lit(BASE_DAY + dt.timedelta(days=4))
        )
        t0 = time.perf_counter()
        build_segment(spark, extra, f"{tmp}/index", "2025-06-05", n_shards=eff_shards)
        tiered["snap5_segment_build"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        compact(spark, f"{tmp}/index", fanout=4)  # below fanout: no-op
        tiered["snap5_compact"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        wand_topk(load_tiered(spark, f"{tmp}/index"), qb, k=10).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/wand_tiered")
        tiered["wand_tiered_topk"] = round(time.perf_counter() - t0, 3)
        timings["_tiered"] = tiered  # side-channel, popped by main()

        # --- ranking-quality regression block (reference harness
        # semantics, tools/tests/quality-rerank-only.py): MRR@10 /
        # nDCG@10 / recall@10 / MAP@10 of the engine's WAND top-10
        # against a FIXED deterministic judgment set over the bench
        # corpus — a tracked per-round metric so a scoring regression
        # (not just a latency one) is visible round-over-round.
        # Scores, not seconds: reported under "quality", which the
        # --compare latency gate deliberately ignores.
        from embed_rerank_spark.functions.quality import quality_summary  # noqa: PLC0415

        ranking = wand_topk(index, qb, k=10).select("query_id", "rank", "doc_id")
        qids = ranking.select("query_id").distinct()
        judgments = (
            qids.crossJoin(index.doc_stats.select("doc_id"))
            .select(
                "query_id",
                "doc_id",
                F.when(
                    (F.col("doc_id") + F.col("query_id")) % 5 == 0,
                    (F.col("doc_id") + F.col("query_id") * 3) % 3 + 1,
                )
                .otherwise(F.lit(0))
                .alias("rel"),
            )
            .filter(F.col("rel") > 0)
        )
        qrow = (
            quality_summary(ranking, judgments, k=10, queries=qids)
            .agg(
                F.avg("rr").alias("mrr"),
                F.avg("ndcg").alias("ndcg"),
                F.avg("recall").alias("recall"),
                F.avg("ap").alias("map"),
                F.count(F.lit(1)).alias("n"),
            )
            .first()
        )
        timings["_quality"] = {
            "mrr_at_10": round(float(qrow["mrr"]), 6),
            "ndcg_at_10": round(float(qrow["ndcg"]), 6),
            "recall_at_10": round(float(qrow["recall"]), 6),
            "map_at_10": round(float(qrow["map"]), 6),
            "n_queries": int(qrow["n"]),
        }
    finally:
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)
    return timings


def host_health_probe() -> dict:
    """~2 s single-thread probe of the two resources the suite leans
    on: memory-bandwidth (int sort) and FLOPs (matmul). This VM shares
    hardware with co-tenants whose MEMORY pressure never shows up in
    loadavg or steal% — measured on this host, the same suite swings
    67 s <-> 380 s while local load is ~2 and steal ~3%, and the sort
    probe swings 5 s <-> 27 s in lockstep. Embedding the probe in the
    output lets any reader normalize a recorded run by the host's
    health AT THAT MOMENT instead of guessing."""
    import numpy as np

    t0 = time.perf_counter()
    a = np.random.default_rng(1).integers(0, 1000, 20_000_000)
    np.sort(a)
    sort_s = time.perf_counter() - t0
    x = np.random.default_rng(0).standard_normal((1500, 1500))
    t0 = time.perf_counter()
    for _ in range(4):
        x @ x
    matmul_s = time.perf_counter() - t0
    try:
        with open("/proc/loadavg") as f:
            load1 = float(f.read().split()[0])
    except OSError:
        load1 = -1.0
    return {
        "sort20M_s": round(sort_s, 3),  # healthy ~1.1-1.6; contended 3-6x that
        "matmul_s": round(matmul_s, 3),
        "load1": load1,
    }


# a clean run's probes agree within PROBE_AGREE x and stay under
# PROBE_HEALTHY_S; outside that, the suite straddled an external
# memory-bandwidth contention window (see BENCH/BASELINE.md) and its
# ordering is meaningless — retry (bounded), else report the least-
# contended attempt with every attempt's probes on record
PROBE_AGREE = 2.0
PROBE_HEALTHY_S = 4.0
PROBE_FAST_S = 1.6  # top of the measured healthy band on this kernel
MAX_ATTEMPTS = int(os.environ.get("SPARK_GRAFT_BENCH_RETRIES", "3"))


def _probe_clean(before: dict, after: dict) -> bool:
    # Contention can only be witnessed by a probe being SLOW. The r04
    # campaigns exposed a bimodal fast mode on this host: the sort
    # probe sometimes lands at 0.33-0.74 s (well BELOW the 1.1-1.6 s
    # healthy band — idle-box frequency boost / cache luck), and a
    # 0.5 s -> 2.0 s pair then fails the 2x agreement test even though
    # both sides sit far under the 3-6x contention band. Six campaign
    # attempts were vetoed exactly this way while their stronger
    # in-band signal (phase inversions) was zero every time. Fix:
    # clamp both probes to the healthy-band floor before the ratio
    # test — an anomalously FAST probe can never flag a window dirty;
    # a genuinely slow probe (the contention edge) still does.
    a, b = before["sort20M_s"], after["sort20M_s"]
    if max(a, b) <= PROBE_FAST_S:
        return True
    a2, b2 = max(a, PROBE_FAST_S), max(b, PROBE_FAST_S)
    return max(a2, b2) / min(a2, b2) <= PROBE_AGREE and max(a, b) <= PROBE_HEALTHY_S


def main() -> None:
    if "--scaling" in sys.argv:
        scaling_mode()
        return
    if "--weak-scaling" in sys.argv:
        weak_scaling_mode()
        return
    if "--phrase-one" in sys.argv:
        print(json.dumps(phrase_one_size(N_PAGES)))
        return
    if "--phrase-scaling" in sys.argv:
        phrase_scaling_mode()
        return
    attempts: list[dict] = []
    for attempt in range(1, MAX_ATTEMPTS + 1):
        probe_before = host_health_probe()
        timings = run_suite(CPUS, N_PAGES)
        probe_after = host_health_probe()
        tiered = timings.pop("_tiered", {})
        extra = timings.pop("_extra", {})
        quality = timings.pop("_quality", {})
        n_shards_used = timings.pop("_n_shards", N_SHARDS)
        total = sum(timings.values())
        attempts.append(
            {
                "value": round(total, 3),
                "queries": {k: round(v, 3) for k, v in timings.items()},
                "tiered": tiered,
                "extra": extra,
                "quality": quality,
                "n_shards": n_shards_used,
                "host_health": {"before": probe_before, "after": probe_after},
                "clean": _probe_clean(probe_before, probe_after),
                "attempt": attempt,
            }
        )
        if attempts[-1]["clean"]:
            break
    # first clean attempt, else the least-contended one
    chosen = next(
        (a for a in attempts if a["clean"]),
        min(
            attempts,
            key=lambda a: max(
                a["host_health"]["before"]["sort20M_s"],
                a["host_health"]["after"]["sort20M_s"],
            ),
        ),
    )
    out = {
        "metric": "e2e_suite_sec",
        "value": chosen["value"],
        "unit": "sec",
        "queries": chosen["queries"],
        "sf": SF,
        "cpus": CPUS,
        "n_pages": N_PAGES,
        "wand_qps": round(N_QUERIES / chosen["queries"]["wand_topk"], 2),
        "tiered": chosen["tiered"],
        "extra": chosen["extra"],
        "quality": chosen["quality"],
        "n_shards": chosen["n_shards"],
        "host_health": chosen["host_health"],
        "probe_clean": chosen["clean"],
        "attempts": [
            {
                "attempt": a["attempt"],
                "value": a["value"],
                "clean": a["clean"],
                "probe_before_s": a["host_health"]["before"]["sort20M_s"],
                "probe_after_s": a["host_health"]["after"]["sort20M_s"],
            }
            for a in attempts
        ],
    }
    if "--compare" in sys.argv:
        prior_path = sys.argv[sys.argv.index("--compare") + 1]
        out["compare"] = compare_with_prior(out, prior_path)
    print(json.dumps(out))


def compare_with_prior(out: dict, prior_path: str, threshold: float = 1.3) -> dict:
    """Round-over-round self-regression check: phase-by-phase ratio of
    this run against a prior BENCH_r{N}.json, flagging any phase more
    than ``threshold``x slower. Only probe-clean legs are comparable —
    a contaminated leg on either side reports ``comparable: false``
    and flags nothing (a co-tenant is not a regression)."""
    with open(prior_path) as f:
        prior = json.load(f)
    # driver-recorded BENCH_r{N}.json wraps the bench line under "parsed"
    if "parsed" in prior and isinstance(prior["parsed"], dict):
        prior = prior["parsed"]

    def _phases(d: dict) -> dict:
        flat = dict(d.get("queries", {}))
        flat.update(d.get("tiered", {}))
        # extras mix timings with other units; any NON-timing extra must
        # carry one of these suffixes (bigger-is-better or unit-typed
        # values compared as latencies would mis-flag improvements as
        # regressions)
        non_timing = ("_bytes", "_qps", "_count", "_rows", "_ratio", "_pct", "_eff")
        flat.update(
            {
                k: v
                for k, v in d.get("extra", {}).items()
                if isinstance(v, (int, float)) and not k.endswith(non_timing)
            }
        )
        return flat

    comparable = bool(out.get("probe_clean")) and bool(prior.get("probe_clean"))
    now, prev = _phases(out), _phases(prior)
    regressions = {}
    if comparable:
        for k in sorted(set(now) & set(prev)):
            if prev[k] > 0.05 and now[k] / prev[k] > threshold:
                regressions[k] = {
                    "prior_s": round(prev[k], 3),
                    "now_s": round(now[k], 3),
                    "ratio": round(now[k] / prev[k], 2),
                }
    return {
        "baseline": prior_path,
        "comparable": comparable,
        "threshold": threshold,
        "n_phases_compared": len(set(now) & set(prev)) if comparable else 0,
        "regressions": regressions,
    }


def _calib_burn(_: int) -> float:
    import numpy as np

    x = np.random.default_rng(1).standard_normal(200_000)
    s = 0.0
    for _i in range(40):
        s += float(np.sin(x).sum())
    return s


def cpu_calibration(n_procs: int, n_tasks: int = 64) -> float:
    """Wall time of an embarrassingly-parallel pure-NumPy workload at
    ``n_procs`` processes — the HARDWARE scaling ceiling of this box.
    Virtualized hosts derate per-core speed under full load (all-core
    turbo / host contention), so even perfect software cannot reach
    ideal N->4N speedup here; reporting raw AND hardware-normalized
    efficiency separates the two effects."""
    import multiprocessing as mp

    with mp.Pool(n_procs) as p:
        t0 = time.perf_counter()
        p.map(_calib_burn, range(n_tasks))
        return time.perf_counter() - t0


def scaling_mode() -> None:
    """Same workload at two parallelism levels in fresh subprocesses;
    prints throughput at both + scaling efficiency (raw and normalized
    by the measured hardware ceiling).

    A campaign is CLEAN only when both legs' own host probes are clean
    AND no phase runs slower on 32 cores than on 8 (a physical
    impossibility without a co-tenant — the 32-core leg runs second,
    so a mid-campaign load burst shows up exactly there). Contended
    campaigns re-run up to SPARK_GRAFT_SCALING_RETRIES times; every
    attempt's verdict ships in the output either way."""
    import subprocess

    # SPARK_GRAFT_SCALING_LOW picks the small leg (default 8 vs CPUS).
    # On this shared box 8 cores already draw a large share of DRAM
    # bandwidth, so 8->32 measures the bandwidth ceiling, not the plan;
    # 4->16 keeps both legs under the saturation knee for an N->4N
    # reading closer to what distinct executor HOSTS would show.
    lows, highs = int(os.environ.get("SPARK_GRAFT_SCALING_LOW", "8")), CPUS

    def _one_campaign():
        results = {}
        for cores in (lows, highs):
            env = dict(
                os.environ,
                SPARK_GRAFT_CPUS=str(cores),
                SPARK_GRAFT_N_PAGES=str(SCALING_PAGES),
                SPARK_GRAFT_TIERED="0",  # side metrics would skew the ratio
                # larger query batch: the QPS phase must be compute-bound
                # (256 queries at sf0.1 are ~60% fixed scan/collect cost)
                SPARK_GRAFT_QUERIES=os.environ.get("SPARK_GRAFT_QUERIES", "1024"),
            )
            p = subprocess.run(
                [sys.executable, __file__],
                env=env,
                capture_output=True,
                text=True,
                check=True,
            )
            results[cores] = json.loads(p.stdout.strip().splitlines()[-1])
        legs_clean = all(results[c].get("probe_clean") for c in (lows, highs))
        # inversion check: more cores must never be slower per phase —
        # but only phases with real parallel work can witness a burst.
        # A phase that takes ~1-2 s at BOTH levels (docs_bm25: one tiny
        # count dominated by Spark planning/launch latency) wobbles a
        # few percent either way on scheduler noise, not co-tenancy, so
        # it cannot be allowed to veto an otherwise-clean campaign:
        # require the low leg to carry >= 5 s of work AND the high leg
        # to be > 10% slower before calling it an inversion.
        inverted = [
            k
            for k in results[lows]["queries"]
            if results[lows]["queries"][k] >= 5.0
            and results[highs]["queries"][k] > 1.10 * results[lows]["queries"][k]
        ]
        return results, legs_clean and not inverted, inverted

    max_attempts = int(os.environ.get("SPARK_GRAFT_SCALING_RETRIES", "2"))
    attempts_meta = []
    results = None
    for attempt in range(1, max_attempts + 1):
        results, clean, inverted = _one_campaign()
        attempts_meta.append(
            {
                "attempt": attempt,
                "clean": clean,
                "inverted_phases": inverted,
                "legs_probe_clean": {
                    str(c): results[c].get("probe_clean") for c in (lows, highs)
                },
            }
        )
        if clean:
            break
    t_low = results[lows]["value"]
    t_high = results[highs]["value"]
    speedup = t_low / t_high
    efficiency = speedup / (highs / lows)
    calib_low = cpu_calibration(lows)
    calib_high = cpu_calibration(highs)
    calib_speedup = calib_low / calib_high
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "value": round(efficiency, 3),
                "unit": "ratio",
                "cores_low": lows,
                "cores_high": highs,
                "sec_low": t_low,
                "sec_high": t_high,
                "speedup": round(speedup, 3),
                "hw_ceiling_speedup": round(calib_speedup, 3),
                "hw_normalized_efficiency": round(speedup / calib_speedup, 3),
                "calib_sec_low": round(calib_low, 3),
                "calib_sec_high": round(calib_high, 3),
                # the north rule names TWO metrics — "BM25 top-k QPS +
                # index-build wall-time" — so report their scaling
                # directly, separate from the whole-suite ratio: the
                # suite total is dominated by bm25_brute, the
                # DELIBERATELY naive declarative oracle-shape scan kept
                # for correctness comparison, which is pure memory
                # bandwidth and measures the host's DRAM wall, not the
                # engine's plans
                "build_sec_low": round(
                    sum(
                        results[lows]["queries"][p]
                        for p in ("extract", "index_build", "index_merge")
                    ),
                    3,
                ),
                "build_sec_high": round(
                    sum(
                        results[highs]["queries"][p]
                        for p in ("extract", "index_build", "index_merge")
                    ),
                    3,
                ),
                "build_scaling_efficiency": round(
                    (
                        sum(
                            results[lows]["queries"][p]
                            for p in ("extract", "index_build", "index_merge")
                        )
                        / sum(
                            results[highs]["queries"][p]
                            for p in ("extract", "index_build", "index_merge")
                        )
                    )
                    / (highs / lows),
                    3,
                ),
                "wand_qps_low": results[lows]["wand_qps"],
                "wand_qps_high": results[highs]["wand_qps"],
                "wand_scaling_efficiency": round(
                    (results[lows]["queries"]["wand_topk"]
                     / results[highs]["queries"]["wand_topk"]) / (highs / lows),
                    3,
                ),
                "per_phase_efficiency": {
                    k: round(
                        (results[lows]["queries"][k] / results[highs]["queries"][k])
                        / (highs / lows),
                        3,
                    )
                    for k in results[lows]["queries"]
                },
                "per_phase_low": results[lows]["queries"],
                "per_phase_high": results[highs]["queries"],
                "campaign_clean": attempts_meta[-1]["clean"],
                "attempts": attempts_meta,
                "leg_host_health": {
                    str(c): results[c].get("host_health") for c in (lows, highs)
                },
                "sf": SF,
                "n_pages": SCALING_PAGES,
            }
        )
    )


def phrase_one_size(n_pages: int) -> dict:
    """One rung of the phrase-path ladder: build the positional index
    AND the combined next-word (bigram) index over the same corpus,
    then run identical mid-term and hot-anchor phrase batches through
    both plan shapes (results are rank-identical — pinned in
    tests/test_nextword_property.py; the delta is pure plan cost)."""
    from pyspark.sql import functions as F

    from embed_rerank_spark.operators.positions import (
        build_combined_phrase_index,
        build_positional_postings,
        phrase_topk,
        phrase_topk_nextword,
    )
    from embed_rerank_spark.operators.postings import InvertedIndex, write_index
    from embed_rerank_spark.plans.build_index import extract_pages
    from embed_rerank_spark.session import get_spark
    from embed_rerank_spark.sources.pages import generate_pages

    spark = get_spark(app_name="embed-rerank-phrase-bench", cores=CPUS)
    from embed_rerank_spark.plans.build_index import sized_shards  # noqa: PLC0415

    eff_shards = N_SHARDS if N_SHARDS is not None else sized_shards(spark, n_pages)
    tmp = tempfile.mkdtemp(prefix="erspark_phrase_")
    out: dict = {"n_pages": n_pages, "cpus": CPUS, "n_shards": eff_shards}
    try:
        probe_before = host_health_probe()
        pages = generate_pages(spark, n_pages, seed=42, n_snapshots=4)
        extract_pages(pages).filter(F.col("error").isNull()).select(
            "doc_id", "text"
        ).write.mode("overwrite").parquet(f"{tmp}/extracted")
        corpus = spark.read.parquet(f"{tmp}/extracted")

        t0 = time.perf_counter()
        write_index(
            build_positional_postings(corpus, n_shards=eff_shards), f"{tmp}/pos"
        )
        out["positional_build"] = round(time.perf_counter() - t0, 3)
        pos_index = InvertedIndex.load(spark, f"{tmp}/pos")

        t0 = time.perf_counter()
        write_index(
            build_combined_phrase_index(corpus, n_shards=eff_shards), f"{tmp}/nw"
        )
        out["nextword_build"] = round(time.perf_counter() - t0, 3)
        nw_index = InvertedIndex.load(spark, f"{tmp}/nw")

        phrases = [
            (i, f"w{(i * 7) % 9973} w{(i * 131 + 17) % 9973}") for i in range(64)
        ]
        hot_phrases = [(i, f"w1 w{(i * 7) % 9973}") for i in range(64)]
        for label, fn in (
            ("phrase_topk_64", lambda: phrase_topk(pos_index, phrases, k=10)),
            (
                "phrase_nextword_64",
                lambda: phrase_topk_nextword(nw_index, None, phrases, k=10),
            ),
            (
                "phrase_hot_topk_64",
                lambda: phrase_topk(pos_index, hot_phrases, k=10),
            ),
            (
                "phrase_hot_nextword_64",
                lambda: phrase_topk_nextword(nw_index, None, hot_phrases, k=10),
            ),
        ):
            times = []
            for rep in range(3):
                t0 = time.perf_counter()
                fn().write.mode("overwrite").parquet(f"{tmp}/{label}{rep}")
                times.append(time.perf_counter() - t0)
            out[label] = round(min(times), 3)
        probe_after = host_health_probe()
        out["host_health"] = {"before": probe_before, "after": probe_after}
        out["probe_clean"] = _probe_clean(probe_before, probe_after)
        out["nextword_speedup_mid"] = round(
            out["phrase_topk_64"] / out["phrase_nextword_64"], 3
        )
        out["nextword_speedup_hot"] = round(
            out["phrase_hot_topk_64"] / out["phrase_hot_nextword_64"], 3
        )
        out["build_overhead_x"] = round(
            out["nextword_build"] / out["positional_build"], 2
        )
        return out
    finally:
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)


def phrase_scaling_mode() -> None:
    """VERDICT r03 'What's wrong #1': is the next-word (bigram) index
    an end-to-end win anywhere on the data ladder, or an opt-in?
    Runs phrase_one_size at a ladder of corpus sizes (env
    SPARK_GRAFT_WEAK_SIZES, default 40000,640000) in fresh
    subprocesses; prints one JSON line with per-size rows and the
    speedup trajectory. The hypothesis under test (Williams/Zobel/
    Bahle, 'Fast phrase querying with combined indexes'): the
    next-word path wins where hot-term position streams are LONG,
    i.e. its speedup should rise with corpus size."""
    import subprocess

    sizes = [
        int(s)
        for s in os.environ.get("SPARK_GRAFT_WEAK_SIZES", "40000,640000").split(",")
    ]
    rows = []
    for n in sizes:
        env = dict(os.environ, SPARK_GRAFT_N_PAGES=str(n))
        p = subprocess.run(
            [sys.executable, __file__, "--phrase-one"],
            env=env, capture_output=True, text=True, check=True,
        )
        rows.append(json.loads(p.stdout.strip().splitlines()[-1]))
    print(
        json.dumps(
            {
                "metric": "phrase_scaling",
                "cpus": CPUS,
                "n_shards": _SHARDS_ENV,
                "sizes": sizes,
                "rows": rows,
                "mid_speedup_by_size": [r["nextword_speedup_mid"] for r in rows],
                "hot_speedup_by_size": [r["nextword_speedup_hot"] for r in rows],
            }
        )
    )


def weak_scaling_mode() -> None:
    """DATA scaling at fixed cores: the same suite at a geometric
    ladder of corpus sizes (default 40k/160k/640k pages, 4x steps) in
    fresh subprocesses, one JSON line out.

    What it evidences for the 100 TB question (complementary to
    ``--scaling``'s core ladder): index-BUILD throughput in pages/s
    must hold (or rise, as per-job fixed costs amortize) as the corpus
    quadruples — any superlinear term in tokenize/encode/merge would
    show here; and WAND query cost must grow SUB-linearly with corpus
    size while the brute-force scan grows linearly — the widening
    WAND-vs-brute gap IS the reason an inverted index exists. Each
    size inherits the default mode's host-health probes and retry
    loop, so contended runs self-flag."""
    import subprocess

    sizes = [
        int(s)
        for s in os.environ.get(
            "SPARK_GRAFT_WEAK_SIZES", "40000,160000,640000"
        ).split(",")
    ]
    rows = []
    for n in sizes:
        env = dict(
            os.environ,
            SPARK_GRAFT_CPUS=str(CPUS),
            SPARK_GRAFT_N_PAGES=str(n),
            SPARK_GRAFT_TIERED="0",  # core phases only
            SPARK_GRAFT_QUERIES=os.environ.get("SPARK_GRAFT_QUERIES", "1024"),
        )
        p = subprocess.run(
            [sys.executable, __file__], env=env, capture_output=True,
            text=True, check=True,
        )
        r = json.loads(p.stdout.strip().splitlines()[-1])
        q = r["queries"]
        # SPARK_GRAFT_SKIP propagates to the legs: a ladder that skips
        # the brute-force oracle (it costs ~20 min alone at 2.56M
        # pages) reports the phases it ran and leaves the gap null
        build_sec = sum(q.get(p_, 0.0) for p_ in ("extract", "index_build", "index_merge"))
        rows.append(
            {
                "n_pages": n,
                "n_shards": r.get("n_shards"),
                "build_sec": round(build_sec, 3),
                "build_pages_per_sec": round(n / build_sec, 1),
                "index_build_pages_per_sec": round(n / q["index_build"], 1),
                "wand_sec": q["wand_topk"],
                "wand_qps": r["wand_qps"],
                "bm25_brute_sec": q.get("bm25_brute"),
                "wand_vs_brute_gap": (
                    round(q["bm25_brute"] / q["wand_topk"], 2)
                    if "bm25_brute" in q
                    else None
                ),
                "probe_clean": r.get("probe_clean"),
                "queries": q,
            }
        )
    base = rows[0]
    print(
        json.dumps(
            {
                "metric": "weak_scaling",
                "unit": "pages_per_sec",
                "cpus": CPUS,
                "sizes": sizes,
                "rows": rows,
                # linearity check: time ratio / size ratio per 4x step
                # (1.0 = perfectly linear build; < 1 = throughput RISES
                # with size as fixed costs amortize)
                "build_time_growth_per_step": [
                    round(
                        (rows[i]["build_sec"] / rows[i - 1]["build_sec"])
                        / (rows[i]["n_pages"] / rows[i - 1]["n_pages"]),
                        3,
                    )
                    for i in range(1, len(rows))
                ],
                "wand_time_growth_per_step": [
                    round(rows[i]["wand_sec"] / rows[i - 1]["wand_sec"], 3)
                    for i in range(1, len(rows))
                ],
                "gap_widening": [r["wand_vs_brute_gap"] for r in rows],
                "largest_vs_smallest_build_throughput": round(
                    rows[-1]["build_pages_per_sec"] / base["build_pages_per_sec"], 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
