"""Dedup operator tests: exact, minhash-LSH, simhash, embedding
near-dup — on a corpus with planted duplicates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from embed_rerank_spark.operators import dedup

BASE = [
    (0, "the quick brown fox jumps over the lazy dog again and again today"),
    (1, "completely different content about spark query engines and shuffles"),
    (2, "a third document mentioning embeddings rerank and retrieval stacks"),
]


@pytest.fixture(scope="module")
def docs(spark):
    rows = list(BASE)
    # exact dup of 0 (modulo case/whitespace)
    rows.append((10, "The  quick brown fox JUMPS over the lazy dog again and again today "))
    # near dup of 1: one word changed
    rows.append((11, "completely different content about spark query engines and joins"))
    # near dup of 2: word appended
    rows.append((12, "a third document mentioning embeddings rerank and retrieval stacks yay"))
    # unrelated
    rows.append((13, "nothing in common with anything else whatsoever in this tiny corpus"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    out = {r.doc_id: r.n_dups for r in dedup.exact_dedup(docs).collect()}
    assert out[0] == 2          # 0 and 10 collapse
    assert 10 not in out
    assert out[1] == 1 and out[11] == 1  # near-dup is NOT exact-dup


def test_shingles(spark, docs):
    sh = dedup.shingles(docs.filter(F.col("doc_id") == 0), n=3).collect()
    texts = {r.shingle for r in sh}
    assert "the quick brown" in texts
    assert all(len(s.split(" ")) == 3 for s in texts)


def test_ngram_jaccard_pairs(spark, docs):
    pairs = spark.createDataFrame([(1, 11), (1, 13)], "doc_a long, doc_b long")
    out = {(r.doc_a, r.doc_b): r.jaccard for r in dedup.ngram_jaccard_pairs(docs, pairs).collect()}
    assert 0.3 < out[(1, 11)] < 1.0     # one word changed -> high but <1
    assert out[(1, 13)] == 0.0


def test_minhash_lsh_finds_near_dups(spark, docs):
    out = dedup.minhash_lsh_dedup(docs, threshold=0.5, n_hashes=16, n_bands=8)
    found = {(r.doc_a, r.doc_b) for r in out.collect()}
    assert (1, 11) in found
    assert (2, 12) in found
    assert all({a, b} != {0, 13} and {a, b} != {1, 13} for a, b in found)


def test_minhash_exact_dup_jaccard_one(spark, docs):
    out = dedup.minhash_lsh_dedup(docs, threshold=0.99, n_hashes=16, n_bands=8)
    rows = {(r.doc_a, r.doc_b): r.jaccard for r in out.collect()}
    assert rows.get((0, 10)) == pytest.approx(1.0)  # identical after tokenize


def test_simhash_near_dups(spark, docs):
    sig = dedup.simhash_signatures(docs)
    out = dedup.simhash_near_dup_pairs(sig, max_hamming=10)
    found = {(r.doc_a, r.doc_b): r.hamming for r in out.collect()}
    assert found.get((0, 10)) == 0       # exact dup -> identical simhash
    assert all(0 <= h <= 10 for h in found.values())
    # the 4x16-bit banding GUARANTEES recall only for hamming <= 3
    # (pigeonhole); verify the guarantee against driver-side distances
    sigs = {r.doc_id: r.simhash for r in sig.collect()}
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin((sigs[a] ^ sigs[b]) & (2**64 - 1)).count("1")
            if h <= 3:
                assert (a, b) in found, (a, b, h)


def test_embedding_near_dup(spark):
    vecs = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.999, 0.01, 0.0]),   # near dup of 0
            (2, [0.0, 1.0, 0.0]),      # orthogonal
        ],
        "vec_id long, embedding array<float>",
    )
    out = {(r.id_a, r.id_b): r.cosine for r in dedup.embedding_near_dup(vecs, 0.95).collect()}
    assert (0, 1) in out and out[(0, 1)] > 0.99
    assert (0, 2) not in out


def test_dedup_survivors(spark, docs):
    pairs = dedup.minhash_lsh_dedup(docs, threshold=0.5, n_hashes=16, n_bands=8)
    kept = {r.doc_id for r in dedup.dedup_survivors(docs, pairs).collect()}
    assert 11 not in kept and 12 not in kept
    assert {0, 1, 2, 13} <= kept


def test_prepare_corpus_composition(spark):
    """Pipeline = exact-survivors minus near-dup losers, quality-filtered."""
    from pyspark.sql import functions as F

    from embed_rerank_spark.operators.dedup import (
        dedup_survivors,
        exact_dedup,
        minhash_lsh_dedup,
    )
    from embed_rerank_spark.operators.textstats import quality_score
    from embed_rerank_spark.plans.corpus_prep import prepare_corpus

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = prepare_corpus(docs, near_dup_threshold=0.5, min_quality=0.5)
    got = {r.doc_id for r in out.collect()}

    base = docs.select("doc_id", "text")
    kept = base.join(exact_dedup(base).select("doc_id"), "doc_id", "left_semi")
    kept = dedup_survivors(kept, minhash_lsh_dedup(kept, threshold=0.5))
    want = {
        r.doc_id
        for r in kept.join(quality_score(kept), "doc_id")
        .filter(F.col("quality") >= 0.5)
        .collect()
    }
    assert got == want and len(got) > 0
    assert set(out.columns) == {"doc_id", "text", "quality"}


def test_hot_shingle_df_cap_bounds_candidate_pairs(spark):
    """A boilerplate shingle present in every doc must NOT generate a
    quadratic candidate set; genuine near-dups (sharing many non-hot
    shingles) are still found with full-set Jaccard."""
    n = 300
    rows = []
    for i in range(n):
        # every doc shares the hot prefix; unique tail shingles
        rows.append((i, f"the the the the x{i}a x{i}b x{i}c x{i}d"))
    # one genuine near-dup pair sharing a long distinctive tail
    rows.append((1000, "the the the the alpha beta gamma delta epsilon zeta"))
    rows.append((1001, "the the the the alpha beta gamma delta epsilon eta"))
    docs2 = spark.createDataFrame(rows, "doc_id long, text string")

    sh = dedup.shingles(docs2, 3)
    pairs = dedup.shingle_candidate_pairs(sh)  # df cap = MAX_SHINGLE_DF
    n_pairs = pairs.count()
    # uncapped would be >= C(302, 2) = 45451 pairs via the hot shingle
    assert n_pairs < 50, n_pairs
    verified = dedup.ngram_jaccard_pairs(docs2, pairs, 3)
    top = verified.orderBy(F.desc("jaccard")).first()
    assert (top.doc_a, top.doc_b) == (1000, 1001) and top.jaccard > 0.4


def test_lsh_bucket_size_cap_bounds_candidates(spark):
    """A degenerate LSH bucket (hundreds of identical boilerplate docs)
    is dropped from candidate generation; pairs in normal buckets
    survive."""
    n = 200
    rows = [(i, "lorem ipsum dolor sit amet consectetur adipiscing") for i in range(n)]
    rows.append((1000, "completely different words one two three four five six"))
    rows.append((1001, "completely different words one two three four five seven"))
    docs2 = spark.createDataFrame(rows, "doc_id long, text string")
    sig = dedup.minhash_signatures(docs2, n_hashes=16, shingle_n=3)
    cands = dedup.minhash_lsh_candidates(sig, n_bands=4, rows_per_band=4)
    got = {(r.doc_a, r.doc_b) for r in cands.collect()}
    # the 200-doc identical cluster (one bucket > MAX_BUCKET_SIZE) is
    # dropped — C(200,2) = 19900 pairs would otherwise dominate
    assert (1000, 1001) in got
    assert len(got) == 1, len(got)


def test_decontaminate_flags_ngram_overlap(spark):
    """Docs sharing a benchmark n-gram are flagged; hit counts are
    distinct-shingle counts; clean docs pass."""
    from embed_rerank_spark.operators.dedup import decontaminate

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),   # contains 'alpha beta'
            (2, "gamma alpha beta"),          # contains 'alpha beta'
            (3, "delta epsilon zeta"),        # clean
            (4, "beta alpha"),                # reversed: clean at n=2
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["contaminated"], r["n_hits"])
        for r in decontaminate(docs, ["alpha beta qq"], n=2).collect()
    }
    # benchmark bigrams: {'alpha beta', 'beta qq'}
    assert out[1] == (True, 1)
    assert out[2] == (True, 1)
    assert out[3] == (False, 0)
    assert out[4] == (False, 0)


def test_duplicate_span_coverage_hand_built(spark):
    """A 20-token passage shared by docs 1 and 2 (at different offsets),
    doc 3 unique: windows, merged coverage, and fractions are exact."""
    from embed_rerank_spark.operators.dedup import duplicate_span_coverage

    passage = " ".join(f"p{i}" for i in range(20))
    rows = [
        (1, "aa bb " + passage + " cc"),          # dl=23, passage at pos 3..22
        (2, passage + " zz yy xx ww vv"),          # dl=25, passage at pos 1..20
        (3, " ".join(f"u{i}" for i in range(30))),  # unique
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in duplicate_span_coverage(docs, window=16).collect()
    }
    # 20-token shared passage -> 5 stride-1 16-windows inside it; all 5
    # recur in the other doc -> dup_windows=5, coverage = 20 tokens
    assert out[1]["dup_windows"] == 5
    assert out[1]["covered_tokens"] == 20
    assert out[1]["dup_frac"] == round(20 / 23, 6)
    assert out[2]["dup_windows"] == 5
    assert out[2]["covered_tokens"] == 20
    assert out[2]["dup_frac"] == round(20 / 25, 6)
    assert out[3]["dup_windows"] == 0
    assert out[3]["covered_tokens"] == 0
    assert out[3]["dup_frac"] == 0.0


def test_duplicate_span_coverage_short_and_exact_dup(spark):
    """Docs shorter than the window emit no windows; exact dups are
    fully covered (dup_frac 1.0)."""
    from embed_rerank_spark.operators.dedup import duplicate_span_coverage

    same = " ".join(f"w{i % 7}" for i in range(16))
    docs = spark.createDataFrame(
        [(1, same), (2, same), (3, "tiny doc")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in duplicate_span_coverage(docs, window=16).collect()}
    assert out[1]["dup_frac"] == 1.0 and out[2]["dup_frac"] == 1.0
    assert out[3]["dl"] == 2 and out[3]["dup_windows"] == 0 and out[3]["dup_frac"] == 0.0


def test_dedup_clusters_transitive_chain(spark):
    """a~b and b~c (no a~c pair) -> one cluster, canonical = min id;
    isolated docs are their own singleton clusters."""
    from embed_rerank_spark.operators.dedup import dedup_clusters

    docs = spark.createDataFrame([(i,) for i in range(1, 6)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 2, 0.9), (2, 3, 0.8), (4, 5, 0.7)],
        "doc_a long, doc_b long, jaccard double",
    )
    out = {
        r["doc_id"]: (r["canonical"], r["is_canonical"])
        for r in dedup_clusters(docs, pairs).collect()
    }
    assert out[1] == (1, True) and out[2] == (1, False) and out[3] == (1, False)
    assert out[4] == (4, True) and out[5] == (4, False)


def test_dedup_clusters_singletons(spark):
    from embed_rerank_spark.operators.dedup import dedup_clusters

    docs = spark.createDataFrame([(7,), (8,)], "doc_id long")
    pairs = spark.createDataFrame([], "doc_a long, doc_b long, jaccard double")
    out = {r["doc_id"]: r for r in dedup_clusters(docs, pairs).collect()}
    assert out[7]["canonical"] == 7 and out[7]["is_canonical"]
    assert out[8]["canonical"] == 8 and out[8]["is_canonical"]


def test_winnowing_guarantee_and_density(spark):
    from embed_rerank_spark.operators.dedup import (
        winnow_dup_pairs,
        winnow_fingerprints,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # w+k-1 = 8 tokens
    docs = spark.createDataFrame(
        [
            (1, f"one two {shared} three four five"),
            (2, f"six seven eight nine {shared} ten"),
            (3, "unrelated words entirely different content here okay fine"),
            (4, "xx"),  # < k tokens: no fingerprints
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs, k=4, w=5)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    # guarantee: a shared run of >= w+k-1 tokens shares >= 1 fingerprint
    assert by_doc[1] & by_doc[2]
    assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])
    assert 4 not in by_doc
    # density: far fewer fingerprints than grams
    n_grams_1 = len("one two".split()) + 8 + len("three four five".split()) - 3
    assert len(by_doc[1]) < n_grams_1
    pairs = winnow_dup_pairs(docs, k=4, w=5, min_shared=1).collect()
    assert [(p["doc_a"], p["doc_b"]) for p in pairs] == [(1, 2)]


def test_line_dedup_removes_corpus_boilerplate(spark):
    from hashlib import md5

    from embed_rerank_spark.operators.dedup import line_dedup

    boiler = "accept all cookies to continue"  # 5 tokens = one line
    rows = [
        (1, f"{boiler} alpha beta gamma delta eps"),
        (2, f"{boiler} one two three four five"),
        (3, f"{boiler} six seven eight nine ten"),
        (4, "unique text with no shared chunk here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in line_dedup(docs, window=5, max_df=2).collect()}
    # the boilerplate line sits in 3 docs > max_df=2 -> removed from all
    assert out[1]["n_removed"] == 1 and out[1]["n_lines"] == 2
    assert out[1]["kept_md5"] == md5(b"alpha beta gamma delta eps").hexdigest()
    assert out[2]["n_removed"] == 1
    assert out[3]["n_removed"] == 1
    # doc 4: two lines (5 + 2 tokens), nothing removed
    assert out[4]["n_removed"] == 0 and out[4]["n_lines"] == 2
    want4 = md5(b"unique text with no shared chunk here").hexdigest()
    assert out[4]["kept_md5"] == want4


def test_line_dedup_fully_boilerplate_doc(spark):
    from hashlib import md5

    from embed_rerank_spark.operators.dedup import line_dedup

    b = "a b c d e"
    docs = spark.createDataFrame(
        [(i, b) for i in range(4)], "doc_id long, text string"
    )
    out = line_dedup(docs, window=5, max_df=2).collect()
    assert all(r["n_removed"] == 1 and r["n_lines"] == 1 for r in out)
    assert all(r["kept_md5"] == md5(b"").hexdigest() for r in out)


def test_contamination_span_coverage_hand_built(spark):
    from embed_rerank_spark.operators.dedup import contamination_span_coverage

    # eval set: one 10-token sentence; doc 1 embeds tokens 3..10 of it
    # plus its own prefix/suffix; doc 2 shares nothing; doc 3 IS the
    # eval text verbatim (full coverage)
    eval_txt = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, "own prefix gamma delta epsilon zeta eta theta iota kappa own suffix"),
            (2, "completely unrelated text with many words here now"),
            (3, eval_txt),
            (4, "short doc"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in contamination_span_coverage(
            docs, [eval_txt], window=8, threshold=0.5
        ).collect()
    }
    # doc 1: its tokens 3..10 = eval tokens 3..10 -> exactly one
    # 8-gram window hit ("gamma..kappa"), covering 8 of its 12 tokens
    assert got[1]["hit_windows"] == 1
    assert got[1]["covered_tokens"] == 8
    assert got[1]["coverage"] == round(8 / 12, 6)
    assert bool(got[1]["contaminated"]) is True  # 0.667 > 0.5
    # doc 2: clean
    assert got[2]["hit_windows"] == 0 and got[2]["coverage"] == 0.0
    assert bool(got[2]["contaminated"]) is False
    # doc 3: verbatim eval text -> 3 windows, all 10 tokens covered
    assert got[3]["hit_windows"] == 3
    assert got[3]["covered_tokens"] == 10
    assert got[3]["coverage"] == 1.0
    # doc 4: shorter than the window -> no windows, clean by definition
    assert got[4]["hit_windows"] == 0 and got[4]["coverage"] == 0.0


def test_contamination_overlapping_windows_not_double_counted(spark):
    from embed_rerank_spark.operators.dedup import contamination_span_coverage

    # doc repeats a 9-token eval run -> two overlapping 8-gram windows
    # but the union of covered positions is 9, not 16
    eval_txt = "a1 a2 a3 a4 a5 a6 a7 a8 a9"
    docs = spark.createDataFrame(
        [(1, "x " + eval_txt + " y")], "doc_id long, text string"
    )
    r = contamination_span_coverage(docs, [eval_txt], window=8).collect()[0]
    assert r["hit_windows"] == 2
    assert r["covered_tokens"] == 9
    assert r["dl"] == 11


# ---- incremental (delta-vs-base) minhash dedup ----


def test_incremental_dedup_matches_batch_on_delta_pairs(spark, docs):
    """Splitting the corpus into base/delta and running the
    incremental operator must find exactly the batch operator's
    verified pairs that involve >=1 delta doc (base-base pairs are
    by-construction excluded)."""
    base = docs.filter(F.col("doc_id") < 10)
    delta = docs.filter(F.col("doc_id") >= 10)
    inc = dedup.incremental_minhash_dedup(
        delta, base, threshold=0.5, n_hashes=16, n_bands=8
    )
    got = {}
    for r in inc.collect():
        got[frozenset((r.doc_a, r.doc_b))] = (round(r.jaccard, 9), r.pair_kind)
    batch = dedup.minhash_lsh_dedup(docs, threshold=0.5, n_hashes=16, n_bands=8)
    delta_ids = {r.doc_id for r in delta.select("doc_id").collect()}
    want = {
        frozenset((r.doc_a, r.doc_b)): round(r.jaccard, 9)
        for r in batch.collect()
        if r.doc_a in delta_ids or r.doc_b in delta_ids
    }
    assert set(got) == set(want)
    for k, (j, kind) in got.items():
        assert j == want[k]
        ids = set(k)
        assert kind == ("delta_delta" if ids <= delta_ids else "delta_base")


def test_incremental_dedup_orients_delta_base_pairs(spark, docs):
    base = docs.filter(F.col("doc_id") < 10)
    delta = docs.filter(F.col("doc_id") >= 10)
    inc = dedup.incremental_minhash_dedup(
        delta, base, threshold=0.5, n_hashes=16, n_bands=8
    ).collect()
    assert inc, "split corpus must produce delta-base dups (0 vs 10)"
    delta_ids = {r.doc_id for r in delta.select("doc_id").collect()}
    for r in inc:
        if r.pair_kind == "delta_base":
            assert r.doc_a in delta_ids and r.doc_b not in delta_ids
        else:
            assert r.doc_a in delta_ids and r.doc_b in delta_ids and r.doc_a < r.doc_b


def test_incremental_dedup_recrawled_doc_id_in_both(spark):
    """A re-crawled doc_id present in BOTH base and delta must not
    self-pair, and exact Jaccard must be computed over the delta's
    (current) version only — the shadowed base row is dropped, even
    when it is still present in persisted base signatures."""
    txt = "the quick brown fox jumps over the lazy dog again and again"
    base = spark.createDataFrame(
        [(1, txt), (2, "completely different base content here entirely")],
        "doc_id long, text string",
    )
    # doc 1 re-crawled unchanged; new doc 3 duplicates it
    delta = spark.createDataFrame([(1, txt), (3, txt)], "doc_id long, text string")
    sig = dedup.minhash_signatures(
        base.select("doc_id", "text"), n_hashes=16, shingle_n=3
    )
    for base_sig in (None, sig):
        inc = dedup.incremental_minhash_dedup(
            delta, base, threshold=0.5, n_hashes=16, n_bands=8,
            base_signatures=base_sig,
        ).collect()
        pairs = {(r.doc_a, r.doc_b): (round(r.jaccard, 9), r.pair_kind) for r in inc}
        assert all(a != b for a, b in pairs)
        # the only dup is 1<->3, both current delta rows
        assert pairs == {(1, 3): (1.0, "delta_delta")}


def test_incremental_dedup_accepts_persisted_signatures(spark, docs):
    base = docs.filter(F.col("doc_id") < 10)
    delta = docs.filter(F.col("doc_id") >= 10)
    sig = dedup.minhash_signatures(
        base.select("doc_id", "text"), n_hashes=16, shingle_n=3
    )
    with_sig = dedup.incremental_minhash_dedup(
        delta, base, threshold=0.5, n_hashes=16, n_bands=8, base_signatures=sig
    )
    without = dedup.incremental_minhash_dedup(
        delta, base, threshold=0.5, n_hashes=16, n_bands=8
    )
    key = lambda r: (r.doc_a, r.doc_b)  # noqa: E731
    assert sorted(
        [(r.doc_a, r.doc_b, round(r.jaccard, 9), r.pair_kind) for r in with_sig.collect()]
    ) == sorted(
        [(r.doc_a, r.doc_b, round(r.jaccard, 9), r.pair_kind) for r in without.collect()]
    )
