"""Boolean/structured query retrieval: parser, clause semantics, and
composition with the underlying primitives."""

from __future__ import annotations

import pytest

from embed_rerank_spark.operators.boolean import boolean_topk, parse_query
from embed_rerank_spark.operators.positions import (
    build_positional_postings,
    load_positional_index,
)

SF_DIR = "/root/testdata/sf0.001"


def test_parser_grammar():
    bq = parse_query('+fast -slow "sort merge" tab* value')
    assert bq.musts == ["fast"]
    assert bq.nots == ["slow"]
    assert bq.phrases == [["sort", "merge"]]
    assert bq.prefixes == ["tab"]
    assert bq.shoulds == ["value"]
    assert bq.positive_terms() == ["fast", "sort", "merge", "value"]
    with pytest.raises(ValueError, match="negated phrases"):
        parse_query('-"a b"')


@pytest.fixture(scope="module")
def pos_index(spark):
    return load_positional_index(
        build_positional_postings(
            spark.read.parquet(f"{SF_DIR}/documents.parquet"), n_shards=4
        )
    )


def test_boolean_clause_semantics(spark, pos_index):
    docs = {
        r["doc_id"]: set(r["text"].strip().lower().split())
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    joined = {
        r["doc_id"]: " " + " ".join(r["text"].strip().lower().split()) + " "
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    out = boolean_topk(
        pos_index,
        [
            (1, '+fast +table -slow'),
            (2, '+hash "sort merge"'),
            (3, "+strategy fast"),
            (4, "s* -scan"),
        ],
        k=10,
    ).collect()
    assert out
    for r in out:
        toks = docs[r["doc_id"]]
        if r["query_id"] == 1:
            assert "fast" in toks and "table" in toks and "slow" not in toks
        elif r["query_id"] == 2:
            assert "hash" in toks and " sort merge " in joined[r["doc_id"]]
        elif r["query_id"] == 4:
            assert "scan" not in toks and any(t.startswith("s") for t in toks)
    assert not any(r["query_id"] == 3 for r in out)  # OOV must -> empty


def test_boolean_must_only_equals_conjunctive(spark, pos_index):
    """A query of only + clauses must equal conjunctive retrieval."""
    from embed_rerank_spark.operators.wand import conjunctive_topk

    got = sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in boolean_topk(pos_index, [(1, "+fast +hash +join")], k=10).collect()
    )
    want = sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in conjunctive_topk(pos_index, [(1, "fast hash join")], k=10).collect()
    )
    assert got == want and got


def test_boolean_should_only_equals_wand(spark, pos_index):
    """A query of only bare terms must equal disjunctive WAND."""
    from embed_rerank_spark.operators.wand import wand_topk

    got = sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in boolean_topk(pos_index, [(1, "customer order line")], k=10).collect()
    )
    want = sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in wand_topk(pos_index, [(1, "customer order line")], k=10).collect()
    )
    assert got == want and got
