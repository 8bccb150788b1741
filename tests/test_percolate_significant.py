"""Round-3 operators: percolation (reverse search) and the
significant-terms aggregation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from embed_rerank_spark.operators.mlt import significant_terms
from embed_rerank_spark.operators.percolate import percolate


def _docs(spark):
    rows = [
        (1, "join scan fast"),
        (2, "join sort merge"),
        (3, "table slow scan"),
        (4, "table fast data"),
        (5, "the a the"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(df):
    return {(r["query_id"], r["doc_id"]) for r in df.collect()}


def test_percolate_clause_semantics(spark):
    docs = _docs(spark)
    got = _pairs(
        percolate(
            docs,
            [
                (1, "+join +scan"),      # conjunction: doc 1 only
                (2, "+table -slow"),     # exclusion removes doc 3
                (3, "fast merge"),       # disjunction: docs 1, 2, 4
                (4, "+zyzzyva"),         # OOV must: nothing
                (5, "-the join"),        # exclusion + should
            ],
        )
    )
    assert {(q, d) for q, d in got if q == 1} == {(1, 1)}
    assert {(q, d) for q, d in got if q == 2} == {(2, 4)}
    assert {(q, d) for q, d in got if q == 3} == {(3, 1), (3, 2), (3, 4)}
    assert not any(q == 4 for q, _ in got)
    assert {(q, d) for q, d in got if q == 5} == {(5, 1), (5, 2)}


def test_percolate_rejects_phrase_and_prefix_clauses(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="phrase/prefix"):
        percolate(docs, [(1, '"sort merge"')])
    with pytest.raises(ValueError, match="phrase/prefix"):
        percolate(docs, [(1, "jo*")])


def test_percolate_must_overrides_duplicate_roles(spark):
    # '+join join -join': the must set wins; the query requires join.
    docs = _docs(spark)
    got = _pairs(percolate(docs, [(1, "+join join -join")]))
    assert got == {(1, 1), (1, 2)}


def test_percolate_streaming_foreachbatch_alerting(spark, tmp_path):
    """The alerting shape: documents arrive as a stream, each
    micro-batch percolates against the registered queries."""
    import shutil

    docs = _docs(spark)
    src = tmp_path / "docs_stream"
    src.mkdir()
    docs.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "seed"))
    for f in (tmp_path / "seed").glob("*.parquet"):
        shutil.copy(f, src / f.name)

    stored = [(1, "+join +scan"), (2, "fast merge")]
    alerts: list[tuple[int, int]] = []

    def on_batch(batch_df, _batch_id):
        alerts.extend(
            (r["query_id"], r["doc_id"])
            for r in percolate(batch_df, stored).collect()
        )

    q = (
        spark.readStream.schema(docs.schema)
        .parquet(str(src))
        .writeStream.foreachBatch(on_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert set(alerts) == _pairs(percolate(docs, stored))


def test_significant_terms_excludes_query_terms_and_requires_enrichment(spark):
    # 'shared' appears everywhere (bg_frac = 1) so it can never be
    # enriched; 'rare' concentrates in the scan-matching docs.
    rows = [
        (1, "scan rare shared"),
        (2, "scan rare shared"),
        (3, "scan rare shared"),
        (4, "other shared filler"),
        (5, "other shared filler"),
        (6, "other shared filler"),
        (7, "other shared filler"),
        (8, "other shared filler"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = significant_terms(
        spark, docs, [(1, "scan")], window=3, top_n=5, min_fg_df=2
    ).collect()
    terms = [r["term"] for r in got]
    assert "rare" in terms
    assert "scan" not in terms    # the query's own term is excluded
    assert "shared" not in terms  # fg_frac == bg_frac: not enriched
    row = next(r for r in got if r["term"] == "rare")
    # fg_frac = 3/3, bg_frac = 3/8 -> JLH = (1 - 3/8) * (1 / (3/8))
    assert row["fg_df"] == 3 and row["bg_df"] == 3
    assert abs(row["score"] - round((1 - 3 / 8) * (8 / 3), 6)) < 1e-9


def test_significant_terms_foreground_bounded_by_window(spark):
    rows = [(i, "scan common" + (" niche" if i <= 2 else "")) for i in range(1, 21)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = significant_terms(
        spark, docs, [(1, "niche scan")], window=2, top_n=5, min_fg_df=1
    ).collect()
    # window=2 -> foreground is exactly the two niche docs (they score
    # highest); 'common' has fg_frac 1 but bg_frac 1 too -> excluded.
    assert all(r["fg_df"] <= 2 for r in got)
    assert "common" not in [r["term"] for r in got]
