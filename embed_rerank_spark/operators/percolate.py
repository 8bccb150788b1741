"""Percolation — reverse search (Elasticsearch percolator): queries
are REGISTERED up front, documents stream IN, and the engine reports
which stored queries each document matches. The standard building
block for alerting ("tell me when a page matching my saved search is
crawled") and for routing documents to subscribers.

Stored-query grammar: the boolean subset that evaluates by term
membership alone — ``+must`` / ``-not`` / bare SHOULD terms (the
``operators/boolean.py`` grammar minus phrases and prefixes, which
need positions/dictionary state; ``parse_query`` rejects nothing
here, so percolate() itself rejects those clause types loudly).

Pinned match semantics (mirrored by the DuckDB oracle):
a doc matches a stored query iff it contains EVERY must term, NONE of
the must-not terms, and — when the query has no must clause — at
least one should term. Identical to ``boolean_topk``'s qualification
rule restricted to term clauses.

Scale shape (the whole point of percolation): the registered query
set is small (thousands) and BROADCASTS; the document side streams
through one ``explode -> broadcast-join -> groupBy(doc, query)``
combinable aggregation — no corpus shuffle keyed on anything but
(doc_id, query_id) matches, whose cardinality is bounded by matches,
not docs x queries (docs sharing no term with a query never leave the
join). Works identically over a static table or a foreachBatch
micro-batch (`plans/streaming_ingest.py` pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.udfs import tokenize_for_scoring
from .boolean import parse_query


def _stored_query_terms(
    spark, stored: list[tuple[int, str]]
) -> tuple[DataFrame, DataFrame]:
    """Parse stored queries -> (terms_df, consts_df).

    terms_df: (query_id, term, role) with role in {'must','not',
    'should'}; consts_df: (query_id, n_must, n_should). Duplicate
    terms within a clause collapse (set semantics). Phrase or prefix
    clauses raise ValueError — percolation is term-membership only."""
    term_rows: list[tuple[int, str, str]] = []
    const_rows: list[tuple[int, int, int]] = []
    for qid, q in stored:
        bq = parse_query(q)
        if bq.phrases or bq.prefixes:
            raise ValueError(
                f"stored query {qid!r} uses phrase/prefix clauses; "
                "percolation supports +must/-not/should terms only"
            )
        musts = sorted(set(bq.musts))
        nots = sorted(set(bq.nots) - set(musts))
        shoulds = sorted(set(bq.shoulds) - set(musts) - set(nots))
        if not musts and not shoulds:
            continue  # unmatchable: nothing positive to require
        term_rows += [(qid, t, "must") for t in musts]
        term_rows += [(qid, t, "not") for t in nots]
        term_rows += [(qid, t, "should") for t in shoulds]
        const_rows.append((qid, len(musts), len(shoulds)))
    terms_df = spark.createDataFrame(
        term_rows, "query_id long, term string, role string"
    )
    consts_df = spark.createDataFrame(
        const_rows, "query_id long, n_must long, n_should long"
    )
    return terms_df, consts_df


def percolate(
    docs: DataFrame,
    stored: list[tuple[int, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, doc_id): every (stored query, document) match pair.

    One pass over the documents: distinct terms per doc explode into a
    broadcast join with the registered query terms, then a combinable
    (doc_id, query_id) aggregation checks the qualification rule
    (all musts present / no nots present / >=1 should when mustless).
    """
    spark = docs.sparkSession
    terms_df, consts_df = _stored_query_terms(spark, stored)

    doc_terms = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array_distinct(tokenize_for_scoring(F.col(text_col)))
        ).alias("term"),
    )
    hits = doc_terms.join(F.broadcast(terms_df), "term").groupBy(
        "doc_id", "query_id"
    ).agg(
        F.sum(F.when(F.col("role") == "must", 1).otherwise(0)).alias("must_hit"),
        F.sum(F.when(F.col("role") == "not", 1).otherwise(0)).alias("not_hit"),
        F.sum(F.when(F.col("role") == "should", 1).otherwise(0)).alias("should_hit"),
    )
    matched = (
        hits.join(F.broadcast(consts_df), "query_id")
        .filter(
            (F.col("must_hit") == F.col("n_must"))
            & (F.col("not_hit") == 0)
            & ((F.col("n_must") > 0) | (F.col("should_hit") > 0))
        )
        .select("query_id", "doc_id")
    )
    return matched
