"""Nested boolean query trees — the Elasticsearch ``bool`` DSL
(arbitrarily nested must / should / must_not / filter with per-node
``minimum_should_match``), evaluated DECLARATIVELY as a Catalyst join
tree over the corpus term-frequency table.

This complements the flat ``operators/boolean.py`` compiler (the
Lucene query-string surface, evaluated imperatively per doc-shard):
the nested DSL is what ES clients actually send, and its evaluation is
pure relational algebra, so the Spark-first form is a JOIN TREE the
optimizer can reorder — every leaf is a term-filtered slice of the
same (doc_id, term, tf) aggregate, every must is an inner join on
doc_id, every should group is a union + count/sum aggregate, every
must_not an anti-join, and filter-context clauses join without
contributing score (Lucene's filter scorer, exactly).

Pinned semantics (Lucene BooleanQuery, mirrored by the generated
DuckDB oracle in ``__spark_entry__.py``):

- a doc matches a node iff it matches EVERY must and filter clause,
  NO must_not clause, and at least ``minimum_should_match`` should
  clauses — where msm defaults to 1 when the node has shoulds but no
  must/filter, else 0 (the ES default);
- node score = sum of matching must scores + sum of matching should
  scores; filter and must_not contribute 0; a leaf term scores Okapi
  BM25 over the whole corpus statistics;
- ranking per query uses engine tie semantics (rounded score desc,
  doc_id asc).

Scale shape (100 TB): the tf/df/dl aggregates are the brute scorer's
— two combinable hash aggs over the token stream; each leaf is a
broadcast-able single-term filter of tf (a term's posting list); the
join tree is doc_id-keyed throughout so AQE can pick
broadcast/shuffle-hash per branch from runtime sizes; nothing is
collected. Tree size (a few dozen leaves) bounds plan size, not data
size."""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import BM25_B, BM25_K1
from .bm25 import TIE_DECIMALS, term_freqs_dl


@dataclass
class Bool:
    """One ``bool`` node. Clauses are term strings or nested Bool."""

    must: list = field(default_factory=list)
    should: list = field(default_factory=list)
    must_not: list = field(default_factory=list)
    filter: list = field(default_factory=list)
    minimum_should_match: int | None = None

    def msm(self) -> int:
        if self.minimum_should_match is not None:
            return self.minimum_should_match
        return 1 if self.should and not (self.must or self.filter) else 0

    def terms(self) -> set[str]:
        out: set[str] = set()
        for group in (self.must, self.should, self.must_not, self.filter):
            for c in group:
                out |= c.terms() if isinstance(c, Bool) else {c}
        return out

    @classmethod
    def from_json(cls, obj) -> "Bool":
        """Parse the ES-wire shape: ``{"bool": {"must": [...], ...}}``
        (the ``bool`` wrapper optional), where each clause is either a
        term string, ``{"term": "word"}``, or a nested bool object.
        Unknown keys raise — a silently ignored clause would change
        which documents match."""
        if isinstance(obj, str):
            raise ValueError("top-level query must be an object, not a bare term")
        node = obj.get("bool", obj)
        known = {"must", "should", "must_not", "filter", "minimum_should_match"}
        unknown = set(node) - known
        if unknown:
            raise ValueError(f"unknown bool clause(s): {sorted(unknown)}")

        def clause(c):
            if isinstance(c, str):
                return c
            if isinstance(c, dict) and set(c) == {"term"}:
                return c["term"]
            if isinstance(c, dict):
                return cls.from_json(c)
            raise ValueError(f"bad clause: {c!r}")

        msm = node.get("minimum_should_match")
        return cls(
            must=[clause(c) for c in node.get("must", [])],
            should=[clause(c) for c in node.get("should", [])],
            must_not=[clause(c) for c in node.get("must_not", [])],
            filter=[clause(c) for c in node.get("filter", [])],
            minimum_should_match=None if msm is None else int(msm),
        )


def _scored_terms(docs: DataFrame, id_col: str, text_col: str,
                  k1: float, b: float) -> DataFrame:
    """(term, doc_id, score): per-(term, doc) Okapi BM25 term score
    over corpus-wide statistics — the shared base every leaf slices."""
    tfdl = term_freqs_dl(docs, id_col, text_col)
    df = tfdl.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = tfdl.select("doc_id", "dl").distinct().agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    return (
        tfdl.join(df, "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            "doc_id",
            (
                F.log(
                    (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                    + 1.0
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("score"),
        )
    )


def _eval(node, base: DataFrame) -> DataFrame:
    """(doc_id, score) matching ``node``; ``base`` is _scored_terms."""
    if isinstance(node, str):
        return base.filter(F.col("term") == node).select("doc_id", "score")

    parts_must = [_eval(c, base) for c in node.must]
    parts_filter = [_eval(c, base) for c in node.filter]
    parts_should = [_eval(c, base) for c in node.should]
    parts_not = [_eval(c, base) for c in node.must_not]
    msm = node.msm()

    cur: DataFrame | None = None
    for p in parts_must:
        p = p.withColumnRenamed("score", "_s")
        cur = (
            p.select("doc_id", F.col("_s").alias("score"))
            if cur is None
            else cur.join(p, "doc_id").select(
                "doc_id", (F.col("score") + F.col("_s")).alias("score")
            )
        )
    for p in parts_filter:
        sel = p.select("doc_id").distinct()
        cur = (
            sel.withColumn("score", F.lit(0.0))
            if cur is None
            else cur.join(sel, "doc_id")
        )

    if parts_should:
        sh = (
            reduce(DataFrame.unionByName, parts_should)
            .groupBy("doc_id")
            .agg(
                F.sum("score").alias("_ss"),
                F.count(F.lit(1)).alias("_sn"),
            )
        )
        if cur is None:
            cur = sh.filter(F.col("_sn") >= max(msm, 1)).select(
                "doc_id", F.col("_ss").alias("score")
            )
        else:
            cur = (
                cur.join(sh, "doc_id", "left")
                .filter(F.coalesce(F.col("_sn"), F.lit(0)) >= msm)
                .select(
                    "doc_id",
                    (
                        F.col("score") + F.coalesce(F.col("_ss"), F.lit(0.0))
                    ).alias("score"),
                )
            )
    if cur is None:
        # must_not-only trees are unbounded (match-all minus); reject.
        raise ValueError("bool node needs at least one positive clause")
    for p in parts_not:
        cur = cur.join(p.select("doc_id").distinct(), "doc_id", "left_anti")
    return cur


def nested_bool_topk(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, Bool]],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, rank, doc_id, score): top-k per nested bool tree.

    One shared scored-term base feeds every query's join tree; the
    per-query plans union before a single global rank window. The
    base is filtered to the union of the trees' terms first, so the
    big tf aggregation's output that survives is exactly the postings
    of mentioned terms (predicate pushdown does the pruning)."""
    all_terms = sorted(set().union(*(q.terms() for _qid, q in queries)))
    base = _scored_terms(docs, id_col, text_col, k1, b).filter(
        F.col("term").isin(all_terms)
    )
    per_q = [
        _eval(tree, base).select(
            F.lit(qid).cast("long").alias("query_id"), "doc_id", "score"
        )
        for qid, tree in queries
    ]
    from pyspark.sql import Window  # noqa: PLC0415

    scored = reduce(DataFrame.unionByName, per_q)
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("score"), TIE_DECIMALS)), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
