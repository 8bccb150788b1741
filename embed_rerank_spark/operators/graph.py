"""Link-graph analytics over web corpora: PageRank + connected components.

A Common-Crawl-style corpus is a graph as much as a document set —
host authority (PageRank) feeds ranking as a static document prior
(the classic web-search signal the BM25 reference pipeline lacks), and
connected components drive crawl-frontier and mirror-site analysis.
The reference repo has no graph surface (it is a per-request serving
loop, `/root/reference/app/services/reranking_service.py:30-103`);
these operators are part of the beyond-the-reference large-corpus
toolkit, like the dedup/sampling stages.

Scale design (the whole point):

- Edges are a plain ``DataFrame[src, dst]``. Both algorithms
  pre-partition the edge table by ``src`` ONCE and reuse that
  partitioning across every iteration, so each iteration costs one
  shuffle (the contribution aggregation), not three.
- Per-iteration state (the rank / label vector) is one row per node —
  always the small side; the edge table never re-shuffles.
- Iterative DataFrame loops grow the logical plan linearly; both
  loops cut lineage with ``localCheckpoint`` every few iterations so
  the optimizer never sees an O(iters)-deep tree (the standard
  iterative-algorithm pattern on Spark).
- ``connected_components`` is min-label propagation: O(diameter)
  iterations, each a join + min-agg. Web graphs have small diameter
  (~6-20), so this beats the constant-factor-heavy large-star /
  small-star alternative until diameters get pathological; the
  docstring records that trade-off.

Oracle strategy: PageRank with a fixed iteration count is pure IEEE
double arithmetic reproducible in DuckDB by unrolling the iterations
as chained CTEs; connected components is exact set reachability,
which DuckDB's recursive CTE computes directly. Both contract entries
round/compare accordingly (`__spark_entry__.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 4,
) -> DataFrame:
    """(id, pr): PageRank after exactly ``iters`` power iterations.

    r_{t+1}(v) = (1-d)/N + d * sum_{u->v} r_t(u) / outdeg(u)

    Fixed-iteration (not convergence-tested) so the result is a pure
    deterministic function of the edge set — that is what makes it
    DuckDB-oracle-able. Nodes = union of endpoints; nodes with no
    out-edges contribute nothing (their mass is NOT redistributed —
    the simple-sink variant, matching the unrolled-CTE oracle).
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    n = nodes.count()
    outdeg = e.groupBy("src").agg(F.count("*").alias("deg"))
    # one partitioning, reused every iteration: the edge side is the
    # big one at web scale and must never re-shuffle inside the loop
    contrib_src = e.join(outdeg, "src").repartition("src").persist()
    contrib_src.count()

    base = (1.0 - damping) / n
    ranks = nodes.select("id", F.lit(1.0 / n).alias("pr")).persist()
    for it in range(iters):
        contribs = contrib_src.join(
            ranks.withColumnRenamed("id", "src"), "src"
        ).select(
            F.col("dst").alias("id"), (F.col("pr") / F.col("deg")).alias("c")
        )
        agg = contribs.groupBy("id").agg(F.sum("c").alias("s"))
        new_ranks = nodes.join(agg, "id", "left").select(
            "id",
            (
                F.lit(base)
                + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("pr"),
        )
        if (it + 1) % checkpoint_every == 0:
            # cut lineage so the plan stays O(1)-deep across iterations
            new_ranks = new_ranks.localCheckpoint(eager=True)
        old = ranks
        ranks = new_ranks.persist()
        ranks.count()
        old.unpersist()
    contrib_src.unpersist()
    return ranks


def hits(
    edges: DataFrame,
    iters: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 2,
) -> DataFrame:
    """(id, hub, auth): Kleinberg HITS after exactly ``iters``
    iterations — per step, hub(u) = sum of auth over u's out-links,
    then auth(v) = sum of hub over v's in-links, each vector
    L1-normalized (sum = 1; any per-step scaling is rank-equivalent,
    and L1 keeps the unrolled DuckDB oracle free of sqrt ordering
    concerns). Fixed-iteration like ``pagerank`` so the output is a
    pure deterministic function of the edge set.

    Scale shape: the edge table is partitioned once per join side and
    reused every iteration; per step two keyed joins + two combinable
    aggs + two one-row normalizers broadcast back in. Lineage cut
    every ``checkpoint_every`` steps."""
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    n = nodes.count()
    e_by_dst = e.repartition("dst").persist()
    e_by_src = e.repartition("src").persist()
    e_by_dst.count(), e_by_src.count()

    auth = nodes.select("id", F.lit(1.0 / n).alias("auth")).persist()
    hub = nodes.select("id", F.lit(1.0 / n).alias("hub")).persist()
    auth.count(), hub.count()
    for it in range(iters):
        hraw = (
            e_by_dst.join(auth.withColumnRenamed("id", "dst"), "dst")
            .groupBy("src")
            .agg(F.sum("auth").alias("s"))
        )
        hfull = nodes.join(
            hraw.withColumnRenamed("src", "id"), "id", "left"
        ).select("id", F.coalesce("s", F.lit(0.0)).alias("s"))
        hsum = hfull.agg(F.sum("s").alias("t"))
        new_hub = hfull.crossJoin(F.broadcast(hsum)).select(
            "id", (F.col("s") / F.col("t")).alias("hub")
        )
        araw = (
            e_by_src.join(new_hub.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.sum("hub").alias("s"))
        )
        afull = nodes.join(
            araw.withColumnRenamed("dst", "id"), "id", "left"
        ).select("id", F.coalesce("s", F.lit(0.0)).alias("s"))
        asum = afull.agg(F.sum("s").alias("t"))
        new_auth = afull.crossJoin(F.broadcast(asum)).select(
            "id", (F.col("s") / F.col("t")).alias("auth")
        )
        if (it + 1) % checkpoint_every == 0:
            new_hub = new_hub.localCheckpoint(eager=True)
            new_auth = new_auth.localCheckpoint(eager=True)
        old_h, old_a = hub, auth
        hub, auth = new_hub.persist(), new_auth.persist()
        hub.count(), auth.count()
        old_h.unpersist(), old_a.unpersist()
    e_by_dst.unpersist(), e_by_src.unpersist()
    return hub.join(auth, "id").select("id", "hub", "auth")


def connected_components(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iters: int = 200,
    checkpoint_every: int = 4,
) -> DataFrame:
    """(id, comp): undirected connected components, comp = min node id
    in the component.

    Min-label propagation to a fixpoint: each node repeatedly takes
    the min of its own label and its neighbors' labels. Converges in
    O(diameter) rounds — the right cost model for web graphs (small
    diameter); for pathological long-chain graphs the
    large-star/small-star alternation (O(log n) rounds) is the known
    upgrade, at ~3x the per-round cost. Convergence is detected with
    a changed-label count, so the result is the exact fixpoint (what
    the recursive-reachability oracle computes), not an
    iteration-count artifact.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    und = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .repartition("src")
        .persist()
    )
    und.count()
    labels = (
        und.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("comp"))
        .persist()
    )
    for it in range(max_iters):
        nbr_min = (
            und.join(labels.withColumnRenamed("id", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("comp").alias("nmin"))
            .withColumnRenamed("src", "id")
        )
        new_labels = labels.join(nbr_min, "id", "left").select(
            "id",
            F.least(
                F.col("comp"), F.coalesce(F.col("nmin"), F.col("comp"))
            ).alias("comp"),
        )
        if (it + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        new_labels = new_labels.persist()
        changed = (
            new_labels.withColumnRenamed("comp", "new_comp")
            .join(labels, "id")
            .filter(F.col("new_comp") != F.col("comp"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    und.unpersist()
    return labels


def degree_stats(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """(id, out_deg, in_deg): one pass per direction, full outer join —
    the link-spam / hub-site profiling primitive."""
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    out_d = e.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("out_deg"))
    in_d = e.groupBy(F.col("dst").alias("id")).agg(F.count("*").alias("in_deg"))
    return (
        out_d.join(in_d, "id", "full")
        .select(
            "id",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        )
    )


def _canonical_edges(e: DataFrame) -> DataFrame:
    return e.filter(F.col("src") != F.col("dst")).select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).distinct()


def connected_components_star(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iters: int = 60,
    checkpoint_every: int = 2,
) -> DataFrame:
    """(id, comp): connected components by alternating large-star /
    small-star (Kiveris et al., "Connected Components in MapReduce and
    Beyond") — O(log n) rounds regardless of graph diameter, vs
    O(diameter) for ``connected_components``. Use THIS on graphs with
    long chains (ID-linkage, similarity graphs); min-label remains
    cheaper per round on small-diameter web graphs.

    large-star: every node u points its larger neighbors at
    m = min(neighborhood(u) + {u}); small-star points the smaller ones
    (and u itself). Each round is two grouped min-aggregations + joins;
    the edge set monotonically contracts toward one star per component
    whose center is the component's min id. Fixpoint = edge multiset
    unchanged (checked with a count + order-insensitive hash, not a
    collect). Lineage is cut every ``checkpoint_every`` rounds."""
    e = _canonical_edges(
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    ).persist()
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )

    def neighborhoods(cur: DataFrame) -> DataFrame:
        return cur.union(
            cur.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )

    def signature(cur: DataFrame):
        # order-insensitive, overflow-free (xor) digest of the DISTINCT
        # edge set — ANSI mode forbids wrapping sums of hashes
        r = cur.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("src", "dst")).alias("h"),
        ).collect()[0]
        return (r.n, r.h)

    cur = e
    prev_cycle_sig = None
    for it in range(max_iters):
        nbr = neighborhoods(cur)
        mins = nbr.groupBy("src").agg(F.min("dst").alias("mn"))
        mins = mins.withColumn("m", F.least("mn", "src")).drop("mn")
        j = nbr.join(mins, "src")
        # large-star: (v, m) for v > u   |   small-star: (v, m) for
        # v <= u, plus (u, m) — u's own pointer rides the union below
        if it % 2 == 0:
            out = j.filter(F.col("dst") > F.col("src")).select(
                F.col("dst").alias("src"), F.col("m").alias("dst")
            )
        else:
            out = j.filter(F.col("dst") <= F.col("src")).select(
                F.col("dst").alias("src"), F.col("m").alias("dst")
            ).union(mins.select(F.col("src"), F.col("m").alias("dst")))
        nxt = out.filter(F.col("src") != F.col("dst")).distinct()
        if (it + 1) % checkpoint_every == 0:
            nxt = nxt.localCheckpoint(eager=True)
        nxt = nxt.persist()
        cur.unpersist()
        cur = nxt
        # fixpoint = the edge set is stable across a FULL large+small
        # cycle (comparing consecutive half-rounds of different phases
        # can stop early on a transiently-identical intermediate)
        if it % 2 == 1:
            nsig = signature(cur)
            if nsig == prev_cycle_sig:
                break
            prev_cycle_sig = nsig
    # at fixpoint every non-root points at its component root
    labels = nodes.join(
        cur.withColumnRenamed("src", "id").withColumnRenamed("dst", "comp"),
        "id",
        "left",
    ).select("id", F.coalesce("comp", F.col("id")).alias("comp"))
    e.unpersist()
    return labels


def anchor_token_stream(
    docs: DataFrame,
    edges: DataFrame,
    anchor_len: int = 4,
    anchor_weight: int = 2,
    max_inlinks: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, text): body tokens plus inlink ANCHOR tokens repeated
    ``anchor_weight`` times — anchor-text field indexing in the same
    weighted-token-stream form as ``bm25.fielded_weighted_docs``, so
    the unchanged posting build / WAND / every query mode computes
    anchor-boosted scores (the classic web ranking signal: what OTHER
    pages say about a page, not just the page itself).

    Anchor text for edge (src, dst) here = the first ``anchor_len``
    tokens of the SOURCE doc — this corpus's deterministic proxy for
    the <a> tag's text; a real crawl pipeline emits (src, dst, anchor)
    triples from the WARC html and plugs into the same aggregation
    unchanged.

    Scale shape: inlinks per target are capped at ``max_inlinks``
    (smallest src ids win — deterministic, mirrored by the oracle)
    BEFORE aggregation, the anchor-sampling production indexers do:
    a nytimes.com front page has 10^8 inlinks and its anchor field
    must not become the corpus's biggest row or the groupBy's hottest
    key. The cap runs as a row_number window partitioned by dst —
    the same shuffle key as the aggregation that follows, so AQE
    plans one exchange; flatten(collect_list) order is
    non-deterministic but the downstream consumer is a tf COUNT,
    which is order-free. Docs with no inlinks pass through with body
    unchanged (left join, no row loss).
    """
    from pyspark.sql import Window  # noqa: PLC0415

    from ..functions.udfs import tokenize_for_scoring  # noqa: PLC0415

    src_anchor = docs.select(
        F.col(id_col).alias("src"),
        F.slice(tokenize_for_scoring(F.col(text_col)), 1, anchor_len).alias("a"),
    )
    capped = (
        edges.withColumn(
            "rk", F.row_number().over(Window.partitionBy("dst").orderBy("src"))
        )
        .filter(F.col("rk") <= max_inlinks)
        .select("src", "dst")
    )
    anchors = (
        capped.join(src_anchor, "src")
        .groupBy(F.col("dst").alias("doc_id"))
        .agg(F.flatten(F.collect_list("a")).alias("anchor"))
    )
    body = docs.select(
        F.col(id_col).alias("doc_id"),
        tokenize_for_scoring(F.col(text_col)).alias("toks"),
    )
    weighted_anchor = F.flatten(
        F.array_repeat(F.coalesce("anchor", F.array().cast("array<string>")), anchor_weight)
    )
    return body.join(anchors, "doc_id", "left").select(
        "doc_id",
        F.array_join(F.concat(weighted_anchor, F.col("toks")), " ").alias("text"),
    )
