"""Distributed quality classifier: hashed-feature logistic regression
trained with per-iteration Spark aggregations.

The model-based document-quality filter every large LLM data pipeline
runs (CCNet's fastText LM filter, GPT-3/LLaMA's "looks like good
reference text" linear classifiers, DCLM's fastText OH-2.5+ELI5
filter): a LINEAR model over hashed bag-of-words features, trained on
labeled documents, then applied corpus-wide to score/filter. The
heuristic signals in ``textstats.py`` are the zero-training baseline;
this is the trained counterpart — still deliberately linear (the
reference engine's non-goal of real deep models, SURVEY.md §2.3,
stands: no torch, no embeddings, exact arithmetic an oracle can
replay).

Spark-first decomposition of batch gradient descent — the driver only
ever holds the WEIGHT VECTOR (dim + 1 doubles), never data:

1. ``hashed_features``: one tokenize + one combinable agg -> sparse
   (doc, feat, val) with the hashing trick (md5-derived feature index,
   the engine's cross-engine deterministic hash idiom) and L1 (length)
   normalization — the only corpus-sized job, computed ONCE and reused
   across iterations via localCheckpoint.
2. per iteration: z = features ⋈ broadcast(weights) -> one sum agg per
   doc; sigmoid; gradient = one sum agg per feature (dim rows) +- L2;
   one collect of dim+1 doubles. Every iteration is two combinable
   aggs and a broadcast join — map-side combinable, no skew key (feat
   is uniform by construction of the hash).

Determinism: feature hashing, init w = 0 (first-pass p = 0.5 exactly),
fixed iteration count and learning rate — bit-reproducible up to
float-sum ordering, which the contract's round-6 comparison absorbs
(same tolerance as pagerank's unrolled-CTE oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hashed_features(
    docs: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, feat, val): hashing-trick bag of words — feature index
    = md5-derived term hash mod ``dim`` (collisions sum, the standard
    hashing-trick trade), val = colliding term frequency / doc length
    (L1 normalization keeps long docs from dominating the gradient)."""
    from ..functions.udfs import tokenize_for_scoring  # noqa: PLC0415

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize_for_scoring(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    feats = tf.withColumn(
        "feat",
        F.conv(F.substring(F.md5("term"), 1, 15), 16, 10).cast("long") % dim,
    )
    return (
        feats.groupBy("doc_id", "feat")
        .agg(F.sum("tf").alias("s"))
        .join(dl, "doc_id")
        .select(
            "doc_id",
            "feat",
            (F.col("s").cast("double") / F.col("dl")).alias("val"),
        )
    )


def _predict(
    spark: SparkSession, features: DataFrame, labels: DataFrame,
    w: dict[int, float], bias: float,
) -> DataFrame:
    """(doc_id, y, p): sigmoid(bias + w·x) per labeled doc. Docs whose
    features all hash to zero-weight cells still score (left join)."""
    if w:
        wdf = spark.createDataFrame(
            [(int(f), float(v)) for f, v in sorted(w.items())], "feat long, w double"
        )
        z = (
            features.join(F.broadcast(wdf), "feat")
            .groupBy("doc_id")
            .agg(F.sum(F.col("w") * F.col("val")).alias("z"))
        )
        joined = labels.join(z, "doc_id", "left")
    else:
        joined = labels.withColumn("z", F.lit(None).cast("double"))
    return joined.select(
        "doc_id",
        "y",
        (
            F.lit(1.0)
            / (F.lit(1.0) + F.exp(-(F.lit(bias) + F.coalesce(F.col("z"), F.lit(0.0)))))
        ).alias("p"),
    )


def train_logreg(
    spark: SparkSession,
    features: DataFrame,
    labels: DataFrame,
    iters: int = 3,
    lr: float = 0.5,
    l2: float = 0.0,
) -> tuple[dict[int, float], float]:
    """Full-batch gradient descent on logistic loss: ``iters`` fixed
    steps of w -= lr * (mean((p - y) x) + l2 * w). ``labels`` is
    (doc_id, y) with y in {0.0, 1.0}. Returns (weights by feature,
    bias). The feature table is materialized once (localCheckpoint):
    re-deriving corpus-sized lineage per iteration is the classic
    iterative-Spark trap (same guard as graph.pagerank)."""
    if iters < 0:
        raise ValueError("iters must be >= 0")
    features = features.localCheckpoint(eager=True)
    labels = labels.localCheckpoint(eager=True)
    n = labels.count()
    if n == 0:
        raise ValueError("no labeled documents")
    w: dict[int, float] = {}
    bias = 0.0
    for _ in range(iters):
        pred = _predict(spark, features, labels, w, bias)
        grads = (
            features.join(
                pred.select("doc_id", (F.col("p") - F.col("y")).alias("e")),
                "doc_id",
            )
            .groupBy("feat")
            .agg((F.sum(F.col("e") * F.col("val")) / F.lit(float(n))).alias("g"))
            .collect()
        )
        bias_g = (
            pred.agg(F.avg(F.col("p") - F.col("y")).alias("g")).collect()[0]["g"]
        )
        for r in grads:
            f = int(r["feat"])
            w[f] = w.get(f, 0.0) - lr * (r["g"] + l2 * w.get(f, 0.0))
        bias -= lr * bias_g
    return w, bias


def quality_scores(
    spark: SparkSession,
    docs: DataFrame,
    labels: DataFrame,
    dim: int = 64,
    iters: int = 3,
    lr: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, y, p): train on the labeled docs, score every doc —
    the train-then-sweep shape of a pipeline quality filter (here
    train set == score set; production trains on a small labeled
    sample and sweeps the corpus with the broadcast weights)."""
    feats = hashed_features(docs, dim=dim, id_col=id_col, text_col=text_col)
    w, bias = train_logreg(spark, feats, labels, iters=iters, lr=lr)
    return _predict(spark, feats, labels, w, bias)
