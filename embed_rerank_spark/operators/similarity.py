"""Similarity search over embedding columns (array<float>).

Two paths:
- ``cosine_topk_bruteforce`` — exact top-k via a broadcast query join
  and JVM-side fold arithmetic (the correctness baseline; also the
  right plan whenever the query side is small)
- ``lsh_cosine_topk`` — random-hyperplane LSH bucketing: vectors hash
  to sign-pattern buckets per table; queries probe their buckets only;
  exact cosine within the probed set. The scale path: candidate set
  shrinks by ~2^bits per table, and bucketing is a plain groupable
  column so the probe join partitions cleanly at 10^12 rows.

Hyperplanes are deterministic (Philox seeded), generated driver-side
(bits x dim floats — tiny) and folded into the plan as literals via a
broadcast-joined DataFrame.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(col):
    return F.sqrt(F.aggregate(col, F.lit(0.0), lambda s, x: s + x * x))


def cosine_topk_bruteforce(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
) -> DataFrame:
    """(query_id, rank, vec_id, cosine): exact cosine top-k per query.
    Query side broadcasts; ties rank by vec_id asc on round(cos, 6)."""
    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        _as_double(F.col(vec_col)).alias("v"),
    ).withColumn("vnorm", _norm(F.col("v")))
    q = queries.select(
        F.col(qid_col).alias("query_id"),
        _as_double(F.col(qvec_col)).alias("qv"),
    ).withColumn("qnorm", _norm(F.col("qv")))
    scored = F.broadcast(q).crossJoin(v).select(
        "query_id",
        "vec_id",
        (_dot(F.col("qv"), F.col("v")) / (F.col("qnorm") * F.col("vnorm"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("cosine"), 6)), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
    return rng.standard_normal((bits, dim)).tolist()


def add_lsh_bucket(
    df: DataFrame, planes: list[list[float]], vec_col: str, out_col: str = "bucket"
) -> DataFrame:
    """Sign-pattern bucket id from random hyperplanes (JVM-side fold)."""
    expr = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        d = _dot(_as_double(F.col(vec_col)), plane)
        expr = expr + F.when(d > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return df.withColumn(out_col, expr)


def lsh_cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Approximate cosine top-k: probe only the query's LSH bucket,
    exact cosine within it. Recall measured in tests; raise recall by
    lowering ``bits`` or running multiple seeds and unioning."""
    dim = len(vectors.select(vec_col).first()[0])
    planes = hyperplanes(dim, bits, seed)
    v = add_lsh_bucket(
        vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")),
        planes,
        "v",
    ).withColumn("vd", _as_double(F.col("v"))).withColumn("vnorm", _norm(F.col("vd")))
    q = add_lsh_bucket(
        queries.select(F.col(qid_col).alias("query_id"), F.col(qvec_col).alias("qv")),
        planes,
        "qv",
    ).withColumn("qd", _as_double(F.col("qv"))).withColumn("qnorm", _norm(F.col("qd")))
    scored = F.broadcast(q).join(v, "bucket").select(
        "query_id",
        "vec_id",
        (_dot(F.col("qd"), F.col("vd")) / (F.col("qnorm") * F.col("vnorm"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("cosine"), 6)), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )
