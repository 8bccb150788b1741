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


def matryoshka_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    prefix_dim: int = 16,
    refine_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
) -> DataFrame:
    """(query_id, rank, vec_id, cosine): two-stage ANN for
    Matryoshka-trained embeddings (Kusupati et al. 2022, MRL — models
    like text-embedding-3 / nomic that front-load information so any
    PREFIX of the vector is itself a valid embedding): stage 1 ranks
    by cosine over the first ``prefix_dim`` dims (cheap — the scan
    reads and multiplies ``prefix_dim/dim`` of the data), stage 2
    re-scores the top ``k * refine_factor`` candidates with FULL-dim
    exact cosine. With refine >= corpus the result equals exact brute
    force (the oracle config); at scale prefix_dim/refine trade
    recall for a ~dim/prefix_dim cut in stage-1 FLOPs and bytes.

    Scale shape: both stages are the declarative brute plan (broadcast
    query side, per-query rank windows); the candidate set between
    them is queries x (k * refine_factor) rows — planning-sized, one
    semi-join back into the full-dim table."""
    if prefix_dim < 1 or refine_factor < 1:
        raise ValueError("prefix_dim and refine_factor must be >= 1")
    pref_v = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.slice(_as_double(F.col(vec_col)), 1, prefix_dim).alias("v"),
    ).withColumn("vnorm", _norm(F.col("v")))
    pref_q = queries.select(
        F.col(qid_col).alias("query_id"),
        F.slice(_as_double(F.col(qvec_col)), 1, prefix_dim).alias("qv"),
    ).withColumn("qnorm", _norm(F.col("qv")))
    stage1 = F.broadcast(pref_q).crossJoin(pref_v).select(
        "query_id",
        "vec_id",
        (_dot(F.col("qv"), F.col("v")) / (F.col("qnorm") * F.col("vnorm"))).alias(
            "pcos"
        ),
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("pcos"), 6)), F.asc("vec_id")
    )
    cands = (
        stage1.withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= k * refine_factor)
        .select("query_id", "vec_id")
    )
    full_v = vectors.select(
        F.col(id_col).alias("vec_id"),
        _as_double(F.col(vec_col)).alias("v"),
    ).withColumn("vnorm", _norm(F.col("v")))
    full_q = queries.select(
        F.col(qid_col).alias("query_id"),
        _as_double(F.col(qvec_col)).alias("qv"),
    ).withColumn("qnorm", _norm(F.col("qv")))
    refined = (
        cands.join(full_v, "vec_id")
        .join(F.broadcast(full_q), "query_id")
        .select(
            "query_id",
            "vec_id",
            (
                _dot(F.col("qv"), F.col("v")) / (F.col("qnorm") * F.col("vnorm"))
            ).alias("cosine"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("cosine"), 6)), F.asc("vec_id")
    )
    return (
        refined.withColumn("rank", F.row_number().over(w2))
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
    n_tables: int = 1,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Approximate cosine top-k: probe only the query's LSH bucket(s),
    exact cosine within the probed candidate set.

    Recall levers: MORE ``n_tables`` (a vector is a candidate if it
    shares a bucket in ANY table — miss prob decays geometrically) and
    FEWER ``bits`` (bigger buckets). ``bits=0`` degenerates to one
    bucket = exact brute force, which is the oracle configuration the
    driver contract pins (full-probe == ``cosine_topk_bruteforce``).
    Recall at bits>0 is pinned in tests/test_similarity.py."""
    dim = len(vectors.select(vec_col).first()[0])
    # table 0 keeps the caller's seed (single-table behavior is
    # unchanged); extra tables derive independent plane sets
    tables = [
        hyperplanes(dim, bits, seed if t == 0 else seed * 1000 + t)
        for t in range(n_tables)
    ]

    def banded(df, idc, vcol):
        out = df
        for t, planes in enumerate(tables):
            out = add_lsh_bucket(out, planes, vcol, out_col=f"b{t}")
        return out.select(
            idc,
            F.posexplode(F.array(*[F.col(f"b{t}") for t in range(n_tables)])).alias(
                "table", "bucket"
            ),
        )

    v = vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")).withColumn(
        "vd", _as_double(F.col("v"))
    ).withColumn("vnorm", _norm(F.col("vd")))
    q = queries.select(
        F.col(qid_col).alias("query_id"), F.col(qvec_col).alias("qv")
    ).withColumn("qd", _as_double(F.col("qv"))).withColumn("qnorm", _norm(F.col("qd")))

    cand = (
        F.broadcast(banded(q, "query_id", "qv"))
        .join(banded(v, "vec_id", "v"), ["table", "bucket"])
        .select("query_id", "vec_id")
        .distinct()
    )
    scored = cand.join(v.select("vec_id", "vd", "vnorm"), "vec_id").join(
        F.broadcast(q.select("query_id", "qd", "qnorm")), "query_id"
    ).select(
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


def _sample_matrix(
    vectors: DataFrame, sample: int, seed: int, vec_col: str, id_col: str
) -> np.ndarray:
    """Layout-independent uniform training sample as an L2-normalized
    (n, dim) matrix: rows ordered by a seeded hash of the id and the
    first ``sample`` taken — a TakeOrdered (per-partition top-N + tiny
    merge), no full sort, no count. A bare ``.limit(sample)`` would
    take the first partitions in SCAN ORDER; at 10^12 rows those are
    one domain/day, so centroids/codebooks would be biased and
    partial-probe recall silently degrades (the exact-config oracle
    can't see it). The hash order is independent of partitioning, so
    the trained model is reproducible across layouts too."""
    rows = (
        vectors.select(F.col(id_col).alias("_sid"), F.col(vec_col).alias("_v"))
        .orderBy(F.xxhash64(F.col("_sid"), F.lit(seed)), F.col("_sid"))
        .limit(sample)
        .collect()
    )
    x = np.array([r["_v"] for r in rows], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    return x


def ivf_centroids(
    vectors: DataFrame,
    n_centroids: int = 16,
    iters: int = 5,
    sample: int = 10_000,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Deterministic coarse quantizer: k-means (Lloyd) on a driver-side
    hash-ordered sample (``_sample_matrix`` — layout-independent, never
    first-partitions-biased). Centroid count stays tiny (thousands at
    most), so training on the driver is the right cost model;
    assignment is the distributed part."""
    x = _sample_matrix(vectors, sample, seed, vec_col, id_col)
    rng = np.random.Generator(np.random.Philox(key=[seed, 1]))
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ cent.T
        assign = np.argmax(sims, axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / max(np.linalg.norm(m), 1e-12)
    return cent


def _centroid_sims(vec_col, cent: np.ndarray):
    """array<double> of cosine sims against every centroid (JVM fold;
    centroids enter the plan as literals — the broadcast-variable
    pattern for model state)."""
    vd = _as_double(vec_col)
    vn = _norm(vd)
    sims = [
        _dot(vd, F.array(*[F.lit(float(x)) for x in c])) / vn for c in cent
    ]
    return F.array(*sims)


def ivf_cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
) -> DataFrame:
    """IVF approximate cosine top-k: vectors live in their nearest
    centroid's inverted list; each query probes its ``nprobe`` nearest
    lists and scores exactly inside them. Scale shape: the list id is
    a plain groupable column (partition/bucket the table by it);
    probed fraction ~= nprobe / n_centroids."""
    cent = ivf_centroids(vectors, n_centroids, seed=seed, vec_col=vec_col, id_col=id_col)

    v = vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    v = v.withColumn(
        "list_id",
        F.array_position(
            _centroid_sims(F.col("v"), cent).alias("s"),
            F.array_max(_centroid_sims(F.col("v"), cent)),
        ).cast("int"),
    ).withColumn("vd", _as_double(F.col("v"))).withColumn("vnorm", _norm(F.col("vd")))

    q = queries.select(F.col(qid_col).alias("query_id"), F.col(qvec_col).alias("qv"))
    # nprobe nearest lists per query: rank centroid sims, explode
    probe = (
        q.withColumn("sims", _centroid_sims(F.col("qv"), cent))
        .withColumn(
            "probes",
            F.slice(
                F.reverse(
                    F.array_sort(
                        F.transform(
                            F.col("sims"),
                            lambda s, i: F.struct(s.alias("s"), (i + 1).alias("list_id")),
                        )
                    )
                ),
                1,
                nprobe,
            ),
        )
        .select(
            "query_id",
            "qv",
            F.explode(F.transform(F.col("probes"), lambda p: p["list_id"])).alias("list_id"),
        )
        .withColumn("qd", _as_double(F.col("qv")))
        .withColumn("qnorm", _norm(F.col("qd")))
    )

    scored = F.broadcast(probe).join(v, "list_id").select(
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


# ---------------- product quantization (IVF-PQ) ----------------


def pq_codebooks(
    vectors: DataFrame,
    m: int = 4,
    ksub: int = 16,
    iters: int = 8,
    sample: int = 10_000,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cent: np.ndarray | None = None,
) -> np.ndarray:
    """(m, ksub, dsub) sub-space codebooks trained by Lloyd k-means on
    a driver-side hash-ordered sample of L2-NORMALIZED vectors (so
    asymmetric distance approximates cosine). Same cost model as
    ``ivf_centroids``: the trainable state is tiny (m*ksub*dsub
    floats), training data is a bounded layout-independent sample, and
    the distributed part is encoding — the right split at 10^12 rows.

    ``cent`` (coarse centroids) switches to RESIDUAL training: each
    sample vector is replaced by its residual against its nearest
    coarse centroid before the sub-space k-means — residual magnitudes
    are far smaller than raw coordinates, so the same m/ksub budget
    quantizes much finer (the standard IVF-PQ refinement; recall
    improvement pinned in tests/test_similarity.py)."""
    x = _sample_matrix(vectors, sample, seed, vec_col, id_col)
    if cent is not None:
        x = x - cent[np.argmax(x @ cent.T, axis=1)]
    dim = x.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.Generator(np.random.Philox(key=[seed, 7]))
    books = np.empty((m, ksub, dsub))
    for s in range(m):
        xs = x[:, s * dsub : (s + 1) * dsub]
        cent = xs[rng.choice(len(xs), size=min(ksub, len(xs)), replace=False)]
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(len(cent)):
                members = xs[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[s] = cent
    return books


def pq_encode(
    vectors: DataFrame,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cent: np.ndarray | None = None,
    residual: bool = False,
) -> DataFrame:
    """(vec_id[, list_id], code: array<int>) — per-vector PQ codes,
    computed in one vectorized Arrow pass (codebooks ride to executors
    inside the closure; they are KB-scale). Codes are what lives in
    memory at serving time: m bytes/vector instead of 4*dim.

    With ``cent`` the SAME pass also emits the nearest-coarse-centroid
    ``list_id`` (1-based, matching ``F.array_position`` semantics) —
    one matrix product per Arrow batch instead of a Catalyst
    expression with n_centroids*dim literals per row plus a
    corpus-sized join of codes back to list assignments. With
    ``residual=True`` each vector encodes its residual x - c against
    that centroid; the decode side then adds the query's coarse dot
    product back (see ``ivf_pq_topk``)."""
    import pyarrow as pa

    m, ksub, dsub = books.shape

    def enc(batches):
        for batch in batches:
            ids = batch.column(0)
            mat = np.array(
                [np.asarray(v, dtype=np.float64) for v in batch.column(1).to_pylist()]
            )
            if len(mat) == 0:
                continue
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            assign = None
            if cent is not None:
                assign = np.argmax(mat @ cent.T, axis=1)
                if residual:
                    mat = mat - cent[assign]
            codes = np.empty((len(mat), m), dtype=np.int32)
            for s in range(m):
                xs = mat[:, s * dsub : (s + 1) * dsub]
                # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; argmin over c
                d2 = -2.0 * (xs @ books[s].T) + (books[s] ** 2).sum(axis=1)[None, :]
                codes[:, s] = np.argmin(d2, axis=1)
            out = {"vec_id": ids}
            if assign is not None:
                out["list_id"] = (assign + 1).astype(np.int32)
            out["code"] = list(codes)
            yield pa.RecordBatch.from_pydict(out)

    schema = (
        "vec_id long, code array<int>"
        if cent is None
        else "vec_id long, list_id int, code array<int>"
    )
    return vectors.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")
    ).mapInArrow(enc, schema)


def ivf_pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    m: int = 4,
    ksub: int = 16,
    refine: int = 50,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
    residual: bool = False,
) -> DataFrame:
    """IVF-PQ approximate cosine top-k with exact refinement:

    1. coarse quantizer assigns every vector to an inverted list
       (``ivf_centroids`` — the partitionable scale axis),
    2. PQ codes give an m-byte in-memory representation scored by
       asymmetric distance (per-query LUT of sub-space dot products —
       one table lookup + add per sub-space, no float vector touched),
    3. the top ``refine`` ADC candidates per query re-score EXACTLY
       against the full vectors (one semi-join back to the vector
       table), which restores exact ranking whenever ADC recall@refine
       covers the true top-k.

    This is the standard big-ANN memory ladder: full vectors on disk,
    codes in memory (4*dim/m compression), LUT scoring per query.
    ``residual=True`` encodes each vector's residual against its
    coarse centroid instead of the raw vector — ADC then scores
    q·c_list + sum(LUT[code]) — same plan shape, finer quantization
    whenever the coarse quantizer captures real cluster structure
    (many lists, clustered embeddings: measured +0.10-0.18 recall at
    the same m/ksub in tests/test_similarity.py). On ISOTROPIC
    vectors the residual is LARGER than the vector (||x - c|| > ||x||
    when x·c is small), so plain PQ wins there — default off; choose
    per corpus shape.
    With nprobe = n_centroids and refine >= corpus size the result is
    exact by construction — the contract's oracle configuration;
    recall at realistic settings is pinned in tests/test_similarity.py.
    """
    import pyarrow as pa

    cent = ivf_centroids(vectors, n_centroids, seed=seed, vec_col=vec_col, id_col=id_col)
    books = pq_codebooks(
        vectors, m=m, ksub=ksub, seed=seed, vec_col=vec_col, id_col=id_col,
        cent=cent if residual else None,
    )

    # ONE Arrow pass emits (vec_id, list_id, code): list assignment
    # rides the encode batch (a matrix product) instead of a Catalyst
    # expression with n_centroids*dim literals per row, and no
    # corpus-sized codes<->list join is needed
    coded = pq_encode(
        vectors, books, id_col=id_col, vec_col=vec_col, cent=cent,
        residual=residual,
    )

    # per-query probe lists + ADC lookup tables (queries are the small
    # side; LUTs are m*ksub doubles each and ship inside the closure)
    q = queries.select(F.col(qid_col).alias("query_id"), F.col(qvec_col).alias("qv"))
    qrows = q.collect()
    dsub = books.shape[2]
    luts = {}
    qdots = {}
    probes = []
    for r in qrows:
        qv = np.asarray(r["qv"], dtype=np.float64)
        qv /= max(np.linalg.norm(qv), 1e-12)
        luts[r["query_id"]] = np.stack(
            [books[s] @ qv[s * dsub : (s + 1) * dsub] for s in range(books.shape[0])]
        )
        sims = cent @ qv
        qdots[r["query_id"]] = sims
        top_lists = np.argsort(-sims, kind="stable")[:nprobe] + 1
        probes.extend((r["query_id"], int(l)) for l in top_lists)
    probe_df = queries.sparkSession.createDataFrame(
        probes, "query_id long, list_id int"
    )

    cand = F.broadcast(probe_df).join(coded, "list_id").select(
        "query_id", "vec_id", "list_id", "code"
    )

    # fully-vectorized ADC kernel: the candidate set is nprobe x
    # list-sized — the one non-tiny array in IVF-PQ — so the kernel
    # must be one fancy-index gather over a stacked LUT tensor, never
    # a per-row Python loop. qids map to LUT rows via searchsorted on
    # the sorted unique query ids (queries are few; candidates many).
    uq = np.array(sorted(luts))
    lut_stack = np.stack([luts[qid] for qid in uq])  # (Q, m, ksub)
    qdot_stack = np.stack([qdots[qid] for qid in uq])  # (Q, n_centroids)
    n_sub = books.shape[0]
    rng_m = np.arange(n_sub)

    def adc(batches):
        for batch in batches:
            col = dict(zip(batch.schema.names, batch.columns))
            qids = col["query_id"].to_numpy(zero_copy_only=False)
            if len(qids) == 0:
                continue
            vids = col["vec_id"].to_numpy(zero_copy_only=False)
            lists = col["list_id"].to_numpy(zero_copy_only=False)
            # fixed-width (m) list column -> one contiguous (n, m) view
            codes_arr = np.asarray(col["code"].flatten()).reshape(-1, n_sub)
            qi = np.searchsorted(uq, qids)
            out = lut_stack[qi[:, None], rng_m[None, :], codes_arr].sum(axis=1)
            if residual:
                # decoded vector = c_list + residual codewords, so the
                # query dot gains the coarse term q . c_list
                out += qdot_stack[qi, lists - 1]
            yield pa.RecordBatch.from_pydict(
                {"query_id": qids, "vec_id": vids, "adc": out}
            )

    adc_scored = cand.mapInArrow(adc, "query_id long, vec_id long, adc double")
    w_adc = Window.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("vec_id"))
    shortlist = (
        adc_scored.withColumn("r", F.row_number().over(w_adc))
        .filter(F.col("r") <= refine)
        .select("query_id", "vec_id")
    )

    # exact re-scoring of the shortlist against the full vectors
    vv = vectors.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("vd")
    ).withColumn("vnorm", _norm(F.col("vd")))
    qq = q.withColumn("qd", _as_double(F.col("qv"))).withColumn(
        "qnorm", _norm(F.col("qd"))
    ).select("query_id", "qd", "qnorm")
    exact = shortlist.join(vv, "vec_id").join(F.broadcast(qq), "query_id").select(
        "query_id",
        "vec_id",
        (_dot(F.col("qd"), F.col("vd")) / (F.col("qnorm") * F.col("vnorm"))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("cosine"), 6)), F.asc("vec_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def filtered_cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    flt,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
) -> DataFrame:
    """(query_id, rank, vec_id, cosine): exact cosine top-k restricted
    to vectors satisfying ``flt`` (a boolean Column over the vectors
    table) — the Elasticsearch ``knn``-with-``filter`` query with
    PRE-filter semantics: the predicate applies DURING the search, so
    every query still gets ``k`` hits if k matches exist (a
    post-filter would silently thin results below k; ES kNN made the
    same call). With ES's HNSW the filter constrains graph traversal;
    here it constrains the scan — Catalyst pushes the predicate into
    the parquet read, so the crossJoin's right side shrinks BEFORE any
    dot products happen, and the cost scales with the filtered
    fraction. For the bucketed scale path, compose the same filter
    into ``lsh_topk``'s candidate table instead."""
    return cosine_topk_bruteforce(
        vectors.filter(flt), queries, k=k,
        id_col=id_col, vec_col=vec_col, qid_col=qid_col, qvec_col=qvec_col,
    )


def quantize_int8(
    vectors: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(vec_id, q8, v): per-vector symmetric int8 scalar quantization
    — the ES/Lucene ``int8`` kNN storage form. scale = max|v_i| / 127,
    q_i = clamp(round(v_i / scale), -127, 127) stored as
    ``array<tinyint>`` (4x smaller than float32, 8x than float64).
    The scale itself needs no storage for COSINE retrieval: it cancels
    in q.qb / (|qa||qb|). All-zero vectors quantize to NULL (they
    have no cosine direction; they are excluded downstream)."""
    v = _as_double(F.col(vec_col))
    s = F.nullif(
        F.aggregate(v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))) / 127.0,
        F.lit(0.0),
    )
    # Spark's least/greatest IGNORE nulls (they return the extreme of
    # the non-null args), so the null scale must short-circuit first —
    # otherwise an all-zero vector would clamp to -127s instead of NULL
    q8 = F.transform(
        v,
        lambda x: F.when(
            (x / s).isNotNull(),
            F.least(F.greatest(F.round(x / s), F.lit(-127.0)), F.lit(127.0)),
        ).cast("byte"),
    )
    return vectors.select(
        F.col(id_col).alias("vec_id"), q8.alias("q8"), v.alias("v")
    )


def _dot8(a, b):
    """Integer dot product of two int8 arrays, accumulated in double
    (max |sum| = dim * 127^2 — exact in double far beyond any real
    embedding dim)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda s, x: s + x,
    )


def int8_knn_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    rescore_window: int = 40,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
) -> DataFrame:
    """(query_id, rank, vec_id, cosine): two-stage quantized kNN — the
    ES ``int8`` quantized-index search with ``rescore``: stage 1 ranks
    by the INT8 cosine (scale-free: the per-vector scales cancel) and
    keeps ``rescore_window`` candidates per query; stage 2 re-scores
    those with exact float cosine and returns the top k. Exact
    whenever the true top-k survive stage 1 (recall pinned in
    tests/test_similarity semantics; rescore_window >= corpus size is
    trivially exact).

    Scale shape: stage 1 scans ONLY the tinyint column — 4x less I/O
    and memory bandwidth than the float scan, the whole point of the
    quantized form at 10^12 vectors — with the same broadcast-queries
    plan as the exact scorer; stage 2 touches float vectors for
    rescore_window rows per query via an id semi-join."""
    vz = quantize_int8(vectors, id_col, vec_col)
    qz = quantize_int8(
        queries.select(
            F.col(qid_col).alias("vec_id"), F.col(qvec_col).alias("embedding")
        )
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("q8").alias("qa"),
        F.col("v").alias("qv"),
    )
    stage1 = (
        F.broadcast(qz.select("query_id", "qa"))
        .crossJoin(vz.select("vec_id", "q8"))
        .select(
            "query_id",
            "vec_id",
            (
                _dot8(F.col("qa"), F.col("q8"))
                / (F.sqrt(_dot8(F.col("qa"), F.col("qa"))) * F.sqrt(_dot8(F.col("q8"), F.col("q8"))))
            ).alias("cos8"),
        )
        .filter(F.col("cos8").isNotNull())
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("cos8"), 6)), F.asc("vec_id")
    )
    cands = stage1.withColumn("crank", F.row_number().over(w1)).filter(
        F.col("crank") <= rescore_window
    )
    exact = (
        cands.select("query_id", "vec_id")
        .join(vz.select("vec_id", "v"), "vec_id")
        .join(F.broadcast(qz.select("query_id", "qv")), "query_id")
        .select(
            "query_id",
            "vec_id",
            (
                _dot(F.col("qv"), F.col("v")) / (_norm(F.col("qv")) * _norm(F.col("v")))
            ).alias("cosine"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("cosine"), 6)), F.asc("vec_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def quantize_binary(
    vectors: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, bwords, v): 1-bit sign quantization — the ES/Lucene
    BBQ-family binary kNN storage form. Component i maps to bit
    (i mod 32) of word (i div 32): 1 when v_i > 0, else 0 (zeros sign
    negative — the rule is pinned so both engines agree). Words are
    32-bit groups carried in BIGINTs, so shifts never touch a sign
    bit in either Spark or the SQL oracle.

    32x smaller than float32: the stage-1 scan reads dim/32 longs per
    row and ranks by Hamming distance — pure bit_count arithmetic,
    the cheapest possible candidate generator at 10^12 vectors.
    Zero-norm vectors are dropped (no direction; same contract as
    the k-means/LSH paths)."""
    n_words = (dim + 31) // 32

    # a 2-arg lambda would make transform() pass (element, index) —
    # the word offset must close over a 1-arg lambda instead.
    # shiftleft needs a literal shift count; pow(2, i) is exact in
    # double through 2^31 (lanes stop at bit 31 by design).
    def _lane(w):
        return lambda i: F.when(
            F.element_at(F.col("v"), F.lit(w * 32 + 1) + i) > 0,
            F.pow(F.lit(2.0), i).cast("long"),
        ).otherwise(F.lit(0).cast("long"))

    v = _as_double(F.col(vec_col))
    words = []
    for w in range(n_words):
        lanes = F.transform(
            F.sequence(F.lit(0), F.lit(min(31, dim - w * 32 - 1))), _lane(w)
        )
        words.append(
            F.aggregate(lanes, F.lit(0).cast("long"), lambda a, x: a.bitwiseOR(x))
        )
    out = vectors.select(F.col(id_col).alias("vec_id"), v.alias("v")).filter(
        _norm(F.col("v")) > 0
    )
    return out.select("vec_id", F.array(*words).alias("bwords"), "v")


def _hamming(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("long")),
        F.lit(0).cast("long"),
        lambda s, x: s + x,
    )


def binary_knn_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    rescore_window: int = 40,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
) -> DataFrame:
    """(query_id, rank, vec_id, hamming, cosine): two-stage binary
    kNN — the ES better-binary-quantization search shape: stage 1
    ranks by Hamming distance over the packed sign bits (asc, vec_id
    asc ties) and keeps ``rescore_window`` candidates per query;
    stage 2 rescores those with exact float cosine and returns the
    top k (round(cos, 6) desc, vec_id asc). Exact whenever the true
    top-k survive stage 1; rescore_window >= corpus size is trivially
    exact. Same broadcast-queries / semi-join-rescore plan as
    ``int8_knn_topk`` with a 32x (not 4x) smaller stage-1 scan."""
    vz = quantize_binary(vectors, dim, id_col, vec_col)
    qz = quantize_binary(
        queries.select(
            F.col(qid_col).alias("vec_id"), F.col(qvec_col).alias("embedding")
        ),
        dim,
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("bwords").alias("qw"),
        F.col("v").alias("qv"),
    )
    stage1 = (
        F.broadcast(qz.select("query_id", "qw"))
        .crossJoin(vz.select("vec_id", "bwords"))
        .select(
            "query_id", "vec_id", _hamming(F.col("qw"), F.col("bwords")).alias("hamming")
        )
    )
    w1 = Window.partitionBy("query_id").orderBy(F.asc("hamming"), F.asc("vec_id"))
    cands = stage1.withColumn("crank", F.row_number().over(w1)).filter(
        F.col("crank") <= rescore_window
    )
    exact = (
        cands.select("query_id", "vec_id", "hamming")
        .join(vz.select("vec_id", "v"), "vec_id")
        .join(F.broadcast(qz.select("query_id", "qv")), "query_id")
        .select(
            "query_id",
            "vec_id",
            "hamming",
            (
                _dot(F.col("qv"), F.col("v")) / (_norm(F.col("qv")) * _norm(F.col("v")))
            ).alias("cosine"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("cosine"), 6)), F.asc("vec_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "hamming", "cosine")
    )
