"""Similarity search over embedding columns (SURVEY.md §2.11).

- **Brute-force top-k cosine**: broadcast the (small) query set, compute
  dot/norms with ``zip_with``+``aggregate`` (JVM-side, no Python), rank
  with a per-query window.  Exact; the baseline.
- **LSH-bucketed ANN** (random hyperplanes): sign-bit bucket per vector;
  queries probe only their bucket — the 100 TB path (the bucket groupBy is
  the only shuffle; recall traded for candidate-set size via ``planes``).

Hyperplanes are deterministic (LCG), so results are reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def topk_cosine(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k: for each query vector, the k nearest corpus vectors by
    cosine (ties broken by corpus id for determinism).

    The query side is broadcast — the corpus is scanned once, no shuffle
    until the per-query top-k window (k rows per query after AQE)."""
    # norms computed ONCE per side BEFORE the pair fan-out: scoring a
    # pair is then a single interpreted-HOF dot instead of three — the
    # same dot/(nq·nc) arithmetic, bit-identical values (the discipline
    # every scorer in this module follows).  r13 note (guide §4.2,
    # measured): the Arrow pair_dot/vec_norm kernels were A/B'd here
    # and REVERTED — on the pair fan-out both 64-dim arrays must cross
    # the Python boundary per pair, and the crossing cost exceeded the
    # interpreted fold cost (sim_topk_cosine 0.5 s → 1.7 s); the fused
    # pq_block kernel below is where vectorization pays.
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("_qv"),
        norm(F.col(vec_col)).alias("_qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("_cv"),
        norm(F.col(vec_col)).alias("_cn"),
    )
    scored = c.join(F.broadcast(q), F.col("q_id") != F.col("c_id")).select(
        "q_id",
        "c_id",
        (dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))).alias("score"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", F.col("score").cast("double").alias("score"), "rank")
    )


def _hyperplanes(dim: int, planes: int, seed: int = 11) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in {-1,+1}^dim via an LCG."""
    out, state = [], seed
    for _ in range(planes):
        row = []
        for _ in range(dim):
            state = (state * 1103515245 + 12345) % (1 << 31)
            row.append(1.0 if (state >> 16) & 1 else -1.0)
        out.append(row)
    return out


def lsh_bucket(vec: Column, dim: int, planes: int = 8, seed: int = 11) -> Column:
    """Random-hyperplane LSH bucket id: sign bits of <v, h_i> packed into an
    int."""
    hps = _hyperplanes(dim, planes, seed)
    bucket = F.lit(0).cast("long")
    for i, hp in enumerate(hps):
        d = dot(vec, F.array(*[F.lit(x) for x in hp]))
        bucket = bucket + F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


# above this K, the staged chained-CASE form's expression tree (K nested
# WHENs, each re-staging the running best) outgrows codegen and planning
# budgets; the array-fold form stays one flat expression at any K
_IVF_STAGED_MAX_K = 64


def ivf_assign(
    vectors: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    form: str = "auto",
) -> DataFrame:
    """IVF coarse quantizer: assign each vector to its nearest centroid by
    cosine (ties -> lowest centroid id).  Centroids are a driver-side list
    (K is small); the assignment is a narrow map over the corpus — at
    100 TB, write the output partitioned by ``cell`` so a query touches
    one partition (classic IVF posting lists — ``write_ivf_index``).

    ``form``: ``"staged"`` = K chained strict-``>`` WHENs (fast codegen
    for small K), ``"array"`` = centroids shipped as broadcast DATA (a
    one-row array-of-structs crossJoin) scanned with ``transform`` +
    ``array_max`` + ``array_position`` — constant-size plan at any K
    (a K-sized literal tree would melt Catalyst: measured minutes of
    optimizer time at K=512), ``"pandas"`` = Arrow-batched NumPy
    matmul (BLAS; the fastest large-K compute), ``"auto"`` = staged up
    to K=64, then array.  Forms are equality-tested against each other
    (K=16) and a K=512 run is pinned in tests/test_scale_ops.py."""
    if form == "auto":
        form = "staged" if len(centroids) <= _IVF_STAGED_MAX_K else "array"
    if form == "array":
        return _ivf_assign_array(vectors, centroids, id_col, vec_col)
    if form == "pandas":
        return _ivf_assign_pandas(vectors, centroids, id_col, vec_col)
    if form != "staged":
        raise ValueError(f"unknown assignment form {form!r}")
    # scores staged as COLUMNS in one projection, argmax as a linear
    # array_position over their array — NOT a chained
    # when(s>best, ...).otherwise(best) fold, whose expression tree
    # embeds the previous best twice per centroid and goes O(2^K)
    # (measured: K=16 already stalls Catalyst for minutes)
    v = F.col(vec_col)
    staged = vectors.select(
        F.col(id_col),
        v,
        *[
            cosine(v, F.array(*[F.lit(float(x)) for x in cvec])).alias(
                f"_s{i}"
            )
            for i, (_cid, cvec) in enumerate(centroids)
        ],
    )
    sarr = F.array(*[F.col(f"_s{i}") for i in range(len(centroids))])
    # first occurrence wins array_position ties = the first centroid in
    # the given list, the same tie-break as a strict-> running argmax
    best = F.array_position(sarr, F.array_max(sarr))
    cell = F.element_at(
        F.array(*[F.lit(cid) for cid, _ in centroids]), best.cast("int")
    )
    return staged.select(F.col(id_col), v, cell.alias("cell"))


def _ivf_assign_array(
    vectors: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Large-K assignment form: centroids travel as broadcast DATA — a
    ONE-ROW DataFrame holding the whole centroid table as an
    array-of-structs column, crossJoined in (BroadcastNestedLoopJoin
    over exactly one build row = a map-side constant).  Per corpus row,
    ``transform`` scores every centroid (dot/cn only — the vector's own
    norm is a common positive factor, so the argmax equals the cosine
    argmax), ``array_max`` + ``array_position`` pick the winner.  First
    occurrence wins ties and the array is ascending-cid — the staged
    form's lowest-cid tie-break.  The plan is constant-size in K (a
    K-sized literal tree instead would melt Catalyst — minutes of
    optimizer time at K=512); still a narrow map, no shuffle."""
    import math

    sp = vectors.sparkSession
    cents = sorted(centroids)
    crow = [
        (
            [
                (
                    cid,
                    [float(x) for x in cvec],
                    math.sqrt(sum(float(x) * float(x) for x in cvec)),
                )
                for cid, cvec in cents
            ],
        )
    ]
    cdf = sp.createDataFrame(
        crow,
        "_cents array<struct<cid:int,cv:array<double>,cn:double>>",
    )
    v = F.col(vec_col)
    staged = vectors.crossJoin(F.broadcast(cdf)).select(
        F.col(id_col),
        v,
        F.col("_cents"),
        F.transform("_cents", lambda c: dot(v, c["cv"]) / c["cn"]).alias(
            "_ss"
        ),
    )
    best = F.array_position(F.col("_ss"), F.array_max(F.col("_ss")))
    return staged.select(
        id_col,
        vec_col,
        F.element_at(F.col("_cents"), best.cast("int"))["cid"].alias("cell"),
    )


def _ivf_assign_pandas(
    vectors: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Large-K assignment as an Arrow-batched NumPy matmul: the
    norm-scaled centroid matrix rides the UDF closure (serialized once
    per executor), each batch is one ``V @ C.T`` argmax — BLAS does
    K·dim·batch flops, the fastest compute shape when K·dim is large.
    Ascending-cid rows + NumPy's first-max argmax = the same lowest-cid
    tie-break as the other forms."""
    import numpy as np
    import pandas as pd

    cents = sorted(centroids)
    cids = np.array([cid for cid, _ in cents], dtype=np.int64)
    C = np.array([cvec for _, cvec in cents], dtype=np.float64)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)

    # annotations stay un-stringified here (the module uses
    # `from __future__ import annotations`, under which the type-hint
    # path can't resolve 'pd.Series'), so declare the Series->Series
    # scalar UDF explicitly
    def _assign(vs: "pd.Series") -> "pd.Series":
        V = np.stack(vs.to_numpy())
        return pd.Series(cids[np.argmax(V @ Cn.T, axis=1)].astype(np.int32))

    _assign.__annotations__ = {"vs": pd.Series, "return": pd.Series}
    assign = F.pandas_udf(_assign, "int")

    return vectors.select(
        F.col(id_col), F.col(vec_col), assign(F.col(vec_col)).alias("cell")
    )


def train_centroids_kmeanspp_lite(
    vectors: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Deterministic centroid picker: the k corpus vectors with the lowest
    ids (a seed-free stand-in for k-means — IVF correctness doesn't depend
    on centroid quality, only recall does).  Driver-side k rows."""
    rows = (
        vectors.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    )
    return [(i, list(r[vec_col])) for i, r in enumerate(rows)]


def train_centroids_kmeans(
    vectors: DataFrame,
    k: int,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Distributed Lloyd's k-means for the IVF coarse quantizer
    (cosine-assignment / mean-update — spherical k-means up to the
    irrelevant centroid scale).

    Each iteration: assignment is a narrow map over the corpus with the
    centroids inlined as literals (no shuffle, no Python); the update is
    ``posexplode`` + groupBy(cell, dim) + sum/count — one exchange whose
    key space is k·dim.  Only k·dim aggregates (metadata, e.g.
    16×64 doubles) ever reach the driver, never corpus rows — the
    ``collect`` here is the same centroid-table carve-out every
    distributed k-means has (Spark MLlib's included).  Deterministic:
    init is the k lowest-id vectors, ties in assignment break to the
    lowest centroid id.  Empty cells keep their previous centroid.
    """
    cents = train_centroids_kmeanspp_lite(vectors, k, id_col, vec_col)
    for _ in range(iters):
        assigned = ivf_assign(vectors, cents, id_col, vec_col)
        stats = (
            assigned.select(
                "cell", F.posexplode(F.col(vec_col)).alias("_pos", "_x")
            )
            .groupBy("cell", "_pos")
            .agg(F.sum("_x").alias("_s"), F.count(F.lit(1)).alias("_n"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in stats:
            by_cell.setdefault(r["cell"], {})[r["_pos"]] = r["_s"] / r["_n"]
        cents = [
            (
                cid,
                [m[p] for p in sorted(m)] if (m := by_cell.get(cid)) else old,
            )
            for cid, old in cents
        ]
    return cents


def _query_cells(
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    nprobe: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Query-side IVF probe fan-out: the ``nprobe`` nearest cells per
    query (by centroid cosine), ``nprobe`` rows per query with the query
    vector and its (once-computed) norm attached:
    ``(q_id, _qv, _qn, cell)``."""
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("_qv"),
        norm(F.col(vec_col)).alias("_qn"),
    )
    cell_scores = [
        F.struct(
            cosine(F.col("_qv"), F.array(*[F.lit(float(x)) for x in cvec])).alias("s"),
            F.lit(cid).alias("cell"),
        )
        for cid, cvec in centroids
    ]
    return q.select(
        "q_id",
        "_qv",
        "_qn",
        F.explode(
            F.slice(F.reverse(F.array_sort(F.array(*cell_scores))), 1, nprobe)
        ).alias("_c"),
    ).select("q_id", "_qv", "_qn", F.col("_c.cell").alias("cell"))


def topk_cosine_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    k: int = 5,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probe only the query's ``nprobe`` nearest IVF
    cells.  nprobe=K degenerates to exact search; recall/latency dial."""
    c = ivf_assign(corpus, centroids, id_col, vec_col).select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("_cv"),
        norm(F.col(vec_col)).alias("_cn"),
        "cell",
    )
    qcells = _query_cells(queries, centroids, nprobe, id_col, vec_col)
    scored = c.join(F.broadcast(qcells), "cell").filter(
        F.col("q_id") != F.col("c_id")
    ).select(
        "q_id",
        "c_id",
        (dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))).alias("score"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", F.col("score").cast("double").alias("score"), "rank")
    )


def with_int8_codes(
    df: DataFrame, vec_col: str = "embedding", code_col: str = "_q"
) -> DataFrame:
    """Add symmetric per-vector int8 codes (``code = clamp(round(v/s))``,
    ``s = max|v|/127``) as ``code_col``.  The scale column itself is not
    kept: cosine is scale-invariant, so ADC scoring needs only the codes
    (a dot-product/L2 consumer would keep ``s``).  Two projections so the
    scale binds once (the bind-once HOF discipline of
    ``queries/analysis.py::sim_quantize_int8``, which is this quantizer's
    oracle-checked audit query)."""
    sc = df.withColumn(
        "_adc_s",
        F.greatest(
            F.array_max(F.transform(vec_col, lambda x: F.abs(x))), F.lit(1e-12)
        )
        / F.lit(127.0),
    )
    return sc.withColumn(
        code_col,
        F.transform(
            vec_col,
            lambda x: F.least(
                F.lit(127),
                F.greatest(
                    F.lit(-127), F.round(x / F.col("_adc_s")).cast("int")
                ),
            ),
        ),
    ).drop("_adc_s")


def _rescore_topk(
    approx: DataFrame, full: DataFrame, k: int, rerank: int
) -> DataFrame:
    """The shared two-stage ANN tail: per-query approximate
    top-``rerank`` window over ``approx`` (columns ``q_id, _qv, _qn,
    c_id, _ascore``) → broadcast shortlist id-join against ``full``
    (columns ``c_id, _cv, _cn``) → exact cosine rescore → top-``k``.
    One definition serves the ADC and PQ paths, in-memory and indexed
    (tie-breaks: score desc, c_id asc at both stages).  r13 note: the
    Arrow pair_dot kernel was A/B'd on the rescore and REVERTED — the
    shortlist is queries×rerank rows (~100), so the interpreted fold is
    cheaper than an extra Python stage."""
    wa = Window.partitionBy("q_id").orderBy(
        F.col("_ascore").desc(), F.col("c_id")
    )
    shortlist = (
        approx.withColumn("_arn", F.row_number().over(wa))
        .filter(F.col("_arn") <= rerank)
        .select("q_id", "_qv", "_qn", "c_id")
    )
    rescored = full.join(F.broadcast(shortlist), "c_id").select(
        "q_id",
        "c_id",
        (
            dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))
        ).alias("score"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("c_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q_id", "c_id", F.col("score").cast("double").alias("score"), "rank"
        )
    )


def topk_cosine_ivf_adc(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    k: int = 5,
    nprobe: int = 1,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF + asymmetric distance computation (ADC): candidates in the
    probed cells are scored against **int8 codes** (the query stays
    float), then only the top ``rerank_factor * k`` per query are
    re-scored at full precision — the standard two-stage ANN shape
    (IVF-SQ8 in Faiss terms).

    Why it matters at 100 TB: the hot scan reads the codes table — 4×
    fewer bytes than float32, 8× vs double — and full-precision vectors
    are fetched for only ``queries × rerank`` rows via an equi-join on
    the id (a point-lookup against the id-keyed corpus at scale; the
    shortlist side broadcasts).  int8 rounding error only matters near
    the rank-k boundary, which the re-rank absorbs: recall vs the float
    IVF path is pinned ≥ 0.95 in tests/test_scale_ops.py.

    Plan shape: codes scan → broadcast-join probes on ``cell`` →
    per-query approximate top-``rerank`` (WindowGroupLimit) → broadcast
    shortlist joined back on id → exact rescore → top-k."""
    rerank = max(k, rerank_factor * k)
    codes = with_int8_codes(
        ivf_assign(corpus, centroids, id_col, vec_col), vec_col
    ).select(
        F.col(id_col).alias("c_id"),
        "cell",
        "_q",
        # code norm once per corpus row, not once per candidate pair
        norm(F.transform("_q", lambda x: x.cast("double"))).alias("_qcn"),
    )
    qcells = _query_cells(queries, centroids, nprobe, id_col, vec_col)

    approx = (
        codes.join(F.broadcast(qcells), "cell")
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "_qv",
            "_qn",
            "c_id",
            (
                dot(F.col("_qv"), F.transform("_q", lambda x: x.cast("double")))
                / (F.col("_qn") * F.col("_qcn"))
            ).alias("_ascore"),
        )
    )
    full = corpus.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("_cv"),
        norm(F.col(vec_col)).alias("_cn"),
    )
    return _rescore_topk(approx, full, k, rerank)


def train_pq_codebooks_lite(
    vectors: DataFrame,
    m: int,
    ks: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[tuple[int, list[float]]]]:
    """Deterministic PQ codebooks: subspace ``s``'s codewords are the
    ``ks`` lowest-id vectors' ``s``-th slices (the PQ analogue of
    ``train_centroids_kmeanspp_lite`` — recall depends on codebook
    quality, correctness of the machinery does not, and determinism is
    what lets the DuckDB oracle re-derive every stage).  Swap in per-
    subspace ``train_centroids_kmeans`` over sliced columns for
    production codebooks."""
    rows = vectors.select(id_col, vec_col).orderBy(id_col).limit(ks).collect()
    dim = len(rows[0][vec_col])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    return [
        [
            (j, [float(x) for x in list(r[vec_col])[s * sub : (s + 1) * sub]])
            for j, r in enumerate(rows)
        ]
        for s in range(m)
    ]


def _pq_sub(vec: Column, s: int, sub: int) -> Column:
    return F.slice(vec, s * sub + 1, sub)


def train_pq_codebooks_kmeans(
    vectors: DataFrame,
    m: int,
    ks: int,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[tuple[int, list[float]]]]:
    """Production PQ codebooks: per-subspace Lloyd's k-means under the
    L2 metric (the metric :func:`with_pq_codes` encodes with — training
    and encoding must agree or reconstruction error balloons).

    Per subspace, per iteration: assignment is the same narrow
    L2-argmin map the encoder uses; the update is posexplode +
    groupBy(code, dim) — one exchange whose key space is ks·sub — and
    only ks·sub mean cells reach the driver (the centroid-table
    carve-out).  Deterministic init: the ks lowest-id vectors' slices
    (= the lite codebooks), ties in assignment to the lowest code;
    empty codes keep their previous codeword."""
    books = train_pq_codebooks_lite(vectors, m, ks, id_col, vec_col)
    sub = len(books[0][0][1])
    for s in range(m):
        sliced = vectors.select(
            F.col(id_col).alias("_id"),
            _pq_sub(F.col(vec_col), s, sub).alias("_sv"),
        ).localCheckpoint()  # slice once; reused every iteration
        book = books[s]
        for _ in range(iters):
            cands = F.array(
                *[
                    F.struct(
                        F.aggregate(
                            F.zip_with(
                                F.col("_sv"),
                                F.array(*[F.lit(float(x)) for x in cw]),
                                lambda x, c: (x - c) * (x - c),
                            ),
                            F.lit(0.0).cast("double"),
                            lambda acc, v: acc + v,
                        ).alias("d"),
                        F.lit(j).alias("j"),
                    )
                    for j, cw in book
                ]
            )
            assigned = sliced.withColumn(
                "_code", F.element_at(F.array_sort(cands), 1)["j"]
            )
            stats = (
                assigned.select(
                    "_code", F.posexplode(F.col("_sv")).alias("_pos", "_x")
                )
                .groupBy("_code", "_pos")
                .agg(F.sum("_x").alias("_s"), F.count(F.lit(1)).alias("_n"))
                .collect()
            )
            by_code: dict[int, dict[int, float]] = {}
            for r in stats:
                by_code.setdefault(r["_code"], {})[r["_pos"]] = (
                    r["_s"] / r["_n"]
                )
            book = [
                (
                    j,
                    [mm[p] for p in sorted(mm)]
                    if (mm := by_code.get(j))
                    else old,
                )
                for j, old in book
            ]
        books[s] = book
        # the codebook is driver-side now — the subspace slice's blocks
        # are superseded (r13 opt, guide §5)
        from ..session import release_checkpoint

        release_checkpoint(sliced)
    return books


def with_pq_codes(
    df: DataFrame,
    codebooks: list[list[tuple[int, list[float]]]],
    vec_col: str = "embedding",
    code_col: str = "_pq",
) -> DataFrame:
    """Product-quantize ``vec_col``: per subspace, the L2-nearest
    codeword id (ties -> lowest id), packed as an array of ``m`` small
    ints.  A narrow map — no shuffle, no Python; at 100 TB the persisted
    codes column is ``m`` bytes/row against ``4·dim`` for float32
    (dim=64, m=4 → 64× less index IO)."""
    m = len(codebooks)
    sub = len(codebooks[0][0][1])

    def code_for(s: int) -> Column:
        sv = _pq_sub(F.col(vec_col), s, sub)
        cands = F.array(
            *[
                F.struct(
                    F.aggregate(
                        F.zip_with(
                            sv,
                            F.array(*[F.lit(float(x)) for x in cw]),
                            lambda x, c: (x - c) * (x - c),
                        ),
                        F.lit(0.0).cast("double"),
                        lambda acc, v: acc + v,
                    ).alias("d"),
                    F.lit(j).alias("j"),
                )
                for j, cw in codebooks[s]
            ]
        )
        return F.element_at(F.array_sort(cands), 1)["j"]

    return df.withColumn(code_col, F.array(*[code_for(s) for s in range(m)]))


def pq_decode(
    codes: Column, codebooks: list[list[tuple[int, list[float]]]]
) -> Column:
    """Reconstruct the quantized vector: concat of each subspace's
    selected codeword.  Codebooks ride as literal arrays — fine at
    m·ks·sub in the hundreds; ship them as broadcast DATA (one-row
    array column, the ``_ivf_assign_array`` pattern) past that."""
    parts = []
    for s, book in enumerate(codebooks):
        table = F.array(
            *[F.array(*[F.lit(float(x)) for x in cw]) for _, cw in book]
        )
        parts.append(F.element_at(table, F.element_at(codes, s + 1) + 1))
    return F.concat(*parts)


def topk_cosine_ivf_pq(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    codebooks: list[list[tuple[int, list[float]]]],
    k: int = 5,
    nprobe: int = 1,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ two-stage ANN: candidates in the probed cells are scored
    against their **PQ reconstruction** (m-byte codes, query stays
    float), then the top ``rerank_factor·k`` per query re-score at full
    precision — Faiss's IVFPQ shape on DataFrames.

    vs IVF-SQ8 (``topk_cosine_ivf_adc``): codes shrink from dim bytes to
    m bytes (64 → 4 here), so the hot scan of a persisted codes table
    reads ~16× less; the re-rank absorbs the coarser approximation.
    The approximate score is ``cosine(q, decode(code))`` computed in
    dimension order, so the oracle can re-derive it bit-for-bit from the
    reconstruction (the per-query LUT form — ``m`` table lookups per
    candidate instead of a dim-length dot — is the constant-factor
    production variant of the same values).

    Plan shape mirrors the ADC path: codes scan → broadcast probe join
    on ``cell`` → per-query approximate top-``rerank`` window →
    broadcast shortlist id-join → exact rescore → top-k.

    r13 (guide §4.2): the corpus pipeline — assign → PQ encode →
    decode → reconstruction norm — runs as ONE fused Arrow kernel
    crossing (``functions/arrowvec.py::pq_block``; pre-r13 it was four
    interpreted-HOF passes over every 64-dim vector).  Values
    bit-identical to the HOF chain (tests/test_arrowvec.py);
    ``with_pq_codes``/``pq_decode`` remain the documented oracle
    contracts.  The approximate/exact dots stay interpreted — the A/B
    showed the per-pair array crossing costs more than the fold (see
    ``topk_cosine``)."""
    from ..functions.arrowvec import pq_block

    rerank = max(k, rerank_factor * k)
    blk = pq_block(F.col(vec_col), centroids, codebooks)
    codes = corpus.select(
        F.col(id_col).alias("c_id"), blk.alias("_b")
    ).select(
        "c_id",
        F.col("_b.cell").alias("cell"),
        F.col("_b.vhat").alias("_vhat"),
        F.col("_b.vhn").alias("_vhn"),
    )
    qcells = _query_cells(queries, centroids, nprobe, id_col, vec_col)

    approx = (
        codes.join(F.broadcast(qcells), "cell")
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "_qv",
            "_qn",
            "c_id",
            (
                dot(F.col("_qv"), F.col("_vhat"))
                / (F.col("_qn") * F.col("_vhn"))
            ).alias("_ascore"),
        )
    )
    full = corpus.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("_cv"),
        norm(F.col(vec_col)).alias("_cn"),
    )
    return _rescore_topk(approx, full, k, rerank)


def write_ivf_index(
    corpus: DataFrame,
    centroids: list[tuple[int, list[float]]],
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pq_codebooks: list[list[tuple[int, list[float]]]] | None = None,
) -> None:
    """Persist the IVF index as cell-partitioned parquet posting lists:
    ``partitionBy("cell")`` with the int8 ADC codes, the full-precision
    vector, and its (precomputed) norm per row.  This is the offline
    half of the serving shape the in-memory functions document at
    ``ivf_assign``: a query then reads ONLY its probed cells' partitions
    (static partition pruning — see ``topk_cosine_ivf_adc_indexed``),
    not the corpus.  One keyed exchange on ``cell`` at build time so
    each partition is one file run, then never again."""
    codes = with_int8_codes(
        ivf_assign(corpus, centroids, id_col, vec_col), vec_col
    ).select(
        F.col(id_col),
        F.col(vec_col),
        norm(F.col(vec_col)).alias("_vn"),
        norm(F.transform("_q", lambda x: x.cast("double"))).alias("_qcn"),
        "_q",
        "cell",
    )
    if pq_codebooks is not None:
        # PQ tier rides in the same cells table: _pq (m small ints — the
        # 100 TB hot-scan column) plus the reconstruction norm,
        # precomputed once at build so the probe never re-folds it
        codes = with_pq_codes(codes, pq_codebooks, vec_col)
        codes = codes.withColumn(
            "_vhn", norm(pq_decode(F.col("_pq"), pq_codebooks))
        )
    (
        # reserved _bid=-2 marks the bootstrap build: streaming batch ids
        # start at 0 and ad-hoc appends use -1, so no later write can
        # dynamic-overwrite the base partitions by id collision
        codes.withColumn("_bid", F.lit(-2))
        .repartition(F.col("cell"))
        .write.mode("overwrite")
        .partitionBy("cell", "_bid")
        .parquet(f"{path}/cells")
    )
    # the index is SELF-DESCRIBING: the centroid table that produced the
    # assignment is stored alongside, so a query against this index can
    # never probe with a different quantizer than the one that built it
    # (a silent-recall-loss footgun otherwise)
    sp = corpus.sparkSession
    sp.createDataFrame(
        [(int(cid), [float(x) for x in cvec]) for cid, cvec in centroids],
        "cid int, cvec array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    if pq_codebooks is not None:
        # codebooks stored with the index (same self-description rule as
        # the quantizer): decode at query time can never drift from the
        # codebooks that produced the codes
        sp.createDataFrame(
            [
                (s, int(j), [float(x) for x in cw])
                for s, book in enumerate(pq_codebooks)
                for j, cw in book
            ],
            "s int, j int, cw array<double>",
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/pq_codebooks")
    else:
        # a PQ-less rebuild must fully RETIRE a previous build's PQ tier:
        # a stale codebooks sidecar would make read_pq_codebooks report a
        # tier the fresh cells don't carry, so append_ivf_index attaches
        # _pq only to appended partitions and the PQ-indexed probe then
        # scores base rows as NULL — silently returning appended rows
        # only (ADVICE r5)
        from ..sources.fsio import get_fs

        fs = get_fs(sp, path)
        if fs.exists(f"{path}/pq_codebooks"):
            fs.delete(f"{path}/pq_codebooks", recursive=True)


def read_ivf_index(spark, path: str) -> DataFrame:
    spark.catalog.refreshByPath(f"{path}/cells")
    return spark.read.parquet(f"{path}/cells")


def read_ivf_centroids(spark, path: str) -> list[tuple[int, list[float]]]:
    """The centroid table the index was built with (written by
    ``write_ivf_index``) — the default quantizer for queries against
    this index."""
    spark.catalog.refreshByPath(f"{path}/centroids")
    rows = spark.read.parquet(f"{path}/centroids").collect()
    return sorted((r["cid"], list(r["cvec"])) for r in rows)


def read_pq_codebooks(
    spark, path: str
) -> list[list[tuple[int, list[float]]]] | None:
    """The PQ codebooks stored with the index (None when the index was
    built without a PQ tier).

    Existence goes through the filesystem shim (sources/fsio.py —
    Hadoop FS on classic PySpark, local fallback under Spark Connect),
    not os.path: the index lives wherever Spark writes (HDFS/S3/local);
    a local-only check would silently report "no PQ tier" on object
    stores and let ``append_ivf_index`` write code-less rows (exactly
    the schema drift the stored codebooks exist to prevent)."""
    from ..sources.fsio import get_fs

    if not get_fs(spark, path).exists(f"{path}/pq_codebooks"):
        return None
    spark.catalog.refreshByPath(f"{path}/pq_codebooks")
    rows = spark.read.parquet(f"{path}/pq_codebooks").collect()
    books: dict[int, list[tuple[int, list[float]]]] = {}
    for r in rows:
        books.setdefault(r["s"], []).append((r["j"], list(r["cw"])))
    return [sorted(books[s]) for s in sorted(books)]


def topk_cosine_ivf_pq_indexed(
    spark,
    index_path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 1,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``topk_cosine_ivf_pq`` against the PERSISTED index: probed cells
    pushed as a static partition filter (same pruning evidence as the
    ADC path), the approximate scan reads ONLY ``(id, cell, _pq, _vhn)``
    — m bytes of code per row instead of the dim-length int8 (or float)
    column, the whole point of the PQ tier — and decodes against the
    codebooks STORED WITH the index.  Full-precision rescore via
    broadcast shortlist id-join, identical to the in-memory path.

    Serving latency (r13 opt, tightened r14 — VERDICT r13 item 7): the
    query-side fan-out is COLLECTED once (it is bounded by the serving
    contract: |queries| × nprobe rows) in the same driver round-trip
    that yields the probed-cell set, and re-enters the plan as a LOCAL
    relation — so the approximate scan's broadcast builds from driver
    memory with NO extra job.  r13 shape paid a checkpoint job + a
    distinct-collect job for the same rows.  The centroid read + fan-out
    chain overlaps the codebook read on a 2-thread pool (guide §2.6).
    Results identical — same quantizer, same rows."""
    from concurrent.futures import ThreadPoolExecutor

    def _cells_and_probes():
        cents = read_ivf_centroids(spark, index_path)
        qc = _query_cells(queries, cents, nprobe, id_col, vec_col)
        return qc.schema, qc.collect()

    with ThreadPoolExecutor(max_workers=2) as pool:
        cells_f = pool.submit(_cells_and_probes)
        books_f = pool.submit(read_pq_codebooks, spark, index_path)
        (q_schema, q_rows), books = cells_f.result(), books_f.result()
    if books is None:
        raise ValueError(f"index at {index_path} has no PQ tier")
    rerank = max(k, rerank_factor * k)
    qcells = spark.createDataFrame(q_rows, q_schema)
    probed = sorted({r["cell"] for r in q_rows})
    idx = read_ivf_index(spark, index_path)
    codes = (
        idx.filter(F.col("cell").isin(probed))
        .select(F.col(id_col).alias("c_id"), "cell", "_pq", "_vhn")
        .withColumn("_vhat", pq_decode(F.col("_pq"), books))
    )
    approx = (
        codes.join(F.broadcast(qcells), "cell")
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "_qv",
            "_qn",
            "c_id",
            (
                dot(F.col("_qv"), F.col("_vhat"))
                / (F.col("_qn") * F.col("_vhn"))
            ).alias("_ascore"),
        )
    )
    full = idx.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("_cv"),
        F.col("_vn").alias("_cn"),
    )
    return _rescore_topk(approx, full, k, rerank)


def topk_cosine_ivf_adc_indexed(
    spark,
    index_path: str,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]] | None = None,
    k: int = 5,
    nprobe: int = 1,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``topk_cosine_ivf_adc`` against the PERSISTED index: the probed
    cells are collected driver-side (at most K values — centroid-table
    sized by construction) and pushed as a static ``cell IN (...)``
    partition filter, so the approximate scan reads only the probed
    partitions' files (asserted via ``inputFiles`` in
    tests/test_scale_ops.py).  The full-precision rescore reads the
    index column-pruned to ``(id, vec, _vn)`` joined on the broadcast
    shortlist — a point-lookup-shaped fetch, never a corpus shuffle.
    Results are identical to the in-memory path (equality-tested).

    ``centroids=None`` (the default) loads the quantizer STORED WITH
    the index — probing with the builder's own centroid table by
    construction; pass centroids explicitly only to deliberately
    override."""
    if centroids is None:
        centroids = read_ivf_centroids(spark, index_path)
    rerank = max(k, rerank_factor * k)
    # r14: one driver round-trip yields the fan-out rows AND the probed
    # cells; the fan-out re-enters as a local relation so the broadcast
    # costs no job (see the PQ twin)
    qc = _query_cells(queries, centroids, nprobe, id_col, vec_col)
    q_rows = qc.collect()
    qcells = spark.createDataFrame(q_rows, qc.schema)
    probed = sorted({r["cell"] for r in q_rows})
    idx = read_ivf_index(spark, index_path)
    codes = idx.filter(F.col("cell").isin(probed)).select(
        F.col(id_col).alias("c_id"), "cell", "_q", "_qcn"
    )
    approx = (
        codes.join(F.broadcast(qcells), "cell")
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "_qv",
            "_qn",
            "c_id",
            (
                dot(F.col("_qv"), F.transform("_q", lambda x: x.cast("double")))
                / (F.col("_qn") * F.col("_qcn"))
            ).alias("_ascore"),
        )
    )
    full = idx.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("_cv"),
        F.col("_vn").alias("_cn"),
    )
    return _rescore_topk(approx, full, k, rerank)


def _perturbation_sets(planes: int, nprobe: int) -> list[tuple[int, ...]]:
    """Multi-probe LSH probe sequence: subsets of sorted-margin POSITIONS
    (0 = smallest |margin|), cheapest first — cost of a subset is the sum
    of (position+1), the standard proxy for the chance the true neighbor
    flipped exactly those planes.  First pattern is the empty set (the
    base bucket)."""
    from itertools import combinations

    all_pats: list[tuple[int, ...]] = []
    for r in range(1, planes + 1):
        all_pats.extend(combinations(range(planes), r))
    all_pats.sort(key=lambda c: (sum(i + 1 for i in c), len(c), c))
    return [()] + all_pats[: max(0, nprobe - 1)]


def _query_probes(
    queries: DataFrame,
    dim: int,
    planes: int,
    nprobe: int,
    seed: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """The query-side probe fan-out for one hyperplane table: the base
    bucket plus (multi-probe) the buckets reached by flipping the query's
    lowest-|margin| sign bits.  Returns ``(q_id, _qv, _bucket)`` —
    ``nprobe`` rows per query."""
    hps = _hyperplanes(dim, planes, seed)
    # stage the per-plane dots once; base bucket + margins reuse them
    qd = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("_qv"),
        norm(F.col(vec_col)).alias("_qn"),
        *[
            dot(F.col(vec_col), F.array(*[F.lit(x) for x in hp])).alias(f"_d{i}")
            for i, hp in enumerate(hps)
        ],
    )
    base = F.lit(0).cast("long")
    for i in range(planes):
        base = base + F.when(F.col(f"_d{i}") >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    margins = F.array(
        *[
            F.struct(F.abs(F.col(f"_d{i}")).alias("m"), F.lit(i).alias("i"))
            for i in range(planes)
        ]
    )
    staged = qd.select(
        "q_id",
        "_qv",
        "_qn",
        base.alias("_base"),
        F.array_sort(margins).alias("_sorted"),  # ascending |margin|
    )

    # perturbation sets are STATIC over sorted-margin positions (which
    # plane a position names varies per query); per-pattern bucket = base
    # XOR the named planes' bits — multi-bit flips, unrolled driver-side
    def probe_expr(pattern: tuple[int, ...]):
        b = F.col("_base")
        for pos in pattern:
            b = b.bitwiseXOR(
                F.pow(
                    F.lit(2.0),
                    F.element_at(F.col("_sorted"), pos + 1)["i"].cast("double"),
                ).cast("long")
            )
        return b

    pats = _perturbation_sets(planes, nprobe)
    return staged.select(
        "q_id",
        "_qv",
        "_qn",
        F.explode(F.array(*[probe_expr(p) for p in pats])).alias("_bucket"),
    )


def topk_cosine_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    planes: int = 8,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
) -> DataFrame:
    """Approximate top-k: probe the query's hyperplane bucket, plus
    (multi-probe, ``nprobe > 1``) the ``nprobe - 1`` buckets reached by
    flipping the query's LOWEST-MARGIN sign bits — the hyperplanes whose
    dot product is closest to zero, i.e. exactly the ones a true neighbor
    most plausibly landed on the other side of.  Multi-probe lifts recall
    without adding planes or re-bucketing the corpus: each corpus vector
    still lives in ONE bucket; only the (small, broadcast) query side
    fans out, so a query touches ``nprobe`` partitions instead of 1.

    Recall < 1 by construction — the exact ``topk_cosine`` is the
    correctness oracle (pinned recall floor in tests/test_scale_ops.py).
    """
    c = corpus.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("_cv"),
        norm(F.col(vec_col)).alias("_cn"),
        lsh_bucket(F.col(vec_col), dim, planes, seed).alias("_bucket"),
    )
    q = _query_probes(queries, dim, planes, nprobe, seed, id_col, vec_col)
    # a corpus vector lives in exactly one bucket and probes are distinct,
    # so (q_id, c_id) pairs cannot duplicate across probes
    scored = c.join(F.broadcast(q), "_bucket").filter(
        F.col("q_id") != F.col("c_id")
    ).select(
        "q_id",
        "c_id",
        (dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))).alias("score"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", F.col("score").cast("double").alias("score"), "rank")
    )


def lsh_table_candidates(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    planes: int = 8,
    tables: int = 2,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
) -> DataFrame:
    """AND-OR amplified candidate generation: AND within a table (all
    ``planes`` sign bits must agree — one bucket), OR across ``tables``
    independent hyperplane tables (per-table seed ``seed + 101*t``).

    If a single plane agrees with probability p, a table matches with
    p^planes and the OR over T tables with 1 - (1-p^planes)^T — recall
    amplification at fixed per-table selectivity (standard LSH
    amplification; candidate volume ≈ T·nprobe buckets per query vs
    ``nprobe`` for one table).

    Scale shape: each corpus vector lands in ONE bucket PER TABLE (a
    narrow explode to T rows — no shuffle); the (small) query side is
    broadcast with T·nprobe probes; the equi-join on (table, bucket)
    never shuffles the corpus.  Returns distinct candidate pairs with
    vectors attached: ``(q_id, c_id, _qv, _cv)``.
    """
    entries = F.array(
        *[
            F.struct(
                F.lit(t).alias("t"),
                lsh_bucket(F.col(vec_col), dim, planes, seed + 101 * t).alias("b"),
            )
            for t in range(tables)
        ]
    )
    c = (
        corpus.select(
            F.col(id_col).alias("c_id"),
            F.col(vec_col).alias("_cv"),
            norm(F.col(vec_col)).alias("_cn"),
            F.explode(entries).alias("_e"),
        )
        .select(
            "c_id",
            "_cv",
            "_cn",
            F.col("_e.t").alias("_table"),
            F.col("_e.b").alias("_bucket"),
        )
    )
    probes = [
        _query_probes(
            queries, dim, planes, nprobe, seed + 101 * t, id_col, vec_col
        ).withColumn("_table", F.lit(t))
        for t in range(tables)
    ]
    q = probes[0]
    for p in probes[1:]:
        q = q.unionByName(p)
    return (
        c.join(F.broadcast(q), ["_table", "_bucket"])
        .filter(F.col("q_id") != F.col("c_id"))
        # the same pair can surface from several tables — dedupe before
        # scoring (vectors are functionally dependent on the ids)
        .dropDuplicates(["q_id", "c_id"])
        .select("q_id", "c_id", "_qv", "_cv", "_qn", "_cn")
    )


def topk_cosine_lsh_tables(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    planes: int = 8,
    tables: int = 2,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
) -> DataFrame:
    """Approximate top-k over AND-OR amplified LSH candidates
    (``lsh_table_candidates``): higher recall than single-table
    multi-probe at a comparable candidate budget (pinned in
    tests/test_scale_ops.py)."""
    cand = lsh_table_candidates(
        corpus, queries, dim, planes, tables, nprobe, id_col, vec_col, seed
    )
    scored = cand.select(
        "q_id",
        "c_id",
        (dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))).alias("score"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", F.col("score").cast("double").alias("score"), "rank")
    )


def random_project(
    vec: Column, in_dim: int, out_dim: int, seed: int = 23
) -> Column:
    """Johnson-Lindenstrauss random projection to ``out_dim`` dimensions:
    ``r[j] = <v, s_j> / sqrt(out_dim)`` with deterministic ±1 sign rows
    (Achlioptas 2003 database-friendly projections; the same LCG sign
    stream as ``_hyperplanes``, so the DuckDB oracle reproduces the matrix
    exactly).

    Pure column expression — ``in_dim·out_dim`` fused multiply-adds per
    row inside whole-stage codegen, zero shuffle, zero Python.  Use
    ``out_dim`` a power of four so the ``1/sqrt(out_dim)`` scale is an
    exact binary double (0.25, 0.0625, …) and both engines multiply by the
    identical constant."""
    rows = _hyperplanes(in_dim, out_dim, seed)
    scale = out_dim ** -0.5
    return F.array(
        *[
            (dot(vec, F.array(*[F.lit(x) for x in row])) * F.lit(scale))
            for row in rows
        ]
    )


def append_ivf_index(
    spark,
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch_id: int | None = None,
) -> dict:
    """Incremental IVF maintenance: admit a batch of NEW vectors into
    the persisted index WITHOUT rebuilding it — assign them with the
    index's own stored quantizer, derive their codes/norms, and append
    into only the touched ``cell=`` partitions (parquet append under
    ``partitionBy``; untouched cells' files are never rewritten or even
    listed).  The 100 TB ingest shape: per batch, one narrow assignment
    pass over the batch plus one keyed exchange on its cells.

    Returns ``{"appended": n, "touched_cells": k}``.  New ids are NOT
    deduplicated against the existing index (same contract as any
    append sink — dedupe upstream); centroids are frozen, so cell
    balance can drift under distribution shift — retrain + rebuild when
    recall telemetry says so.  Accumulated small files per cell are
    exactly the `sources/compact.py` case; run ``compact_parquet_dir``
    on hot cell dirs in the same maintenance window.

    ``batch_id`` (for streaming / retried callers): rows land under a
    ``(cell, _bid=batch_id)`` partition via DYNAMIC partition
    overwrite — the assignment is deterministic, so a replayed batch
    rewrites exactly its own partitions and the index converges to the
    same state (the at-least-once -> exactly-once discipline of
    ``streaming/dedup_stream.py``).  ``batch_id=None`` is a plain
    ad-hoc append (``_bid=-1``), NOT idempotent under retry."""
    centroids = read_ivf_centroids(spark, path)
    codes = with_int8_codes(
        ivf_assign(new_vectors, centroids, id_col, vec_col), vec_col
    ).select(
        F.col(id_col),
        F.col(vec_col),
        norm(F.col(vec_col)).alias("_vn"),
        norm(F.transform("_q", lambda x: x.cast("double"))).alias("_qcn"),
        "_q",
        "cell",
    )
    # an index built with a PQ tier keeps it through appends — encode
    # with the STORED codebooks so appended rows stay queryable by the
    # PQ path (schema drift between base and appended partitions would
    # silently null out their codes otherwise)
    books = read_pq_codebooks(spark, path)
    if books is not None:
        codes = with_pq_codes(codes, books, vec_col)
        codes = codes.withColumn(
            "_vhn", norm(pq_decode(F.col("_pq"), books))
        )
    codes = codes.withColumn(
        "_bid", F.lit(-1 if batch_id is None else int(batch_id))
    ).localCheckpoint()  # stats + write from one assignment
    stats = codes.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("cell").alias("k"),
    ).first()
    writer = codes.repartition(F.col("cell")).write.partitionBy(
        "cell", "_bid"
    )
    if batch_id is None:
        writer.mode("append").parquet(f"{path}/cells")
    else:
        # the WRITER-level option, not session conf: foreachBatch hands
        # callers a cloned SparkSession, so a conf set on the outer
        # session would not reach this write (observed: the overwrite
        # then runs static and wipes the whole table)
        writer.option("partitionOverwriteMode", "dynamic").mode(
            "overwrite"
        ).parquet(f"{path}/cells")
    spark.catalog.refreshByPath(f"{path}/cells")
    # stats taken and cells written — the staging checkpoint is spent
    # (r13 opt, guide §5)
    from ..session import release_checkpoint

    release_checkpoint(codes)
    return {"appended": stats["n"], "touched_cells": stats["k"]}
