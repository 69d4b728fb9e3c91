"""Arrow-vectorized twins of the embedding fold kernels (guide §4.2).

The similarity operators define ``dot``/``norm``/PQ-encode as Catalyst
higher-order functions (``zip_with`` + ``aggregate``) so the DuckDB
oracle can restate the arithmetic bit-for-bit.  Catalyst HOFs are
CodegenFallback: every *dimension* of every vector pays an interpreted
expression-tree walk, and the IVF-PQ corpus pipeline (assign → encode →
decode → norm) walks each 64-dim vector dozens of times.  Profiled at
sf0.1 (r13): the 2000-row embeddings table costs ~1 s per stage purely
in interpreted evaluation.

These twins compute IDENTICAL doubles with NumPy over Arrow batches —
one JVM→Python crossing per stage.  Exactness argument (pinned by
differential tests, tests/test_arrowvec.py):

- Every float fold accumulates LEFT-TO-RIGHT over dimensions: the
  kernels loop over dims and vectorize over ROWS (``acc = acc + x_j*y_j``
  column-at-a-time), so each row's additions happen in the same
  IEEE-754 order as the Catalyst ``aggregate`` fold — bit-identical,
  never ``np.dot``/``np.sum`` (pairwise/SIMD order differs).
- Scalar centroid/codeword norms are folded sequentially in Python
  float64 — same operation sequence as the per-row interpreted fold
  over a literal array.
- Tie-breaks mirror the expression forms exactly: IVF cell =
  ``array_position(scores, array_max(scores))`` = first occurrence of
  the max with NaN greatest (kernel: NaN→+inf substitution + first-max
  ``argmax``); PQ code = ``element_at(array_sort((d, j)), 1).j`` =
  lowest j on distance ties with NaN greatest (kernel: NaN→+inf +
  first-min ``argmin`` over ascending-j rows).
- NULL vectors map to NULL outputs (the HOF forms propagate NULL);
  empty arrays fold to the init value (0.0 → norm 0.0, dot 0.0);
  length-mismatched pairs yield NULL (``zip_with`` pads with NULL,
  poisoning the fold) — all mirrored element-for-element.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F


def _rows_matrix(vs):
    """(matrix, idx) for the non-null, uniform-length fast path — or
    (None, None) to signal the per-row fallback."""
    import numpy as np

    arrs = [None if v is None else np.asarray(v, dtype=np.float64) for v in vs]
    lens = {a.shape[0] for a in arrs if a is not None}
    if len(lens) != 1:
        return arrs, None
    (d,) = lens
    idx = [i for i, a in enumerate(arrs) if a is not None]
    if not idx:
        return arrs, None
    m = np.empty((len(idx), d), dtype=np.float64)
    for r, i in enumerate(idx):
        m[r] = arrs[i]
    return arrs, (m, idx)


def _seq_norm_rows(m):
    """sqrt of the left-to-right sum of squares, per row (dim loop keeps
    the fold's IEEE order; rows vectorize)."""
    import numpy as np

    acc = np.zeros(m.shape[0], dtype=np.float64)
    for j in range(m.shape[1]):
        x = m[:, j]
        acc = acc + x * x
    return np.sqrt(acc)


def _seq_dot_rows(a, b):
    import numpy as np

    acc = np.zeros(a.shape[0], dtype=np.float64)
    for j in range(a.shape[1]):
        acc = acc + a[:, j] * b[:, j]
    return acc


def _seq_norm_one(vec) -> float:
    acc = 0.0
    for x in vec:
        acc = acc + float(x) * float(x)
    import math

    return math.sqrt(acc)


@lru_cache(maxsize=4)
def _vec_norm_udf():
    import pandas as pd

    def _fn(vs: pd.Series) -> pd.Series:
        arrs, fast = _rows_matrix(vs)
        out = [None] * len(arrs)
        if fast is not None:
            m, idx = fast
            ns = _seq_norm_rows(m)
            for r, i in enumerate(idx):
                out[i] = float(ns[r])
        else:
            for i, a in enumerate(arrs):
                if a is not None:
                    out[i] = _seq_norm_one(a)
        return pd.Series(out, dtype="float64")

    _fn.__name__ = "arrowvec_norm"
    _fn.__annotations__ = {"vs": pd.Series, "return": pd.Series}
    return F.pandas_udf(_fn, "double")


def vec_norm(v: Column) -> Column:
    """Twin of ``similarity.norm`` (sequential sum-of-squares fold →
    sqrt) in one vectorized crossing."""
    return _vec_norm_udf()(v)


@lru_cache(maxsize=4)
def _pair_dot_udf():
    import numpy as np
    import pandas as pd

    def _fn(av: pd.Series, bv: pd.Series) -> pd.Series:
        n = len(av)
        out = [None] * n
        a_arrs = [
            None if v is None else np.asarray(v, dtype=np.float64) for v in av
        ]
        b_arrs = [
            None if v is None else np.asarray(v, dtype=np.float64) for v in bv
        ]
        # group rows by (len_a == len_b) dimension for matrix batching
        groups: dict[int, list[int]] = {}
        for i, (a, b) in enumerate(zip(a_arrs, b_arrs)):
            if a is None or b is None or a.shape[0] != b.shape[0]:
                continue  # zip_with pads -> NULL fold
            groups.setdefault(a.shape[0], []).append(i)
        for d, idx in groups.items():
            if d == 0:
                for i in idx:
                    out[i] = 0.0
                continue
            A = np.empty((len(idx), d), dtype=np.float64)
            B = np.empty((len(idx), d), dtype=np.float64)
            for r, i in enumerate(idx):
                A[r] = a_arrs[i]
                B[r] = b_arrs[i]
            s = _seq_dot_rows(A, B)
            for r, i in enumerate(idx):
                out[i] = float(s[r])
        return pd.Series(out, dtype="float64")

    _fn.__name__ = "arrowvec_dot"
    _fn.__annotations__ = {
        "av": pd.Series,
        "bv": pd.Series,
        "return": pd.Series,
    }
    return F.pandas_udf(_fn, "double")


def pair_dot(a: Column, b: Column) -> Column:
    """Twin of ``similarity.dot`` (sequential zip-multiply fold) in one
    vectorized crossing — used on joined (query, candidate) rows."""
    return _pair_dot_udf()(a, b)


@lru_cache(maxsize=16)
def _pq_block_udf(cents_key, books_key):
    import numpy as np
    import pandas as pd

    cents = [(cid, np.asarray(cv, dtype=np.float64)) for cid, cv in cents_key]
    cids = np.asarray([cid for cid, _ in cents], dtype=np.int64)
    cmat = np.stack([cv for _, cv in cents])  # K × dim
    cnorms = np.asarray([_seq_norm_one(cv) for _, cv in cents])
    books = [
        [(j, np.asarray(cw, dtype=np.float64)) for j, cw in book]
        for book in books_key
    ]
    m = len(books)
    sub = books[0][0][1].shape[0] if m else 0
    book_mats = [np.stack([cw for _, cw in book]) for book in books]  # ks × sub

    def _fn(vs: pd.Series) -> pd.DataFrame:
        arrs, fast = _rows_matrix(vs)
        n = len(arrs)
        cell = [None] * n
        pq = [None] * n
        vhat = [None] * n
        vhn = [None] * n
        if fast is not None:
            V, idx = fast
            nv = _seq_norm_rows(V)
            # IVF cell: cosine per centroid, sequential dot over dims
            S = np.empty((V.shape[0], cmat.shape[0]), dtype=np.float64)
            for k in range(cmat.shape[0]):
                dv = np.zeros(V.shape[0], dtype=np.float64)
                for j in range(V.shape[1]):
                    dv = dv + V[:, j] * cmat[k, j]
                S[:, k] = dv / (nv * cnorms[k])
            key = np.where(np.isnan(S), np.inf, S)
            best = np.argmax(key, axis=1)
            cells = cids[best]
            # PQ codes: per subspace, sequential L2 fold per codeword
            codes = np.empty((V.shape[0], m), dtype=np.int64)
            for s in range(m):
                sl = V[:, s * sub : (s + 1) * sub]
                D = np.empty((V.shape[0], book_mats[s].shape[0]))
                for j_cw in range(book_mats[s].shape[0]):
                    acc = np.zeros(V.shape[0], dtype=np.float64)
                    for j in range(sub):
                        dlt = sl[:, j] - book_mats[s][j_cw, j]
                        acc = acc + dlt * dlt
                    D[:, j_cw] = acc
                codes[:, s] = np.argmin(
                    np.where(np.isnan(D), np.inf, D), axis=1
                )
            # decode + reconstruction norm
            Vh = np.concatenate(
                [book_mats[s][codes[:, s]] for s in range(m)], axis=1
            )
            nh = _seq_norm_rows(Vh)
            for r, i in enumerate(idx):
                cell[i] = int(cells[r])
                pq[i] = codes[r]
                vhat[i] = Vh[r]
                vhn[i] = float(nh[r])
        else:
            for i, a in enumerate(arrs):
                if a is None:
                    continue
                one = pd.Series([a])
                blk = _fn(one)
                cell[i] = blk["cell"][0]
                pq[i] = blk["pq"][0]
                vhat[i] = blk["vhat"][0]
                vhn[i] = blk["vhn"][0]
        return pd.DataFrame(
            {"cell": cell, "pq": pq, "vhat": vhat, "vhn": vhn}
        )

    _fn.__name__ = f"arrowvec_pq_block_{len(cents_key)}_{len(books_key)}"
    _fn.__annotations__ = {"vs": pd.Series, "return": pd.DataFrame}
    # asNondeterministic: stops CollapseProject from inlining the kernel
    # into downstream field extractions (it would otherwise be
    # duplicated once per referenced field — guide §4.4)
    return F.pandas_udf(
        _fn,
        "struct<cell: int, pq: array<int>, vhat: array<double>, vhn: double>",
    ).asNondeterministic()


def _freeze(x):
    return tuple(
        (k, tuple(float(v) for v in vec)) for k, vec in x
    )


def pq_block(
    v: Column,
    centroids: list[tuple[int, list[float]]],
    codebooks: list[list[tuple[int, list[float]]]],
) -> Column:
    """The IVF-PQ corpus pipeline in ONE crossing: struct of
    (cell, pq codes, reconstruction, reconstruction norm) — exactly the
    four values ``topk_cosine_ivf_pq`` derives via
    ``ivf_assign`` → ``with_pq_codes`` → ``pq_decode`` → ``norm``."""
    return _pq_block_udf(
        _freeze(centroids), tuple(_freeze(b) for b in codebooks)
    )(v)
