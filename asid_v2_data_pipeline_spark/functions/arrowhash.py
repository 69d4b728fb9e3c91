"""Arrow-vectorized twins of the char/token hash kernels (guide §4.2).

The engine's deterministic text hashes (``operators.dedup.token_hashes``,
``fingerprint_from_token_hashes``, ``_shingle_hashes_from_token_hashes``,
the MinHash permutation minima) are defined as Catalyst higher-order
functions so the DuckDB oracle can restate them bit-for-bit.  Catalyst
HOFs are CodegenFallback — every lambda step is an interpreted expression
tree walk, so the char-level fold costs ~a dozen virtual calls PER
CHARACTER.  Profiled at sf0.1 (r13 opt round): the tokenize+hash pass is
the dominant term of every curation/dedup/decontam query.

These twins compute the IDENTICAL integer values with NumPy over Arrow
batches — one JVM→Python crossing per stage (the corpus text column is
small next to its compute cost; at 100 TB the crossing is amortized by
``spark.sql.execution.arrow.maxRecordsPerBatch``-sized batches exactly
like the mapInPandas codec kernels).  Exactness argument, pinned by
differential tests (tests/test_arrowhash.py):

- Tokenization: ``functions.text.tokens_py`` is the declared plain-Python
  twin of the ``tokens`` column form (same ``lower()`` + ASCII split
  regex); token characters are drawn from ``[a-z0-9']`` by construction,
  so ``F.ascii`` == ``ord`` on every hashed char.
- The folds are polynomial hashes mod 2**31.  An iterated
  ``(acc*base + x) % 2**31`` fold equals the full polynomial sum mod
  2**31, and 2**31 divides 2**64, so uint64 wraparound arithmetic
  (NumPy's native overflow behavior) followed by one final mask is exact.
- The MinHash permutation map ``(x*a + b) % MERSENNE31`` never overflows:
  x, a < 2**31 so x*a + b < 2**63 — int64-exact, then an ordinary mod.
- Float folds (classifier logit, dot/norm) accumulate LEFT-TO-RIGHT:
  ``np.cumsum`` performs the same sequential IEEE-754 additions as the
  Catalyst ``aggregate`` fold, so the last prefix sum is bit-identical
  (NumPy pairwise summation applies to ``np.sum``, not ``np.cumsum``).

Null/empty semantics mirror the column forms element-for-element (NULL
text -> NULL array; zero tokens -> empty hash array / [0] shingle array),
pinned in the differential tests.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F

MASK31 = (1 << 31) - 1
MOD = 1 << 31
MERSENNE31 = (1 << 31) - 1
COMBINE = 1000003

_MAX_POW = 4096  # powers-of-base table size; token/shingle windows are short


def _pows(base: int, n: int):
    """[base**0, ..., base**(n-1)] mod 2**64 as uint64."""
    import numpy as np

    out = np.empty(n, dtype=np.uint64)
    p = 1
    b = base
    for i in range(n):
        out[i] = p & 0xFFFFFFFFFFFFFFFF
        p = (p * b) & 0xFFFFFFFFFFFFFFFF
    return out


@lru_cache(maxsize=8)
def _pow31():
    return _pows(31, _MAX_POW)


@lru_cache(maxsize=8)
def _pow_combine():
    return _pows(COMBINE, _MAX_POW)


def _token_char_hashes(texts) -> tuple[list, list]:
    """Per-document token-hash arrays for a batch of texts.

    Returns ``(hashes, None_mask)`` where ``hashes[i]`` is an int64
    ndarray of per-token 31-poly char hashes mod 2**31 (None for NULL
    input).  The char pass is fully vectorized: one flat uint32 array of
    code points for the whole batch, per-char ``code * 31**(exp)`` terms
    mod 2**64, segment-summed per token via ``np.add.reduceat``.
    """
    import numpy as np

    from .text import tokens_py

    tok_lists: list[list[str] | None] = [
        None if t is None else tokens_py(t) for t in texts
    ]
    flat: list[str] = []
    counts = np.empty(len(tok_lists), dtype=np.int64)
    for i, tl in enumerate(tok_lists):
        if tl:
            flat.extend(tl)
            counts[i] = len(tl)
        else:
            counts[i] = 0
    if not flat:
        empty = np.empty(0, dtype=np.int64)
        return (
            [None if tl is None else empty for tl in tok_lists],
            tok_lists,
        )
    lens = np.array([len(t) for t in flat], dtype=np.int64)
    joined = "".join(flat)
    codes = np.frombuffer(
        joined.encode("utf-32-le"), dtype=np.uint32
    ).astype(np.uint64)
    ends = np.cumsum(lens)
    starts = ends - lens
    # exponent of 31 for each char: (token_end - 1 - absolute_pos)
    pos = np.arange(len(codes), dtype=np.int64)
    exp = np.repeat(ends, lens) - 1 - pos
    if lens.max(initial=0) > _MAX_POW:
        # fall back to a per-token Python fold for pathological tokens
        th_flat = np.array(
            [_char_fold_py(t) for t in flat], dtype=np.int64
        )
    else:
        terms = codes * _pow31()[exp]
        th_flat = (
            np.add.reduceat(terms, starts) & np.uint64(MASK31)
        ).astype(np.int64)
    out: list = []
    k = 0
    for tl in tok_lists:
        if tl is None:
            out.append(None)
        else:
            c = len(tl)
            out.append(th_flat[k : k + c])
            k += c
    return out, tok_lists


def _char_fold_py(tok: str) -> int:
    acc = 0
    for ch in tok:
        acc = (acc * 31 + ord(ch)) % MOD
    return acc


def _fp_from_th(th) -> int:
    """fingerprint fold: (acc*COMBINE + h) % 2**31 over the full array."""
    import numpy as np

    n = len(th)
    if n == 0:
        return 0
    if n > _MAX_POW:
        acc = 0
        for h in th.tolist():
            acc = (acc * COMBINE + h) % MOD
        return acc
    p = _pow_combine()[:n][::-1]
    return int(
        np.add.reduce(th.astype(np.uint64) * p) & np.uint64(MASK31)
    )


def _shingles_from_th(th, n: int):
    """Distinct (first-occurrence order) n-token shingle hashes; [fold]
    for docs shorter than n tokens — mirrors
    ``dedup._shingle_hashes_from_token_hashes`` (including the NULL-text
    case: the expression's when() falls to the otherwise branch, whose
    fold over a NULL array is NULL, so the result is ``[None]``)."""
    import numpy as np
    import pandas as pd

    if th is None:
        return [None]
    k = len(th)
    if k < n:
        return np.array([_fp_from_th(th)], dtype=np.int64)
    u = th.astype(np.uint64)
    p = _pow_combine()[:n][::-1].copy()
    w = np.lib.stride_tricks.sliding_window_view(u, n)
    vals = ((w * p).sum(axis=1, dtype=np.uint64) & np.uint64(MASK31)).astype(
        np.int64
    )
    return pd.unique(vals)


@lru_cache(maxsize=32)
def _perm_ab(num_perm: int, seed: int = 7):
    import numpy as np

    from ..operators.dedup import _perm_constants

    pairs = _perm_constants(num_perm, seed)
    a = np.array([p[0] for p in pairs], dtype=np.int64)
    b = np.array([p[1] for p in pairs], dtype=np.int64)
    return a, b


def _sig_from_hs(hs, a, b):
    """Per-permutation minima of (x*a + b) % MERSENNE31 — int64-exact."""
    # hs: int64 ndarray (never empty: empty docs carry [0])
    return ((hs[:, None] * a[None, :] + b[None, :]) % MERSENNE31).min(axis=0)


# --- Column-level twins -------------------------------------------------------


@lru_cache(maxsize=4)
def _token_hashes_udf():
    import pandas as pd

    def _fn(texts: pd.Series) -> pd.Series:
        th, _ = _token_char_hashes(texts)
        return pd.Series(th)

    _fn.__name__ = "arrowhash_token_hashes"
    _fn.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return F.pandas_udf(_fn, "array<long>")


def token_hashes_arrow(text: Column) -> Column:
    """Drop-in twin of ``operators.dedup.token_hashes`` (array<long> of
    per-token 31-poly char hashes mod 2**31), vectorized."""
    return _token_hashes_udf()(text)


@lru_cache(maxsize=16)
def _shingle_hashes_udf(n: int):
    import pandas as pd

    def _fn(texts: pd.Series) -> pd.Series:
        th, _ = _token_char_hashes(texts)
        return pd.Series([_shingles_from_th(t, n) for t in th])

    _fn.__name__ = f"arrowhash_shingles_{n}"
    _fn.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return F.pandas_udf(_fn, "array<long>")


def shingle_hashes_arrow(text: Column, n: int = 3) -> Column:
    """Twin of ``dedup.shingle_hashes`` (text -> distinct n-shingle hash
    array) in ONE boundary crossing (tokenize + char hash + fold fused)."""
    return _shingle_hashes_udf(n)(text)


@lru_cache(maxsize=16)
def _hash_block_udf(n1: int, n2: int):
    import pandas as pd

    def _fn(texts: pd.Series) -> pd.DataFrame:
        th, _ = _token_char_hashes(texts)
        fp = [None if t is None else _fp_from_th(t) for t in th]
        h1 = [_shingles_from_th(t, n1) for t in th]
        h2 = [_shingles_from_th(t, n2) for t in th]
        return pd.DataFrame({"fp": fp, "hs1": h1, "hs2": h2})

    _fn.__name__ = f"arrowhash_block_{n1}_{n2}"
    _fn.__annotations__ = {"texts": pd.Series, "return": pd.DataFrame}
    # asNondeterministic (guide §4.4): the value IS deterministic, but
    # the marker stops CollapseProject from inlining the kernel into
    # downstream operators — exact_dedup's Window partition spec would
    # otherwise swallow the UDF, where ExtractPythonUDFs cannot reach
    # it (runtime INTERNAL_ERROR "Cannot evaluate expression") and the
    # optimizer could also duplicate the evaluation per field reference.
    return F.pandas_udf(
        _fn, "struct<fp: long, hs1: array<long>, hs2: array<long>>"
    ).asNondeterministic()


def hash_block(text: Column, n1: int = 3, n2: int = 8) -> Column:
    """The curate-chain tokenize-once block in ONE crossing: struct of
    (fingerprint, n1-shingle hashes, n2-shingle hashes) — exactly the
    three folds ``curate``/``curate_v2`` derive from ``token_hashes``."""
    return _hash_block_udf(n1, n2)(text)


@lru_cache(maxsize=16)
def _minhash_sig_udf(num_perm: int):
    import pandas as pd

    a, b = _perm_ab(num_perm)

    def _fn(hss: pd.Series) -> pd.Series:
        import numpy as np

        nulls = [None] * len(a)  # array_min over []/[None] is NULL

        def one(hs):
            if hs is None:
                return None
            arr = np.asarray(hs)
            if len(arr) == 0 or arr.dtype == object:
                return nulls
            if np.issubdtype(arr.dtype, np.floating):
                # a hash array containing NULLs arrives as float64/NaN;
                # values are < 2**31 so the lossless cast is safe
                if np.isnan(arr).any():
                    return nulls
                arr = arr.astype(np.int64)
            return _sig_from_hs(arr.astype(np.int64), a, b)

        return pd.Series([one(hs) for hs in hss])

    _fn.__name__ = f"arrowhash_minhash_sig_{num_perm}"
    _fn.__annotations__ = {"hss": pd.Series, "return": pd.Series}
    return F.pandas_udf(_fn, "array<long>")


def minhash_sig_arrow(hs: Column, num_perm: int = 16) -> Column:
    """Twin of the ``_perm_min`` signature array over a shingle-hash
    array column — all ``num_perm`` minima in one vectorized pass."""
    return _minhash_sig_udf(num_perm)(hs)


@lru_cache(maxsize=16)
def _clf_sum_udf(weights: tuple, dim: int):
    import pandas as pd

    def _fn(texts: pd.Series) -> pd.DataFrame:
        import numpy as np

        w = np.asarray(weights, dtype=np.float64)
        th, _ = _token_char_hashes(texts)
        s = []
        n = []
        for t in th:
            if t is None:
                s.append(None)
                n.append(None)
            elif len(t) == 0:
                s.append(0.0)
                n.append(0)
            else:
                # cumsum = sequential left-to-right adds (fold-identical)
                s.append(float(np.cumsum(w[t % dim])[-1]))
                n.append(len(t))
        return pd.DataFrame({"s": s, "n": n})

    _fn.__name__ = "arrowhash_clf_sum"
    _fn.__annotations__ = {"texts": pd.Series, "return": pd.DataFrame}
    return F.pandas_udf(_fn, "struct<s: double, n: int>")


def clf_token_sum(text: Column, weights: list[float]) -> Column:
    """struct(s, n): sequential sum over tokens of w[th % dim] plus the
    token count — the classifier logit's fold
    (``classifier._mean_pooled_logit``) with the weight vector in the
    UDF closure instead of a broadcast row."""
    return _clf_sum_udf(tuple(float(x) for x in weights), len(weights))(text)


@lru_cache(maxsize=8)
def _grams_udf(k: int):
    import pandas as pd

    def _fn(toks: pd.Series) -> pd.Series:
        out = []
        for t in toks:
            if t is None:
                # the expression's when() falls through to the empty
                # start array for NULL token arrays
                out.append([])
                continue
            m = len(t) - (k - 1)
            if m <= 0:
                out.append([])
                continue
            tl = list(t)
            out.append([" ".join(tl[i : i + k]) for i in range(m)])
        return pd.Series(out)

    _fn.__name__ = f"arrowhash_grams_{k}"
    _fn.__annotations__ = {"toks": pd.Series, "return": pd.Series}
    return F.pandas_udf(_fn, "array<string>")


def grams_arrow(toks: Column, k: int) -> Column:
    """k-token gram strings (space-joined) per window start, in position
    order — the span detector's window expansion; explode with
    ``posexplode`` for (0-based pos, gram)."""
    return _grams_udf(k)(toks)
