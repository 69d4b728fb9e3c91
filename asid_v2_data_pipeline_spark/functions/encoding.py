"""Ice-type one-hot encoders as native Spark column expressions.

Re-expresses /root/reference/asip_v2/hot_encoding_utils.py:10-145
(``ice_type``, ``one_hot_binary``, ``one_hot_continous``) as pure
``when``/``greatest`` column algebra — JVM-side, whole-stage-codegen
friendly, no Python UDF in the hot path.  At 100 TB these run inside the
broadcast-join build of the polygon decode (J1), so they only ever touch the
tiny polygon_codes dimension anyway — but keeping them columnar means they
can also be applied per-pixel if needed.

Bug-compatibility (SURVEY.md §7.3 item 2, guarded by ``strict``):

- ``one_hot_binary`` accumulates ``f[icetype-1]``; when ``ice_type(si) == 0``
  (ice-free) Python's ``f[-1]`` wraps to index 2 = multi-year
  (hot_encoding_utils.py:84-87).  ``strict=True`` reproduces the wrap;
  ``strict=False`` skips ice-free stages in the accumulation.
- ``one_hot_continous`` overwrites any accumulated index-0 mass with
  ``1 - sum(result[1:])`` (hot_encoding_utils.py:142-143) — inherent in the
  formula, reproduced exactly.
- np.argmax tie rule = first maximum; ``when`` chains naturally match it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ice_type(stage: Column) -> Column:
    """Stage-of-development -> ice-type index (C1).

    0 -> 0 (ice free), 81-85 -> 1 (young), 86-93 -> 2 (first-year),
    95-97 -> 3 (multi-year), anything else (incl. 94, >=98) -> NULL.
    Mirrors hot_encoding_utils.py:10-41 exactly.
    """
    return (
        F.when(stage == 0, F.lit(0))
        .when((stage >= 81) & (stage <= 85), F.lit(1))
        .when((stage >= 86) & (stage <= 93), F.lit(2))
        .when((stage >= 95) & (stage <= 97), F.lit(3))
    )  # no .otherwise -> NULL


def _fraction_sums(
    pairs: list[tuple[Column, Column]], strict: bool
) -> tuple[Column, Column, Column]:
    """f[0..2] of one_hot_binary: sum partial concentrations per ice type.

    ``f[icetype-1]``: icetype 1->f0, 2->f1, 3->f2 and — strict mode — the
    ice-free icetype 0 wraps to f2 via Python negative indexing
    (hot_encoding_utils.py:84-87).
    """

    def term(ci: Column, si: Column, idx: int) -> Column:
        it = ice_type(si)
        if idx == 2:
            hit = (it == 3) | (it == 0) if strict else (it == 3)
        else:
            hit = it == idx + 1
        return F.when((ci != -9) & hit, ci).otherwise(F.lit(0))

    sums = []
    for idx in range(3):
        total = None
        for ci, si in pairs:
            t = term(ci, si, idx)
            total = t if total is None else total + t
        sums.append(total)
    return sums[0], sums[1], sums[2]


def one_hot_binary(
    ct: Column,
    ca: Column,
    sa: Column,
    cb: Column,
    sb: Column,
    cc: Column,
    sc: Column,
    min_ct: int = 10,
    strict: bool = True,
) -> list[Column]:
    """Binary one-hot encode (C2) -> 4 columns [open/young/first/multi...].

    Semantics of hot_encoding_utils.py:44-95:
    ``ct < min_ct`` -> [1,0,0,0]; else accumulate partial concentrations into
    f by ice type; if ``max(f)==0`` fall back to ``ice_type(sa)`` (may be
    NULL -> all-zero vector) else ``argmax(f)+1`` (first max wins, as
    np.argmax); set result[icetype]=1.
    """
    pairs = [(ca, sa), (cb, sb), (cc, sc)]
    f0, f1, f2 = _fraction_sums(pairs, strict)
    m = F.greatest(f0, f1, f2)
    icetype = F.when(m == 0, ice_type(sa)).otherwise(
        F.when(f0 == m, F.lit(1)).when(f1 == m, F.lit(2)).otherwise(F.lit(3))
    )
    out = []
    for k in range(4):
        col = F.when(ct < min_ct, F.lit(1 if k == 0 else 0)).otherwise(
            F.when(icetype == k, F.lit(1)).otherwise(F.lit(0))
        )
        out.append(col.cast("int"))
    return out


def one_hot_continous(
    ct: Column,
    ca: Column,
    sa: Column,
    cb: Column,
    sb: Column,
    cc: Column,
    sc: Column,
) -> list[Column]:
    """Concentration one-hot encode (C3) -> 4 double columns.

    Semantics of hot_encoding_utils.py:98-145: accumulate ``ci/100`` into
    ``result[ice_type(si)]`` (ice-free index 0 included, no wrap here); if
    all accumulators are zero: ``result[0] = 1 - ct/100`` then, when
    ``ice_type(sa)`` is non-NULL, ``result[ice_type(sa)] = ct/100`` (which
    overwrites index 0 when sa is ice-free); otherwise
    ``result[0] = 1 - sum(result[1:])`` — overwriting any accumulated
    index-0 mass (the reference's quirk, kept verbatim).
    """
    pairs = [(ca, sa), (cb, sb), (cc, sc)]

    def acc(k: int) -> Column:
        total = None
        for ci, si in pairs:
            t = F.when((ci != -9) & (ice_type(si) == k), ci / F.lit(100.0)).otherwise(
                F.lit(0.0)
            )
            total = t if total is None else total + t
        return total

    a0, a1, a2, a3 = (acc(k) for k in range(4))
    allzero = F.greatest(a0, a1, a2, a3) == 0
    it_sa = ice_type(sa)
    ctf = ct / F.lit(100.0)

    r0 = F.when(
        allzero, F.when(it_sa == 0, ctf).otherwise(F.lit(1.0) - ctf)
    ).otherwise(F.lit(1.0) - (a1 + a2 + a3))
    rest = [
        F.when(allzero, F.when(it_sa == k, ctf).otherwise(F.lit(0.0))).otherwise(a)
        for k, a in ((1, a1), (2, a2), (3, a3))
    ]
    return [r0.cast("double")] + [r.cast("double") for r in rest]


def encode_polygon_codes(codes_df, encoding: str = "binary", strict: bool = True):
    """Encode a polygon_codes DataFrame -> (scene, id, oh0..oh3).

    This is the broadcast build side of the polygon-decode join J1
    (reference: map built at archive.py:233-248, applied at
    archive.py:124-142).  Dispatch mirrors archive.py:241-245 (C4).
    """
    c = codes_df
    args = (c.ct, c.ca, c.sa, c.cb, c.sb, c.cc, c.sc)
    if encoding == "binary":
        oh = one_hot_binary(*args, strict=strict)
    elif encoding == "continous":  # misspelling is the reference API
        oh = one_hot_continous(*args)
    else:
        raise ValueError(f"unknown encoding {encoding!r}")
    return c.select(
        "scene", "id", *[o.alias(f"oh{k}") for k, o in enumerate(oh)]
    )
