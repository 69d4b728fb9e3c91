"""Shared MP3 oracle-SQL constructors (r12, split with the fixture
builders out of ``queries/audio.py``): the DuckDB twins that replay
the Layer III bitstream arithmetic (frame geometry, scalefactors,
stereo decorrelation) straight from the documents table.  Sources are
byte-identical to their pre-split form; ``all_oracles()`` strings are
unchanged.
"""

from __future__ import annotations

from .media import _CODES_CTE_SQL

# audio-stats admission thresholds + the fixture global_gain: shared
# by the query kernels in queries/audio.py and the oracle SQL here
_AC_CLIP = 20000  # |sample| >= this counts as clipped
_AC_SIL = 8192  # |sample| < this counts as near-silent
_AC_MAX_CLIP = 0.2  # admission gates (empirically non-trivial: ~77%
_AC_MAX_SIL = 0.85  # and ~86% pass individually on the fixture bytes)
_AC_MIN_FRAMES = 16
_AC_FP_WIN = 16  # intro-fingerprint window (interleaved samples)
_MP3_GG = 190  # fixture global_gain (2^-5 — PCM off the int16 rails)

def _mp3_final_select(
    nch: int, frames_expr: str, nsamp: str, admission: bool
) -> str:
    """Tail of the generated MP3 oracle: the rms shape for the
    ``mm_mp3*_rms`` queries, or the ADMISSION-stats shape (clip and
    silence counts, per-channel frame count, intro fingerprint) the
    multi-codec curation funnel gates on."""
    if not admission:
        return f"""agg AS (
  SELECT doc_id, ff,
    CAST(list_sum(list_transform(pcm, p -> p * p)) AS BIGINT) AS sum_sq,
    CAST(list_sum(list_transform(range(0, {nsamp}), k ->
      (k + 1) * pcm[CAST(k + 1 AS INT)])) AS BIGINT) AS fp
  FROM pcms
)
SELECT doc_id{", CAST(ff AS INT) AS n_blocks" if frames_expr != "1" else ""},
       CAST(44100 AS INT) AS sample_rate,
       CAST({nsamp} AS BIGINT) AS n_samples, sum_sq, fp,
       ROUND(sqrt(sum_sq / CAST({nsamp} AS DOUBLE)), 6) AS rms
FROM agg ORDER BY doc_id"""
    return f"""adm AS (
  SELECT doc_id,
    CAST(44100 AS INT) AS sample_rate,
    CAST({nch} AS INT) AS n_channels,
    CAST(1152 * ff AS BIGINT) AS n_frames,
    CAST(len(list_filter(pcm, p -> abs(p) >= {_AC_CLIP})) AS BIGINT)
      AS n_clip,
    CAST(len(list_filter(pcm, p -> abs(p) < {_AC_SIL})) AS BIGINT)
      AS n_silence,
    CAST(list_sum(list_transform(pcm, p -> p * p)) AS BIGINT) AS sum_sq,
    CAST(list_sum(list_transform(
      range(0, LEAST({nsamp}, {_AC_FP_WIN})), k ->
        (k + 1) * pcm[CAST(k + 1 AS INT)])) AS BIGINT) AS fp
  FROM pcms
)
SELECT * FROM adm ORDER BY doc_id"""

def _mm_mp3_rms_sql(
    nch: int = 1,
    frames_expr: str = "1",
    ms: bool = False,
    admission: bool = False,
    doc_where: str = "",
    intensity: bool = False,
) -> str:
    """The fixed-point Layer III decode pipeline unrolled as chained
    CTEs over the pre-encode octets — same tables, same single
    rounding rule floor((2a+b)/2b) as ``functions/mp3.py`` (constants
    embedded verbatim from the module, so the LUTs ARE the contract).
    Stage layout mirrors the decoder over ``2*nch*F`` frame-granule-
    channel segments of 576 lines in bitstream order (``frames_expr``
    is a per-row SQL expression for the frame count F — "1" for the
    single-frame queries, data-dependent for the MKV variant, so the
    list stages are VARIABLE-length per document): xq (requantized
    lines), xa (alias butterflies, exact), zz (fused IMDCT+window, the
    ONE mid-pipeline rounding), tv (overlap-add + frequency inversion,
    exact — the previous-granule tail is the SAME-CHANNEL segment
    ``nch`` back, which also chains granules ACROSS frame boundaries),
    vv (polyphase matrixing per channel, exact), pcm (512-tap windowed
    output, final rounding + int16 clamp, channel-interleaved)."""
    from ..functions.mp3 import (
        _CA,
        _CS,
        _CW36,
        _DWIN,
        _IS_KL,
        _IS_KR,
        _NMAT,
        SFB_LONG_44100,
        requant_lut,
    )

    lut = requant_lut(_MP3_GG)
    bo = []
    for band in range(22):
        bo += [band] * (SFB_LONG_44100[band + 1] - SFB_LONG_44100[band])
    cw = [int(v) for v in _CW36.ravel()]  # [n*18+i]
    nm = [int(v) for v in _NMAT.ravel()]  # [i*32+j]
    dw = [int(v) for v in _DWIN]
    csa = [int(v) for v in _CS]
    caa = [int(v) for v in _CA]
    kl = [int(v) for v in _IS_KL]
    kr = [int(v) for v in _IS_KR]
    nseg = f"(2 * {nch} * ff)"  # frame-granule-channel segments
    nsamp = f"(1152 * {nch} * ff)"
    blocks = "(36 * ff)"  # per-channel filterbank blocks

    def rdiv20(s: str) -> str:
        return (
            f"CAST(floor((2.0 * ({s}) + 1048576) / 2097152.0) AS BIGINT)"
        )

    imdct_terms = " + ".join(
        f"xa[CAST((k // 1152) * 576 + ((k % 1152) // 36) * 18 + {i}"
        f" + 1 AS INT)] * cw[CAST((k % 36) * 18 + {i} + 1 AS INT)]"
        for i in range(18)
    )
    # vv block layout is CHANNEL-major time (ch*36F + t) so the 16-deep
    # window FIFO never crosses channels; ts segment for (ch, t) is
    # (t // 18) * nch + ch
    matrix_terms = " + ".join(
        f"nm[CAST((k % 64) * 32 + {j} + 1 AS INT)]"
        f" * tv[CAST(((((k // 64) % {blocks}) // 18) * {nch}"
        f" + (k // 64) // {blocks}) * 576 + {j} * 18"
        f" + ((k // 64) % 18) + 1 AS INT)]"
        for j in range(32)
    )
    # pcm is channel-interleaved: sample n = k // nch, channel = k % nch
    win_terms = " + ".join(
        f"(CASE WHEN (k // {nch}) // 32 >= {i} THEN"
        f" vv[CAST(((k % {nch}) * {blocks} + (k // {nch}) // 32 - {i})"
        f" * 64 + (k // {nch}) % 32 + {32 * (i % 2)}"
        f" + 1 AS INT)] ELSE 0 END) * dw[CAST((k // {nch}) % 32"
        f" + {32 * i} + 1 AS INT)]"
        for i in range(16)
    )
    sfx = (
        "CASE WHEN bo[CAST(k % 576 + 1 AS INT)] < 21 THEN"
        " cs[CAST(((k // 576) * 21 + bo[CAST(k % 576 + 1 AS INT)])"
        " % n_bytes + 1 AS INT)] % 8 ELSE 0 END"
    )

    def rdiv10(expr: str) -> str:
        return f"CAST(floor((2.0 * ({expr}) + 1024) / 2048.0) AS BIGINT)"

    # mid/side recombination (ms=True, nch=2): even segments are the
    # MID channel, partner SIDE at k+576 of the same granule —
    # L,R = rdiv((M +- S) * 724, 2^10), mirroring the decoder stage
    # intensity position split (intensity=True, nch=2): even segments
    # carry the spectrum; for lines at/above the right channel's
    # 134-line bound, L,R = rdiv(xL * KL/KR[is_pos], 2^10) with is_pos
    # = the right channel's raw %7 scalefactor (band 21 reuses 20's)
    if intensity:
        if nch != 2 or ms:
            raise ValueError("intensity oracle needs nch=2 and not ms")
    ms_cte = ""
    if ms:
        if nch != 2:
            raise ValueError("ms oracle needs nch=2")
        ms_cte = f"""msr AS (
  SELECT doc_id, ff, list_transform(range(0, 576 * {nseg}), k ->
    CASE WHEN (k // 576) % 2 = 0 THEN
      {rdiv10("(x[CAST(k + 1 AS INT)] + x[CAST(k + 577 AS INT)]) * 724")}
    ELSE
      {rdiv10("(x[CAST(k - 575 AS INT)] - x[CAST(k + 1 AS INT)]) * 724")}
    END) AS x
  FROM xq
),
"""
    if intensity:
        # is_pos byte of the partner RIGHT segment: fixture maps right
        # bands 15..20 (and 21 -> reuse 20) through %7
        is_pos = (
            "(cs[CAST((((k // 576) - (k // 576) % 2 + 1) * 21"
            " + LEAST(bo[CAST(k % 576 + 1 AS INT)], 20)) % mp.n_bytes"
            " + 1 AS INT)] % 8 % 7)"
        )
        nseg_q = nseg.replace("ff", "xq.ff")
        ms_cte = f"""isr AS (
  SELECT xq.doc_id, xq.ff, list_transform(range(0, 576 * {nseg_q}), k ->
    CASE WHEN (k % 576) < 134 THEN x[CAST(k + 1 AS INT)]
    WHEN (k // 576) % 2 = 0 THEN
      {rdiv10(f"x[CAST(k + 1 AS INT)] * kl[CAST({is_pos} + 1 AS INT)]")}
    ELSE
      {rdiv10(f"x[CAST(k - 575 AS INT)] * kr[CAST({is_pos} + 1 AS INT)]")}
    END) AS x
  FROM xq JOIN mp ON mp.doc_id = xq.doc_id CROSS JOIN consts
),
"""
    return f"""
WITH {_CODES_CTE_SQL},
consts AS (SELECT {lut!r}::BIGINT[] AS lut, {bo!r}::BIGINT[] AS bo,
  {csa!r}::BIGINT[] AS csa, {caa!r}::BIGINT[] AS caa,
  {kl!r}::BIGINT[] AS kl, {kr!r}::BIGINT[] AS kr,
  {cw!r}::BIGINT[] AS cw, {nm!r}::BIGINT[] AS nm, {dw!r}::BIGINT[] AS dw),
mp AS (
  SELECT doc_id, n_bytes, cs, CAST({frames_expr} AS BIGINT) AS ff
  FROM codes WHERE n_bytes > 0{doc_where}
),
xq AS (
  SELECT doc_id, ff, n_bytes, list_transform(range(0, 576 * {nseg}), k ->
    (CASE cs[CAST(k % n_bytes + 1 AS INT)] % 3
       WHEN 0 THEN 0 WHEN 1 THEN 1 ELSE -1 END)
    * lut[CAST(({sfx}) + 1 AS INT)]) AS x
  FROM mp CROSS JOIN consts
),
{ms_cte}xal AS (
  SELECT doc_id, ff, list_transform(range(0, 576 * {nseg}), k ->
    CASE
      WHEN (k % 576) % 18 >= 10 AND (k % 576) // 18 < 31 THEN
        x[CAST(k + 1 AS INT)]
          * csa[CAST(17 - (k % 576) % 18 + 1 AS INT)]
        - x[CAST(k + 2 * (17 - (k % 576) % 18) + 2 AS INT)]
          * caa[CAST(17 - (k % 576) % 18 + 1 AS INT)]
      WHEN (k % 576) % 18 <= 7 AND (k % 576) // 18 >= 1 THEN
        x[CAST(k + 1 AS INT)] * csa[CAST((k % 576) % 18 + 1 AS INT)]
        + x[CAST(k - 2 * ((k % 576) % 18) AS INT)]
          * caa[CAST((k % 576) % 18 + 1 AS INT)]
      ELSE x[CAST(k + 1 AS INT)] * 1024
    END) AS xa
  FROM {"msr" if ms else ("isr" if intensity else "xq")} CROSS JOIN consts
),
zz AS (
  SELECT doc_id, ff, list_transform(range(0, 1152 * {nseg}), k ->
    {rdiv20(imdct_terms)}) AS z
  FROM xal CROSS JOIN consts
),
tvs AS (
  SELECT doc_id, ff, list_transform(range(0, 576 * {nseg}), k ->
    (CASE WHEN ((k % 576) // 18) % 2 = 1 AND (k % 18) % 2 = 1
          THEN -1 ELSE 1 END)
    * (z[CAST((k // 576) * 1152 + ((k % 576) // 18) * 36
         + (k % 18) + 1 AS INT)]
       + CASE WHEN k // 576 >= {nch} THEN
           z[CAST((k // 576 - {nch}) * 1152 + ((k % 576) // 18) * 36
             + 18 + (k % 18) + 1 AS INT)]
         ELSE 0 END)) AS tv
  FROM zz
),
vvs AS (
  SELECT doc_id, ff, list_transform(range(0, 64 * {blocks} * {nch}), k ->
    {matrix_terms}) AS vv
  FROM tvs CROSS JOIN consts
),
pcms AS (
  SELECT doc_id, ff, list_transform(range(0, {nsamp}), k ->
    LEAST(32767, GREATEST(-32768, {rdiv20(win_terms)}))) AS pcm
  FROM vvs CROSS JOIN consts
),
{_mp3_final_select(nch, frames_expr, nsamp, admission)}
"""

def _mm_mp3_general_sql() -> str:
    """The GENERAL-profile decode oracle (r9): the ``_mm_mp3_rms_sql``
    pipeline with per-segment block structure — the eight
    granule-segments of the fixed 4-frame mono fixture carry the block
    types ``_MP3G_BT`` (long ×4, start, short, stop, long), so the
    requant stage selects per-segment scalefactor rules (scfsi share,
    preflag pretab, scalefac_scale, table-2 magnitudes, per-window
    short scalefactors + subblock gains), the alias stage skips the
    short segment, and the IMDCT stage picks the fused
    normal/start/stop long tables or the three-window short path
    (gathered through the stored-order index map).  The reservoir,
    VBR framing, scfsi bits and Huffman/count1 coding have no oracle
    footprint by construction — they are transport for exactly these
    values, which the round-trip pins (``test_mp3``); everything from
    requantization on is replayed here bit-exactly."""
    from ..functions.mp3 import (
        _CA,
        _CS,
        _CW36_BT,
        _DWIN,
        _NMAT,
        _PRETAB,
        _STORED_IDX,
        _STORED_IDX_MIX,
        _STORED_SFB,
        _STORED_SFB_MIX,
        _STORED_WIN,
        _STORED_WIN_MIX,
        _SW12,
        SFB_LONG_44100,
        requant_lut,
    )

    rqa = [
        v
        for a in (0, 1, 2)
        for v in requant_lut(_MP3_GG, 0, 11, q=a)
    ]
    rqb = [
        v
        for a in (0, 1, 2)
        for v in requant_lut(_MP3_GG, 1, 11, q=a)
    ]
    rqs = [
        v
        for g in range(8)
        for v in requant_lut(_MP3_GG - 8 * g, 0, 8, q=1)
    ]
    bo = []
    for band in range(22):
        bo += [band] * (SFB_LONG_44100[band + 1] - SFB_LONG_44100[band])
    pt = [int(v) for v in _PRETAB]
    sfb3 = [int(v) for v in _STORED_SFB]
    win3 = [int(v) for v in _STORED_WIN]
    sid = [
        int(_STORED_IDX[w, 6 * sb + i])
        for sb in range(32)
        for w in range(3)
        for i in range(6)
    ]
    # mixed stored gather (sb >= 2 only; sb 0..1 entries unused -> 0)
    sidm = [
        int(_STORED_IDX_MIX[w, 6 * sb + i]) if sb >= 2 else 0
        for sb in range(32)
        for w in range(3)
        for i in range(6)
    ]
    sfb3m = [max(int(v), 0) for v in _STORED_SFB_MIX]
    win3m = [max(int(v), 0) for v in _STORED_WIN_MIX]
    cw0 = [int(v) for v in _CW36_BT[0].ravel()]
    cw1 = [int(v) for v in _CW36_BT[1].ravel()]
    cw3 = [int(v) for v in _CW36_BT[3].ravel()]
    sw = [int(v) for v in _SW12.ravel()]
    nm = [int(v) for v in _NMAT.ravel()]
    dw = [int(v) for v in _DWIN]
    csa = [int(v) for v in _CS]
    caa = [int(v) for v in _CA]

    def rdiv20(s: str) -> str:
        return (
            f"CAST(floor((2.0 * ({s}) + 1048576) / 2097152.0) AS BIGINT)"
        )

    # per-line helpers (l = k % 576, seg = k // 576)
    L = "CAST(k % 576 + 1 AS INT)"
    band = f"bo[{L}]"
    byte = "cs[CAST(k % n_bytes + 1 AS INT)]"
    # long effective scalefactor: raw %8 byte (seg 1 shares bands
    # 11..20 with seg 0 -> base 0) + preflag pretab on segs 0/3
    sf_raw = (
        f"(CASE WHEN {band} < 21 THEN "
        f"(CASE WHEN k // 576 = 1 AND {band} >= 11 THEN "
        f"cs[CAST({band} % n_bytes + 1 AS INT)] % 8 "
        f"ELSE cs[CAST((21 * (k // 576) + {band}) % n_bytes + 1 AS INT)]"
        f" % 8 END) ELSE 0 END)"
    )
    sfe = (
        f"({sf_raw} + (CASE WHEN k // 576 = 0 OR k // 576 = 3 "
        f"THEN pt[CAST({band} + 1 AS INT)] ELSE 0 END))"
    )
    # short segments: per-window subblock gain + short scalefactor,
    # with the segment's own byte base 21*seg (pure-short layout maps)
    sbg_byte = (
        f"cs[CAST((21 * (k // 576) + 36 + win3[{L}]) % n_bytes"
        f" + 1 AS INT)] % 8"
    )
    sfs_short = (
        f"(CASE WHEN sfb3[{L}] < 12 THEN "
        f"cs[CAST((21 * (k // 576) + 3 * sfb3[{L}] + win3[{L}])"
        f" % n_bytes + 1 AS INT)] % 8 ELSE 0 END)"
    )
    # the MIXED segment (5): short part uses the mixed layout maps,
    # the long part (lines < 36) uses byte base 21*5 + 39 for its
    # eight long scalefactors
    sbg_byte_m = (
        f"cs[CAST((21 * (k // 576) + 36 + win3m[{L}]) % n_bytes"
        f" + 1 AS INT)] % 8"
    )
    sfs_short_m = (
        f"(CASE WHEN sfb3m[{L}] < 12 THEN "
        f"cs[CAST((21 * (k // 576) + 3 * sfb3m[{L}] + win3m[{L}])"
        f" % n_bytes + 1 AS INT)] % 8 ELSE 0 END)"
    )
    sf_mix_long = (
        f"cs[CAST((21 * (k // 576) + 39 + {band}) % n_bytes"
        f" + 1 AS INT)] % 8"
    )
    sgn = (
        "(CASE WHEN v[CAST(k + 1 AS INT)] > 0 THEN 1 "
        "WHEN v[CAST(k + 1 AS INT)] < 0 THEN -1 ELSE 0 END)"
    )
    absv = "abs(v[CAST(k + 1 AS INT)])"

    def imdct_terms(t: str) -> str:
        return " + ".join(
            f"xa[CAST((k // 1152) * 576 + ((k % 1152) // 36) * 18 + {i}"
            f" + 1 AS INT)] * {t}[CAST((k % 36) * 18 + {i} + 1 AS INT)]"
            for i in range(18)
        )

    short_terms = " + ".join(
        f"(CASE WHEN k % 36 >= {6 + 6 * w} AND k % 36 < {18 + 6 * w}"
        f" THEN xa[CAST((k // 1152) * 576"
        f" + sid[CAST(((k % 1152) // 36) * 18 + {w * 6 + i}"
        f" + 1 AS INT)] + 1 AS INT)]"
        f" * sw[CAST((k % 36 - {6 + 6 * w}) * 6 + {i} + 1 AS INT)]"
        f" ELSE 0 END)"
        for w in range(3)
        for i in range(6)
    )
    short_terms_mix = short_terms.replace("sid[", "sidm[")
    matrix_terms = " + ".join(
        f"nm[CAST((k % 64) * 32 + {j} + 1 AS INT)]"
        f" * tv[CAST(((k // 64) % 144) // 18 * 576 + {j} * 18"
        f" + ((k // 64) % 18) + 1 AS INT)]"
        for j in range(32)
    )
    win_terms = " + ".join(
        f"(CASE WHEN k // 32 >= {i} THEN"
        f" vv[CAST((k // 32 - {i})"
        f" * 64 + k % 32 + {32 * (i % 2)}"
        f" + 1 AS INT)] ELSE 0 END) * dw[CAST(k % 32"
        f" + {32 * i} + 1 AS INT)]"
        for i in range(16)
    )
    return f"""
WITH {_CODES_CTE_SQL},
consts AS (SELECT {rqa!r}::BIGINT[] AS rqa, {rqb!r}::BIGINT[] AS rqb,
  {rqs!r}::BIGINT[] AS rqs, {bo!r}::BIGINT[] AS bo,
  {pt!r}::BIGINT[] AS pt, {sfb3!r}::BIGINT[] AS sfb3,
  {win3!r}::BIGINT[] AS win3, {sid!r}::BIGINT[] AS sid,
  {sidm!r}::BIGINT[] AS sidm, {sfb3m!r}::BIGINT[] AS sfb3m,
  {win3m!r}::BIGINT[] AS win3m,
  {csa!r}::BIGINT[] AS csa, {caa!r}::BIGINT[] AS caa,
  {cw0!r}::BIGINT[] AS cw0, {cw1!r}::BIGINT[] AS cw1,
  {cw3!r}::BIGINT[] AS cw3, {sw!r}::BIGINT[] AS sw,
  {nm!r}::BIGINT[] AS nm, {dw!r}::BIGINT[] AS dw),
vq AS (
  SELECT doc_id, n_bytes, cs, CAST(4 AS BIGINT) AS ff,
    list_transform(range(0, 4608), k ->
      CASE
        WHEN (k // 576 = 0 OR k // 576 = 3) AND k % 576 < 36 THEN
          CASE {byte} % 5 WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 2
            WHEN 3 THEN -1 ELSE -2 END
        WHEN (k // 576 = 0 OR k // 576 = 3) AND k % 576 >= 258 THEN 0
        ELSE CASE {byte} % 3 WHEN 0 THEN 0 WHEN 1 THEN 1 ELSE -1 END
      END) AS v
  FROM codes WHERE n_bytes > 0
),
xq AS (
  SELECT doc_id, ff, list_transform(range(0, 4608), k ->
    CASE WHEN k // 576 = 6 THEN
      v[CAST(k + 1 AS INT)]
      * rqs[CAST(({sbg_byte}) * 8 + {sfs_short} + 1 AS INT)]
    WHEN k // 576 = 5 AND k % 576 >= 36 THEN
      v[CAST(k + 1 AS INT)]
      * rqs[CAST(({sbg_byte_m}) * 8 + {sfs_short_m} + 1 AS INT)]
    WHEN k // 576 = 5 THEN
      {sgn} * rqa[CAST({absv} * 11 + {sf_mix_long} + 1 AS INT)]
    WHEN k // 576 = 1 THEN
      {sgn} * rqb[CAST({absv} * 11 + {sfe} + 1 AS INT)]
    ELSE
      {sgn} * rqa[CAST({absv} * 11 + {sfe} + 1 AS INT)]
    END) AS x
  FROM vq CROSS JOIN consts
),
xal AS (
  SELECT doc_id, ff, list_transform(range(0, 4608), k ->
    CASE
      WHEN k // 576 = 6 THEN x[CAST(k + 1 AS INT)] * 1024
      WHEN k // 576 = 5 AND NOT ((k % 576) % 18 >= 10
           AND (k % 576) // 18 = 0)
           AND NOT ((k % 576) % 18 <= 7 AND (k % 576) // 18 = 1)
        THEN x[CAST(k + 1 AS INT)] * 1024
      WHEN (k % 576) % 18 >= 10 AND (k % 576) // 18 < 31 THEN
        x[CAST(k + 1 AS INT)]
          * csa[CAST(17 - (k % 576) % 18 + 1 AS INT)]
        - x[CAST(k + 2 * (17 - (k % 576) % 18) + 2 AS INT)]
          * caa[CAST(17 - (k % 576) % 18 + 1 AS INT)]
      WHEN (k % 576) % 18 <= 7 AND (k % 576) // 18 >= 1 THEN
        x[CAST(k + 1 AS INT)] * csa[CAST((k % 576) % 18 + 1 AS INT)]
        + x[CAST(k - 2 * ((k % 576) % 18) AS INT)]
          * caa[CAST((k % 576) % 18 + 1 AS INT)]
      ELSE x[CAST(k + 1 AS INT)] * 1024
    END) AS xa
  FROM xq CROSS JOIN consts
),
zz AS (
  SELECT doc_id, ff, list_transform(range(0, 9216), k ->
    CASE k // 1152
      WHEN 6 THEN {rdiv20(short_terms)}
      WHEN 5 THEN CASE WHEN (k % 1152) // 36 < 2
        THEN {rdiv20(imdct_terms("cw0"))}
        ELSE {rdiv20(short_terms_mix)} END
      WHEN 4 THEN {rdiv20(imdct_terms("cw1"))}
      WHEN 7 THEN {rdiv20(imdct_terms("cw3"))}
      ELSE {rdiv20(imdct_terms("cw0"))}
    END) AS z
  FROM xal CROSS JOIN consts
),
tvs AS (
  SELECT doc_id, ff, list_transform(range(0, 4608), k ->
    (CASE WHEN ((k % 576) // 18) % 2 = 1 AND (k % 18) % 2 = 1
          THEN -1 ELSE 1 END)
    * (z[CAST((k // 576) * 1152 + ((k % 576) // 18) * 36
         + (k % 18) + 1 AS INT)]
       + CASE WHEN k // 576 >= 1 THEN
           z[CAST((k // 576 - 1) * 1152 + ((k % 576) // 18) * 36
             + 18 + (k % 18) + 1 AS INT)]
         ELSE 0 END)) AS tv
  FROM zz
),
vvs AS (
  SELECT doc_id, ff, list_transform(range(0, 64 * 144), k ->
    {matrix_terms}) AS vv
  FROM tvs CROSS JOIN consts
),
pcms AS (
  SELECT doc_id, ff, list_transform(range(0, 4608), k ->
    LEAST(32767, GREATEST(-32768, {rdiv20(win_terms)}))) AS pcm
  FROM vvs CROSS JOIN consts
),
{_mp3_final_select(1, "1", "4608", False)}
"""
