"""Dedup / similarity / text / multimodal queries (SURVEY.md §2.11) with
DuckDB oracles.

The oracles replicate the engine's deterministic arithmetic (31-poly char
hashes, LCG hyperplanes/permutations) in SQL generated from the same
constants — an independent second implementation, so a hash match verifies
the Spark operators end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as tx
from ..operators import dedup as dd
from ..operators import similarity as sim
from ..operators.multimodal import extract_features
from ..schemas import load_table

# --- serving-index cache ------------------------------------------------------
#
# The *_serve query twins (VERDICT r5 task 6) measure the scale-relevant
# number: query latency against a PERSISTED index, with the index build
# amortized away (offline on a real cluster).  The build lands once per
# testdata fingerprint under .index_cache/ (gitignored, local to the
# repo); a _COMPLETE marker written after the build makes a crashed build
# invisible (recomputed, never trusted — the _stage_complete discipline).


def _index_cache_path(sf_dir: str, table_file: str, kind: str) -> str:
    import hashlib
    import os

    src = os.path.join(sf_dir, table_file)
    if os.path.isdir(src):
        key = ";".join(
            f"{n}:{os.stat(os.path.join(src, n)).st_size}"
            for n in sorted(os.listdir(src))
        )
    else:
        st = os.stat(src)
        key = f"{st.st_size}:{st.st_mtime_ns}"
    tag = hashlib.sha1(f"{src}|{key}".encode()).hexdigest()[:12]
    root = os.environ.get(
        "SPARK_GRAFT_INDEX_CACHE",
        os.path.join(
            os.path.dirname(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            ),
            ".index_cache",
        ),
    )
    return os.path.join(root, f"{kind}-{tag}")


def _cached_index(path: str, build) -> None:
    """Run ``build()`` unless a completed index already sits at ``path``."""
    import os

    marker = os.path.join(path, "_COMPLETE")
    if os.path.exists(marker):
        return
    build()
    with open(marker, "w") as f:
        f.write("ok")


_CODEC_FPRINT: str | None = None


def _codec_fprint() -> str:
    """Fingerprint of every module whose code shapes media-fixture
    BYTES (codecs, containers, the builders' host modules).  Folded
    into the media cache key so a codec/builder change invalidates the
    cached payloads automatically — r9 ADVICE closed: a forgotten
    ``kind`` bump can no longer serve stale bytes.  Hashes the AST
    with docstrings stripped, so comment/doc edits don't trigger a
    multi-minute refixture; any executable change does."""
    global _CODEC_FPRINT
    if _CODEC_FPRINT is None:
        import ast
        import hashlib
        import os

        pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = hashlib.sha1()
        for rel in (
            "functions/codecs.py",
            "functions/flac.py",
            "functions/mp3.py",
            "functions/ebml.py",
            "functions/id3.py",
            "functions/warc.py",
            "functions/html.py",
            "functions/mp4.py",
            "functions/ogg.py",
            "functions/tarf.py",
            "functions/tiff.py",
            "functions/zipf.py",
            "functions/lz4.py",
            "functions/snappyf.py",
            "functions/avrof.py",
            "functions/pdf.py",
            "functions/wiki.py",
            "functions/zstd.py",
            "functions/tfrecord.py",
            "functions/protof.py",
            "functions/msgpackf.py",
            "functions/epub.py",
            "functions/subtitles.py",
            "functions/avi.py",
            "functions/exif.py",
            "functions/qoi.py",
            "functions/docx.py",
            "functions/markdown.py",
            "functions/webp.py",
            "functions/robots.py",
            "functions/ico.py",
            "functions/tensors.py",
            "functions/rasters.py",
            "operators/multimodal.py",
            "operators/webtext.py",
        ):
            p = os.path.join(pkg, rel)
            if os.path.exists(p):
                with open(p, "r") as f:
                    h.update(_code_fingerprint_src(ast, f.read()))
        _CODEC_FPRINT = h.hexdigest()[:8]
    return _CODEC_FPRINT


def _code_fingerprint_src(ast_mod, src: str) -> bytes:
    """AST dump of ``src`` with docstrings removed — the stable-under-
    documentation form both codec-fingerprint paths hash."""
    tree = ast_mod.parse(src)
    for node in ast_mod.walk(tree):
        body = getattr(node, "body", None)
        if (
            isinstance(
                body, list
            )
            and body
            and isinstance(body[0], ast_mod.Expr)
            and isinstance(body[0].value, ast_mod.Constant)
            and isinstance(body[0].value.value, str)
        ):
            body[0] = ast_mod.Pass()
    return ast_mod.dump(tree).encode()


def _cached_media(
    spark: SparkSession,
    sf_dir: str,
    kind: str,
    build_fn,
    cols: tuple = ("doc_id", "text"),
    schema: str = "media_id long, payload binary",
    deps: tuple = (),
) -> DataFrame:
    """Media-fixture payloads synthesized ONCE per testdata fingerprint
    and persisted under ``.index_cache`` (VERDICT r8 task 1): the
    declared operator in every ``mm_*`` query is the DECODE — the
    encode + container mux is fixture synthesis standing in for bytes
    that at production scale already sit in object storage, so it runs
    outside the benched path, exactly like the ``*_serve`` index
    builds.  Returns the cached payloads hash-repartitioned to default
    parallelism (the decode kernel's input stage; the cached parquet is
    small enough that the file scan would otherwise coalesce into a
    handful of splits and serialize the Arrow kernel).

    The cache key is (testdata fingerprint, ``kind``, codec+builder
    fingerprint): ``_codec_fprint()`` hashes every codec/container
    module plus this builder's own source, so a code change that
    alters fixture bytes invalidates the cache automatically — no
    manual ``kind`` bump needed (r9 ADVICE).

    The returned DataFrame is BYTE-BOUNDED for the Arrow hop (VERDICT
    r10 task 5): ``maxRecordsPerBatch`` caps rows, not bytes, so a
    multi-MB-payload corpus would otherwise hand the Python worker
    multi-GB batches at 100 TB scale.  Partition count is derived
    from the cached files' actual bytes/rows (parquet footers, no
    Spark job — codec payloads are high-entropy, so compressed size ≈
    payload size) such that a partition, and therefore any Arrow
    batch, stays near ``_MEDIA_BATCH_TARGET_BYTES``."""
    import ast
    import hashlib
    import inspect
    import textwrap

    src_bytes = b""
    for fn in (build_fn, *deps):  # deps: a wrapper builder hashes the
        try:  # builders it delegates to, so the auto-invalidation
            src = textwrap.dedent(inspect.getsource(fn))  # guarantee
            src_bytes += _code_fingerprint_src(ast, src)  # survives
        except (OSError, TypeError, SyntaxError):  # composition
            src_bytes += repr(fn).encode()
    ver = hashlib.sha1(
        _codec_fprint().encode() + src_bytes
    ).hexdigest()[:8]
    path = _index_cache_path(
        sf_dir, "documents.parquet", f"media-{kind}-{ver}"
    )

    def build():
        d = load_table(spark, sf_dir, "documents")
        _parallel_docs(d, *cols).mapInPandas(
            build_fn, schema
        ).write.mode("overwrite").parquet(path)

    _cached_index(path, build)
    # stale-version hygiene: the versioned key means superseded builds
    # for the SAME (kind, testdata fingerprint) linger forever; sweep
    # them (other fingerprints = other sf_dirs stay untouched)
    import os
    import shutil

    root, cur = os.path.split(path)
    tag = cur.rsplit("-", 1)[-1]
    prefix = f"media-{kind}-"
    try:
        for name in os.listdir(root):
            if (
                name.startswith(prefix)
                and name.endswith(f"-{tag}")
                and name != cur
            ):
                shutil.rmtree(os.path.join(root, name), ignore_errors=True)
    except OSError:
        pass
    return _bounded_media_read(spark, path)


# target Arrow-batch payload volume for the media decode kernels: a
# partition is sized so JVM->Python transfer stays near this many
# bytes even when single payloads are MBs (see _cached_media docstring)
_MEDIA_BATCH_TARGET_BYTES = 64 << 20


def _bounded_media_read(spark: SparkSession, path: str) -> DataFrame:
    """Read cached media payloads partitioned for BOTH parallelism and
    a byte-bounded Arrow hop: n_partitions = max(defaultParallelism,
    total_bytes / _MEDIA_BATCH_TARGET_BYTES), with rows/bytes taken
    from the local parquet footers (driver-side, no job).  Hash
    partitioning by media_id keeps per-doc placement deterministic;
    ids are dense, so partitions stay near-uniform and each Arrow
    batch ≤ ceil(rows/n) rows ≈ the byte target.  (An Arrow batch is a
    subset of one partition, so bounding partition bytes bounds batch
    bytes; the 10k-row global cap still bounds the many-tiny-rows
    case.)"""
    import os

    files = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    ]
    nbytes = sum(os.path.getsize(f) for f in files)
    par = spark.sparkContext.defaultParallelism
    n = max(par, -(-nbytes // _MEDIA_BATCH_TARGET_BYTES))
    return spark.read.parquet(path).repartition(int(n), "media_id")


# --- shared SQL fragments -----------------------------------------------------

TOKENS_SQL = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), x -> x <> '')"
)


def _char_hash_sql(s: str) -> str:
    """31-poly char hash, fold from 0 — mirrors functions.text.char_poly_hash."""
    codes = f"list_transform(range(1, len({s}) + 1), i -> ascii(substr({s}, i, 1)))"
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), {codes}), "
        f"(a, b) -> (a * 31 + b) % 2147483648)"
    )


# --- dedup --------------------------------------------------------------------


def dd_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a derived key (first 2 tokens): survivors per lang."""
    d = load_table(spark, sf_dir, "documents")
    keyed = d.withColumn(
        "dkey", F.concat_ws(" ", F.slice(tx.tokens(F.col("text")), 1, 2))
    )
    surv = dd.exact_dedup(keyed, ["dkey"], "doc_id")
    return (
        surv.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("doc_id").alias("sum_ids"))
        .orderBy("lang")
    )


DD_EXACT_SQL = f"""
WITH keyed AS (
  SELECT doc_id, lang,
         array_to_string(list_slice({TOKENS_SQL}, 1, 2), ' ') AS dkey
  FROM documents
), surv AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY dkey ORDER BY doc_id) AS rn
  FROM keyed
)
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS sum_ids
FROM surv WHERE rn = 1
GROUP BY lang ORDER BY lang
"""


def dd_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (threshold 0.5), with the
    hot-shingle DF cutoff ON: stop-shingles (df > 50) are excluded from
    candidate generation except among hot-heavy docs — provably
    result-preserving (see jaccard_pairs docstring), so the oracle is the
    plain all-shingles SQL."""
    d = load_table(spark, sf_dir, "documents")
    pairs = dd.jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5, df_cutoff=50)
    return pairs.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


DD_JACCARD_SQL = f"""
WITH sh AS (
  SELECT doc_id, unnest(
    (SELECT CASE WHEN len(t) >= 3 THEN
       list_distinct(list_transform(range(0, len(t) - 2),
                     i -> t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3]))
     ELSE [array_to_string(t, ' ')] END
     FROM (SELECT {TOKENS_SQL} AS t))
  ) AS s
  FROM documents
), sizes AS (
  SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       ROUND(i * 1.0 / (sa.sz + sb.sz - i), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.5
ORDER BY id_a, id_b
"""


def dd_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidate pairs (16 perms, 4 bands)."""
    d = load_table(spark, sf_dir, "documents")
    return dd.minhash_lsh_pairs(d, "doc_id", "text", num_perm=16, bands=4).orderBy(
        "id_a", "id_b"
    )


_TOKEN_HASHES_SQL = (
    f"list_transform({TOKENS_SQL}, s -> "
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(range(1, len(s) + 1), i -> ascii(substr(s, i, 1)))), "
    "(a, b) -> (a * 31 + b) % 2147483648))"
)

# shingle hashes combined from token hashes (n=3, COMBINE=1000003) —
# mirrors operators.dedup._shingle_hashes_from_token_hashes
_SHINGLE_HASHES_SQL = """
, th AS (SELECT doc_id, {TH} AS th FROM documents
), shing AS (
  SELECT doc_id,
         CASE WHEN len(th) >= 3 THEN
           list_distinct(list_transform(range(0, len(th) - 2), i ->
             ((((CAST(0 AS BIGINT) * 1000003 + th[i + 1]) % 2147483648)
                * 1000003 + th[i + 2]) % 2147483648
                * 1000003 + th[i + 3]) % 2147483648))
         ELSE [list_reduce(list_prepend(CAST(0 AS BIGINT), th),
                           (a, b) -> (a * 1000003 + b) % 2147483648)]
         END AS hs
  FROM th
)
""".replace("{TH}", _TOKEN_HASHES_SQL)


def _minhash_pairs_ctes(num_perm: int = 16, bands: int = 4) -> str:
    """CTE chain ending in ``pairs(id_a, id_b)`` — shared by the minhash
    and cluster oracles."""
    consts = dd._perm_constants(num_perm)
    rows = num_perm // bands
    mins = ", ".join(
        f"list_min(list_transform(hs, x -> (x * {a} + {b}) % 2147483647)) AS m{i}"
        for i, (a, b) in enumerate(consts)
    )
    band_exprs = []
    for bband in range(bands):
        # band hash: fold from 0 over the band's signature slice
        expr = "CAST(0 AS BIGINT)"
        for r in range(rows):
            expr = f"(({expr}) * 31 + m{bband * rows + r}) % 2147483648"
        band_exprs.append(f"({bband}, {expr})")
    return f"""dummy AS (SELECT 1)
{_SHINGLE_HASHES_SQL}
, sigs AS (
  SELECT doc_id, {mins} FROM shing
), bandsx AS (
  SELECT doc_id, b.band, b.bucket
  FROM sigs, LATERAL (VALUES {', '.join(band_exprs)}) AS b(band, bucket)
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bandsx a JOIN bandsx b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)"""


def _minhash_sql(num_perm: int = 16, bands: int = 4) -> str:
    return (
        "WITH "
        + _minhash_pairs_ctes(num_perm, bands)
        + "\nSELECT id_a, id_b FROM pairs ORDER BY id_a, id_b\n"
    )


def _cluster_sql(num_perm: int = 16, bands: int = 4) -> str:
    """Recursive-CTE oracle for connected components over the minhash
    pairs: transitive closure on the symmetric edge list, then min
    reachable id per node."""
    return (
        "WITH RECURSIVE "
        + _minhash_pairs_ctes(num_perm, bands)
        + """
, sym AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs
), reach(node, r) AS (
  SELECT DISTINCT a, a FROM sym
  UNION
  SELECT s.a, reach.r FROM sym s JOIN reach ON s.b = reach.node
)
SELECT node AS doc_id, CAST(MIN(r) AS BIGINT) AS cluster_id
FROM reach GROUP BY node ORDER BY doc_id
"""
    )


def dd_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering — the step after pair generation: MinHash-LSH
    candidate pairs → connected components → each doc labeled with its
    cluster's canonical (minimum) doc_id."""
    d = load_table(spark, sf_dir, "documents")
    pairs = dd.minhash_lsh_pairs(d, "doc_id", "text", num_perm=16, bands=4)
    cc = dd.connected_components(pairs)
    return cc.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    ).orderBy("doc_id")


def ds_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data generation for embedding models: near-dup pairs
    become (anchor, positive) with a deterministic IN-BATCH negative —
    the next pair's positive in hash order, cyclically — the standard
    in-batch-negatives shape, derived entirely from the corpus with no
    labels.  One window over the (tiny) pair set; the corpus itself
    never re-shuffles."""
    from pyspark.sql.window import Window

    from ..operators.split import shuffle_hash

    d = load_table(spark, sf_dir, "documents")
    pairs = dd.minhash_lsh_pairs(
        d, "doc_id", "text", num_perm=16, bands=4
    ).localCheckpoint()  # feeds the triple window AND the near-dup veto
    ordered = pairs.withColumn(
        "_o", shuffle_hash(F.col("id_a") * 31 + F.col("id_b"), 43)
    )
    w = Window.orderBy("_o", "id_a", "id_b")
    out = ordered.select(
        F.col("id_a").alias("anchor"),
        F.col("id_b").alias("positive"),
        F.coalesce(
            F.lead("id_b").over(w), F.first("id_b").over(w.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            ))
        ).alias("negative"),
    )
    # a usable triple needs a REAL negative: not the anchor/positive
    # themselves, and not a known near-dup of the anchor (veto via
    # anti-join on the sorted pair key) — degenerate triples (tiny or
    # wrap-around clusters) are dropped, not emitted poisoned
    out = out.filter(
        (F.col("negative") != F.col("anchor"))
        & (F.col("negative") != F.col("positive"))
    )
    veto = pairs.select(
        F.col("id_a").alias("_va"), F.col("id_b").alias("_vb")
    )
    out = out.join(
        F.broadcast(veto),
        (
            (F.least("anchor", "negative") == F.col("_va"))
            & (F.greatest("anchor", "negative") == F.col("_vb"))
        ),
        "left_anti",
    )
    return out.orderBy("anchor", "positive")


def _contrastive_sql() -> str:
    from ..operators.split import shuffle_hash_sql

    oh = shuffle_hash_sql("(id_a * 31 + id_b)", 43)
    return (
        "WITH "
        + _minhash_pairs_ctes(16, 4)
        + f""",
ordered AS (SELECT id_a, id_b, {oh} AS o FROM pairs),
trip AS (
  SELECT id_a AS anchor, id_b AS positive,
         COALESCE(
           lead(id_b) OVER (ORDER BY o, id_a, id_b),
           first_value(id_b) OVER (ORDER BY o, id_a, id_b
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ) AS negative
  FROM ordered
)
SELECT anchor, positive, negative FROM trip t
WHERE negative <> anchor AND negative <> positive
  AND NOT EXISTS (
    SELECT 1 FROM pairs p
    WHERE p.id_a = LEAST(t.anchor, t.negative)
      AND p.id_b = GREATEST(t.anchor, t.negative))
ORDER BY anchor, positive
"""
    )


def dd_cluster_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor selection: per near-dup cluster keep the HIGHEST-quality
    member (not the id-minimal one) — quality desc, id asc tie-break;
    singletons survive as their own cluster."""
    d = load_table(spark, sf_dir, "documents")
    pairs = dd.minhash_lsh_pairs(d, "doc_id", "text", num_perm=16, bands=4)
    best = dd.keep_best_per_cluster(
        d.withColumn("q", tx.quality_score(F.col("text"))),
        pairs,
        "doc_id",
        "q",
    )
    return best.select(
        "doc_id",
        F.col("cluster_id").cast("long").alias("cluster_id"),
        F.round("q", 6).alias("q"),
    ).orderBy("doc_id")


def _cluster_best_sql(num_perm: int = 16, bands: int = 4) -> str:
    return (
        "WITH RECURSIVE "
        + _minhash_pairs_ctes(num_perm, bands)
        + f"""
, sym AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs
), reach(node, r) AS (
  SELECT DISTINCT a, a FROM sym
  UNION
  SELECT s.a, reach.r FROM sym s JOIN reach ON s.b = reach.node
), lbl AS (
  SELECT node, MIN(r) AS cl FROM reach GROUP BY node
), scored AS (
  SELECT d.doc_id,
         COALESCE(l.cl, d.doc_id) AS cluster_id,
         {_quality_expr_sql()} AS q
  FROM documents d LEFT JOIN lbl l ON l.node = d.doc_id
), ranked AS (
  SELECT doc_id, cluster_id, q,
         row_number() OVER (PARTITION BY cluster_id ORDER BY q DESC, doc_id) AS rn
  FROM scored
)
SELECT doc_id, CAST(cluster_id AS BIGINT) AS cluster_id, ROUND(q, 6) AS q
FROM ranked WHERE rn = 1 ORDER BY doc_id
"""
    )


def dd_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup against a signature index: documents with
    doc_id % 5 = 0 play the incoming micro-batch, the rest the persisted
    corpus index; returns the batch docs' candidate matches in history
    (batch side broadcast — the index never shuffles)."""
    d = load_table(spark, sf_dir, "documents")
    batch = dd.minhash_band_rows(
        d.filter(F.col("doc_id") % 5 == 0), "doc_id", "text", 16, 4
    )
    index = dd.minhash_band_rows(
        d.filter(F.col("doc_id") % 5 != 0), "doc_id", "text", 16, 4
    )
    return dd.index_candidates(batch, index).orderBy("id_new", "id_index")


def _incremental_sql(num_perm: int = 16, bands: int = 4) -> str:
    """Same band/bucket arithmetic; pairs restricted to (batch, index)."""
    consts = dd._perm_constants(num_perm)
    rows = num_perm // bands
    mins = ", ".join(
        f"list_min(list_transform(hs, x -> (x * {a} + {b}) % 2147483647)) AS m{i}"
        for i, (a, b) in enumerate(consts)
    )
    band_exprs = []
    for bband in range(bands):
        expr = "CAST(0 AS BIGINT)"
        for r in range(rows):
            expr = f"(({expr}) * 31 + m{bband * rows + r}) % 2147483648"
        band_exprs.append(f"({bband}, {expr})")
    return f"""
WITH dummy AS (SELECT 1)
{_SHINGLE_HASHES_SQL}
, sigs AS (
  SELECT doc_id, {mins} FROM shing
), bandsx AS (
  SELECT doc_id, b.band, b.bucket
  FROM sigs, LATERAL (VALUES {', '.join(band_exprs)}) AS b(band, bucket)
)
SELECT DISTINCT n.doc_id AS id_new, i.doc_id AS id_index
FROM bandsx n JOIN bandsx i ON n.band = i.band AND n.bucket = i.bucket
WHERE n.doc_id % 5 = 0 AND i.doc_id % 5 <> 0
ORDER BY id_new, id_index
"""


def dd_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprint per document (strongest check: raw values)."""
    d = load_table(spark, sf_dir, "documents")
    return dd.simhashes(d, "doc_id", "text", bits=32).orderBy("doc_id")


def _simhash_sql(bits: int = 32) -> str:
    bit_terms = " + ".join(
        f"(CASE WHEN 2 * len(list_filter(hs, x -> (x // {1 << b}) % 2 = 1)) "
        f"> len(hs) THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(bits)
    )
    return f"""
WITH dummy AS (SELECT 1)
{_SHINGLE_HASHES_SQL}
SELECT doc_id, {bit_terms} AS simhash
FROM shing ORDER BY doc_id
"""


# --- similarity ---------------------------------------------------------------


def dd_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs over the FULL documents table: Hamming
    distance ≤ 3 on 32-bit fingerprints via banded blocking (4 × 8-bit
    chunks, equi-join on matching chunk, exact Hamming verify) — the
    pigeonhole guarantee makes banding exact for hd ≤ 3, so results equal
    the all-pairs oracle with no nested-loop join."""
    d = load_table(spark, sf_dir, "documents")
    sh = dd.simhashes(d, "doc_id", "text", bits=32)
    return dd.simhash_pairs(
        sh, "doc_id", "simhash", bits=32, bands=4, max_hd=3
    ).orderBy("id_a", "id_b")


def _simhash_pairs_sql(bits: int = 32) -> str:
    bit_terms = " + ".join(
        f"(CASE WHEN 2 * len(list_filter(hs, x -> (x // {1 << b}) % 2 = 1)) "
        f"> len(hs) THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(bits)
    )
    return f"""
WITH dummy AS (SELECT 1)
{_SHINGLE_HASHES_SQL}
, fp AS (SELECT doc_id, {bit_terms} AS simhash FROM shing)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hd
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
ORDER BY id_a, id_b
"""


def sim_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for query vectors (vec_id < 10)."""
    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    q = e.filter(F.col("vec_id") < 10)
    out = sim.topk_cosine(e, q, k=5)
    return out.select(
        "q_id", "c_id", F.round("score", 6).alias("score"), "rank"
    ).orderBy("q_id", "rank")


SIM_TOPK_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
scored AS (
  SELECT q_id, e.vec_id AS c_id,
         list_dot_product(qv, v) /
         (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS s
  FROM q JOIN e ON e.vec_id <> q.q_id
), ranked AS (
  SELECT q_id, c_id, s,
         row_number() OVER (PARTITION BY q_id ORDER BY s DESC, c_id) AS rank
  FROM scored
)
SELECT q_id, c_id, ROUND(s, 6) AS score, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
ORDER BY q_id, rank
"""


def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-5 (8 hyperplanes, deterministic)."""
    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    q = e.filter(F.col("vec_id") < 10)
    out = sim.topk_cosine_lsh(e, q, dim=64, k=5, planes=8)
    return out.select(
        "q_id", "c_id", F.round("score", 6).alias("score"), "rank"
    ).orderBy("q_id", "rank")


def _ann_lsh_sql(dim: int = 64, planes: int = 8) -> str:
    hps = sim._hyperplanes(dim, planes)
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product(v, {hp!r}::DOUBLE[]) >= 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, hp in enumerate(hps)
    )
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         {bucket} AS bucket
  FROM embeddings
), q AS (SELECT vec_id AS q_id, v AS qv, bucket FROM e WHERE vec_id < 10),
scored AS (
  SELECT q_id, e.vec_id AS c_id,
         list_dot_product(qv, v) /
         (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS s
  FROM q JOIN e USING (bucket) WHERE e.vec_id <> q.q_id
), ranked AS (
  SELECT q_id, c_id, s,
         row_number() OVER (PARTITION BY q_id ORDER BY s DESC, c_id) AS rank
  FROM scored
)
SELECT q_id, c_id, ROUND(s, 6) AS score, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
ORDER BY q_id, rank
"""


def ds_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023) as a declared query: score
    every document by the hashed-ngram log-likelihood ratio toward the
    English-language target slice, top-20 by weight
    (``operators/selection.py`` — distribution estimates are two
    bucket-keyed aggregates; scoring is one narrow zero-shuffle pass
    with the 256-entry ratio table inlined)."""
    from ..operators.selection import dsir_weights

    d = load_table(spark, sf_dir, "documents")
    target = d.filter(F.col("lang") == "en")
    w = dsir_weights(d, target, buckets=256)
    return (
        w.select("doc_id", "n_feats", F.round("weight", 4).alias("weight"))
        .orderBy(F.col("weight").desc(), "doc_id")
        .limit(20)
    )


def _dsir_ctes(buckets: int = 256, combine: int = 1000003) -> str:
    """The shared WITH-body deriving ``scored(doc_id, n_feats, w)``:
    identical hashes, identical add-one smoothing, identical per-bucket
    ROUND(lr, 6) ratio table, and the per-doc fold runs over the same
    feature list in the same order — the summed double is bit-identical,
    not merely close."""
    ch = _char_hash_sql("s")
    return f"""
WITH toks AS (
  SELECT doc_id, lang, {TOKENS_SQL} AS t FROM documents
), th AS (
  SELECT doc_id, lang, list_transform(t, s -> {ch}) AS h FROM toks
), fb AS (
  SELECT doc_id, lang,
         list_concat(
           list_transform(h, x -> x % {buckets}),
           CASE WHEN len(h) >= 2 THEN
             list_transform(range(1, len(h)),
                            i -> ((h[i] * {combine} + h[i+1]) % 2147483648) % {buckets})
           ELSE [] END
         ) AS fb
  FROM th
), raw_cnt AS (
  SELECT b, COUNT(*) AS c FROM (SELECT unnest(fb) AS b FROM fb) GROUP BY b
), tgt_cnt AS (
  SELECT b, COUNT(*) AS c
  FROM (SELECT unnest(fb) AS b FROM fb WHERE lang = 'en') GROUP BY b
), nt AS (SELECT SUM(c) AS n FROM tgt_cnt),
nr AS (SELECT SUM(c) AS n FROM raw_cnt),
allb AS (SELECT unnest(range(0, {buckets})) AS b),
ratio AS (
  SELECT allb.b,
         ROUND(ln((COALESCE(t.c, 0) + 1.0) / (nt.n + {buckets}))
               - ln((COALESCE(r.c, 0) + 1.0) / (nr.n + {buckets})), 6) AS lr
  FROM allb LEFT JOIN raw_cnt r ON allb.b = r.b
            LEFT JOIN tgt_cnt t ON allb.b = t.b, nt, nr
), rarr AS (SELECT list(lr ORDER BY b) AS arr FROM ratio),
scored AS (
  SELECT doc_id, len(fb) AS n_feats,
         list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
                        list_transform(fb, x -> arr[CAST(x + 1 AS INT)])),
           (a, y) -> a + y) AS w
  FROM fb, rarr
)
"""


def _dsir_sql(buckets: int = 256, combine: int = 1000003) -> str:
    return (
        _dsir_ctes(buckets, combine)
        + """
SELECT doc_id, CAST(n_feats AS INT) AS n_feats, ROUND(w, 4) AS weight
FROM scored ORDER BY w DESC, doc_id LIMIT 20
"""
    )


def ds_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-guarded train/val split: near-dup clusters (MinHash-LSH →
    connected components) split as UNITS, so no near-duplicate of a
    training doc lands in val (``operators/split.py::
    leakage_safe_split``; Lee et al. 2022)."""
    from ..operators.split import leakage_safe_split

    d = load_table(spark, sf_dir, "documents")
    return leakage_safe_split(d, val_pct=20, seed=23).orderBy("doc_id")


def _leakage_split_sql(
    val_pct: int = 20, seed: int = 23, num_perm: int = 16, bands: int = 4
) -> str:
    from ..operators.split import shuffle_hash_sql

    h = shuffle_hash_sql("cluster_id", seed)
    return (
        "WITH RECURSIVE "
        + _minhash_pairs_ctes(num_perm, bands)
        + f"""
, sym AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs
), reach(node, r) AS (
  SELECT DISTINCT a, a FROM sym
  UNION
  SELECT s.a, reach.r FROM sym s JOIN reach ON s.b = reach.node
), roots AS (
  SELECT node, MIN(r) AS root FROM reach GROUP BY node
), rooted AS (
  SELECT d.doc_id, CAST(COALESCE(roots.root, d.doc_id) AS BIGINT) AS cluster_id
  FROM documents d LEFT JOIN roots ON d.doc_id = roots.node
)
SELECT doc_id, cluster_id,
       CASE WHEN ({h}) % 100 < {val_pct} THEN 'val' ELSE 'train' END AS split
FROM rooted ORDER BY doc_id
"""
    )


def tx_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM fluency filter (Wenzek et al. 2020) with the
    in-engine hashed bigram model: train on the English slice (two
    bucket-keyed aggregates), score every document in one zero-shuffle
    pass, top-20 by mean log-prob (``operators/selection.py::
    bigram_lm_scores``)."""
    from ..operators.selection import bigram_lm_scores

    d = load_table(spark, sf_dir, "documents")
    target = d.filter(F.col("lang") == "en")
    s = bigram_lm_scores(d, target, buckets=256)
    return (
        s.filter(F.col("n_bigrams") > 0)
        .select(
            "doc_id",
            "n_bigrams",
            F.round("ll", 4).alias("ll"),
            F.round(F.col("ll") / F.col("n_bigrams"), 6).alias("mlp"),
        )
        .orderBy(F.col("mlp").desc(), "doc_id")
        .limit(20)
    )


def _bigram_lm_sql(buckets: int = 256, combine: int = 1000003) -> str:
    ch = _char_hash_sql("s")
    return f"""
WITH toks AS (
  SELECT doc_id, lang, {TOKENS_SQL} AS t FROM documents
), th AS (
  SELECT doc_id, lang, list_transform(t, s -> {ch}) AS h FROM toks
), feats AS (
  SELECT doc_id, lang,
         CASE WHEN len(h) >= 2 THEN
           list_transform(range(1, len(h)),
                          i -> ((h[i] * {combine} + h[i+1]) % 2147483648) % {buckets})
         ELSE [] END AS bg,
         CASE WHEN len(h) >= 2 THEN
           list_transform(h[1:len(h)-1], x -> x % {buckets})
         ELSE [] END AS cx
  FROM th
), big_cnt AS (
  SELECT b, COUNT(*) AS c
  FROM (SELECT unnest(bg) AS b FROM feats WHERE lang = 'en') GROUP BY b
), ctx_cnt AS (
  SELECT b, COUNT(*) AS c
  FROM (SELECT unnest(cx) AS b FROM feats WHERE lang = 'en') GROUP BY b
), allb AS (SELECT unnest(range(0, {buckets})) AS b),
lnum AS (
  SELECT allb.b, ROUND(ln(COALESCE(big_cnt.c, 0) + 1.0), 6) AS v
  FROM allb LEFT JOIN big_cnt ON allb.b = big_cnt.b
), lden AS (
  SELECT allb.b, ROUND(ln(COALESCE(ctx_cnt.c, 0) + {buckets}.0), 6) AS v
  FROM allb LEFT JOIN ctx_cnt ON allb.b = ctx_cnt.b
), narr AS (SELECT list(v ORDER BY b) AS nu FROM lnum),
darr AS (SELECT list(v ORDER BY b) AS de FROM lden),
scored AS (
  SELECT doc_id, len(bg) AS n_bigrams,
         list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(range(1, len(bg) + 1),
               i -> nu[CAST(bg[i] + 1 AS INT)] - de[CAST(cx[i] + 1 AS INT)])),
           (a, y) -> a + y) AS ll
  FROM feats, narr, darr
)
SELECT doc_id, CAST(n_bigrams AS INT) AS n_bigrams,
       ROUND(ll, 4) AS ll, ROUND(ll / n_bigrams, 6) AS mlp
FROM scored WHERE n_bigrams > 0
ORDER BY mlp DESC, doc_id LIMIT 20
"""


def ds_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance RESAMPLING: Gumbel-top-25 over the log-weights —
    inclusion probability ∝ exp(weight), deterministic via the portable
    LCG draw (``operators/selection.py::gumbel_topk``; the sampling step
    the DSIR paper pairs with the weights)."""
    from ..operators.selection import dsir_weights, gumbel_topk

    d = load_table(spark, sf_dir, "documents")
    target = d.filter(F.col("lang") == "en")
    w = dsir_weights(d, target, buckets=256)
    out = gumbel_topk(w, 25)
    return out.select(
        "doc_id",
        "n_feats",
        F.round("weight", 4).alias("weight"),
        F.col("_gkey").alias("gkey"),
    )


def _dsir_resample_sql(buckets: int = 256, combine: int = 1000003) -> str:
    from ..operators.selection import gumbel_topk_sql

    inner = gumbel_topk_sql("scored", 25, id_col="doc_id", weight_col="w")
    return (
        _dsir_ctes(buckets, combine)
        + f"""
SELECT doc_id, CAST(n_feats AS INT) AS n_feats,
       ROUND(w, 4) AS weight, _gkey AS gkey
FROM ({inner})
"""
    )


def sim_ivf_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + int8 ADC two-stage ANN as a declared query
    (``operators/similarity.py::topk_cosine_ivf_adc``): 4 deterministic
    coarse cells (the k lowest-id vectors — kmeanspp_lite), nprobe=2,
    int8 codes scored in the probed cells, float re-rank of the top 20.
    Every stage — assignment argmax, quantization, approximate rank,
    re-scored top-5 — is re-derived exactly by the oracle, upgrading the
    ADC path from recall-tested to value-checked."""
    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    q = e.filter(F.col("vec_id") < 5)
    cents = sim.train_centroids_kmeanspp_lite(e, 4)
    out = sim.topk_cosine_ivf_adc(e, q, cents, k=5, nprobe=2)
    return out.select(
        "q_id", "c_id", F.round("score", 6).alias("score"), "rank"
    ).orderBy("q_id", "rank")


SIM_IVF_ADC_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS cv
  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 4)
),
asg AS (
  SELECT vec_id, v, cell FROM (
    SELECT e.vec_id, e.v, c.cell,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             list_dot_product(e.v, c.cv) /
             (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
             c.cell) AS rn
    FROM e CROSS JOIN cents c) WHERE rn = 1
),
codes AS (
  SELECT vec_id, cell,
         list_transform(v, x ->
           CAST(LEAST(127, GREATEST(-127, CAST(round(x / s) AS INT))) AS DOUBLE)) AS qc
  FROM (SELECT vec_id, cell, v,
               greatest(list_max(list_transform(v, x -> abs(x))), 1e-12) / 127.0 AS s
        FROM asg)
),
q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 5),
qcells AS (
  SELECT q_id, qv, cell FROM (
    SELECT q.q_id, q.qv, c.cell,
           row_number() OVER (PARTITION BY q.q_id ORDER BY
             list_dot_product(q.qv, c.cv) /
             (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
             c.cell DESC) AS rn
    FROM q CROSS JOIN cents c) WHERE rn <= 2
),
approx AS (
  SELECT q_id, qv, c.vec_id AS c_id,
         list_dot_product(qv, qc) /
         (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(qc, qc))) AS a
  FROM qcells JOIN codes c USING (cell)
  WHERE c.vec_id <> q_id
),
short AS (
  SELECT q_id, qv, c_id FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY a DESC, c_id) AS arn
    FROM approx) WHERE arn <= 20
),
resc AS (
  SELECT q_id, s.c_id,
         list_dot_product(qv, e.v) /
         (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(e.v, e.v))) AS sc
  FROM short s JOIN e ON e.vec_id = s.c_id
),
ranked AS (
  SELECT q_id, c_id, sc,
         row_number() OVER (PARTITION BY q_id ORDER BY sc DESC, c_id) AS rank
  FROM resc
)
SELECT q_id, c_id, ROUND(sc, 6) AS score, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
ORDER BY q_id, rank
"""


def sim_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ two-stage ANN as a declared query
    (``operators/similarity.py::topk_cosine_ivf_pq``): 4 deterministic
    coarse cells, nprobe=2, PQ codes (m=4 subspaces × 8 codewords =
    4 bytes/vector vs 64 for SQ8) scored via reconstruction in the
    probed cells, float re-rank of the top 20.  Deterministic lite
    codebooks let the oracle re-derive encode → decode → approximate
    rank → rescore bit-for-bit, so the PQ machinery is value-checked,
    not just recall-tested."""
    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    q = e.filter(F.col("vec_id") < 5)
    cents = sim.train_centroids_kmeanspp_lite(e, 4)
    books = sim.train_pq_codebooks_lite(e, m=4, ks=8)
    out = sim.topk_cosine_ivf_pq(e, q, cents, books, k=5, nprobe=2)
    return out.select(
        "q_id", "c_id", F.round("score", 6).alias("score"), "rank"
    ).orderBy("q_id", "rank")


def sim_ivf_pq_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving twin of ``sim_ivf_pq`` (VERDICT r5 task 6): the identical
    query answered from the PERSISTED IVF-PQ index
    (``write_ivf_index`` + ``topk_cosine_ivf_pq_indexed``).  The
    training + encode + index write run once per testdata fingerprint
    (offline on a real cluster); what this query times is the
    scale-relevant serving path — probed-cell partition pruning, m-byte
    PQ codes in the approximate scan, broadcast-shortlist float
    rescore.  Same deterministic quantizer/codebooks as ``sim_ivf_pq``,
    so the result — and the oracle — are identical."""
    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    q = e.filter(F.col("vec_id") < 5)
    path = _index_cache_path(sf_dir, "embeddings.parquet", "ivf_pq")

    def _build():
        cents = sim.train_centroids_kmeanspp_lite(e, 4)
        books = sim.train_pq_codebooks_lite(e, m=4, ks=8)
        sim.write_ivf_index(e, cents, path, pq_codebooks=books)

    _cached_index(path, _build)
    out = sim.topk_cosine_ivf_pq_indexed(spark, path, q, k=5, nprobe=2)
    return out.select(
        "q_id", "c_id", F.round("score", 6).alias("score"), "rank"
    ).orderBy("q_id", "rank")


SIM_IVF_PQ_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS cv
  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 4)
),
asg AS (
  SELECT vec_id, v, cell FROM (
    SELECT e.vec_id, e.v, c.cell,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             list_dot_product(e.v, c.cv) /
             (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
             c.cell) AS rn
    FROM e CROSS JOIN cents c) WHERE rn = 1
),
cb AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, v
  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8)
),
enc AS (
  SELECT vec_id, s, j AS code FROM (
    SELECT e.vec_id, s.s, cb.j,
           row_number() OVER (PARTITION BY e.vec_id, s.s ORDER BY
             list_sum(list_transform(range(1, 17),
               i -> (e.v[s.s*16 + i] - cb.v[s.s*16 + i]) * (e.v[s.s*16 + i] - cb.v[s.s*16 + i]))),
             cb.j) AS rn
    FROM e CROSS JOIN range(0, 4) AS s(s) CROSS JOIN cb) WHERE rn = 1
),
vh AS (
  SELECT vec_id, flatten(list(cw ORDER BY s)) AS vhat FROM (
    SELECT enc.vec_id, enc.s, cb.v[enc.s*16 + 1 : (enc.s + 1)*16] AS cw
    FROM enc JOIN cb ON cb.j = enc.code)
  GROUP BY vec_id
),
q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 5),
qcells AS (
  SELECT q_id, qv, cell FROM (
    SELECT q.q_id, q.qv, c.cell,
           row_number() OVER (PARTITION BY q.q_id ORDER BY
             list_dot_product(q.qv, c.cv) /
             (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
             c.cell DESC) AS rn
    FROM q CROSS JOIN cents c) WHERE rn <= 2
),
approx AS (
  SELECT q_id, qv, a.vec_id AS c_id,
         list_dot_product(qv, vh.vhat) /
         (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(vh.vhat, vh.vhat))) AS a
  FROM qcells JOIN asg a USING (cell) JOIN vh ON vh.vec_id = a.vec_id
  WHERE a.vec_id <> q_id
),
short AS (
  SELECT q_id, qv, c_id FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY a DESC, c_id) AS arn
    FROM approx) WHERE arn <= 20
),
resc AS (
  SELECT q_id, s.c_id,
         list_dot_product(qv, e.v) /
         (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(e.v, e.v))) AS sc
  FROM short s JOIN e ON e.vec_id = s.c_id
),
ranked AS (
  SELECT q_id, c_id, sc,
         row_number() OVER (PARTITION BY q_id ORDER BY sc DESC, c_id) AS rank
  FROM resc
)
SELECT q_id, c_id, ROUND(sc, 6) AS score, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
ORDER BY q_id, rank
"""


def sim_ann_lsh_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND-OR amplified ANN: 3 independent 9-plane tables, OR'd — the
    recall-amplified scale path (recall floor pinned in
    tests/test_scale_ops.py; candidates ≈ single-table multi-probe at
    nprobe=2 budget)."""
    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    q = e.filter(F.col("vec_id") < 10)
    out = sim.topk_cosine_lsh_tables(e, q, dim=64, k=5, planes=9, tables=3)
    return out.select(
        "q_id", "c_id", F.round("score", 6).alias("score"), "rank"
    ).orderBy("q_id", "rank")


def _ann_lsh_tables_sql(dim: int = 64, planes: int = 9, tables: int = 3) -> str:
    def bucket_expr(seed: int) -> str:
        hps = sim._hyperplanes(dim, planes, seed)
        return " + ".join(
            f"(CASE WHEN list_dot_product(v, {hp!r}::DOUBLE[]) >= 0 "
            f"THEN {1 << i} ELSE 0 END)"
            for i, hp in enumerate(hps)
        )

    buckets = ",\n         ".join(
        f"({bucket_expr(11 + 101 * t)}) AS b{t}" for t in range(tables)
    )
    or_cond = " OR ".join(f"e.b{t} = q.b{t}" for t in range(tables))
    bsel = ", ".join(f"b{t}" for t in range(tables))
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         {buckets}
  FROM embeddings
), q AS (SELECT vec_id AS q_id, v AS qv, {bsel} FROM e WHERE vec_id < 10),
scored AS (
  SELECT q.q_id, e.vec_id AS c_id,
         list_dot_product(qv, v) /
         (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS s
  FROM q JOIN e ON ({or_cond}) AND e.vec_id <> q.q_id
), ranked AS (
  SELECT q_id, c_id, s,
         row_number() OVER (PARTITION BY q_id ORDER BY s DESC, c_id) AS rank
  FROM scored
)
SELECT q_id, c_id, ROUND(s, 6) AS score, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
ORDER BY q_id, rank
"""


_CHUNK = 16  # tokens per training chunk (small so the testdata multi-chunks)


def tx_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: split every document into fixed-size
    token chunks (the flatMap that feeds sequence packing / RAG
    indexing).  Narrow per-doc arithmetic — tokens staged once behind a
    projection, then one explode over the chunk indices; no shuffle
    until the presentation sort."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", tx.tokens(F.col("text")).alias("_t")).filter(
        F.size("_t") > 0
    )
    nchunks = F.ceil(F.size("_t") / F.lit(float(_CHUNK))).cast("int")
    c = t.select(
        "doc_id",
        "_t",
        F.explode(F.sequence(F.lit(0), nchunks - 1)).alias("chunk_idx"),
    )
    return c.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.least(
            F.lit(_CHUNK), F.size("_t") - F.col("chunk_idx") * _CHUNK
        ).cast("int").alias("n_tok"),
        F.element_at("_t", F.col("chunk_idx") * _CHUNK + 1).alias("first_token"),
    ).orderBy("doc_id", "chunk_idx")


TX_CHUNK_SQL = f"""
WITH t AS (SELECT doc_id, {TOKENS_SQL} AS t FROM documents),
c AS (SELECT doc_id, t,
             unnest(range(0, CAST(ceil(len(t) / {float(_CHUNK)}) AS BIGINT))) AS ci
      FROM t WHERE len(t) > 0)
SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
       CAST(LEAST({_CHUNK}, len(t) - ci * {_CHUNK}) AS INT) AS n_tok,
       t[ci * {_CHUNK} + 1] AS first_token
FROM c ORDER BY doc_id, chunk_idx
"""


_PACK_CAP = 128  # tokens per packed training bin


def tx_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing per source shard (first-fit-contiguous,
    capacity 128 tokens): per-bin document counts, token fill, and the
    id checksum — the curation→batch-assembly bridge.  Sequential per
    shard via applyInPandas; the oracle replays the identical
    recurrence as a recursive CTE."""
    from ..operators.packing import pack_greedy

    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "source", "doc_id", tx.token_count(F.col("text")).alias("ntok")
    )
    packed = pack_greedy(t, "source", "doc_id", "ntok", _PACK_CAP)
    return (
        packed.groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ntok").alias("fill_tokens"),
            F.sum("doc_id").alias("sum_ids"),
        )
        .orderBy("source", "bin_id")
    )


def _tx_packing_sql() -> str:
    from ..operators.packing import pack_recurrence_sql

    body = pack_recurrence_sql(
        f"SELECT source, doc_id, len({TOKENS_SQL}) AS ntok FROM documents",
        "source",
        "doc_id",
        "ntok",
        _PACK_CAP,
    )
    return f"""
SELECT source, bin_id, COUNT(*) AS n_docs,
       CAST(SUM(ntok) AS BIGINT) AS fill_tokens,
       CAST(SUM(doc_id) AS BIGINT) AS sum_ids
FROM ({body})
GROUP BY source, bin_id
ORDER BY source, bin_id
"""


def sim_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids — the distributed vector-mean shape
    (the k-means update step as a declared, oracle-checked query):
    posexplode to (label, dim, x), one groupBy whose key space is
    labels·dim.  At 100 TB only label·dim aggregates cross the exchange,
    never vectors."""
    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    return (
        e.select("label", F.posexplode("v").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(F.round(F.avg("x"), 6).alias("avg_v"))
        .orderBy("label", "dim")
    )


SIM_CENTROIDS_SQL = """
WITH ex AS (
  SELECT label, unnest(embedding::DOUBLE[]) AS x,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings)
SELECT label, CAST(i - 1 AS INT) AS dim, ROUND(AVG(x), 6) AS avg_v
FROM ex GROUP BY 1, 2 ORDER BY label, dim
"""


def tx_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition / stopword quality rules (Rae et al. 2021
    §A1.1, public): per language, how many docs trip the
    duplicate-3-gram rule (repetition_ratio > 0.01) or the low-stopword
    rule (stopword_ratio < 0.03), plus the mean ratios.  Pure column
    expressions — scan-stage work, one aggregate."""
    d = load_table(spark, sf_dir, "documents")
    rep = tx.repetition_ratio(F.col("text"))
    stw = tx.stopword_ratio(F.col("text"))
    return (
        d.select("lang", rep.alias("_rep"), stw.alias("_stw"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("_rep") > 0.01).cast("int")).alias("n_repetitive"),
            F.sum((F.col("_stw") < 0.03).cast("int")).alias("n_low_stopword"),
            F.round(F.avg("_rep"), 4).alias("avg_repetition"),
            F.round(F.avg("_stw"), 4).alias("avg_stopword"),
        )
        .orderBy("lang")
    )


_STOPWORDS_SQL = "[" + ",".join(f"'{w}'" for w in tx.STOPWORDS["en"]) + "]"
TX_GOPHER_SQL = f"""
WITH t AS (SELECT lang, {TOKENS_SQL} AS t FROM documents),
s AS (SELECT lang,
        CASE WHEN len(t) >= 3
             THEN list_transform(range(0, len(t) - 2),
                                 i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
             ELSE [array_to_string(t, ' ')] END AS sh,
        len(t) AS nt,
        len(list_filter(t, x -> list_contains({_STOPWORDS_SQL}, x))) AS nstop
      FROM t),
r AS (SELECT lang,
        CASE WHEN len(sh) > 0
             THEN 1.0 - CAST(len(list_distinct(sh)) AS DOUBLE) / len(sh)
             ELSE 0.0 END AS rep,
        CASE WHEN nt > 0 THEN CAST(nstop AS DOUBLE) / nt ELSE 0.0 END AS stw
      FROM s)
SELECT lang, COUNT(*) AS n,
       CAST(SUM(CASE WHEN rep > 0.01 THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive,
       CAST(SUM(CASE WHEN stw < 0.03 THEN 1 ELSE 0 END) AS BIGINT) AS n_low_stopword,
       ROUND(AVG(rep), 4) AS avg_repetition,
       ROUND(AVG(stw), 4) AS avg_stopword
FROM r GROUP BY lang ORDER BY lang
"""


# --- text analysis ------------------------------------------------------------


def tx_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("lang", tx.token_count(F.col("text")).alias("ntok"), "n_chars")
        .groupBy("lang")
        .agg(
            F.round(F.avg("ntok"), 6).alias("avg_tokens"),
            F.sum("n_chars").alias("sum_chars"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .orderBy("lang")
    )


TX_TOKEN_SQL = f"""
SELECT lang,
       ROUND(AVG(len({TOKENS_SQL})), 6) AS avg_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       COUNT(*) AS n_docs
FROM documents
GROUP BY lang ORDER BY lang
"""


def tx_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(tx.tokens(F.col("text")).alias("_t"))
        .select(tx.detect_language_from_tokens(F.col("_t")).alias("detected"))
        .groupBy("detected")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("detected").asc_nulls_first())
    )


def _langid_sql() -> str:
    hit_exprs = {
        lang: (
            f"len(list_filter(t, x -> list_contains({words!r}, x)))"
        )
        for lang, words in tx.STOPWORDS.items()
    }
    best = "GREATEST(" + ", ".join(f"h_{la}" for la in tx.STOPWORDS) + ")"
    chain = " ".join(
        f"WHEN h_{la} = {best} AND {best} > 0 THEN '{la}'" for la in tx.STOPWORDS
    )
    hits_sel = ", ".join(f"{e} AS h_{la}" for la, e in hit_exprs.items())
    return f"""
WITH toks AS (SELECT {TOKENS_SQL} AS t FROM documents),
hits AS (SELECT {hits_sel} FROM toks)
SELECT (CASE {chain} ELSE NULL END) AS detected, COUNT(*) AS n
FROM hits GROUP BY 1 ORDER BY detected ASC NULLS FIRST
"""


def tx_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("lang", tx.quality_score(F.col("text")).alias("q"))
        .groupBy("lang")
        .agg(F.round(F.sum("q"), 4).alias("sum_quality"), F.count(F.lit(1)).alias("n"))
        .orderBy("lang")
    )


TX_QUALITY_SQL = f"""
WITH d AS (
  SELECT lang,
         LENGTH(text) AS n,
         LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
         LENGTH(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS punct,
         len({TOKENS_SQL}) AS ntok
  FROM documents
), q AS (
  SELECT lang,
         (CASE WHEN n > 0 THEN alpha * 1.0 / n ELSE 0.0 END) * 0.5
         + (1 - LEAST((CASE WHEN n > 0 THEN punct * 1.0 / n ELSE 0.0 END) * 5, 1.0)) * 0.25
         + (CASE WHEN ntok >= 5 AND ntok <= 5000 THEN 1.0 ELSE 0.5 END) * 0.25 AS q
  FROM d
)
SELECT lang, ROUND(SUM(q), 4) AS sum_quality, COUNT(*) AS n
FROM q GROUP BY lang ORDER BY lang
"""


def tx_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", tx.fingerprint(F.col("text")).alias("fp")
    ).orderBy("doc_id")


TX_FP_SQL = f"""
WITH toks AS (SELECT doc_id, {TOKENS_SQL} AS t FROM documents),
th AS (
  SELECT doc_id,
         list_transform(t, s ->
           list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(range(1, len(s) + 1), i -> ascii(substr(s, i, 1)))),
             (a, b) -> (a * 31 + b) % 2147483648)) AS hs
  FROM toks
)
SELECT doc_id,
       list_reduce(list_prepend(CAST(0 AS BIGINT), hs),
                   (a, b) -> (a * 1000003 + b) % 2147483648) AS fp
FROM th ORDER BY doc_id
"""


# --- sampling -----------------------------------------------------------------


def sp_group_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain capping: at most 30 docs per source, selected by the
    portable keyed shuffle hash — the 'no domain dominates' corpus rule,
    reproducible across engines and reruns."""
    from ..operators.sampling import quota_per_group

    d = load_table(spark, sf_dir, "documents")
    kept = quota_per_group(d, ["source"], 30, "doc_id", seed=17)
    return kept.select("doc_id", "lang", "source").orderBy("doc_id")


def _sp_quota_sql() -> str:
    from ..operators.split import shuffle_hash_sql

    h = shuffle_hash_sql("doc_id", 17)
    return f"""
WITH ranked AS (
  SELECT doc_id, lang, source,
         row_number() OVER (PARTITION BY source ORDER BY {h}, doc_id) AS rn
  FROM documents
)
SELECT doc_id, lang, source FROM ranked WHERE rn <= 30 ORDER BY doc_id
"""


_STRAT_FRACS = {"en": 0.1, "de": 0.5, "es": 0.25, "fr": 0.5, "zh": 0.2}


def sp_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Bernoulli sampling by hash threshold (deterministic
    sampleBy): rebalances the lang mix without a shuffle — the predicate
    pushes to the scan."""
    from ..operators.sampling import stratified_sample

    d = load_table(spark, sf_dir, "documents")
    return (
        stratified_sample(d, "lang", _STRAT_FRACS, "doc_id", seed=23)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


def _sp_strat_sql() -> str:
    from ..operators.sampling import stratified_sample_sql

    pred = stratified_sample_sql("lang", _STRAT_FRACS, "doc_id", 23)
    return f"SELECT doc_id, lang FROM documents WHERE {pred} ORDER BY doc_id"


_MIX_WEIGHTS = {"en": 2.25, "de": 1.0, "es": 0.5, "fr": 1.5, "zh": 0.25}


def sp_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixing with fractional epoch weights: languages are up/
    down-sampled to their mixture weight (en×2.25, es×0.5, …) with the
    stochastic extra epoch keyed on the portable id hash — the LLM
    data-mixture operator, reproducible across engines."""
    from ..operators.sampling import weighted_repeat

    d = load_table(spark, sf_dir, "documents")
    out = weighted_repeat(d, "lang", _MIX_WEIGHTS, "doc_id", seed=29)
    return out.select(
        "doc_id", "lang", F.col("epoch").cast("long").alias("epoch")
    ).orderBy("doc_id", "epoch")


def _sp_mix_sql() -> str:
    from ..operators.sampling import weighted_repeat_sql

    body = weighted_repeat_sql("lang", _MIX_WEIGHTS, "doc_id", 29)
    return f"SELECT doc_id, lang, epoch FROM ({body}) ORDER BY doc_id, epoch"


# --- decontamination ----------------------------------------------------------

_DC_N = 8  # n-gram length for benchmark-overlap checks


def _shingle_fold_sql(n: int) -> str:
    expr = "CAST(0 AS BIGINT)"
    for d in range(n):
        expr = f"(({expr}) * 1000003 + th[i + {d + 1}]) % 2147483648"
    return expr


def _shingle_cte_sql(n: int, src: str = "documents", tag: str | None = None) -> str:
    """Generic twin of _SHINGLE_HASHES_SQL over any source CTE/table
    (CTEs ``toks{tag}``/``shing{tag}``, tag defaults to n)."""
    tag = str(n) if tag is None else tag
    fold = _shingle_fold_sql(n)
    return f"""
toks{tag} AS (SELECT doc_id, {_TOKEN_HASHES_SQL} AS th FROM {src}),
shing{tag} AS (
  SELECT doc_id,
         CASE WHEN len(th) >= {n} THEN
           list_distinct(list_transform(range(0, len(th) - {n - 1}), i -> {fold}))
         ELSE [list_reduce(list_prepend(CAST(0 AS BIGINT), th),
                           (a, b) -> (a * 1000003 + b) % 2147483648)]
         END AS hs
  FROM toks{tag}
)"""


def dc_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: every 97th document plays the held-out
    eval set; corpus documents sharing any 8-gram with it are reported
    with hit counts — the benchmark side is broadcast, so the corpus
    never shuffles."""
    from ..operators.decontam import contamination

    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    corpus = d.filter(F.col("doc_id") % 97 != 0)
    return contamination(corpus, bench, "doc_id", "text", n=_DC_N).orderBy(
        "doc_id"
    )


def _dc_sql() -> str:
    return f"""
WITH {_shingle_cte_sql(_DC_N)},
bench AS (SELECT DISTINCT unnest(hs) AS sh FROM shing{_DC_N} WHERE doc_id % 97 = 0),
corpus AS (SELECT doc_id, CAST(len(hs) AS INT) AS ng, unnest(hs) AS sh
           FROM shing{_DC_N} WHERE doc_id % 97 <> 0)
SELECT c.doc_id, ng AS n_grams, COUNT(*) AS n_hits,
       ROUND(CAST(COUNT(*) AS DOUBLE) / ng, 6) AS rate
FROM corpus c JOIN bench b ON c.sh = b.sh
GROUP BY c.doc_id, ng
ORDER BY c.doc_id
"""


_CLF_DIM = 64


def tx_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring (the FineWeb-Edu tier): hashed
    mean-pooled BOW logit under deterministic LCG weights → sigmoid.
    Zero-shuffle narrow map with the weight vector as one broadcast row;
    the oracle inlines the identical weights and fold."""
    from ..functions.classifier import lcg_weights, score_documents

    d = load_table(spark, sf_dir, "documents")
    w = lcg_weights(_CLF_DIM, seed=17)
    out = score_documents(d, "text", w, bias=0.1)
    return out.select(
        "doc_id", F.round("clf_score", 6).alias("clf_score")
    ).orderBy("doc_id")


def _clf_sql() -> str:
    from ..functions.classifier import lcg_weights

    w = lcg_weights(_CLF_DIM, seed=17)
    wlit = "[" + ", ".join(repr(x) for x in w) + "]::DOUBLE[]"
    z = (
        "0.1 + (CASE WHEN len(th) > 0 THEN "
        f"list_sum(list_transform(th, h -> w[CAST(h % {_CLF_DIM} AS INT) + 1])) / len(th) "
        "ELSE 0.0 END)"
    )
    return f"""
WITH t AS (SELECT doc_id, {_TOKEN_HASHES_SQL} AS th FROM documents),
ws AS (SELECT doc_id, th, {wlit} AS w FROM t)
SELECT doc_id, ROUND(1.0 / (1.0 + exp(-({z}))), 6) AS clf_score
FROM ws ORDER BY doc_id
"""


def dc_fuzzy_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paraphrase-robust decontamination: corpus docs MinHash-banded
    against the held-out slice, exact-Jaccard-verified — benchmark side
    broadcast, corpus hashed once, candidates only at the verify."""
    from ..operators.decontam import fuzzy_contamination

    d = load_table(spark, sf_dir, "documents")
    # %5 split (not the %97 one): the synthetic near-dup clusters must
    # straddle the corpus/benchmark boundary for the query to exercise
    # the fuzzy path on >0 rows
    bench = d.filter(F.col("doc_id") % 5 == 0)
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    return fuzzy_contamination(
        corpus, bench, "doc_id", "text", min_jaccard=_DC_FUZZY_T
    ).orderBy("doc_id", "bench_id")


_DC_FUZZY_T = 0.4


def _dc_fuzzy_sql() -> str:
    jac = "CAST(len(list_intersect(sc.hs, sb.hs)) AS DOUBLE) / (len(sc.hs) + len(sb.hs) - len(list_intersect(sc.hs, sb.hs)))"
    return f"""
WITH {_shingle_cte_sql(3, "documents", "f")}, {_minhash_pair_ctes_from("shingf", "f")},
cand AS (
  SELECT DISTINCT c.doc_id, b.doc_id AS bench_id
  FROM (SELECT * FROM bandrowsf WHERE doc_id % 5 <> 0) c
  JOIN (SELECT * FROM bandrowsf WHERE doc_id % 5 = 0) b
    ON c.band = b.band AND c.bucket = b.bucket
)
SELECT cand.doc_id, cand.bench_id, ROUND({jac}, 6) AS jaccard
FROM cand
JOIN shingf sc ON sc.doc_id = cand.doc_id
JOIN shingf sb ON sb.doc_id = cand.bench_id
WHERE ROUND({jac}, 6) >= {_DC_FUZZY_T}
ORDER BY cand.doc_id, cand.bench_id
"""


def dc_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dc_contamination through the Bloom semi-join prefilter — the
    at-scale form for benchmark gram sets past the broadcast threshold.
    Lossless by construction (no false negatives + exact join behind the
    bloom), so it shares dc_contamination's oracle verbatim."""
    from ..operators.decontam import contamination_bloom

    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    corpus = d.filter(F.col("doc_id") % 97 != 0)
    return contamination_bloom(corpus, bench, "doc_id", "text", n=_DC_N).orderBy(
        "doc_id"
    )


# --- end-to-end curation ------------------------------------------------------


def cur_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation funnel report — per-stage survivor counts through the
    flagship chain (corpus → quality → exact-dedup → near-dup-free →
    decontaminated → quota-capped): the audit artifact every production
    pipeline publishes alongside its output.  Each stage is one count
    over the same lazy chain ``curate`` runs; the mixture stage is
    excluded (it multiplies rows, not documents)."""
    from ..operators.decontam import contamination
    from ..operators.sampling import quota_per_group

    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    corpus = d.filter(F.col("doc_id") % 97 != 0)

    good = corpus.filter(tx.quality_score(F.col("text")) >= 0.5)
    keyed = good.withColumn("_fp", tx.fingerprint(F.col("text")))
    uniq = dd.exact_dedup(keyed, ["_fp"], "doc_id").drop("_fp").localCheckpoint()
    pairs = dd.minhash_lsh_pairs(uniq, "doc_id", "text", num_perm=16, bands=4)
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    neat = uniq.join(F.broadcast(losers), "doc_id", "left_anti").localCheckpoint()
    contaminated = contamination(neat, bench, "doc_id", "text", n=_DC_N).select(
        "doc_id"
    )
    clean = neat.join(F.broadcast(contaminated), "doc_id", "left_anti")
    capped = quota_per_group(clean, ["source"], 30, "doc_id", seed=17)

    stages = [
        ("corpus", corpus),
        ("quality", good),
        ("exact", uniq),
        ("neardup", neat),
        ("decontam", clean),
        ("quota", capped),
    ]
    out = None
    for i, (name, df_) in enumerate(stages):
        row = df_.agg(F.count(F.lit(1)).alias("n_docs")).select(
            F.lit(i).alias("stage_ord"),
            F.lit(name).alias("stage"),
            "n_docs",
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("stage_ord")


def _cur_funnel_sql() -> str:
    from ..operators.split import shuffle_hash_sql

    fp_hash = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), th), "
        "(a, b) -> (a * 1000003 + b) % 2147483648)"
    )
    qh = shuffle_hash_sql("doc_id", 17)
    return f"""
WITH corpus0 AS (
  SELECT doc_id, lang, source, text FROM documents WHERE doc_id % 97 <> 0
), good AS (
  SELECT doc_id, lang, source, text FROM corpus0
  WHERE {_quality_expr_sql()} >= 0.5
), fpth AS (
  SELECT doc_id, lang, source, text, {_TOKEN_HASHES_SQL} AS th FROM good
), fp AS (
  SELECT doc_id, lang, source, text, {fp_hash} AS _fp FROM fpth
), uniq AS (
  SELECT doc_id, lang, source, text FROM (
    SELECT *, row_number() OVER (PARTITION BY _fp ORDER BY doc_id) AS rn FROM fp
  ) WHERE rn = 1
), {_shingle_cte_sql(3, "uniq", "u")}, {_minhash_pair_ctes_from("shingu", "u")},
neat AS (
  SELECT * FROM uniq WHERE doc_id NOT IN (SELECT id_b FROM pairsu)
), {_shingle_cte_sql(8, "(SELECT * FROM documents WHERE doc_id % 97 = 0)", "b")},
bgrams AS (SELECT DISTINCT unnest(hs) AS sh FROM shingb),
{_shingle_cte_sql(8, "neat", "n")},
contam AS (
  SELECT DISTINCT g.doc_id
  FROM (SELECT doc_id, unnest(hs) AS sh FROM shingn) g JOIN bgrams USING (sh)
), clean AS (
  SELECT * FROM neat WHERE doc_id NOT IN (SELECT doc_id FROM contam)
), capped AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           row_number() OVER (PARTITION BY source ORDER BY {qh}, doc_id) AS rn
    FROM clean
  ) WHERE rn <= 30
)
SELECT 0 AS stage_ord, 'corpus' AS stage, COUNT(*) AS n_docs FROM corpus0
UNION ALL SELECT 1, 'quality', COUNT(*) FROM good
UNION ALL SELECT 2, 'exact', COUNT(*) FROM uniq
UNION ALL SELECT 3, 'neardup', COUNT(*) FROM neat
UNION ALL SELECT 4, 'decontam', COUNT(*) FROM clean
UNION ALL SELECT 5, 'quota', COUNT(*) FROM capped
ORDER BY stage_ord
"""


def cur_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship composition: quality filter → exact dedup → MinHash
    near-dup dedup → benchmark decontamination → per-source quota →
    language mixture, as one DataFrame plan (see plans/curation.py for
    the shuffle census)."""
    from ..plans.curation import curate

    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    corpus = d.filter(F.col("doc_id") % 97 != 0)
    out = curate(corpus, bench, _MIX_WEIGHTS)
    return out.select(
        "doc_id", "lang", "source", F.col("epoch").cast("long").alias("epoch")
    ).orderBy("doc_id", "epoch")


def _quality_expr_sql(t: str = "text") -> str:
    """quality_score as one SQL expression (explicit DOUBLE casts — no
    DECIMAL creep; mirrors functions.text.quality_score op-for-op)."""
    alpha = f"LENGTH(regexp_replace({t}, '[^A-Za-z]', '', 'g'))"
    punct = f"LENGTH(regexp_replace({t}, '[^.,;:!?]', '', 'g'))"
    ar = f"(CASE WHEN LENGTH({t}) > 0 THEN CAST({alpha} AS DOUBLE) / LENGTH({t}) ELSE 0.0 END)"
    pr = f"(CASE WHEN LENGTH({t}) > 0 THEN CAST({punct} AS DOUBLE) / LENGTH({t}) ELSE 0.0 END)"
    ok = f"(CASE WHEN len({TOKENS_SQL}) >= 5 AND len({TOKENS_SQL}) <= 5000 THEN 1.0 ELSE 0.5 END)"
    return f"({ar} * 0.5 + (1 - LEAST({pr} * 5, 1.0)) * 0.25 + {ok} * 0.25)"


def _minhash_pair_ctes_from(
    shing: str, tag: str, num_perm: int = 16, bands: int = 4
) -> str:
    """sigs/bandrows/pairs CTEs over an existing shingle-hash CTE."""
    consts = dd._perm_constants(num_perm)
    rows = num_perm // bands
    mins = ", ".join(
        f"list_min(list_transform(hs, x -> (x * {a} + {b}) % 2147483647)) AS m{i}"
        for i, (a, b) in enumerate(consts)
    )
    band_exprs = []
    for bband in range(bands):
        expr = "CAST(0 AS BIGINT)"
        for r in range(rows):
            expr = f"(({expr}) * 31 + m{bband * rows + r}) % 2147483648"
        band_exprs.append(f"({bband}, {expr})")
    return f"""sigs{tag} AS (
  SELECT doc_id, {mins} FROM {shing}
), bandrows{tag} AS (
  SELECT doc_id, b.band, b.bucket
  FROM sigs{tag}, LATERAL (VALUES {', '.join(band_exprs)}) AS b(band, bucket)
), pairs{tag} AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bandrows{tag} a JOIN bandrows{tag} b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)"""


def _cur_sql() -> str:
    from ..operators.sampling import weighted_repeat_sql
    from ..operators.split import shuffle_hash_sql

    fp_hash = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), th), "
        "(a, b) -> (a * 1000003 + b) % 2147483648)"
    )
    qh = shuffle_hash_sql("doc_id", 17)
    mix = weighted_repeat_sql("lang", _MIX_WEIGHTS, "doc_id", 29, src="capped")
    return f"""
WITH corpus0 AS (
  SELECT doc_id, lang, source, text FROM documents WHERE doc_id % 97 <> 0
), good AS (
  SELECT doc_id, lang, source, text FROM corpus0
  WHERE {_quality_expr_sql()} >= 0.5
), fpth AS (
  SELECT doc_id, lang, source, text, {_TOKEN_HASHES_SQL} AS th FROM good
), fp AS (
  SELECT doc_id, lang, source, text, {fp_hash} AS _fp FROM fpth
), uniq AS (
  SELECT doc_id, lang, source, text FROM (
    SELECT *, row_number() OVER (PARTITION BY _fp ORDER BY doc_id) AS rn FROM fp
  ) WHERE rn = 1
), {_shingle_cte_sql(3, "uniq", "u")}, {_minhash_pair_ctes_from("shingu", "u")},
neat AS (
  SELECT * FROM uniq WHERE doc_id NOT IN (SELECT id_b FROM pairsu)
), {_shingle_cte_sql(8, "(SELECT * FROM documents WHERE doc_id % 97 = 0)", "b")},
bgrams AS (SELECT DISTINCT unnest(hs) AS sh FROM shingb),
{_shingle_cte_sql(8, "neat", "n")},
contam AS (
  SELECT DISTINCT g.doc_id
  FROM (SELECT doc_id, unnest(hs) AS sh FROM shingn) g JOIN bgrams USING (sh)
), clean AS (
  SELECT * FROM neat WHERE doc_id NOT IN (SELECT doc_id FROM contam)
), capped AS (
  SELECT doc_id, lang, source FROM (
    SELECT doc_id, lang, source,
           row_number() OVER (PARTITION BY source ORDER BY {qh}, doc_id) AS rn
    FROM clean
  ) WHERE rn <= 30
)
SELECT doc_id, lang, source, epoch FROM ({mix}) ORDER BY doc_id, epoch
"""


_CLF_GATE = 0.5249  # ~30th percentile of corpus scores — a real gate


def cur_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-5 flagship composition: classifier gate → duplicate-
    span removal (text REWRITTEN) → quality → exact dedup → MinHash
    near-dup → decontamination (exact ∪ fuzzy) → quota → mixture, as
    one plan (plans/curation.py::curate_v2).  %5 split so the fuzzy
    decontam tier has cross-boundary near-dups to catch."""
    from ..functions.classifier import lcg_weights
    from ..plans.curation import curate_v2

    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 5 == 0)
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    out = curate_v2(
        corpus,
        bench,
        _MIX_WEIGHTS,
        clf_weights=lcg_weights(_CLF_DIM, seed=17),
        clf_bias=0.1,
        clf_min=_CLF_GATE,
        fuzzy_jaccard=_DC_FUZZY_T,
    )
    return out.select(
        "doc_id", "lang", "source", F.col("epoch").cast("long").alias("epoch")
    ).orderBy("doc_id", "epoch")


def _cur_v2_sql() -> str:
    from ..functions.classifier import lcg_weights
    from ..operators.sampling import weighted_repeat_sql
    from ..operators.split import shuffle_hash_sql

    w = lcg_weights(_CLF_DIM, seed=17)
    wlit = "[" + ", ".join(repr(x) for x in w) + "]::DOUBLE[]"
    clf_z = (
        "0.1 + (CASE WHEN len(th) > 0 THEN "
        f"list_sum(list_transform(th, h -> w[CAST(h % {_CLF_DIM} AS INT) + 1])) / len(th) "
        "ELSE 0.0 END)"
    )
    fp_hash = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), th), "
        "(a, b) -> (a * 1000003 + b) % 2147483648)"
    )
    jac = (
        "CAST(len(list_intersect(sc.hs, sb.hs)) AS DOUBLE) / "
        "(len(sc.hs) + len(sb.hs) - len(list_intersect(sc.hs, sb.hs)))"
    )
    qh = shuffle_hash_sql("doc_id", 17)
    mix = weighted_repeat_sql("lang", _MIX_WEIGHTS, "doc_id", 29, src="capped2")
    return f"""
WITH corpus0 AS (
  SELECT doc_id, lang, source, text FROM documents WHERE doc_id % 5 <> 0
), bench0 AS (
  SELECT doc_id, lang, source, text FROM documents WHERE doc_id % 5 = 0
), gth AS (
  SELECT doc_id, lang, source, text, {_TOKEN_HASHES_SQL} AS th, {wlit} AS w
  FROM corpus0
), gated AS (
  SELECT doc_id, lang, source, text FROM gth
  WHERE 1.0 / (1.0 + exp(-({clf_z}))) >= {_CLF_GATE}
), {_span_removal_ctes("gated", "v")},
rewritten AS (
  SELECT g.doc_id, g.lang, g.source, s.clean_text AS text
  FROM gated g JOIN sroutv s ON s.doc_id = g.doc_id
), good2 AS (
  SELECT doc_id, lang, source, text FROM rewritten
  WHERE {_quality_expr_sql()} >= 0.5
), fpth2 AS (
  SELECT doc_id, lang, source, text, {_TOKEN_HASHES_SQL} AS th FROM good2
), fp2 AS (
  SELECT doc_id, lang, source, text, {fp_hash} AS _fp FROM fpth2
), uniq2 AS (
  SELECT doc_id, lang, source, text FROM (
    SELECT *, row_number() OVER (PARTITION BY _fp ORDER BY doc_id) AS rn FROM fp2
  ) WHERE rn = 1
), {_shingle_cte_sql(3, "uniq2", "u2")}, {_minhash_pair_ctes_from("shingu2", "u2")},
neat2 AS (
  SELECT * FROM uniq2 WHERE doc_id NOT IN (SELECT id_b FROM pairsu2)
), {_shingle_cte_sql(8, "bench0", "b2")},
bgrams2 AS (SELECT DISTINCT unnest(hs) AS sh FROM shingb2),
{_shingle_cte_sql(8, "neat2", "n2")},
contam_exact AS (
  SELECT DISTINCT g.doc_id
  FROM (SELECT doc_id, unnest(hs) AS sh FROM shingn2) g JOIN bgrams2 USING (sh)
), {_shingle_cte_sql(3, "bench0", "f2b")}, {_minhash_pair_ctes_from("shingf2b", "f2b")},
fcand AS (
  SELECT DISTINCT c.doc_id, b.doc_id AS bench_id
  FROM (SELECT * FROM bandrowsu2
        WHERE doc_id IN (SELECT doc_id FROM neat2)) c
  JOIN bandrowsf2b b ON c.band = b.band AND c.bucket = b.bucket
),
contam_fuzzy AS (
  SELECT DISTINCT fcand.doc_id
  FROM fcand
  JOIN shingu2 sc ON sc.doc_id = fcand.doc_id
  JOIN shingf2b sb ON sb.doc_id = fcand.bench_id
  WHERE ROUND({jac}, 6) >= {_DC_FUZZY_T}
),
clean2 AS (
  SELECT * FROM neat2 WHERE doc_id NOT IN (
    SELECT doc_id FROM contam_exact UNION SELECT doc_id FROM contam_fuzzy)
), capped2 AS (
  SELECT doc_id, lang, source FROM (
    SELECT doc_id, lang, source,
           row_number() OVER (PARTITION BY source ORDER BY {qh}, doc_id) AS rn
    FROM clean2
  ) WHERE rn <= 30
)
SELECT doc_id, lang, source, epoch FROM ({mix}) ORDER BY doc_id, epoch
"""


# --- corpus statistics --------------------------------------------------------

_QUANTS = [(1, 2), (9, 10), (99, 100)]  # p50 / p90 / p99


def tx_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact nearest-rank token-length quantiles per language — integer
    rank arithmetic, portable across engines (no float interpolation)."""
    from ..operators.stats import group_quantiles_exact

    d = load_table(spark, sf_dir, "documents")
    t = d.select("lang", tx.token_count(F.col("text")).alias("ntok"), "doc_id")
    return group_quantiles_exact(t, "lang", "ntok", _QUANTS, "doc_id").orderBy(
        "lang"
    )


def _tx_quant_sql() -> str:
    from ..operators.stats import group_quantiles_sql

    return (
        group_quantiles_sql(
            "lang", f"CAST(len({TOKENS_SQL}) AS INT)", _QUANTS, "doc_id"
        )
        + " ORDER BY lang"
    )


def tx_normalize_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization + redaction audit: per language, how many documents
    change under canonicalization / digit redaction, and a portable
    checksum of the transformed text (strongest per-row check that both
    engines produced byte-identical strings)."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "lang",
        tx.normalize_text(F.col("text")).alias("_norm"),
        tx.redact(F.col("text")).alias("_red"),
        "text",
    )
    return (
        t.groupBy("lang")
        .agg(
            F.sum((F.col("_norm") != F.col("text")).cast("int")).alias(
                "n_norm_changed"
            ),
            F.sum((F.col("_red") != F.col("text")).cast("int")).alias(
                "n_redacted"
            ),
            F.sum(tx.char_poly_hash(F.col("_norm"))).alias("norm_checksum"),
            F.sum(F.length("_red")).alias("sum_red_len"),
        )
        .orderBy("lang")
    )


def _tx_norm_sql() -> str:
    ch = _char_hash_sql("_norm")
    return f"""
WITH t AS (
  SELECT lang, text,
         trim(regexp_replace(lower(text), '[ \t\n\r]+', ' ', 'g')) AS _norm,
         regexp_replace(text, '[0-9]+', '#', 'g') AS _red
  FROM documents
)
SELECT lang,
       CAST(SUM(CASE WHEN _norm <> text THEN 1 ELSE 0 END) AS BIGINT) AS n_norm_changed,
       CAST(SUM(CASE WHEN _red <> text THEN 1 ELSE 0 END) AS BIGINT) AS n_redacted,
       CAST(SUM({ch}) AS BIGINT) AS norm_checksum,
       CAST(SUM(LENGTH(_red)) AS BIGINT) AS sum_red_len
FROM t GROUP BY lang ORDER BY lang
"""


def tx_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary heavy hitters: the 20 most frequent tokens corpus-wide
    (map-side partial agg + TakeOrderedAndProject — no full sort)."""
    from ..operators.stats import top_k_by_count

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(tx.tokens(F.col("text"))).alias("token"))
    return top_k_by_count(toks, ["token"], 20)


TX_TOP_SQL = f"""
WITH t AS (SELECT unnest({TOKENS_SQL}) AS token FROM documents)
SELECT token, COUNT(*) AS n FROM t
GROUP BY token ORDER BY n DESC, token LIMIT 20
"""


# --- multimodal ---------------------------------------------------------------


def _parallel_docs(d: DataFrame, *cols: str) -> DataFrame:
    """Documents projected to ``cols`` and hash-repartitioned to the
    session's default parallelism — the input stage of every mm_*
    media kernel.  At bench SF the documents table is ONE small parquet
    file → one input split, which would serialize the Arrow/Python
    kernels onto a single core (measured 3.2 s single-core vs ~0.4 s of
    actual compute for the MJPEG build).  At production scale the input
    arrives in many splits and this exchange is the partitioning the
    kernel wants anyway; the shuffle payload is just the projected
    columns."""
    sp = d.sparkSession
    return d.select(*cols).repartition(
        sp.sparkContext.defaultParallelism, "doc_id"
    )


def mm_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: documents' text bytes as binary
    payloads -> Arrow-batched mapInPandas feature extraction (byte
    histogram folded to 8 buckets)."""
    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    ).repartition(spark.sparkContext.defaultParallelism, "media_id")
    feats = extract_features(media)
    sel = [F.round(F.element_at("feature", k + 1).cast("double"), 6).alias(f"f{k}") for k in range(8)]
    return feats.select(F.col("media_id").alias("doc_id"), F.col("n_bytes"), *sel).orderBy(
        "doc_id"
    )


# Octet-level CTEs (ADVICE r1): the engine hashes UTF-8 *bytes*
# (F.encode), so the oracle must too — hex(encode(text)) exposes each byte
# as a hex pair, decoded with ascii() nibble arithmetic.  Correct for any
# input, not just ASCII (multi-byte chars count per-byte on both sides).
_CODES_CTE_SQL = """octets AS (
  SELECT doc_id, octet_length(encode(text)) AS n_bytes, hex(encode(text)) AS hx
  FROM documents
), codes AS (
  SELECT doc_id, n_bytes,
         list_transform(range(0, n_bytes), i ->
           (ascii(substr(hx, CAST(2 * i + 1 AS INT), 1))
              - CASE WHEN ascii(substr(hx, CAST(2 * i + 1 AS INT), 1)) <= 57
                     THEN 48 ELSE 55 END) * 16
           + ascii(substr(hx, CAST(2 * i + 2 AS INT), 1))
              - CASE WHEN ascii(substr(hx, CAST(2 * i + 2 AS INT), 1)) <= 57
                     THEN 48 ELSE 55 END) AS cs
  FROM octets
)"""

MM_SQL = f"""
WITH {_CODES_CTE_SQL}
SELECT doc_id, CAST(n_bytes AS INT) AS n_bytes,
""" + ",\n".join(
    f"       ROUND(len(list_filter(cs, c -> c % 8 = {k})) * 1.0 / GREATEST(n_bytes, 1), 6) AS f{k}"
    for k in range(8)
) + """
FROM codes ORDER BY doc_id
"""


_RAW_W, _RAW_H, _RAW_F = 8, 8, 2


def mm_raw_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAW-frame multimodal pipeline: each document's UTF-8 bytes play an
    8×8 RAW grayscale frame (truncated/zero-padded); the real NumPy
    block-mean kernel pools 2×2 → a 4×4 thumbnail, checked octet-exactly
    by the oracle."""
    from ..operators.multimodal import pool_raw_frames

    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
    ).repartition(spark.sparkContext.defaultParallelism, "media_id")
    pooled = pool_raw_frames(media, _RAW_W, _RAW_H, _RAW_F)
    k = (_RAW_W // _RAW_F) * (_RAW_H // _RAW_F)
    sel = [
        F.round(F.element_at("pooled", i + 1), 6).alias(f"p{i}")
        for i in range(k)
    ]
    return pooled.select(F.col("media_id").alias("doc_id"), *sel).orderBy(
        "doc_id"
    )


def _mm_raw_sql() -> str:
    ow = _RAW_W // _RAW_F
    oh = _RAW_H // _RAW_F
    cell = (
        f"list_transform(range(0, {_RAW_W * _RAW_H}), i -> "
        "CASE WHEN i < n_bytes THEN cs[CAST(i + 1 AS INT)] ELSE 0 END)"
    )
    cols = []
    for kk in range(ow * oh):
        r, c = kk // ow, kk % ow
        idx = [
            (_RAW_F * r + dr) * _RAW_W + (_RAW_F * c + dc) + 1
            for dr in range(_RAW_F)
            for dc in range(_RAW_F)
        ]
        s = " + ".join(f"f64[{i}]" for i in idx)
        cols.append(f"ROUND(({s}) / {_RAW_F * _RAW_F}.0, 6) AS p{kk}")
    return f"""
WITH {_CODES_CTE_SQL},
frames AS (SELECT doc_id, {cell} AS f64 FROM codes)
SELECT doc_id,
{',' .join(cols)}
FROM frames ORDER BY doc_id
"""


_RMS_W = 16


def mm_window_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-style windowed energy: document bytes as unsigned 8-bit PCM,
    exact per-window sum-of-squares + RMS (see operators.multimodal)."""
    from ..operators.multimodal import window_rms

    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
    ).repartition(spark.sparkContext.defaultParallelism, "media_id")
    out = window_rms(media, _RMS_W)
    return out.select(
        F.col("media_id").alias("doc_id"),
        "win_no",
        "sum_sq",
        F.round("rms", 6).alias("rms"),
    ).orderBy("doc_id", "win_no")


def _mm_rms_sql() -> str:
    w = _RMS_W
    return f"""
WITH {_CODES_CTE_SQL},
wins AS (
  SELECT doc_id, CAST(w AS INT) AS win_no,
         CAST(list_sum(list_transform(range(0, {w}), k ->
              CAST(cs[CAST(w * {w} + k + 1 AS INT)] AS BIGINT)
            * CAST(cs[CAST(w * {w} + k + 1 AS INT)] AS BIGINT))) AS BIGINT) AS sum_sq
  FROM codes, unnest(range(0, n_bytes // {w})) AS t(w)
)
SELECT doc_id, win_no, sum_sq,
       ROUND(sqrt(CAST(sum_sq AS DOUBLE) / {w}), 6) AS rms
FROM wins ORDER BY doc_id, win_no
"""


_WAV_W = 16


def mm_wav_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL container decode end-to-end: each document's UTF-8 bytes
    become 8-bit PCM samples inside a genuine RIFF/WAVE container
    (``functions/codecs.write_wav``), then ``decode_wav_rms`` parses
    the container back (fmt/data chunk walk, PCM validation) and emits
    exact centered sum-of-squares per 16-sample window.  The DuckDB
    oracle recomputes the same windows straight from the text octets —
    container round-trip + decode checked bit-for-bit."""
    from ..operators.multimodal import decode_wav_rms


    def build(batches):
        import numpy as np
        import pandas as pd

        from ..functions.codecs import write_wav

        for pdf in batches:
            payloads = [
                write_wav(
                    np.frombuffer(t.encode("utf-8"), dtype=np.uint8), 8000
                )
                for t in pdf["text"]
            ]
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = _cached_media(spark, sf_dir, "wav", build)
    out = decode_wav_rms(media, _WAV_W)
    return out.select(
        F.col("media_id").alias("doc_id"),
        "sample_rate",
        "win_no",
        "sum_sq",
        F.round("rms", 6).alias("rms"),
    ).orderBy("doc_id", "win_no")


def _mm_wav_sql() -> str:
    w = _WAV_W
    return f"""
WITH {_CODES_CTE_SQL},
wins AS (
  SELECT doc_id, CAST(w AS INT) AS win_no,
         CAST(list_sum(list_transform(range(0, {w}), k ->
              (CAST(cs[CAST(w * {w} + k + 1 AS INT)] AS BIGINT) - 128)
            * (CAST(cs[CAST(w * {w} + k + 1 AS INT)] AS BIGINT) - 128))) AS BIGINT) AS sum_sq
  FROM codes, unnest(range(0, n_bytes // {w})) AS t(w)
)
SELECT doc_id, CAST(8000 AS INT) AS sample_rate, win_no, sum_sq,
       ROUND(sqrt(CAST(sum_sq AS DOUBLE) / {w}), 6) AS rms
FROM wins ORDER BY doc_id, win_no
"""


def mm_wav_dft(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio FEATURE EXTRACTION over real decoded containers: document
    bytes become a genuine PCM WAV, ``decode_wav_dft`` parses it back
    and computes per-window fixed-point DFT band powers (integer
    twiddles ×4096, powers = exact int64) — the spectral-energy step of
    an audio curation pipeline.  The oracle re-derives every power from
    the raw octets with the same literal twiddle tables: spectral
    values are hash-exact, not approximately compared."""
    from ..operators.multimodal import decode_wav_dft


    def build(batches):
        import numpy as np
        import pandas as pd

        from ..functions.codecs import write_wav

        for pdf in batches:
            payloads = [
                write_wav(
                    np.frombuffer(t.encode("utf-8"), dtype=np.uint8), 8000
                )
                for t in pdf["text"]
            ]
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = _cached_media(spark, sf_dir, "wavdft", build)
    out = decode_wav_dft(media, _WAV_W)
    return out.select(
        F.col("media_id").alias("doc_id"), "win_no", "bin", "power"
    ).orderBy("doc_id", "win_no", "bin")


def _mm_wav_dft_sql() -> str:
    """Oracle for the spectral features: literal integer twiddle rows,
    one generated (re, im) sum pair per bin over the centered octets of
    each window — all-integer arithmetic, so the hash match pins the
    container round-trip AND the transform."""
    from ..operators.multimodal import dft_twiddles

    w = _WAV_W
    cos_t, sin_t = dft_twiddles(w)
    arms = []
    for b in range(w // 2 + 1):
        re = " + ".join(
            f"(CAST(cs[CAST(w * {w} + {k} + 1 AS INT)] AS BIGINT) - 128)"
            f" * ({cos_t[b][k]})"
            for k in range(w)
            if cos_t[b][k]
        ) or "0"
        im = " + ".join(
            f"(CAST(cs[CAST(w * {w} + {k} + 1 AS INT)] AS BIGINT) - 128)"
            f" * ({sin_t[b][k]})"
            for k in range(w)
            if sin_t[b][k]
        ) or "0"
        arms.append(
            f"SELECT doc_id, CAST(w AS INT) AS win_no, {b} AS bin, "
            f"CAST(({re}) * ({re}) + ({im}) * ({im}) AS BIGINT) AS power "
            f"FROM wins"
        )
    union = " UNION ALL ".join(arms)
    return f"""
WITH {_CODES_CTE_SQL},
wins AS (
  SELECT doc_id, cs, w FROM codes, unnest(range(0, n_bytes // {w})) AS t(w)
)
SELECT doc_id, win_no, CAST(bin AS INT) AS bin, power
FROM ({union}) ORDER BY doc_id, win_no, bin
"""


_BMP_W, _BMP_H, _BMP_F = 8, 8, 2


def mm_bmp_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image container decode: document bytes (truncated /
    zero-padded to 8×8) become a genuine 24-bit BMP via
    ``functions/codecs.write_bmp`` (bottom-up rows, 4-byte padding,
    BGR), then ``decode_bmp_pool`` parses it back and 2×2 block-mean
    pools the grayscale.  The oracle pools the raw text octets — so a
    mistake anywhere in the container round-trip (row order, padding,
    channel order, palette) breaks parity."""
    from ..operators.multimodal import decode_bmp_pool


    def build(batches):
        import numpy as np
        import pandas as pd

        from ..functions.codecs import write_bmp

        n = _BMP_W * _BMP_H
        for pdf in batches:
            payloads = []
            for t in pdf["text"]:
                buf = t.encode("utf-8")[:n].ljust(n, b"\0")
                gray = np.frombuffer(buf, dtype=np.uint8).reshape(
                    _BMP_H, _BMP_W
                )
                payloads.append(write_bmp(gray))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = _cached_media(spark, sf_dir, "bmp", build)
    pooled = decode_bmp_pool(media, _BMP_F)
    k = (_BMP_W // _BMP_F) * (_BMP_H // _BMP_F)
    sel = [
        F.round(F.element_at("pooled", i + 1), 6).alias(f"p{i}")
        for i in range(k)
    ]
    return pooled.select(
        F.col("media_id").alias("doc_id"), "width", "height", *sel
    ).orderBy("doc_id")


def mm_image_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUARANTINING image decode (r10, the visual twin of
    ``mm_audio_quarantine``): BMP payloads with a deterministically
    corrupted subset (``doc_id % 7 == 3``, magic destroyed) through
    ``decode_image_pool_admitting`` — one corrupt image costs one
    rejected row.  The oracle re-derives the admitted docs' pooled
    values straight from the text octets (BMP is lossless) and the
    corrupted subset as (doc_id, 'ValueError') null rows."""
    from ..operators.multimodal import decode_image_pool_admitting

    def build(batches):
        import numpy as np
        import pandas as pd

        from ..functions.codecs import write_bmp

        n = _BMP_W * _BMP_H
        for pdf in batches:
            payloads = []
            for did, t in zip(pdf["doc_id"], pdf["text"]):
                buf = t.encode("utf-8")[:n].ljust(n, b"\0")
                gray = np.frombuffer(buf, dtype=np.uint8).reshape(
                    _BMP_H, _BMP_W
                )
                blob = write_bmp(gray)
                if did % 7 == 3:
                    # truncated mid-header (magic intact): the parser
                    # boundary converts the short read to ValueError
                    blob = blob[:12]
                payloads.append(blob)
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = _cached_media(spark, sf_dir, "bmpquar", build)
    stats = decode_image_pool_admitting(media, _BMP_F)
    k = (_BMP_W // _BMP_F) * (_BMP_H // _BMP_F)
    sel = [
        F.round(F.element_at("pooled", i + 1), 6).alias(f"p{i}")
        for i in range(k)
    ]
    return stats.select(
        F.col("media_id").alias("doc_id"),
        F.col("error").isNull().alias("admitted"),
        "error",
        "width",
        *sel,
    ).orderBy("doc_id")


def _mm_image_quarantine_sql() -> str:
    ow = _BMP_W // _BMP_F
    oh = _BMP_H // _BMP_F
    cell = (
        f"list_transform(range(0, {_BMP_W * _BMP_H}), i -> "
        "CASE WHEN i < n_bytes THEN cs[CAST(i + 1 AS INT)] ELSE 0 END)"
    )
    cols = []
    nulls = []
    for kk in range(ow * oh):
        r, c = kk // ow, kk % ow
        idx = [
            (_BMP_F * r + dr) * _BMP_W + (_BMP_F * c + dc) + 1
            for dr in range(_BMP_F)
            for dc in range(_BMP_F)
        ]
        s = " + ".join(f"f64[{i}]" for i in idx)
        cols.append(f"ROUND(({s}) / {_BMP_F * _BMP_F}.0, 6) AS p{kk}")
        nulls.append(f"CAST(NULL AS DOUBLE) AS p{kk}")
    return f"""
WITH {_CODES_CTE_SQL},
frames AS (SELECT doc_id, {cell} AS f64 FROM codes)
SELECT doc_id, TRUE AS admitted, CAST(NULL AS VARCHAR) AS error,
  CAST({_BMP_W} AS INT) AS width, {',' .join(cols)}
FROM frames WHERE doc_id % 7 <> 3
UNION ALL
SELECT doc_id, FALSE AS admitted, 'ValueError' AS error,
  CAST(NULL AS INT) AS width, {',' .join(nulls)}
FROM frames WHERE doc_id % 7 = 3
ORDER BY doc_id
"""


def _mm_bmp_sql() -> str:
    ow = _BMP_W // _BMP_F
    oh = _BMP_H // _BMP_F
    cell = (
        f"list_transform(range(0, {_BMP_W * _BMP_H}), i -> "
        "CASE WHEN i < n_bytes THEN cs[CAST(i + 1 AS INT)] ELSE 0 END)"
    )
    cols = []
    for kk in range(ow * oh):
        r, c = kk // ow, kk % ow
        idx = [
            (_BMP_F * r + dr) * _BMP_W + (_BMP_F * c + dc) + 1
            for dr in range(_BMP_F)
            for dc in range(_BMP_F)
        ]
        s = " + ".join(f"f64[{i}]" for i in idx)
        cols.append(f"ROUND(({s}) / {_BMP_F * _BMP_F}.0, 6) AS p{kk}")
    return f"""
WITH {_CODES_CTE_SQL},
frames AS (SELECT doc_id, {cell} AS f64 FROM codes)
SELECT doc_id, CAST({_BMP_W} AS INT) AS width, CAST({_BMP_H} AS INT) AS height,
{',' .join(cols)}
FROM frames ORDER BY doc_id
"""


def mm_png_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-image decode: document bytes become a genuine
    8-bit grayscale PNG with the writer CYCLING all five scanline
    filters (None/Sub/Up/Average/Paeth) across rows, so the decoder
    must undo DEFLATE *and* every filter type per document;
    ``decode_image_pool`` magic-dispatches to ``parse_png`` and 2×2
    block-mean pools.  Oracle = raw text octets pooled — any mistake
    in inflate, filter reconstruction or row order breaks parity."""
    from ..operators.multimodal import decode_image_pool


    def build(batches):
        import numpy as np
        import pandas as pd

        from ..functions.codecs import write_png

        n = _BMP_W * _BMP_H
        for pdf in batches:
            payloads = []
            for t in pdf["text"]:
                buf = t.encode("utf-8")[:n].ljust(n, b"\0")
                gray = np.frombuffer(buf, dtype=np.uint8).reshape(
                    _BMP_H, _BMP_W
                )
                payloads.append(write_png(gray, filter_mode="cycle"))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = _cached_media(spark, sf_dir, "png", build)
    pooled = decode_image_pool(media, _BMP_F)
    k = (_BMP_W // _BMP_F) * (_BMP_H // _BMP_F)
    sel = [
        F.round(F.element_at("pooled", i + 1), 6).alias(f"p{i}")
        for i in range(k)
    ]
    return pooled.select(
        F.col("media_id").alias("doc_id"), "width", "height", *sel
    ).orderBy("doc_id")


def mm_gif_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL LZW decode per document: text bytes become palette indices
    of a genuine GIF whose global palette is the identity grayscale
    (palette[i] = (i,i,i)), so LZW decompression + palette mapping must
    reproduce the octets exactly; ``decode_image_pool`` magic-
    dispatches to ``parse_gif`` and 2×2 block-mean pools.  Oracle = raw
    text octets pooled (same as the BMP/PNG paths) — any mistake in the
    variable-width code reader, table resets, or the KwK case breaks
    parity."""
    from ..operators.multimodal import decode_image_pool


    def build(batches):
        import numpy as np
        import pandas as pd

        from ..functions.codecs import write_gif

        n = _BMP_W * _BMP_H
        pal = np.repeat(
            np.arange(256, dtype=np.uint8)[:, None], 3, axis=1
        )
        for pdf in batches:
            payloads = []
            for t in pdf["text"]:
                buf = t.encode("utf-8")[:n].ljust(n, b"\0")
                idx = np.frombuffer(buf, dtype=np.uint8).reshape(
                    _BMP_H, _BMP_W
                )
                payloads.append(write_gif(idx, pal))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = _cached_media(spark, sf_dir, "gif", build)
    pooled = decode_image_pool(media, _BMP_F)
    k = (_BMP_W // _BMP_F) * (_BMP_H // _BMP_F)
    sel = [
        F.round(F.element_at("pooled", i + 1), 6).alias(f"p{i}")
        for i in range(k)
    ]
    return pooled.select(
        F.col("media_id").alias("doc_id"), "width", "height", *sel
    ).orderBy("doc_id")


_JPEG_QUALITY = 75


def mm_jpeg_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL lossy-codec decode (VERDICT r5 task 3): document bytes
    (8×8 grayscale) become a genuine baseline JFIF via
    ``functions/codecs.write_jpeg`` — fixed-point integer DCT,
    quality-scaled Annex-K quantization, canonical Huffman entropy
    coding with byte stuffing — and ``decode_image_pool``
    magic-dispatches to ``parse_jpeg`` (marker parse, DHT rebuild,
    bit-unstuffing, dequant + integer IDCT) and 2×2 block-mean pools.

    JPEG is lossy, so unlike the BMP/PNG/GIF twins the oracle cannot
    pool the raw octets: it re-derives the ENTIRE encode∘decode
    pipeline — both fixed-point DCT passes with their intermediate
    roundings, quantize, dequantize, both IDCT passes, the clamp — in
    generated SQL over the same octets.  That works (bit-for-bit)
    precisely because the codec's transform is integer arithmetic with
    one explicit rounding rule; any drift in the Huffman tables, the
    bitstream, zigzag, or either transform breaks the value hash."""
    from ..operators.multimodal import decode_image_pool


    def build(batches):
        import numpy as np
        import pandas as pd

        from ..functions.codecs import write_jpeg

        n = _BMP_W * _BMP_H
        for pdf in batches:
            payloads = []
            for t in pdf["text"]:
                buf = t.encode("utf-8")[:n].ljust(n, b"\0")
                gray = np.frombuffer(buf, dtype=np.uint8).reshape(
                    _BMP_H, _BMP_W
                )
                payloads.append(write_jpeg(gray, quality=_JPEG_QUALITY))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = _cached_media(spark, sf_dir, "jpeg", build)
    pooled = decode_image_pool(media, _BMP_F)
    k = (_BMP_W // _BMP_F) * (_BMP_H // _BMP_F)
    sel = [
        F.round(F.element_at("pooled", i + 1), 6).alias(f"p{i}")
        for i in range(k)
    ]
    return pooled.select(
        F.col("media_id").alias("doc_id"), "width", "height", *sel
    ).orderBy("doc_id")


def _jpeg_passes_sql(
    keys: str, quality: int = _JPEG_QUALITY
) -> tuple[str, list[str]]:
    """The fixed-point JPEG encode∘decode pipeline as generated-SQL CTE
    text — shared by the single-frame (``mm_jpeg_pool``) and per-MKV-
    frame (``mm_mkv_jpeg_pool``) oracles.  Expects a CTE named
    ``shifted`` providing ``{keys}`` plus ``xs`` (64 level-shifted
    BIGINTs); yields CTEs ``consts``..``pixels`` where ``pixels`` holds
    ``{keys}, pv`` (the decoded clamped pixel doubles), plus the pooled
    column expressions.  Same matrix constants and round-half-up rule
    ``floor((2a+b)/2b)`` as ``functions/codecs`` — the intermediate
    roundings between the four matrix passes are replicated exactly,
    which is what makes a lossy codec value-hashable."""
    from ..functions.codecs import _DCT_T, _QUANT_LUMA, _quality_table

    t = [int(v) for v in _DCT_T.ravel()]  # T[u*8+x]
    q = [int(v) for v in _quality_table(_QUANT_LUMA, quality).ravel()]

    def rdiv(s: str, b: str) -> str:
        return f"CAST(floor((2.0 * ({s}) + {b}) / (2.0 * ({b}))) AS BIGINT)"

    # pass 1: A[r*8+u] = rdiv(sum_x X[r*8+x] * T[u*8+x], 4096)
    a_terms = " + ".join(
        f"xs[CAST((k // 8) * 8 + {x} + 1 AS INT)]"
        f" * tm[CAST((k % 8) * 8 + {x} + 1 AS INT)]"
        for x in range(8)
    )
    # pass 2: F[v*8+u] = rdiv(sum_r T[v*8+r] * A[r*8+u], 4096)
    f_terms = " + ".join(
        f"tm[CAST((k // 8) * 8 + {r} + 1 AS INT)]"
        f" * av[CAST({r} * 8 + (k % 8) + 1 AS INT)]"
        for r in range(8)
    )
    # pass 3: B[r*8+u] = rdiv(sum_v T[v*8+r] * D[v*8+u], 4096)
    b_terms = " + ".join(
        f"tm[CAST({v} * 8 + (k // 8) + 1 AS INT)]"
        f" * dq[CAST({v} * 8 + (k % 8) + 1 AS INT)]"
        for v in range(8)
    )
    # pass 4: P[r*8+x] = clamp(rdiv(sum_u B[r*8+u] * T[u*8+x], 4096) + 128)
    p_terms = " + ".join(
        f"bv[CAST((k // 8) * 8 + {u} + 1 AS INT)]"
        f" * tm[CAST({u} * 8 + (k % 8) + 1 AS INT)]"
        for u in range(8)
    )
    ow = _BMP_W // _BMP_F
    oh = _BMP_H // _BMP_F
    cols = []
    for kk in range(ow * oh):
        r, c = kk // ow, kk % ow
        idx = [
            (_BMP_F * r + dr) * _BMP_W + (_BMP_F * c + dc) + 1
            for dr in range(_BMP_F)
            for dc in range(_BMP_F)
        ]
        s = " + ".join(f"pv[{i}]" for i in idx)
        cols.append(
            f"ROUND(({s}) / {_BMP_F * _BMP_F}.0, 6) AS p{kk}"
        )
    ctes = f"""consts AS (SELECT {t!r}::BIGINT[] AS tm, {q!r}::BIGINT[] AS qt),
pass1 AS (
  SELECT {keys}, list_transform(range(0, 64), k ->
    {rdiv(a_terms, "4096")}) AS av
  FROM shifted CROSS JOIN consts
),
pass2 AS (
  SELECT {keys}, list_transform(range(0, 64), k ->
    {rdiv(f_terms, "4096")}) AS fv
  FROM pass1 CROSS JOIN consts
),
quantized AS (
  SELECT {keys}, list_transform(range(0, 64), k ->
    {rdiv("fv[CAST(k + 1 AS INT)]", "qt[CAST(k + 1 AS INT)]")}
      * qt[CAST(k + 1 AS INT)]) AS dq
  FROM pass2 CROSS JOIN consts
),
pass3 AS (
  SELECT {keys}, list_transform(range(0, 64), k ->
    {rdiv(b_terms, "4096")}) AS bv
  FROM quantized CROSS JOIN consts
),
pixels AS (
  SELECT {keys}, list_transform(range(0, 64), k ->
    CAST(LEAST(255, GREATEST(0, {rdiv(p_terms, "4096")} + 128)) AS DOUBLE)
  ) AS pv
  FROM pass3 CROSS JOIN consts
)"""
    return ctes, cols


def _mm_jpeg_sql() -> str:
    """Oracle for the lossy JPEG round-trip: the fixed-point integer
    DCT → quantize → dequantize → IDCT pipeline of functions/codecs,
    applied to the raw text octets, then 2×2 pooled (see
    ``_jpeg_passes_sql``)."""
    ctes, cols = _jpeg_passes_sql("doc_id")
    return f"""
WITH {_CODES_CTE_SQL},
shifted AS (
  SELECT doc_id, list_transform(range(0, 64), i ->
    CAST((CASE WHEN i < n_bytes THEN cs[CAST(i + 1 AS INT)] ELSE 0 END) - 128
         AS BIGINT)) AS xs
  FROM codes
),
{ctes}
SELECT doc_id, CAST({_BMP_W} AS INT) AS width, CAST({_BMP_H} AS INT) AS height,
{',' .join(cols)}
FROM pixels ORDER BY doc_id
"""


_JPEG_PROG_QUALITY = 85  # distinct from the baseline fixture's 75


def mm_jpeg_progressive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROGRESSIVE JPEG decode (VERDICT r10 task 1): the same 8×8
    grayscale pixels as ``mm_jpeg_pool``, but encoded as genuine
    multi-scan SOF2 streams via ``codecs.write_jpeg_progressive`` —
    spectral selection, successive approximation with DC/AC first and
    refinement passes, EOB-run coding, per-scan in-stream DHTs.  Docs
    alternate (by id parity) between the conventional 6-scan script
    and a deeper 8-scan 3-bit-approximation script, so both script
    shapes sit in the decoded corpus.  ``decode_image_pool``
    magic-dispatches to ``parse_jpeg``, which accumulates the scans
    into the coefficient array and reconstructs.

    Oracle: progressive transmission reorders the coefficients but
    never changes them, so the SAME fixed-point encode∘decode SQL
    pipeline as ``mm_jpeg_pool`` (at this fixture's quality) replays
    the decode from the pre-encode octets.  A builder-side assertion
    pins that every payload is really SOF2 multi-scan."""
    from ..operators.multimodal import decode_image_pool

    def build(batches):
        import numpy as np
        import pandas as pd

        from ..functions.codecs import write_jpeg_progressive

        deep = [
            ((0,), 0, 0, 0, 3), ((0,), 1, 63, 0, 3), ((0,), 1, 63, 3, 2),
            ((0,), 1, 63, 2, 1), ((0,), 1, 63, 1, 0), ((0,), 0, 0, 3, 2),
            ((0,), 0, 0, 2, 1), ((0,), 0, 0, 1, 0),
        ]
        n = _BMP_W * _BMP_H
        for pdf in batches:
            payloads = []
            for did, t in zip(pdf["doc_id"], pdf["text"]):
                buf = t.encode("utf-8")[:n].ljust(n, b"\0")
                gray = np.frombuffer(buf, dtype=np.uint8).reshape(
                    _BMP_H, _BMP_W
                )
                blob = write_jpeg_progressive(
                    gray,
                    quality=_JPEG_PROG_QUALITY,
                    scans=deep if did % 2 else None,
                )
                assert b"\xff\xc2" in blob and blob.count(b"\xff\xda") >= 6
                payloads.append(blob)
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = _cached_media(spark, sf_dir, "jpegprog", build)
    pooled = decode_image_pool(media, _BMP_F)
    k = (_BMP_W // _BMP_F) * (_BMP_H // _BMP_F)
    sel = [
        F.round(F.element_at("pooled", i + 1), 6).alias(f"p{i}")
        for i in range(k)
    ]
    return pooled.select(
        F.col("media_id").alias("doc_id"), "width", "height", *sel
    ).orderBy("doc_id")


def _mm_jpeg_prog_sql() -> str:
    """Oracle for the progressive fixture: identical pipeline to
    ``_mm_jpeg_sql`` at the progressive fixture's quality — scan order
    has no oracle footprint because progressive transmits the same
    quantized coefficients baseline does (the codec-level equality is
    pinned in tests/test_codecs.py)."""
    ctes, cols = _jpeg_passes_sql("doc_id", quality=_JPEG_PROG_QUALITY)
    return f"""
WITH {_CODES_CTE_SQL},
shifted AS (
  SELECT doc_id, list_transform(range(0, 64), i ->
    CAST((CASE WHEN i < n_bytes THEN cs[CAST(i + 1 AS INT)] ELSE 0 END) - 128
         AS BIGINT)) AS xs
  FROM codes
),
{ctes}
SELECT doc_id, CAST({_BMP_W} AS INT) AS width, CAST({_BMP_H} AS INT) AS height,
{',' .join(cols)}
FROM pixels ORDER BY doc_id
"""


_MKV_FR = 16  # bytes per fixture video frame
_MKV_TICKS = 40  # ticks between frames (25 fps at 1 ms scale)


def mm_mkv_demux(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container demux: document bytes become complete
    ``_MKV_FR``-byte raw frames muxed into a genuine Matroska container
    (EBML varints, Segment/Tracks/Cluster tree, un-laced SimpleBlocks,
    clusters of 4 with rebased timestamps), then ``demux_mkv_frames``
    parses it back — track metadata joined onto every frame, absolute
    timestamps recomputed from cluster-relative offsets.  The oracle
    re-derives frame count, timestamps, keyframe cadence and exact
    byte sums from the raw octets, so any drift in varint encoding,
    cluster rebasing or block framing breaks the value hash."""
    from ..operators.multimodal import demux_mkv_frames


    def build(batches):
        import pandas as pd

        from ..functions.ebml import MkvTrack, write_mkv

        tracks = [
            MkvTrack(1, "video", "V_UNCOMPRESSED", width=4, height=4)
        ]
        for pdf in batches:
            payloads = []
            for t in pdf["text"]:
                raw = t.encode("utf-8")
                n = len(raw) // _MKV_FR
                frames = [
                    (
                        1,
                        i * _MKV_TICKS,
                        i % 4 == 0,
                        raw[i * _MKV_FR : (i + 1) * _MKV_FR],
                    )
                    for i in range(n)
                ]
                payloads.append(
                    write_mkv(frames, tracks, cluster_every=4)
                    if frames
                    else None
                )
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = _cached_media(spark, sf_dir, "mkv", build)
    out = demux_mkv_frames(media)
    return out.select(
        F.col("media_id").alias("doc_id"),
        "track",
        "kind",
        "codec_id",
        "ts",
        "keyframe",
        "n_bytes",
        "byte_sum",
    ).orderBy("doc_id", "ts")


def _mm_mkv_sql() -> str:
    fr, tk = _MKV_FR, _MKV_TICKS
    return f"""
WITH {_CODES_CTE_SQL},
frames AS (
  SELECT doc_id, CAST(f AS INT) AS fno,
         CAST(list_sum(list_transform(range(0, {fr}), k ->
              CAST(cs[CAST(f * {fr} + k + 1 AS INT)] AS BIGINT))) AS BIGINT)
           AS byte_sum
  FROM codes, unnest(range(0, n_bytes // {fr})) AS t(f)
)
SELECT doc_id, CAST(1 AS INT) AS track, 'video' AS kind,
       'V_UNCOMPRESSED' AS codec_id,
       CAST(fno * {tk} AS BIGINT) AS ts,
       (fno % 4 = 0) AS keyframe,
       CAST({fr} AS INT) AS n_bytes, byte_sum
FROM frames ORDER BY doc_id, ts
"""


_MJPEG_MAX_FRAMES = 4  # complete 8×8 frames per document, capped


def mm_mkv_jpeg_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END video frame decode (VERDICT r6 task 2): each
    document's UTF-8 bytes become up to ``_MJPEG_MAX_FRAMES`` complete
    8×8 grayscale frames, each REALLY encoded as baseline JPEG
    (``write_jpeg`` — fixed-point DCT, Annex-K quant, canonical
    Huffman), muxed into a genuine Matroska container as an MJPEG video
    track (every frame a keyframe, clusters of 4), then
    ``demux_decode_jpeg_pool`` demuxes the container, JPEG-decodes
    every frame payload, and 2×2 block-mean pools it — the composition
    of the repo's own MKV demuxer and JPEG codec, converting the
    "compressed frame payloads are opaque" disclosure into a working
    video-decode path with zero external codec libraries.

    The oracle re-derives the ENTIRE per-frame lossy encode∘decode in
    generated SQL (``_jpeg_passes_sql`` keyed by (doc_id, frame)) plus
    the demuxer's timestamp arithmetic — any drift in EBML framing,
    cluster rebasing, the bitstream, or either DCT pass breaks the
    value hash.

    r10: ODD frames are encoded PROGRESSIVE (SOF2 multi-scan) at the
    same quality — a mixed SOF0/SOF2 stream inside one container, the
    real-world MJPEG-archive shape.  Progressive transmits the same
    quantized coefficients, so the oracle is untouched; the Spark
    side now proves the container path handles both frame modes
    through one magic dispatch."""
    from ..operators.multimodal import demux_decode_jpeg_pool

    n = _BMP_W * _BMP_H

    def build(batches):
        import numpy as np
        import pandas as pd

        from ..functions.codecs import write_jpeg, write_jpeg_progressive
        from ..functions.ebml import MkvTrack, write_mkv

        tracks = [
            MkvTrack(1, "video", "V_MJPEG", width=_BMP_W, height=_BMP_H)
        ]
        for pdf in batches:
            payloads = []
            for t in pdf["text"]:
                raw = t.encode("utf-8")
                nf = min(_MJPEG_MAX_FRAMES, len(raw) // n)
                frames = [
                    (
                        1,
                        i * _MKV_TICKS,
                        True,  # MJPEG: every frame is a keyframe
                        (write_jpeg_progressive if i % 2 else write_jpeg)(
                            np.frombuffer(
                                raw, np.uint8, count=n, offset=i * n
                            ).reshape(_BMP_H, _BMP_W),
                            quality=_JPEG_QUALITY,
                        ),
                    )
                    for i in range(nf)
                ]
                payloads.append(
                    write_mkv(frames, tracks, cluster_every=4)
                    if frames
                    else None
                )
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = _cached_media(spark, sf_dir, "mkvjpeg", build)
    pooled = demux_decode_jpeg_pool(media, _BMP_F)
    k = (_BMP_W // _BMP_F) * (_BMP_H // _BMP_F)
    sel = [
        F.round(F.element_at("pooled", i + 1), 6).alias(f"p{i}")
        for i in range(k)
    ]
    return pooled.select(
        F.col("media_id").alias("doc_id"),
        "ts",
        "keyframe",
        "width",
        "height",
        *sel,
    ).orderBy("doc_id", "ts")


def _mm_mkv_jpeg_sql() -> str:
    """Oracle for MJPEG-in-MKV: one complete 64-byte frame per
    ``_MKV_TICKS`` ticks (capped at ``_MJPEG_MAX_FRAMES``), each pushed
    through the identical fixed-point JPEG encode∘decode pipeline as
    ``mm_jpeg_pool`` — keyed by (doc_id, frame) — plus the demuxer's
    absolute-timestamp reconstruction."""
    ctes, cols = _jpeg_passes_sql("doc_id, fno")
    n = _BMP_W * _BMP_H
    return f"""
WITH {_CODES_CTE_SQL},
shifted AS (
  SELECT doc_id, CAST(f AS INT) AS fno,
         list_transform(range(0, {n}), i ->
           CAST(cs[CAST(f * {n} + i + 1 AS INT)] AS BIGINT) - 128) AS xs
  FROM codes,
       unnest(range(0, LEAST(n_bytes // {n}, {_MJPEG_MAX_FRAMES}))) AS t(f)
),
{ctes}
SELECT doc_id, CAST(fno * {_MKV_TICKS} AS BIGINT) AS ts,
       TRUE AS keyframe,
       CAST({_BMP_W} AS INT) AS width, CAST({_BMP_H} AS INT) AS height,
{',' .join(cols)}
FROM pixels ORDER BY doc_id, ts
"""


_PR_DAMP = 0.85
_PR_ITERS = 6
_PR_OFF = 1_000_000  # supplier-node namespace offset


def gr_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-graph centrality — the document-quality prior of web-corpus
    curation (PageRank's original use), by fixed-iteration power method
    over the symmetrized customer↔supplier transaction graph (an edge
    per distinct (customer, supplier) trading pair; supplier nodes
    offset into their own id space).  Symmetrizing removes dangling
    nodes, so all ``_PR_ITERS`` rounds stay one lazy plan — each round
    is one |E|-keyed equi-join + one |N|-keyed aggregation, no global
    scalar round-trips (see ``operators/graph.py``).  The oracle
    unrolls the identical six rounds in SQL; doubles rounded to 6
    (parallel summation order differs between engines)."""
    from ..operators.graph import pagerank

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    edges = pairs.select(
        F.col("c").alias("src"), (F.col("s") + _PR_OFF).alias("dst")
    ).unionAll(
        pairs.select(
            (F.col("s") + _PR_OFF).alias("src"), F.col("c").alias("dst")
        )
    )
    ranks = pagerank(edges, damping=_PR_DAMP, iters=_PR_ITERS)
    return ranks.select(
        "node", F.round("rank", 6).alias("rank")
    ).orderBy("node")


def gr_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the same trading graph: edge weight =
    lineitem count between the (customer, supplier) pair, so mass
    leaves a node proportionally to transaction volume — the form used
    when link multiplicity carries signal (co-occurrence strength,
    citation counts).  Same plan shape as ``gr_pagerank``; only the
    degree table becomes an out-weight sum."""
    from ..operators.graph import pagerank

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pw = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    edges = pw.select(
        F.col("c").alias("src"), (F.col("s") + _PR_OFF).alias("dst"), "w"
    ).unionAll(
        pw.select(
            (F.col("s") + _PR_OFF).alias("src"),
            F.col("c").alias("dst"),
            "w",
        )
    )
    ranks = pagerank(edges, damping=_PR_DAMP, iters=_PR_ITERS, weight="w")
    return ranks.select(
        "node", F.round("rank", 6).alias("rank")
    ).orderBy("node")


_PRI_OLD = 4  # cold rounds over the "already-ranked" edge subset
_PRI_WARM = 4  # warm rounds after the delta folds in


def gr_pagerank_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL graph maintenance (VERDICT r7 task 7): the trading
    graph splits into an already-ranked subset (pairs with even
    ``c + s`` — the persisted state of a previous run) and an arriving
    delta; ``pagerank_incremental`` folds the delta into the degree
    table and runs ``_PRI_WARM`` warm rounds seeded from the old ranks
    (new nodes at 1/N).  The oracle unrolls BOTH phases — the cold
    rounds on the old graph, the seed join, the warm rounds on the full
    graph — as one CTE chain, so the warm-start semantics themselves
    are value-hashed, not just the final fixed point.  Plan shape per
    round is identical to ``gr_pagerank``; the warm start is the whole
    scale story (K rounds instead of a from-scratch schedule)."""
    from ..operators.graph import pagerank, pagerank_incremental

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )

    def _edges(p):
        return p.select(
            F.col("c").alias("src"), (F.col("s") + _PR_OFF).alias("dst")
        ).unionAll(
            p.select(
                (F.col("s") + _PR_OFF).alias("src"), F.col("c").alias("dst")
            )
        )

    old = pairs.filter((F.col("c") + F.col("s")) % 2 == 0)
    prev = pagerank(_edges(old), damping=_PR_DAMP, iters=_PRI_OLD)
    ranks = pagerank_incremental(
        _edges(pairs), prev, damping=_PR_DAMP, iters=_PRI_WARM
    )
    return ranks.select(
        "node", F.round("rank", 6).alias("rank")
    ).orderBy("node")


def _gr_pagerank_incr_sql() -> str:
    """Both phases unrolled: ``a0..a{_PRI_OLD}`` cold rounds over the
    even-(c+s) subgraph, the warm-seed LEFT join (new nodes at 1/N),
    then ``w1..w{_PRI_WARM}`` rounds over the full graph — mirroring
    operators/graph.py's warm-start definition round for round."""
    d, off = _PR_DAMP, _PR_OFF

    def _round(name, prevn, edges, deg, nn):
        return f"""{name} AS (
  SELECT g.src, g.rank, g.rank / {deg}.deg AS contrib
  FROM (
    SELECT e.dst AS src,
           (1 - {d}) / {nn}.n + {d} * sum(r.contrib) AS rank
    FROM {edges} e JOIN {prevn} r ON e.src = r.src, {nn}
    GROUP BY e.dst, {nn}.n
  ) g JOIN {deg} ON {deg}.src = g.src
)"""

    parts = [
        f"""pairs AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
op AS (SELECT c, s FROM pairs WHERE (c + s) % 2 = 0),
eo AS (
  SELECT c AS src, s + {off} AS dst FROM op
  UNION ALL
  SELECT s + {off} AS src, c AS dst FROM op
),
dego AS (SELECT src, count(*) AS deg FROM eo GROUP BY src),
no AS (SELECT count(*) AS n FROM dego),
a0 AS (SELECT src, (1.0 / n) / deg AS contrib FROM dego, no)"""
    ]
    for k in range(1, _PRI_OLD + 1):
        parts.append(_round(f"a{k}", f"a{k - 1}", "eo", "dego", "no"))
    parts.append(
        f"""ef AS (
  SELECT c AS src, s + {off} AS dst FROM pairs
  UNION ALL
  SELECT s + {off} AS src, c AS dst FROM pairs
),
degf AS (SELECT src, count(*) AS deg FROM ef GROUP BY src),
nf AS (SELECT count(*) AS n FROM degf),
w0 AS (
  SELECT dd.src, coalesce(a{_PRI_OLD}.rank, 1.0 / nf.n) / dd.deg AS contrib
  FROM degf dd LEFT JOIN a{_PRI_OLD} ON a{_PRI_OLD}.src = dd.src, nf
)"""
    )
    for k in range(1, _PRI_WARM + 1):
        parts.append(_round(f"w{k}", f"w{k - 1}", "ef", "degf", "nf"))
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT src AS node, ROUND(rank, 6) AS rank FROM w{_PRI_WARM}"
        + " ORDER BY node"
    )


def _gr_pagerank_sql(weighted: bool = False) -> str:
    """The same six power-method rounds unrolled as chained CTEs
    (weighted: edge weight = pair lineitem count, degree = out-weight
    sum, contributions weight-scaled — mirroring operators/graph.py)."""
    d, off = _PR_DAMP, _PR_OFF
    if weighted:
        pairs = f"""pairs AS (
  SELECT o_custkey AS c, l_suppkey AS s,
         CAST(count(*) AS DOUBLE) AS w
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY o_custkey, l_suppkey
),
edges AS (
  SELECT c AS src, s + {off} AS dst, w FROM pairs
  UNION ALL
  SELECT s + {off} AS src, c AS dst, w FROM pairs
),
deg AS (SELECT src, sum(w) AS deg FROM edges GROUP BY src)"""
        contrib_sum = "sum(e.w * r.contrib)"
    else:
        pairs = f"""pairs AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (
  SELECT c AS src, s + {off} AS dst FROM pairs
  UNION ALL
  SELECT s + {off} AS src, c AS dst FROM pairs
),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src)"""
        contrib_sum = "sum(r.contrib)"
    parts = [
        f"""{pairs},
nn AS (SELECT count(*) AS n FROM deg),
r0 AS (SELECT src, (1.0 / n) / deg AS contrib FROM deg, nn)"""
    ]
    for k in range(1, _PR_ITERS + 1):
        parts.append(
            f"""r{k} AS (
  SELECT g.src, g.rank, g.rank / deg.deg AS contrib
  FROM (
    SELECT e.dst AS src,
           (1 - {d}) / nn.n + {d} * {contrib_sum} AS rank
    FROM edges e JOIN r{k - 1} r ON e.src = r.src, nn
    GROUP BY e.dst, nn.n
  ) g JOIN deg ON deg.src = g.src
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT src AS node, ROUND(rank, 6) AS rank FROM r{_PR_ITERS}"
        + " ORDER BY node"
    )


_FLAC_W = 16  # samples per RMS window
_FLAC_RATE = 16000
_FLAC_BLOCK = 16  # FLAC frame block size for the MKV variant (multi-block)


def _flac_build(batches, block_size, mux_mkv):
    """Shared fixture kernel for the FLAC queries: each document's
    UTF-8 bytes become interleaved 16-bit big-endian stereo PCM
    (sample[j][c] = raw[4j+2c]·256 + raw[4j+2c+1] − 32768), encoded as
    REAL FLAC — mid/side stereo for even doc_ids, independent for odd,
    so both decorrelation paths run under the oracle.  With
    ``mux_mkv`` the stream is split per the Matroska A_FLAC codec
    mapping: metadata headers into CodecPrivate, one frame per
    SimpleBlock, clusters of 4."""
    import numpy as np
    import pandas as pd

    from ..functions.flac import (
        flac_codec_private,
        flac_frames,
        write_flac,
    )

    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            raw = t.encode("utf-8")
            m = len(raw) // 4
            if m == 0:
                payloads.append(None)
                continue
            b = np.frombuffer(raw, np.uint8, count=4 * m).astype(np.int64)
            samples = (
                (b[0::2] * 256 + b[1::2]) - 32768
            ).reshape(m, 2)
            blob = write_flac(
                samples,
                sample_rate=_FLAC_RATE,
                block_size=block_size,
                bits_per_sample=16,
                stereo_mode="mid_side" if int(did) % 2 == 0 else "independent",
            )
            if not mux_mkv:
                payloads.append(blob)
                continue
            from ..functions.ebml import MkvTrack, write_mkv

            _info, frames = flac_frames(blob)
            tracks = [
                MkvTrack(
                    1,
                    "audio",
                    "A_FLAC",
                    sampling_hz=float(_FLAC_RATE),
                    channels=2,
                    codec_private=flac_codec_private(blob),
                )
            ]
            payloads.append(
                write_mkv(
                    [
                        (1, i * block_size, True, fr)
                        for i, fr in enumerate(frames)
                    ],
                    tracks,
                    cluster_every=4,
                )
            )
        yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})


def mm_flac_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL lossless-COMPRESSED audio codec end-to-end: document bytes
    become interleaved 16-bit stereo PCM inside a genuine FLAC stream
    (``functions/flac.write_flac`` — fixed/LPC subframe prediction
    chosen by exact rice cost, optimal rice partitions, mid/side or
    independent stereo per doc, CRC-8/16 footers, STREAMINFO MD5), then
    ``decode_flac_rms`` decodes it back (prediction reconstruction,
    rice, stereo undecorrelation, CRC + MD5 verification) and emits
    exact per-(channel, 16-sample-window) energies.  FLAC is lossless,
    so the DuckDB oracle recomputes the windows straight from the text
    octets — any drift anywhere in the compression round-trip breaks
    the value hash."""
    from ..operators.multimodal import decode_flac_rms

    media = _cached_media(spark, sf_dir, "flac", lambda it: _flac_build(it, 4096, False))
    out = decode_flac_rms(media, _FLAC_W)
    return out.select(
        F.col("media_id").alias("doc_id"),
        "sample_rate",
        "bits",
        "channel",
        "win_no",
        "sum_sq",
        F.round("rms", 6).alias("rms"),
    ).orderBy("doc_id", "channel", "win_no")


def _flac_wins_sql() -> str:
    """Windowed stereo energies straight from the text octets — the
    pre-encode samples, valid as the FLAC oracle precisely because the
    codec is lossless."""
    w = _FLAC_W
    s = (
        f"(CAST(cs[CAST(4 * (w * {w} + k) + 2 * c + 1 AS INT)] AS BIGINT)"
        f" * 256"
        f" + CAST(cs[CAST(4 * (w * {w} + k) + 2 * c + 2 AS INT)] AS BIGINT)"
        f" - 32768)"
    )
    return f"""wins AS (
  SELECT doc_id, n_bytes, CAST(c AS INT) AS channel, CAST(w AS INT) AS win_no,
         CAST(list_sum(list_transform(range(0, {w}), k ->
              {s} * {s})) AS BIGINT) AS sum_sq
  FROM codes,
       unnest(range(0, 2)) AS tc(c),
       unnest(range(0, (n_bytes // 4) // {w})) AS tw(w)
)"""


def _mm_flac_sql() -> str:
    return f"""
WITH {_CODES_CTE_SQL},
{_flac_wins_sql()}
SELECT doc_id, CAST({_FLAC_RATE} AS INT) AS sample_rate,
       CAST(16 AS INT) AS bits, channel, win_no, sum_sq,
       ROUND(sqrt(CAST(sum_sq AS DOUBLE) / {_FLAC_W}), 6) AS rms
FROM wins ORDER BY doc_id, channel, win_no
"""


def mm_mkv_flac_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END compressed audio in a video container — the audio
    sibling of ``mm_mkv_jpeg_pool``: the same stereo PCM is FLAC-
    encoded in 16-sample blocks (so every doc spans multiple frames),
    split per the Matroska A_FLAC codec mapping (headers in
    CodecPrivate, one frame per SimpleBlock, clusters of 4), then
    ``demux_decode_flac_rms`` demuxes the container, reassembles the
    stream, FLAC-decodes it (the STREAMINFO MD5 spans ALL samples, so
    one dropped or reordered MKV block fails loudly) and emits the
    windowed energies plus ``n_blocks``, the demuxed frame count the
    oracle re-derives as ceil(samples / block).  Composition of the
    repo's own EBML demuxer and FLAC codec — zero external codec
    libraries."""
    from ..operators.multimodal import demux_decode_flac_rms

    media = _cached_media(spark, sf_dir, "mkvflac", lambda it: _flac_build(it, _FLAC_BLOCK, True))
    out = demux_decode_flac_rms(media, _FLAC_W)
    return out.select(
        F.col("media_id").alias("doc_id"),
        "n_blocks",
        "sample_rate",
        "bits",
        "channel",
        "win_no",
        "sum_sq",
        F.round("rms", 6).alias("rms"),
    ).orderBy("doc_id", "channel", "win_no")


def _mm_mkv_flac_sql() -> str:
    b = _FLAC_BLOCK
    return f"""
WITH {_CODES_CTE_SQL},
{_flac_wins_sql()}
SELECT doc_id,
       CAST(((n_bytes // 4) + {b} - 1) // {b} AS INT) AS n_blocks,
       CAST({_FLAC_RATE} AS INT) AS sample_rate,
       CAST(16 AS INT) AS bits, channel, win_no, sum_sq,
       ROUND(sqrt(CAST(sum_sq AS DOUBLE) / {_FLAC_W}), 6) AS rms
FROM wins ORDER BY doc_id, channel, win_no
"""


def _ogg_flac_build(batches):
    """Fixture kernel for ``mm_ogg_flac_rms``: the ``_flac_build``
    native streams (hashed as a dep) wrapped per the FLAC-in-Ogg
    mapping — mapping packet + one frame per audio packet, multi-
    packet pages with CRC-sealed lacing."""
    from ..functions.ogg import write_ogg_flac

    for pdf in _flac_build(batches, _FLAC_BLOCK, False):
        pdf["payload"] = [
            write_ogg_flac(bytes(p)) if p is not None else None
            for p in pdf["payload"]
        ]
        yield pdf


def mm_ogg_flac_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END FLAC-in-Ogg decode — Ogg completes the open-container
    family (Matroska, MP4, Ogg): the same stereo PCM as the MKV twin,
    FLAC-encoded in 16-sample blocks, wrapped per the FLAC-in-Ogg
    mapping (RFC 3533 pages, CRC-32-sealed, packets laced across
    pages), then ``demux_decode_ogg_flac_rms`` validates + reassembles
    the page stream, FLAC-decodes it (STREAMINFO MD5 spans ALL
    samples, so one dropped or reordered page fails loudly) and emits
    the windowed energies plus ``n_blocks`` (audio packets).  The
    oracle is the SAME octet replay as the MKV twin — container-
    independent by construction."""
    from ..operators.multimodal import demux_decode_ogg_flac_rms

    media = _cached_media(
        spark, sf_dir, "oggflac", _ogg_flac_build, deps=(_flac_build,)
    )
    out = demux_decode_ogg_flac_rms(media, _FLAC_W)
    return out.select(
        F.col("media_id").alias("doc_id"),
        "n_blocks",
        "sample_rate",
        "bits",
        "channel",
        "win_no",
        "sum_sq",
        F.round("rms", 6).alias("rms"),
    ).orderBy("doc_id", "channel", "win_no")


_AC_CLIP = 20000  # |sample| >= this counts as clipped
_AC_SIL = 8192  # |sample| < this counts as near-silent
_AC_MAX_CLIP = 0.2  # admission gates (empirically non-trivial: ~77%
_AC_MAX_SIL = 0.85  # and ~86% pass individually on the fixture bytes)
_AC_MIN_FRAMES = 16
_AC_FP_WIN = 16  # intro-fingerprint window (interleaved samples)


def mm_audio_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END audio CURATION FUNNEL — the multimodal twin of
    ``cur_pipeline``: documents become real FLAC streams, decode back
    through the full codec (``decode_flac_audio_stats``), then the
    admission pipeline runs on MEASURED audio: quality gates (clipped-
    sample ratio, near-silence ratio, minimum duration) followed by
    exact dedup on an order-sensitive integer INTRO fingerprint (the
    head-window hash of audio fingerprinting, over the first
    ``_AC_FP_WIN`` decoded samples — ~24 real collision groups exist
    in the fixture corpus, so the dedup stage does real work), keeping
    the lowest doc_id per fingerprint as canonical.
    Every statistic is integer-exact and FLAC is lossless, so the
    DuckDB oracle re-derives the entire funnel — decode, gates, dedup,
    survivor choice — from the pre-encode octets.

    Scale shape: one zero-shuffle Arrow decode pass, then one
    fingerprint-keyed aggregation (the dedup shuffle moves one stats
    row per payload, never samples)."""
    from ..operators.multimodal import decode_flac_audio_stats

    media = _cached_media(spark, sf_dir, "flac", lambda it: _flac_build(it, 4096, False))
    stats = decode_flac_audio_stats(media, _AC_CLIP, _AC_SIL, _AC_FP_WIN)
    n = F.col("n_frames") * F.col("n_channels")  # decoded, not assumed
    gated = stats.select(
        F.col("media_id").alias("doc_id"),
        "n_frames",
        (F.col("n_clip") / n).alias("clip_ratio"),
        (F.col("n_silence") / n).alias("silence_ratio"),
        F.sqrt(F.col("sum_sq") / n).alias("rms"),
        "fp",
    ).filter(
        (F.col("n_frames") >= _AC_MIN_FRAMES)
        & (F.col("clip_ratio") <= _AC_MAX_CLIP)
        & (F.col("silence_ratio") <= _AC_MAX_SIL)
    )
    canon = gated.groupBy("fp").agg(
        F.min("doc_id").alias("doc_id"),
        F.count(F.lit(1)).alias("dup_count"),
    )
    return (
        gated.join(canon, ["fp", "doc_id"])
        .select(
            "doc_id",
            "n_frames",
            F.round("clip_ratio", 6).alias("clip_ratio"),
            F.round("silence_ratio", 6).alias("silence_ratio"),
            F.round("rms", 6).alias("rms"),
            "fp",
            "dup_count",
        )
        .orderBy("doc_id")
    )


def _mm_audio_curation_sql() -> str:
    s = (
        "(CAST(cs[CAST(2 * k + 1 AS INT)] AS BIGINT) * 256"
        " + CAST(cs[CAST(2 * k + 2 AS INT)] AS BIGINT) - 32768)"
    )
    return f"""
WITH {_CODES_CTE_SQL},
stats AS (
  SELECT doc_id, CAST(n_bytes // 4 AS BIGINT) AS n_frames,
    2 * (n_bytes // 4) AS ns,
    CAST(len(list_filter(list_transform(range(0, 2 * (n_bytes // 4)),
      k -> abs({s})), a -> a >= {_AC_CLIP})) AS BIGINT) AS n_clip,
    CAST(len(list_filter(list_transform(range(0, 2 * (n_bytes // 4)),
      k -> abs({s})), a -> a < {_AC_SIL})) AS BIGINT) AS n_silence,
    CAST(list_sum(list_transform(range(0, 2 * (n_bytes // 4)),
      k -> {s} * {s})) AS BIGINT) AS sum_sq,
    CAST(list_sum(list_transform(
      range(0, LEAST(2 * (n_bytes // 4), {_AC_FP_WIN})),
      k -> (k + 1) * {s})) AS BIGINT) AS fp
  FROM codes WHERE n_bytes // 4 > 0
),
gated AS (
  SELECT doc_id, n_frames,
         n_clip * 1.0 / ns AS clip_ratio,
         n_silence * 1.0 / ns AS silence_ratio,
         sqrt(CAST(sum_sq AS DOUBLE) / ns) AS rms, fp
  FROM stats
  WHERE n_frames >= {_AC_MIN_FRAMES}
    AND n_clip * 1.0 / ns <= {_AC_MAX_CLIP}
    AND n_silence * 1.0 / ns <= {_AC_MAX_SIL}
),
canon AS (
  SELECT fp, min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS dup_count
  FROM gated GROUP BY fp
)
SELECT g.doc_id, g.n_frames,
       ROUND(g.clip_ratio, 6) AS clip_ratio,
       ROUND(g.silence_ratio, 6) AS silence_ratio,
       ROUND(g.rms, 6) AS rms, g.fp, c.dup_count
FROM gated g JOIN canon c ON c.fp = g.fp AND c.doc_id = g.doc_id
ORDER BY g.doc_id
"""


_GIF_DELAY = 10  # centiseconds between fixture frames (scaled by no.)


def mm_gif_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANIMATED-GIF frame demux + decode — a second real animated
    container beside MKV: each document's bytes become up to
    ``_MJPEG_MAX_FRAMES`` full 8×8 frames in one genuine GIF89a
    animation (identity grayscale palette, per-frame Graphic Control
    Extensions with increasing delays), then ``decode_gif_frames``
    composes every displayed frame and 2×2-pools it.  The identity
    palette makes the animation lossless over the octets, so the oracle
    pools the raw text bytes per frame and re-derives the delay
    arithmetic — any drift in LZW, GCE parsing or canvas composition
    breaks the value hash."""
    from ..operators.multimodal import decode_gif_frames

    n = _BMP_W * _BMP_H

    def build(batches):
        import numpy as np
        import pandas as pd

        from ..functions.codecs import write_gif_anim

        pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
        for pdf in batches:
            payloads = []
            for t in pdf["text"]:
                raw = t.encode("utf-8")
                nf = min(_MJPEG_MAX_FRAMES, len(raw) // n)
                if nf == 0:
                    payloads.append(None)
                    continue
                frames = [
                    np.frombuffer(
                        raw, np.uint8, count=n, offset=i * n
                    ).reshape(_BMP_H, _BMP_W)
                    for i in range(nf)
                ]
                payloads.append(
                    write_gif_anim(
                        frames,
                        pal,
                        [_GIF_DELAY * (i + 1) for i in range(nf)],
                    )
                )
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = _cached_media(spark, sf_dir, "gifanim", build)
    pooled = decode_gif_frames(media, _BMP_F)
    k = (_BMP_W // _BMP_F) * (_BMP_H // _BMP_F)
    sel = [
        F.round(F.element_at("pooled", i + 1), 6).alias(f"p{i}")
        for i in range(k)
    ]
    return pooled.select(
        F.col("media_id").alias("doc_id"),
        "frame_no",
        "delay_cs",
        "width",
        "height",
        *sel,
    ).orderBy("doc_id", "frame_no")


def _mm_gif_frames_sql() -> str:
    n = _BMP_W * _BMP_H
    ow = _BMP_W // _BMP_F
    oh = _BMP_H // _BMP_F
    cols = []
    for kk in range(ow * oh):
        r, c = kk // ow, kk % ow
        idx = [
            (_BMP_F * r + dr) * _BMP_W + (_BMP_F * c + dc)
            for dr in range(_BMP_F)
            for dc in range(_BMP_F)
        ]
        s = " + ".join(
            f"CAST(cs[CAST(fno * {n} + {i} + 1 AS INT)] AS BIGINT)"
            for i in idx
        )
        cols.append(f"ROUND(({s}) / {_BMP_F * _BMP_F}.0, 6) AS p{kk}")
    return f"""
WITH {_CODES_CTE_SQL},
frames AS (
  SELECT doc_id, CAST(f AS INT) AS fno, cs
  FROM codes,
       unnest(range(0, LEAST(n_bytes // {n}, {_MJPEG_MAX_FRAMES}))) AS t(f)
)
SELECT doc_id, fno AS frame_no,
       CAST({_GIF_DELAY} * (fno + 1) AS INT) AS delay_cs,
       CAST({_BMP_W} AS INT) AS width, CAST({_BMP_H} AS INT) AS height,
{',' .join(cols)}
FROM frames ORDER BY doc_id, frame_no
"""


def mm_audio_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental media admission — the oracle-checked BATCH TWIN of
    ``streaming/media_stream.py`` (the pattern ``dd_incremental`` set
    for text): even-doc_id media are the already-admitted history
    (their gated fingerprints = the persisted index), odd-doc_id media
    are the arriving batch; the batch passes the quality gates, drops
    anything whose intro fingerprint is already indexed, and keeps the
    lowest media_id per fingerprint within itself.  Exercises the
    exact admission semantics the streaming loop runs per micro-batch,
    end-to-end through real FLAC decode, against a from-octets SQL
    oracle."""
    from ..operators.multimodal import decode_flac_audio_stats
    from ..streaming.media_stream import admit_media_batch

    media = _cached_media(spark, sf_dir, "flac", lambda it: _flac_build(it, 4096, False))
    history = media.filter(F.col("media_id") % 2 == 0)
    batch = media.filter(F.col("media_id") % 2 == 1)
    hist_stats = decode_flac_audio_stats(
        history, _AC_CLIP, _AC_SIL, _AC_FP_WIN
    )
    n = F.col("n_frames") * F.col("n_channels")
    index_rows = hist_stats.filter(
        (F.col("n_frames") >= _AC_MIN_FRAMES)
        & (F.col("n_clip") / n <= _AC_MAX_CLIP)
        & (F.col("n_silence") / n <= _AC_MAX_SIL)
    ).select("fp")
    admitted, _fp_rows = admit_media_batch(
        batch,
        index_rows,
        clip_at=_AC_CLIP,
        silence_below=_AC_SIL,
        fp_window=_AC_FP_WIN,
        max_clip=_AC_MAX_CLIP,
        max_silence=_AC_MAX_SIL,
        min_frames=_AC_MIN_FRAMES,
    )
    return admitted.select(
        F.col("media_id").alias("doc_id"),
        "n_frames",
        F.round("clip_ratio", 6).alias("clip_ratio"),
        F.round("silence_ratio", 6).alias("silence_ratio"),
        F.round("rms", 6).alias("rms"),
        "fp",
    ).orderBy("doc_id")


def _mm_audio_incremental_sql() -> str:
    s = (
        "(CAST(cs[CAST(2 * k + 1 AS INT)] AS BIGINT) * 256"
        " + CAST(cs[CAST(2 * k + 2 AS INT)] AS BIGINT) - 32768)"
    )
    return f"""
WITH {_CODES_CTE_SQL},
stats AS (
  SELECT doc_id, CAST(n_bytes // 4 AS BIGINT) AS n_frames,
    2 * (n_bytes // 4) AS ns,
    CAST(len(list_filter(list_transform(range(0, 2 * (n_bytes // 4)),
      k -> abs({s})), a -> a >= {_AC_CLIP})) AS BIGINT) AS n_clip,
    CAST(len(list_filter(list_transform(range(0, 2 * (n_bytes // 4)),
      k -> abs({s})), a -> a < {_AC_SIL})) AS BIGINT) AS n_silence,
    CAST(list_sum(list_transform(range(0, 2 * (n_bytes // 4)),
      k -> {s} * {s})) AS BIGINT) AS sum_sq,
    CAST(list_sum(list_transform(
      range(0, LEAST(2 * (n_bytes // 4), {_AC_FP_WIN})),
      k -> (k + 1) * {s})) AS BIGINT) AS fp
  FROM codes WHERE n_bytes // 4 > 0
),
gated AS (
  SELECT doc_id, n_frames,
         n_clip * 1.0 / ns AS clip_ratio,
         n_silence * 1.0 / ns AS silence_ratio,
         sqrt(CAST(sum_sq AS DOUBLE) / ns) AS rms, fp
  FROM stats
  WHERE n_frames >= {_AC_MIN_FRAMES}
    AND n_clip * 1.0 / ns <= {_AC_MAX_CLIP}
    AND n_silence * 1.0 / ns <= {_AC_MAX_SIL}
),
index_fps AS (SELECT DISTINCT fp FROM gated WHERE doc_id % 2 = 0),
novel AS (
  SELECT g.* FROM gated g
  WHERE g.doc_id % 2 = 1
    AND NOT EXISTS (SELECT 1 FROM index_fps i WHERE i.fp = g.fp)
),
surv AS (SELECT fp, min(doc_id) AS doc_id FROM novel GROUP BY fp)
SELECT n.doc_id, n.n_frames,
       ROUND(n.clip_ratio, 6) AS clip_ratio,
       ROUND(n.silence_ratio, 6) AS silence_ratio,
       ROUND(n.rms, 6) AS rms, n.fp
FROM novel n JOIN surv s ON s.fp = n.fp AND s.doc_id = n.doc_id
ORDER BY n.doc_id
"""


_MP3_GG = 190  # fixture global_gain (2^-5 — PCM off the int16 rails)


_MP3_MKV_TICKS = 26  # ~1152/44100 s per frame at the 1 ms default scale


def _mp3_mkv_build(batches):
    """Fixture kernel for ``mm_mkv_mp3_rms``: a data-dependent NUMBER
    of frames per document (F = 1 + n_bytes mod 3, so the decode chain
    length varies per row), built as one mono Layer III stream (segment
    gc = f*2 + g keeps the byte→bitstream mapping of ``_mp3_build``),
    then muxed per the Matroska A_MPEG/L3 codec mapping: one MPEG frame
    per SimpleBlock, no CodecPrivate, clusters of 2."""
    import numpy as np
    import pandas as pd

    from ..functions.ebml import MkvTrack, write_mkv
    from ..functions.mp3 import _FRAME_LEN, write_mp3_l3

    tracks = [
        MkvTrack(1, "audio", "A_MPEG/L3", sampling_hz=44100.0, channels=1)
    ]
    for pdf in batches:
        payloads = []
        for t in pdf["text"]:
            raw = t.encode("utf-8")
            nb = len(raw)
            if nb == 0:
                payloads.append(None)
                continue
            b = np.frombuffer(raw, np.uint8).astype(np.int64)
            nf = 1 + nb % 3
            q = np.empty((nf, 2, 576), np.int64)
            sfs = np.empty((nf, 2, 21), np.int64)
            for f in range(nf):
                for g in range(2):
                    gc = f * 2 + g
                    v = b[(576 * gc + np.arange(576)) % nb] % 3
                    q[f, g] = np.where(v == 0, 0, np.where(v == 1, 1, -1))
                    sfs[f, g] = b[(21 * gc + np.arange(21)) % nb] % 8
            stream = write_mp3_l3(q, sfs, global_gain=_MP3_GG)
            frames = [
                (
                    1,
                    f * _MP3_MKV_TICKS,
                    True,
                    stream[f * _FRAME_LEN : (f + 1) * _FRAME_LEN],
                )
                for f in range(nf)
            ]
            payloads.append(write_mkv(frames, tracks, cluster_every=2))
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def _mp3_build(batches, nch: int = 1, stereo_mode: str = "independent"):
    """Fixture kernel for the ``mm_mp3*`` queries: document bytes
    become ONE real ID3v2-prefixed MPEG-1 Layer III frame (44.1 kHz,
    320 kbps, Huffman table 1; mono or independent-channel stereo).
    The byte→bitstream mapping the oracle mirrors, over granule-channel
    segments ``gc = g*nch + ch`` (bitstream order): line i of segment
    gc takes its quantized value from byte ``(576·gc + i) mod n``
    (b%3: 0→0, 1→+1, 2→−1); scalefactor band k of segment gc from byte
    ``(21·gc + k) mod n`` (b%8)."""
    import numpy as np
    import pandas as pd

    from ..functions.id3 import write_id3
    from ..functions.mp3 import write_mp3_l3

    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            raw = t.encode("utf-8")
            nb = len(raw)
            if nb == 0:
                payloads.append(None)
                continue
            b = np.frombuffer(raw, np.uint8).astype(np.int64)
            q = np.empty((1, 2, nch, 576), np.int64)
            sfs = np.empty((1, 2, nch, 21), np.int64)
            for g in range(2):
                for ch in range(nch):
                    gc = g * nch + ch
                    v = b[(576 * gc + np.arange(576)) % nb] % 3
                    q[0, g, ch] = np.where(
                        v == 0, 0, np.where(v == 1, 1, -1)
                    )
                    sfs[0, g, ch] = b[(21 * gc + np.arange(21)) % nb] % 8
            if nch == 1:
                q, sfs = q[:, :, 0], sfs[:, :, 0]
            payloads.append(
                write_id3({"TIT2": f"doc {did}"})
                + write_mp3_l3(
                    q, sfs, global_gain=_MP3_GG,
                    stereo_mode=stereo_mode,
                )
            )
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def mm_mp3_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END MP3 SAMPLE decode (VERDICT r7 task 2, the last
    DecodeStub raise worth killing): each document becomes a REAL
    ID3v2-tagged MPEG-1 Layer III stream — side info, scalefactors and
    a table-1 Huffman-coded spectrum derived from the document bytes —
    and ``decode_mp3_audio_stats`` decodes the SAMPLES back: ID3 skip,
    sync walk, side-info parse, scalefactor read, Huffman decode,
    then the fixed-point reconstruction (requant LUT → alias
    butterflies → fused IMDCT+window with ONE rounding → overlap-add →
    frequency inversion → polyphase synthesis → int16 clamp).  Every
    reconstruction stage is integer-exact, so the DuckDB oracle
    replays the WHOLE pipeline from the pre-encode octets — any drift
    in the bitstream layout, the Huffman codes, a table constant or a
    rounding rule breaks the value hash (the lossy-codec trick of
    ``mm_jpeg_pool``, at Layer III scale: 5 chained stages over
    576-line granules instead of 4 over 8×8 blocks).

    Scale shape: one zero-shuffle Arrow decode pass over repartitioned
    payloads; one stats row per document moves afterwards."""
    from ..operators.multimodal import decode_mp3_audio_stats

    media = _cached_media(spark, sf_dir, "mp3", _mp3_build)
    stats = decode_mp3_audio_stats(media)
    return stats.select(
        F.col("media_id").alias("doc_id"),
        "sample_rate",
        "n_samples",
        "sum_sq",
        "fp",
        F.round(
            F.sqrt(F.col("sum_sq") / F.col("n_samples")), 6
        ).alias("rms"),
    ).orderBy("doc_id")


def mm_mp3_stereo_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STEREO twin of ``mm_mp3_rms``: two INDEPENDENT channels per
    frame (mode 00; 32-byte side info, four granule-channel blocks,
    per-channel overlap + filterbank state), decoded samples
    channel-interleaved into the same integer stats.  The oracle runs
    the full fixed-point pipeline over all four granule-channel
    segments — the per-channel state separation (the overlap tail is
    the same-channel segment TWO back; the window FIFO never crosses
    channels) is exactly what the value hash pins."""
    from functools import partial

    from ..operators.multimodal import decode_mp3_audio_stats

    media = _cached_media(spark, sf_dir, "mp3st", partial(_mp3_build, nch=2))
    stats = decode_mp3_audio_stats(media)
    return stats.select(
        F.col("media_id").alias("doc_id"),
        "sample_rate",
        "n_samples",
        "sum_sq",
        "fp",
        F.round(
            F.sqrt(F.col("sum_sq") / F.col("n_samples")), 6
        ).alias("rms"),
    ).orderBy("doc_id")


def _audio_mixed_build(batches):
    """Fixture kernel for ``mm_audio_multicodec``: a HETEROGENEOUS
    corpus — even doc_ids become real FLAC stereo streams (the
    ``_flac_build`` sample mapping: interleaved 16-bit big-endian pairs
    from the UTF-8 bytes; mid/side for doc_id % 4 == 0), odd doc_ids
    become ID3-prefixed mono Layer III (the ``_mp3_build`` mapping)."""
    import numpy as np
    import pandas as pd

    from ..functions.flac import write_flac
    from ..functions.id3 import write_id3
    from ..functions.mp3 import write_mp3_l3

    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            raw = t.encode("utf-8")
            nb = len(raw)
            if did % 2 == 0:
                m = nb // 4
                if m == 0:
                    payloads.append(None)
                    continue
                b = np.frombuffer(raw, np.uint8, count=4 * m).astype(
                    np.int64
                )
                samples = ((b[0::2] * 256 + b[1::2]) - 32768).reshape(m, 2)
                payloads.append(
                    write_flac(
                        samples,
                        sample_rate=_FLAC_RATE,
                        block_size=4096,
                        stereo_mode=(
                            "mid_side" if did % 4 == 0 else "independent"
                        ),
                    )
                )
            else:
                if nb == 0:
                    payloads.append(None)
                    continue
                b = np.frombuffer(raw, np.uint8).astype(np.int64)
                q = np.empty((1, 2, 576), np.int64)
                sfs = np.empty((1, 2, 21), np.int64)
                for g in range(2):
                    v = b[(576 * g + np.arange(576)) % nb] % 3
                    q[0, g] = np.where(v == 0, 0, np.where(v == 1, 1, -1))
                    sfs[0, g] = b[(21 * g + np.arange(21)) % nb] % 8
                payloads.append(
                    write_id3({"TIT2": f"doc {did}"})
                    + write_mp3_l3(q, sfs, global_gain=_MP3_GG)
                )
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def mm_audio_multicodec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-CODEC audio curation (r8): the admission funnel of
    ``mm_audio_curation`` over a HETEROGENEOUS corpus — half the
    payloads are real FLAC stereo, half ID3-prefixed MP3 mono — decoded
    by the magic-dispatched ``decode_audio_stats`` into ONE integer
    stats schema, then gated and fingerprint-deduplicated together.
    The oracle is the union of both codec re-derivations: FLAC stats
    straight from the pre-encode octets (lossless), MP3 stats through
    the full variable-free fixed-point pipeline (the ``admission``
    form of the shared generator) — the mixed-corpus gates and
    survivor choice are value-hashed end-to-end.

    Scale shape: one zero-shuffle Arrow decode pass regardless of
    codec mix; one fingerprint-keyed agg moving a stats row per doc."""
    from ..operators.multimodal import decode_audio_stats

    media = _cached_media(spark, sf_dir, "audiomix", _audio_mixed_build)
    stats = decode_audio_stats(media, _AC_CLIP, _AC_SIL, _AC_FP_WIN)
    n = F.col("n_frames") * F.col("n_channels")
    gated = stats.select(
        F.col("media_id").alias("doc_id"),
        F.when(F.col("media_id") % 2 == 0, F.lit("flac"))
        .otherwise(F.lit("mp3"))
        .alias("codec"),
        "n_channels",
        "n_frames",
        (F.col("n_clip") / n).alias("clip_ratio"),
        (F.col("n_silence") / n).alias("silence_ratio"),
        F.sqrt(F.col("sum_sq") / n).alias("rms"),
        "fp",
    ).filter(
        (F.col("n_frames") >= _AC_MIN_FRAMES)
        & (F.col("clip_ratio") <= _AC_MAX_CLIP)
        & (F.col("silence_ratio") <= _AC_MAX_SIL)
    )
    canon = gated.groupBy("fp").agg(
        F.min("doc_id").alias("doc_id"),
        F.count(F.lit(1)).alias("dup_count"),
    )
    return (
        gated.join(canon, ["fp", "doc_id"])
        .select(
            "doc_id",
            "codec",
            "n_channels",
            "n_frames",
            F.round("clip_ratio", 6).alias("clip_ratio"),
            F.round("silence_ratio", 6).alias("silence_ratio"),
            F.round("rms", 6).alias("rms"),
            "fp",
            "dup_count",
        )
        .orderBy("doc_id")
    )


def _mm_audio_multicodec_sql() -> str:
    """Union oracle: even docs re-derived from octets (FLAC is
    lossless), odd docs through the admission form of the MP3 pipeline
    generator; then the identical gates + min-doc_id dedup."""
    s = (
        "(CAST(cs[CAST(2 * k + 1 AS INT)] AS BIGINT) * 256"
        " + CAST(cs[CAST(2 * k + 2 AS INT)] AS BIGINT) - 32768)"
    )
    mp3_adm = _mm_mp3_rms_sql(
        1, admission=True, doc_where=" AND doc_id % 2 = 1"
    )
    return f"""
WITH {_CODES_CTE_SQL},
fl AS (
  SELECT doc_id, CAST(2 AS INT) AS n_channels,
    CAST(n_bytes // 4 AS BIGINT) AS n_frames,
    CAST(len(list_filter(list_transform(range(0, 2 * (n_bytes // 4)),
      k -> abs({s})), a -> a >= {_AC_CLIP})) AS BIGINT) AS n_clip,
    CAST(len(list_filter(list_transform(range(0, 2 * (n_bytes // 4)),
      k -> abs({s})), a -> a < {_AC_SIL})) AS BIGINT) AS n_silence,
    CAST(list_sum(list_transform(range(0, 2 * (n_bytes // 4)),
      k -> {s} * {s})) AS BIGINT) AS sum_sq,
    CAST(list_sum(list_transform(
      range(0, LEAST(2 * (n_bytes // 4), {_AC_FP_WIN})),
      k -> (k + 1) * {s})) AS BIGINT) AS fp
  FROM codes WHERE doc_id % 2 = 0 AND n_bytes // 4 > 0
),
mp3a AS (
  SELECT doc_id, n_channels, n_frames, n_clip, n_silence, sum_sq, fp
  FROM ({mp3_adm})
),
allst AS (SELECT * FROM fl UNION ALL SELECT * FROM mp3a),
gated AS (
  SELECT doc_id,
    CASE WHEN doc_id % 2 = 0 THEN 'flac' ELSE 'mp3' END AS codec,
    n_channels, n_frames,
    n_clip * 1.0 / (n_frames * n_channels) AS clip_ratio,
    n_silence * 1.0 / (n_frames * n_channels) AS silence_ratio,
    sqrt(CAST(sum_sq AS DOUBLE) / (n_frames * n_channels)) AS rms, fp
  FROM allst
  WHERE n_frames >= {_AC_MIN_FRAMES}
    AND n_clip * 1.0 / (n_frames * n_channels) <= {_AC_MAX_CLIP}
    AND n_silence * 1.0 / (n_frames * n_channels) <= {_AC_MAX_SIL}
),
canon AS (
  SELECT fp, min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS dup_count
  FROM gated GROUP BY fp
)
SELECT g.doc_id, g.codec, g.n_channels, g.n_frames,
       ROUND(g.clip_ratio, 6) AS clip_ratio,
       ROUND(g.silence_ratio, 6) AS silence_ratio,
       ROUND(g.rms, 6) AS rms, g.fp, c.dup_count
FROM gated g JOIN canon c ON c.fp = g.fp AND c.doc_id = g.doc_id
ORDER BY g.doc_id
"""


def _audio_mixed3_build(batches):
    """Fixture kernel for ``mm_audio_multicodec3`` (r9, VERDICT r8
    task 3): THREE codecs through one funnel — ``doc_id % 3 == 0``
    becomes real FLAC stereo, ``% 3 == 1`` ID3-prefixed mono Layer III,
    ``% 3 == 2`` a RIFF/WAVE container with mono 16-bit PCM (the most
    common raw-audio container, previously absent from the dispatch).
    The WAV samples use the same big-endian byte-pair mapping as FLAC,
    so both lossless arms re-derive from the pre-encode octets."""
    import numpy as np
    import pandas as pd

    from ..functions.codecs import write_wav
    from ..functions.flac import write_flac
    from ..functions.id3 import write_id3
    from ..functions.mp3 import write_mp3_l3

    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            raw = t.encode("utf-8")
            nb = len(raw)
            arm = did % 3
            if arm == 0:
                m = nb // 4
                if m == 0:
                    payloads.append(None)
                    continue
                b = np.frombuffer(raw, np.uint8, count=4 * m).astype(
                    np.int64
                )
                samples = ((b[0::2] * 256 + b[1::2]) - 32768).reshape(m, 2)
                payloads.append(
                    write_flac(
                        samples,
                        sample_rate=_FLAC_RATE,
                        block_size=4096,
                        stereo_mode=(
                            "mid_side" if did % 6 == 0 else "independent"
                        ),
                    )
                )
            elif arm == 1:
                if nb == 0:
                    payloads.append(None)
                    continue
                b = np.frombuffer(raw, np.uint8).astype(np.int64)
                q = np.empty((1, 2, 576), np.int64)
                sfs = np.empty((1, 2, 21), np.int64)
                for g in range(2):
                    v = b[(576 * g + np.arange(576)) % nb] % 3
                    q[0, g] = np.where(v == 0, 0, np.where(v == 1, 1, -1))
                    sfs[0, g] = b[(21 * g + np.arange(21)) % nb] % 8
                payloads.append(
                    write_id3({"TIT2": f"doc {did}"})
                    + write_mp3_l3(q, sfs, global_gain=_MP3_GG)
                )
            else:
                m = nb // 2
                if m == 0:
                    payloads.append(None)
                    continue
                b = np.frombuffer(raw, np.uint8, count=2 * m).astype(
                    np.int64
                )
                pcm = ((b[0::2] * 256 + b[1::2]) - 32768).astype(np.int16)
                payloads.append(write_wav(pcm, sample_rate=_FLAC_RATE))
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def mm_audio_multicodec3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THREE-codec audio curation (r9): the ``mm_audio_multicodec``
    funnel with a RIFF/WAVE arm — FLAC stereo, ID3-prefixed MP3 mono
    and raw 16-bit PCM WAV mono all decode through the one
    magic-dispatched ``decode_audio_stats`` into the shared admission
    schema, then gate and fingerprint-deduplicate together.  The two
    lossless arms (FLAC, WAV) re-derive straight from the pre-encode
    octets in the oracle; the MP3 arm replays the full fixed-point
    pipeline.  Scale shape identical to the 2-codec funnel: one
    zero-shuffle Arrow decode pass, one fp-keyed agg."""
    from ..operators.multimodal import decode_audio_stats

    media = _cached_media(spark, sf_dir, "audiomix3", _audio_mixed3_build)
    stats = decode_audio_stats(media, _AC_CLIP, _AC_SIL, _AC_FP_WIN)
    n = F.col("n_frames") * F.col("n_channels")
    gated = stats.select(
        F.col("media_id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("flac"), F.lit("mp3"), F.lit("wav")),
            (F.col("media_id") % 3 + 1).cast("int"),
        ).alias("codec"),
        "n_channels",
        "n_frames",
        (F.col("n_clip") / n).alias("clip_ratio"),
        (F.col("n_silence") / n).alias("silence_ratio"),
        F.sqrt(F.col("sum_sq") / n).alias("rms"),
        "fp",
    ).filter(
        (F.col("n_frames") >= _AC_MIN_FRAMES)
        & (F.col("clip_ratio") <= _AC_MAX_CLIP)
        & (F.col("silence_ratio") <= _AC_MAX_SIL)
    )
    canon = gated.groupBy("fp").agg(
        F.min("doc_id").alias("doc_id"),
        F.count(F.lit(1)).alias("dup_count"),
    )
    return (
        gated.join(canon, ["fp", "doc_id"])
        .select(
            "doc_id",
            "codec",
            "n_channels",
            "n_frames",
            F.round("clip_ratio", 6).alias("clip_ratio"),
            F.round("silence_ratio", 6).alias("silence_ratio"),
            F.round("rms", 6).alias("rms"),
            "fp",
            "dup_count",
        )
        .orderBy("doc_id")
    )


def _mm_audio_multicodec3_sql() -> str:
    """Three-arm union oracle: FLAC (stereo pairs) and WAV (mono pairs)
    re-derived from octets — both lossless — plus the admission form of
    the MP3 pipeline generator; then the identical gates + dedup."""
    s2 = (
        "(CAST(cs[CAST(2 * k + 1 AS INT)] AS BIGINT) * 256"
        " + CAST(cs[CAST(2 * k + 2 AS INT)] AS BIGINT) - 32768)"
    )
    mp3_adm = _mm_mp3_rms_sql(
        1, admission=True, doc_where=" AND doc_id % 3 = 1"
    )

    def lossless_arm(where: str, nch: int, frames: str) -> str:
        n_inter = f"{nch} * ({frames})"
        return f"""
  SELECT doc_id, CAST({nch} AS INT) AS n_channels,
    CAST({frames} AS BIGINT) AS n_frames,
    CAST(len(list_filter(list_transform(range(0, {n_inter}),
      k -> abs({s2})), a -> a >= {_AC_CLIP})) AS BIGINT) AS n_clip,
    CAST(len(list_filter(list_transform(range(0, {n_inter}),
      k -> abs({s2})), a -> a < {_AC_SIL})) AS BIGINT) AS n_silence,
    CAST(list_sum(list_transform(range(0, {n_inter}),
      k -> {s2} * {s2})) AS BIGINT) AS sum_sq,
    CAST(list_sum(list_transform(
      range(0, LEAST({n_inter}, {_AC_FP_WIN})),
      k -> (k + 1) * {s2})) AS BIGINT) AS fp
  FROM codes WHERE {where} AND {frames} > 0"""

    return f"""
WITH {_CODES_CTE_SQL},
fl AS ({lossless_arm("doc_id % 3 = 0", 2, "n_bytes // 4")}),
wv AS ({lossless_arm("doc_id % 3 = 2", 1, "n_bytes // 2")}),
mp3a AS (
  SELECT doc_id, n_channels, n_frames, n_clip, n_silence, sum_sq, fp
  FROM ({mp3_adm})
),
allst AS (
  SELECT * FROM fl UNION ALL SELECT * FROM mp3a UNION ALL SELECT * FROM wv
),
gated AS (
  SELECT doc_id,
    CASE doc_id % 3 WHEN 0 THEN 'flac' WHEN 1 THEN 'mp3'
         ELSE 'wav' END AS codec,
    n_channels, n_frames,
    n_clip * 1.0 / (n_frames * n_channels) AS clip_ratio,
    n_silence * 1.0 / (n_frames * n_channels) AS silence_ratio,
    sqrt(CAST(sum_sq AS DOUBLE) / (n_frames * n_channels)) AS rms, fp
  FROM allst
  WHERE n_frames >= {_AC_MIN_FRAMES}
    AND n_clip * 1.0 / (n_frames * n_channels) <= {_AC_MAX_CLIP}
    AND n_silence * 1.0 / (n_frames * n_channels) <= {_AC_MAX_SIL}
),
canon AS (
  SELECT fp, min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS dup_count
  FROM gated GROUP BY fp
)
SELECT g.doc_id, g.codec, g.n_channels, g.n_frames,
       ROUND(g.clip_ratio, 6) AS clip_ratio,
       ROUND(g.silence_ratio, 6) AS silence_ratio,
       ROUND(g.rms, 6) AS rms, g.fp, c.dup_count
FROM gated g JOIN canon c ON c.fp = g.fp AND c.doc_id = g.doc_id
ORDER BY g.doc_id
"""


def _audio_mixed4_build(batches):
    """Fixture kernel for ``mm_audio_multicodec4`` (r10): FOUR
    containers through one funnel — ``doc_id % 4 == 0`` real FLAC
    stereo, ``% 4 == 1`` ID3-prefixed mono Layer III, ``% 4 == 2``
    RIFF/WAVE mono 16-bit PCM, ``% 4 == 3`` AIFF mono 16-bit PCM
    (big-endian IFF with the 80-bit extended-float sample rate).  The
    three lossless arms share the big-endian byte-pair mapping, so
    they re-derive from the pre-encode octets."""
    import numpy as np
    import pandas as pd

    from ..functions.codecs import write_aiff, write_wav
    from ..functions.flac import write_flac
    from ..functions.id3 import write_id3
    from ..functions.mp3 import write_mp3_l3

    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            raw = t.encode("utf-8")
            nb = len(raw)
            arm = did % 4
            if arm == 0:
                m = nb // 4
                if m == 0:
                    payloads.append(None)
                    continue
                b = np.frombuffer(raw, np.uint8, count=4 * m).astype(
                    np.int64
                )
                samples = ((b[0::2] * 256 + b[1::2]) - 32768).reshape(m, 2)
                payloads.append(
                    write_flac(
                        samples,
                        sample_rate=_FLAC_RATE,
                        block_size=4096,
                        stereo_mode=(
                            "mid_side" if did % 8 == 0 else "independent"
                        ),
                    )
                )
            elif arm == 1:
                if nb == 0:
                    payloads.append(None)
                    continue
                b = np.frombuffer(raw, np.uint8).astype(np.int64)
                q = np.empty((1, 2, 576), np.int64)
                sfs = np.empty((1, 2, 21), np.int64)
                for g in range(2):
                    v = b[(576 * g + np.arange(576)) % nb] % 3
                    q[0, g] = np.where(v == 0, 0, np.where(v == 1, 1, -1))
                    sfs[0, g] = b[(21 * g + np.arange(21)) % nb] % 8
                payloads.append(
                    write_id3({"TIT2": f"doc {did}"})
                    + write_mp3_l3(q, sfs, global_gain=_MP3_GG)
                )
            else:
                m = nb // 2
                if m == 0:
                    payloads.append(None)
                    continue
                b = np.frombuffer(raw, np.uint8, count=2 * m).astype(
                    np.int64
                )
                pcm = ((b[0::2] * 256 + b[1::2]) - 32768).astype(np.int16)
                payloads.append(
                    write_wav(pcm, sample_rate=_FLAC_RATE)
                    if arm == 2
                    else write_aiff(pcm, sample_rate=_FLAC_RATE)
                )
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def mm_audio_multicodec4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FOUR-container audio curation (r10): the heterogeneous funnel
    with an AIFF arm — FLAC, MP3, WAV and AIFF all magic-dispatch
    through the ONE ``decode_audio_stats`` kernel into the shared
    admission schema, then gate and fingerprint-deduplicate together.
    AIFF exercises the big-endian IFF path incl. the 80-bit
    extended-float sample-rate field.  Scale shape unchanged: one
    zero-shuffle Arrow decode pass, one fp-keyed agg."""
    from ..operators.multimodal import decode_audio_stats

    media = _cached_media(spark, sf_dir, "audiomix4", _audio_mixed4_build)
    stats = decode_audio_stats(media, _AC_CLIP, _AC_SIL, _AC_FP_WIN)
    n = F.col("n_frames") * F.col("n_channels")
    gated = stats.select(
        F.col("media_id").alias("doc_id"),
        F.element_at(
            F.array(
                F.lit("flac"), F.lit("mp3"), F.lit("wav"), F.lit("aiff")
            ),
            (F.col("media_id") % 4 + 1).cast("int"),
        ).alias("codec"),
        "n_channels",
        "n_frames",
        (F.col("n_clip") / n).alias("clip_ratio"),
        (F.col("n_silence") / n).alias("silence_ratio"),
        F.sqrt(F.col("sum_sq") / n).alias("rms"),
        "fp",
    ).filter(
        (F.col("n_frames") >= _AC_MIN_FRAMES)
        & (F.col("clip_ratio") <= _AC_MAX_CLIP)
        & (F.col("silence_ratio") <= _AC_MAX_SIL)
    )
    canon = gated.groupBy("fp").agg(
        F.min("doc_id").alias("doc_id"),
        F.count(F.lit(1)).alias("dup_count"),
    )
    return (
        gated.join(canon, ["fp", "doc_id"])
        .select(
            "doc_id",
            "codec",
            "n_channels",
            "n_frames",
            F.round("clip_ratio", 6).alias("clip_ratio"),
            F.round("silence_ratio", 6).alias("silence_ratio"),
            F.round("rms", 6).alias("rms"),
            "fp",
            "dup_count",
        )
        .orderBy("doc_id")
    )


def _mm_audio_multicodec4_sql() -> str:
    """Four-arm union oracle: FLAC (stereo pairs), WAV and AIFF (mono
    pairs — both lossless, identical octet mapping) re-derived
    straight from the pre-encode octets, plus the admission form of
    the MP3 pipeline generator; then the identical gates + dedup."""
    s2 = (
        "(CAST(cs[CAST(2 * k + 1 AS INT)] AS BIGINT) * 256"
        " + CAST(cs[CAST(2 * k + 2 AS INT)] AS BIGINT) - 32768)"
    )
    mp3_adm = _mm_mp3_rms_sql(
        1, admission=True, doc_where=" AND doc_id % 4 = 1"
    )

    def lossless_arm(where: str, nch: int, frames: str) -> str:
        n_inter = f"{nch} * ({frames})"
        return f"""
  SELECT doc_id, CAST({nch} AS INT) AS n_channels,
    CAST({frames} AS BIGINT) AS n_frames,
    CAST(len(list_filter(list_transform(range(0, {n_inter}),
      k -> abs({s2})), a -> a >= {_AC_CLIP})) AS BIGINT) AS n_clip,
    CAST(len(list_filter(list_transform(range(0, {n_inter}),
      k -> abs({s2})), a -> a < {_AC_SIL})) AS BIGINT) AS n_silence,
    CAST(list_sum(list_transform(range(0, {n_inter}),
      k -> {s2} * {s2})) AS BIGINT) AS sum_sq,
    CAST(list_sum(list_transform(
      range(0, LEAST({n_inter}, {_AC_FP_WIN})),
      k -> (k + 1) * {s2})) AS BIGINT) AS fp
  FROM codes WHERE {where} AND {frames} > 0"""

    return f"""
WITH {_CODES_CTE_SQL},
fl AS ({lossless_arm("doc_id % 4 = 0", 2, "n_bytes // 4")}),
wv AS ({lossless_arm("doc_id % 4 = 2", 1, "n_bytes // 2")}),
af AS ({lossless_arm("doc_id % 4 = 3", 1, "n_bytes // 2")}),
mp3a AS (
  SELECT doc_id, n_channels, n_frames, n_clip, n_silence, sum_sq, fp
  FROM ({mp3_adm})
),
allst AS (
  SELECT * FROM fl UNION ALL SELECT * FROM mp3a
  UNION ALL SELECT * FROM wv UNION ALL SELECT * FROM af
),
gated AS (
  SELECT doc_id,
    CASE doc_id % 4 WHEN 0 THEN 'flac' WHEN 1 THEN 'mp3'
         WHEN 2 THEN 'wav' ELSE 'aiff' END AS codec,
    n_channels, n_frames,
    n_clip * 1.0 / (n_frames * n_channels) AS clip_ratio,
    n_silence * 1.0 / (n_frames * n_channels) AS silence_ratio,
    sqrt(CAST(sum_sq AS DOUBLE) / (n_frames * n_channels)) AS rms, fp
  FROM allst
  WHERE n_frames >= {_AC_MIN_FRAMES}
    AND n_clip * 1.0 / (n_frames * n_channels) <= {_AC_MAX_CLIP}
    AND n_silence * 1.0 / (n_frames * n_channels) <= {_AC_MAX_SIL}
),
canon AS (
  SELECT fp, min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS dup_count
  FROM gated GROUP BY fp
)
SELECT g.doc_id, g.codec, g.n_channels, g.n_frames,
       ROUND(g.clip_ratio, 6) AS clip_ratio,
       ROUND(g.silence_ratio, 6) AS silence_ratio,
       ROUND(g.rms, 6) AS rms, g.fp, c.dup_count
FROM gated g JOIN canon c ON c.fp = g.fp AND c.doc_id = g.doc_id
ORDER BY g.doc_id
"""


def _audio_quarantine_build(batches):
    """Fixture kernel for ``mm_audio_quarantine`` (r10): every doc a
    mono 16-bit PCM WAV from the big-endian octet-pair mapping, and
    docs with ``doc_id % 7 == 3`` get their RIFF magic destroyed — a
    deterministic corrupt-subset so the quarantine path itself is
    oracle-checkable."""
    import numpy as np
    import pandas as pd

    from ..functions.codecs import write_wav

    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            raw = t.encode("utf-8")
            m = len(raw) // 2
            if m == 0:
                payloads.append(None)
                continue
            b = np.frombuffer(raw, np.uint8, count=2 * m).astype(np.int64)
            pcm = ((b[0::2] * 256 + b[1::2]) - 32768).astype(np.int16)
            blob = write_wav(pcm, sample_rate=_FLAC_RATE)
            if did % 7 == 3:
                blob = b"JUNK" + blob[4:]  # magic broken -> must reject
            payloads.append(blob)
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def mm_audio_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUARANTINING admission (r10): the funnel's production shape —
    ``decode_audio_stats_admitting`` turns each corrupt payload into a
    rejected ROW (null stats + error class) instead of a failed Spark
    task, the difference between losing one document and losing a
    100 TB pass when the corpus inevitably contains broken files.
    The fixture corrupts a deterministic subset (``doc_id % 7 == 3``,
    RIFF magic destroyed), so the oracle re-derives BOTH sides: exact
    stats from the pre-encode octets for the admitted docs, and the
    (doc_id, 'ValueError') rejects for the corrupted ones."""
    from ..operators.multimodal import decode_audio_stats_admitting

    media = _cached_media(spark, sf_dir, "audioquar", _audio_quarantine_build)
    stats = decode_audio_stats_admitting(
        media, _AC_CLIP, _AC_SIL, _AC_FP_WIN
    )
    return (
        stats.select(
            F.col("media_id").alias("doc_id"),
            F.col("error").isNull().alias("admitted"),
            "error",
            "n_frames",
            F.round(
                F.sqrt(F.col("sum_sq") / F.col("n_frames")), 6
            ).alias("rms"),
            "fp",
        )
        .orderBy("doc_id")
    )


def _mm_audio_quarantine_sql() -> str:
    """Both sides of the quarantine re-derived from octets: admitted
    docs' exact loudness/fingerprint (the lossless WAV mapping), and
    the corrupted subset as (doc_id, error='ValueError') null-stat
    rows."""
    s2 = (
        "(CAST(cs[CAST(2 * k + 1 AS INT)] AS BIGINT) * 256"
        " + CAST(cs[CAST(2 * k + 2 AS INT)] AS BIGINT) - 32768)"
    )
    return f"""
WITH {_CODES_CTE_SQL},
base AS (
  SELECT doc_id, n_bytes // 2 AS m, cs FROM codes WHERE n_bytes // 2 > 0
),
good AS (
  SELECT doc_id, TRUE AS admitted, CAST(NULL AS VARCHAR) AS error,
    CAST(m AS BIGINT) AS n_frames,
    ROUND(sqrt(CAST(list_sum(list_transform(range(0, m),
      k -> {s2} * {s2})) AS DOUBLE) / m), 6) AS rms,
    CAST(list_sum(list_transform(range(0, LEAST(m, {_AC_FP_WIN})),
      k -> (k + 1) * {s2})) AS BIGINT) AS fp
  FROM base WHERE doc_id % 7 <> 3
),
rejected AS (
  SELECT doc_id, FALSE AS admitted, 'ValueError' AS error,
    CAST(NULL AS BIGINT) AS n_frames, CAST(NULL AS DOUBLE) AS rms,
    CAST(NULL AS BIGINT) AS fp
  FROM base WHERE doc_id % 7 = 3
)
SELECT * FROM good UNION ALL SELECT * FROM rejected ORDER BY doc_id
"""


def mm_mp3_ms_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MID/SIDE joint-stereo twin of ``mm_mp3_stereo_rms`` (mode 01,
    mode_ext MS — how most real stereo MP3s are coded): the document
    bytes become quantized MID/SIDE spectra, and the decoder recombines
    ``L,R = rdiv((M ± S)·724, 2^10)`` on the requantized lines before
    reconstruction.  The oracle inserts the identical recombination CTE
    between requantization and the alias butterflies — the 724 constant
    and the extra rounding rule are value-hashed."""
    from functools import partial

    from ..operators.multimodal import decode_mp3_audio_stats

    media = _cached_media(spark, sf_dir, "mp3ms", partial(_mp3_build, nch=2, stereo_mode="ms"))
    stats = decode_mp3_audio_stats(media)
    return stats.select(
        F.col("media_id").alias("doc_id"),
        "sample_rate",
        "n_samples",
        "sum_sq",
        "fp",
        F.round(
            F.sqrt(F.col("sum_sq") / F.col("n_samples")), 6
        ).alias("rms"),
    ).orderBy("doc_id")


# general-profile MP3 fixture layout (r9, VERDICT r8 task 2): four
# mono frames per document = eight granule segments with fixed block
# types and per-frame bitrates (VBR exercises the reservoir packing)
# seg 5 is a MIXED block (r9 second pass), seg 6 pure short:
# long,long | long,long | start,mixed | short,stop — every transition
# valid (start->mixed, mixed->short, short->stop)
_MP3G_BT = (0, 0, 0, 0, 1, 2, 2, 3)
_MP3G_MIXED = (0, 0, 0, 0, 0, 1, 0, 0)
_MP3G_KBPS = (320, 256, 224, 320)
_MP3G_V5 = (0, 1, 2, -1, -2)  # byte%5 -> table-2 value


def _mp3_general_build(batches):
    """Fixture kernel for ``mm_mp3_general``: each document becomes an
    ID3v2-prefixed GENERAL-profile Layer III stream — four mono frames
    at varying bitrates (the bit reservoir genuinely engages), a valid
    long→start→MIXED→short→stop window sequence, Huffman table 2 +
    count1 quads + preflag on segments 0/3 (table B on seg 0, the
    variable-length table A on seg 3), scfsi sharing + a
    scalefac_scale=1 granule on frame 0, and a short granule with
    byte-derived subblock_gain and per-window scalefactors.

    Byte→bitstream mapping (the oracle mirrors it, segment
    ``seg = 2f+g``): line i of seg takes byte ``(576·seg+i) mod n`` —
    %5 mapped over {0,±1,±2} in the table-2 region (lines 0..35 of
    segs 0/3), %3 over {0,±1} elsewhere; segs 0/3 transmit 162
    big-value lines + 96 count1 lines and zero the rest.  Long
    scalefactor band k of seg: byte ``(21·seg+k) mod n`` %8 (seg 1
    shares bands 11..20 with seg 0 via scfsi); the short seg's
    36 per-window scalefactors sit at ``21·seg + 3·sfb + w`` and its
    subblock gains at ``21·seg + 36 + w``."""
    import numpy as np
    import pandas as pd

    from ..functions.id3 import write_id3
    from ..functions.mp3 import write_mp3_l3_general

    v5 = np.array(_MP3G_V5, np.int64)

    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            raw = t.encode("utf-8")
            nb = len(raw)
            if nb == 0:
                payloads.append(None)
                continue
            b = np.frombuffer(raw, np.uint8).astype(np.int64)
            frames = []
            for f in range(4):
                grans = []
                for g in range(2):
                    seg = 2 * f + g
                    bt = _MP3G_BT[seg]
                    idx = (576 * seg + np.arange(576)) % nb
                    q = np.zeros(576, np.int64)
                    if seg in (0, 3):
                        q[:36] = v5[b[idx[:36]] % 5]
                        m3 = b[idx[36:258]] % 3
                        q[36:258] = np.where(
                            m3 == 0, 0, np.where(m3 == 1, 1, -1)
                        )
                        bv, nq, tsel = 81, 24, [2, 1, 1]
                    else:
                        m3 = b[idx] % 3
                        q[:] = np.where(
                            m3 == 0, 0, np.where(m3 == 1, 1, -1)
                        )
                        bv, nq, tsel = 288, 0, [1, 1, 1]
                    if bt == 2:
                        mixed = bool(_MP3G_MIXED[seg])
                        sfs3 = (
                            b[
                                (
                                    21 * seg
                                    + 3 * np.arange(12)[:, None]
                                    + np.arange(3)[None, :]
                                )
                                % nb
                            ]
                            % 8
                        )
                        sbg = [
                            int(b[(21 * seg + 36 + w) % nb] % 8)
                            for w in range(3)
                        ]
                        gran = {
                            "block_type": 2,
                            "mixed": mixed,
                            "spectrum": q,
                            "big_values": bv,
                            "count1": nq,
                            "scalefacs_short": sfs3,
                            "subblock_gain": sbg,
                            "scalefac_scale": 0,
                            "table_select": tsel[:2],
                            "global_gain": _MP3_GG,
                        }
                        if mixed:
                            # long sfbs 0..7 from bytes 39..46 of the
                            # segment's sf range; short rows 0..2 zero
                            sfs3[:3] = 0
                            gran["scalefacs_short"] = sfs3
                            gran["scalefacs_long"] = (
                                b[(21 * seg + 39 + np.arange(8)) % nb]
                                % 8
                            )
                        grans.append(gran)
                    else:
                        sf = b[(21 * seg + np.arange(21)) % nb] % 8
                        if seg == 1:  # scfsi groups 2+3 share seg 0's
                            sf[11:21] = b[np.arange(11, 21) % nb] % 8
                        grans.append({
                            "block_type": bt,
                            "spectrum": q,
                            "big_values": bv,
                            "count1": nq,
                            # seg 0 codes its quads under count1 table
                            # B, seg 3 under the variable-length table
                            # A (r9) — both transport, zero oracle
                            # footprint
                            "count1_table": "A" if seg == 3 else "B",
                            "scalefacs": sf,
                            "preflag": 1 if seg in (0, 3) else 0,
                            "scalefac_scale": 1 if seg == 1 else 0,
                            "table_select": tsel,
                            "global_gain": _MP3_GG,
                        })
                frames.append({
                    "kbps": _MP3G_KBPS[f],
                    "scfsi": 0b0011 if f == 0 else 0,
                    # frame 2 is CRC-protected: the decoder verifies
                    # the error-check word (pure transport, no oracle
                    # footprint)
                    "crc": f == 2,
                    "granules": grans,
                })
            payloads.append(
                write_id3({"TIT2": f"doc {did}"})
                + write_mp3_l3_general(frames)
            )
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def mm_mp3_general(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GENERAL-PROFILE MP3 decode (r9, VERDICT r8 task 2): the fixture
    exercises every general-stream feature the r8 decoder disclosed —
    the bit reservoir across VBR frames (256/224 kbps frames pull
    their main data back into earlier frames' slack), scfsi, preflag,
    scalefac_scale, Huffman table 2, the count1 table-B quadruple
    region, and window switching (start → MIXED → short → stop, with
    subblock_gain, per-window short scalefactors, and the mixed
    block's two long subbands).  The oracle
    replays the complete fixed-point reconstruction from the
    pre-encode octets — per-segment block types select the fused
    normal/start/stop IMDCT tables or the three-window short path —
    so the value hash pins the whole general profile end to end.

    Scale shape: identical to ``mm_mp3_rms`` — one zero-shuffle Arrow
    decode pass over cached payloads, one stats row per document."""
    from ..operators.multimodal import decode_mp3_audio_stats

    media = _cached_media(spark, sf_dir, "mp3gen4", _mp3_general_build)
    stats = decode_mp3_audio_stats(media)
    return stats.select(
        F.col("media_id").alias("doc_id"),
        "sample_rate",
        "n_samples",
        "sum_sq",
        "fp",
        F.round(
            F.sqrt(F.col("sum_sq") / F.col("n_samples")), 6
        ).alias("rms"),
    ).orderBy("doc_id")


def _mp3_intensity_build(batches):
    """Fixture kernel for ``mm_mp3_intensity_rms``: stereo frames in
    joint-stereo mode 01 / mode_ext 01 — the left channel carries the
    full 576-line spectrum, the right channel transmits only its first
    134 lines (sfb 15 bound) and its scalefactors in bands 15..20 are
    byte-derived is_pos positions (%7, so 0..6).  Same %3 value and %8
    scalefactor byte mappings as ``_mp3_build``."""
    import numpy as np
    import pandas as pd

    from ..functions.id3 import write_id3
    from ..functions.mp3 import _IS_BV, write_mp3_l3

    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            raw = t.encode("utf-8")
            nb = len(raw)
            if nb == 0:
                payloads.append(None)
                continue
            b = np.frombuffer(raw, np.uint8).astype(np.int64)
            q = np.zeros((1, 2, 2, 576), np.int64)
            sfs = np.empty((1, 2, 2, 21), np.int64)
            for g in range(2):
                for ch in range(2):
                    gc = g * 2 + ch
                    lines = 576 if ch == 0 else 2 * _IS_BV
                    v = b[(576 * gc + np.arange(lines)) % nb] % 3
                    q[0, g, ch, :lines] = np.where(
                        v == 0, 0, np.where(v == 1, 1, -1)
                    )
                    sfs[0, g, ch] = b[(21 * gc + np.arange(21)) % nb] % 8
                # right bands 15..20 are is_pos: cap at 6
                sfs[0, g, 1, 15:21] %= 7
            payloads.append(
                write_id3({"TIT2": f"doc {did}"})
                + write_mp3_l3(
                    q, sfs, global_gain=_MP3_GG,
                    stereo_mode="intensity",
                )
            )
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def mm_mp3_intensity_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTENSITY joint-stereo twin of ``mm_mp3_stereo_rms`` (r9,
    VERDICT r8 task 5 — the remaining mode_ext bit): bands at/above
    the right channel's transmitted bound (sfb 15) carry one spectrum
    split by the fixed-point tan-position factors
    ``L,R = rdiv(x·KL/KR[is_pos], 2^10)``; the oracle inserts the
    identical position-split CTE between requantization and the alias
    butterflies, value-hashing the KL/KR tables, the band-21-reuses-
    band-20 rule and the bound arithmetic."""
    from ..operators.multimodal import decode_mp3_audio_stats

    media = _cached_media(spark, sf_dir, "mp3is", _mp3_intensity_build)
    stats = decode_mp3_audio_stats(media)
    return stats.select(
        F.col("media_id").alias("doc_id"),
        "sample_rate",
        "n_samples",
        "sum_sq",
        "fp",
        F.round(
            F.sqrt(F.col("sum_sq") / F.col("n_samples")), 6
        ).alias("rms"),
    ).orderBy("doc_id")


def mm_mkv_mp3_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END MP3-in-Matroska decode — completes the demux∘codec
    family (MJPEG video, FLAC audio, now the most common compressed
    audio format): a data-dependent number of REAL Layer III frames per
    document (1–3, so the decode-chain length varies per row) muxed per
    the A_MPEG/L3 codec mapping, demuxed back, reassembled in timestamp
    order and SAMPLE-decoded with cross-frame reconstruction state —
    one dropped or reordered SimpleBlock would change every later
    sample and break the value hash.  The oracle re-derives the frame
    count AND the whole variable-length fixed-point pipeline from the
    pre-encode octets (the ``frames_expr`` form of the shared
    generator).  One zero-shuffle Arrow pass; one stats row per doc."""
    from ..operators.multimodal import demux_decode_mp3_stats

    media = _cached_media(spark, sf_dir, "mkvmp3", _mp3_mkv_build)
    stats = demux_decode_mp3_stats(media)
    return stats.select(
        F.col("media_id").alias("doc_id"),
        "n_blocks",
        "sample_rate",
        "n_samples",
        "sum_sq",
        "fp",
        F.round(
            F.sqrt(F.col("sum_sq") / F.col("n_samples")), 6
        ).alias("rms"),
    ).orderBy("doc_id")


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


def mm_id3_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP3 metadata extraction through a REAL ID3v2 container: each
    document becomes an ID3-tagged payload (title = first 3 tokens,
    artist = lang, album = source, track = doc_id mod 100; version,
    text encoding AND unsynchronization vary per doc to exercise
    v2.2's 6-byte frame headers, v2.3 plain vs v2.4 syncsafe frame
    sizes, the Latin-1 vs UTF-8 decoders, and the whole-tag (v2.2/
    v2.3) vs per-frame (v2.4) unsync paths) followed by opaque 'audio'
    bytes.  ``extract_id3_tags`` parses it back; the oracle recomputes
    every column — including the tag/audio byte split, which pins the
    per-version frame-header and syncsafe size arithmetic — from the
    documents table.  (The fixture text is ASCII, so unsync inserts no
    escape bytes here; the expansion arithmetic on 0xFF-bearing bodies
    is pinned by the UTF-16 unit matrix in test_codecs.py.)"""
    from ..operators.multimodal import extract_id3_tags


    def build(batches):
        import pandas as pd

        from ..functions.id3 import write_id3
        from ..functions.text import tokens_py

        for pdf in batches:
            ids, payloads = [], []
            for did, lang, source, t in zip(
                pdf["doc_id"], pdf["lang"], pdf["source"], pdf["text"]
            ):
                toks = tokens_py(t)[:3]
                frames = {
                    "TIT2": " ".join(toks),
                    "TPE1": str(lang),
                    "TALB": str(source),
                    "TRCK": str(int(did) % 100),
                }
                did_i = int(did)
                major = 2 if did_i % 5 == 0 else (3 if did_i % 3 == 0 else 4)
                ids.append(did)
                payloads.append(
                    write_id3(
                        frames,
                        major=major,
                        encoding=3 if did_i % 2 == 0 else 0,
                        unsync=did_i % 4 == 1,
                        audio=t.encode("utf-8")[:32],
                    )
                )
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = _cached_media(spark, sf_dir, "id3", build, cols=("doc_id", "lang", "source", "text"))
    out = extract_id3_tags(media)
    return out.select(
        F.col("media_id").alias("doc_id"),
        "major",
        "title",
        "artist",
        "album",
        "track",
        "tag_bytes",
        "audio_bytes",
    ).orderBy("doc_id")


def _mm_id3_sql() -> str:
    # tag layout: 10 header + per-frame (frame-header + 1 encoding byte
    # + len) + 16 padding, where the frame overhead is 7 for v2.2's
    # 6-byte headers and 11 for v2.3/v2.4's 10-byte headers; all
    # fixture text is ASCII so char length == byte length in Latin-1
    # and UTF-8 and unsynchronization inserts nothing
    return f"""
WITH base AS (
  SELECT doc_id, lang, source,
         array_to_string(list_slice({TOKENS_SQL}, 1, 3), ' ') AS title,
         CAST(doc_id % 100 AS VARCHAR) AS trck,
         octet_length(encode(text)) AS nb,
         CASE WHEN doc_id % 5 = 0 THEN 2
              WHEN doc_id % 3 = 0 THEN 3 ELSE 4 END AS mj
  FROM documents
)
SELECT doc_id,
       CAST(mj AS INT) AS major,
       title, lang AS artist, source AS album, trck AS track,
       CAST(10
            + 4 * (CASE WHEN mj = 2 THEN 7 ELSE 11 END)
            + len(title) + len(lang) + len(source) + len(trck)
            + 16 AS INT) AS tag_bytes,
       CAST(LEAST(32, nb) AS INT) AS audio_bytes
FROM base ORDER BY doc_id
"""


# per-family fixture parameters: (version, layer, sample rate, samples
# per frame, 5-entry kbps cycle drawn from that family's bitrate table)
_MP3_FAMILIES = (
    ("1", 3, 44100, 1152, (64, 96, 128, 192, 256)),
    ("2", 3, 22050, 576, (16, 24, 32, 48, 64)),
    ("1", 2, 44100, 1152, (48, 56, 64, 96, 128)),
    ("2.5", 1, 11025, 384, (32, 48, 64, 96, 112)),
)


def mm_mp3_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MPEG audio stream metadata through REAL frame headers — the
    version×layer matrix: each document becomes an ID3v2-prefixed
    stream whose (version, layer, sample rate) cycle over MPEG-1 L3 /
    MPEG-2 L3 / MPEG-1 L2 / MPEG-2.5 L1 by doc_id, with per-frame VBR
    bitrates from that family's table and alternating padding bits;
    ``mp3_stream_info`` walks the sync words — every computed
    per-layer frame length must land exactly on the next header — and
    reports frame count, bitrate census, exact duration, version and
    layer.  The oracle recomputes everything from doc_id and the
    text's byte length."""
    from ..operators.multimodal import mp3_stream_info


    def build(batches):
        import pandas as pd

        from ..functions.id3 import write_mp3

        for pdf in batches:
            ids, payloads = [], []
            for did, t in zip(pdf["doc_id"], pdf["text"]):
                nb = len(t.encode("utf-8"))
                k = 1 + nb % 7
                ver, layer, sr, _spf, cycle = _MP3_FAMILIES[int(did) % 4]
                kbps = [
                    cycle[(int(did) + i) % len(cycle)] for i in range(k)
                ]
                pads = [(int(did) + i) % 2 for i in range(k)]
                ids.append(did)
                payloads.append(
                    write_mp3(
                        kbps,
                        sample_rate=sr,
                        paddings=pads,
                        id3_frames={"TIT2": str(int(did))},
                        version=ver,
                        layer=layer,
                    )
                )
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = _cached_media(spark, sf_dir, "mp3meta", build)
    out = mp3_stream_info(media)
    return out.select(
        F.col("media_id").alias("doc_id"),
        "n_frames",
        "sample_rate",
        "kbps_sum",
        "duration_us",
        "mpeg_version",
        "mpeg_layer",
    ).orderBy("doc_id")


def _mm_mp3_sql() -> str:
    def fam_case(expr: str) -> str:
        return (
            "CASE doc_id % 4 "
            + " ".join(
                f"WHEN {i} THEN {expr.format(*fam)}"
                for i, fam in enumerate(_MP3_FAMILIES)
            )
            + " END"
        )

    # expr placeholders: {0}=version {1}=layer {2}=rate {3}=spf {4}=cycle
    cyc = fam_case("list_value{4}")
    return f"""
WITH base AS (
  SELECT doc_id, 1 + (octet_length(encode(text)) % 7) AS k FROM documents
)
SELECT doc_id, CAST(k AS INT) AS n_frames,
       CAST({fam_case("{2}")} AS INT) AS sample_rate,
       CAST(list_sum(list_transform(range(0, k), i ->
            ({cyc})[CAST((doc_id + i) % 5 + 1 AS INT)])) AS BIGINT)
         AS kbps_sum,
       CAST((k * {fam_case("{3}")} * 1000000) // {fam_case("{2}")} AS BIGINT)
         AS duration_us,
       {fam_case("'{0}'")} AS mpeg_version,
       CAST({fam_case("{1}")} AS INT) AS mpeg_layer
FROM base ORDER BY doc_id
"""


_FR_BYTES, _FR_STRIDE, _FR_MAX = 16, 2, 8


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: document bytes as concatenated 16-byte
    frames, every 2nd frame (max 8) emitted with its exact byte-sum."""
    from ..operators.multimodal import sample_frames

    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
    ).repartition(spark.sparkContext.defaultParallelism, "media_id")
    out = sample_frames(media, _FR_BYTES, _FR_STRIDE, _FR_MAX)
    return out.select(
        F.col("media_id").alias("doc_id"), "frame_no", "f_sum"
    ).orderBy("doc_id", "frame_no")


def _mm_frames_sql() -> str:
    fb, stride, mx = _FR_BYTES, _FR_STRIDE, _FR_MAX
    return f"""
WITH {_CODES_CTE_SQL},
f AS (
  SELECT doc_id, cs, CAST(n_bytes // {fb} AS INT) AS nf FROM codes
), sampled AS (
  SELECT doc_id,
         unnest(list_transform(
           range(0, LEAST((nf + {stride - 1}) // {stride}, {mx})),
           j -> CAST(j * {stride} AS INT))) AS frame_no,
         cs
  FROM f WHERE nf > 0
)
SELECT doc_id, frame_no,
       CAST(list_sum(list_slice(cs, frame_no * {fb} + 1, frame_no * {fb} + {fb})) AS BIGINT) AS f_sum
FROM sampled ORDER BY doc_id, frame_no
"""


def dd_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (threshold 0.9) over a bounded id
    range — the brute-force baseline the LSH path approximates."""
    e = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 200)
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    )
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("_va"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("_vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b")).select(
        "id_a", "id_b", sim.cosine(F.col("_va"), F.col("_vb")).alias("_s")
    )
    return (
        pairs.filter(F.col("_s") >= 0.9)
        .select("id_a", "id_b", F.round("_s", 6).alias("cos"))
        .orderBy("id_a", "id_b")
    )


DD_EMB_SQL = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 200
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_dot_product(a.v, b.v) /
             (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v) /
      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.9
ORDER BY id_a, id_b
"""



def dd_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicate spans (Lee et al. 2022 substring dedup,
    distributed k-gram form): maximal token spans whose every 5-gram also
    occurs in another document."""
    d = load_table(spark, sf_dir, "documents")
    return dd.duplicate_spans(d, "doc_id", "text", k=5).orderBy(
        "doc_id", "span_start"
    )


DD_SPANS_SQL = f"""
WITH toks AS (SELECT doc_id, {TOKENS_SQL} AS t FROM documents),
grams AS (
  SELECT doc_id, i AS pos, array_to_string(list_slice(t, i, i + 4), ' ') AS g
  FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 3)) AS i)
),
dup AS (SELECT g FROM grams GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2),
hits AS (SELECT doc_id, pos FROM grams WHERE g IN (SELECT g FROM dup)),
brk AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 5
              THEN 1 ELSE 0 END AS b
  FROM hits
),
isl AS (
  SELECT doc_id, pos,
         SUM(b) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM brk
)
SELECT doc_id,
       CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(pos) - MIN(pos) + 5 AS BIGINT) AS span_len
FROM isl GROUP BY doc_id, island ORDER BY doc_id, span_start
"""



def dd_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The removal half of substring dedup: duplicated spans excised
    from every carrier, surviving tokens re-joined — returns
    (doc_id, clean_text, n_removed) for the whole corpus."""
    d = load_table(spark, sf_dir, "documents")
    return dd.remove_duplicate_spans(d, "doc_id", "text", k=5).orderBy("doc_id")


def _span_removal_ctes(src: str, tag: str = "") -> str:
    """CTE chain for duplicate-span removal over any doc relation
    ``src`` (must expose doc_id, text): final CTE ``srout{tag}`` has
    (doc_id, clean_text, n_removed) for EVERY src document."""
    t = tag
    return f"""
toks{t} AS (SELECT doc_id, {TOKENS_SQL} AS t FROM {src}),
grams{t} AS (
  SELECT doc_id, i AS pos, array_to_string(list_slice(t, i, i + 4), ' ') AS g
  FROM toks{t}, LATERAL (SELECT unnest(range(1, len(t) - 3)) AS i)
),
dupg{t} AS (SELECT g FROM grams{t} GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2),
hits{t} AS (SELECT doc_id, pos FROM grams{t} WHERE g IN (SELECT g FROM dupg{t})),
brk{t} AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 5
              THEN 1 ELSE 0 END AS b
  FROM hits{t}
),
isl{t} AS (
  SELECT doc_id, pos,
         SUM(b) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM brk{t}
),
spans{t} AS (
  SELECT doc_id, MIN(pos) AS span_start, MAX(pos) - MIN(pos) + 5 AS span_len
  FROM isl{t} GROUP BY doc_id, island
),
srpos{t} AS (
  SELECT doc_id, i, t[i] AS tok
  FROM toks{t}, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i)
),
srkeep{t} AS (
  SELECT p.doc_id, p.i, p.tok FROM srpos{t} p
  WHERE NOT EXISTS (
    SELECT 1 FROM spans{t} s
    WHERE s.doc_id = p.doc_id
      AND p.i >= s.span_start AND p.i < s.span_start + s.span_len)
),
sragg{t} AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS ct, COUNT(*) AS nk
  FROM srkeep{t} GROUP BY doc_id
),
srout{t} AS (
  SELECT t.doc_id,
         COALESCE(a.ct, '') AS clean_text,
         CAST(len(t.t) - COALESCE(a.nk, 0) AS BIGINT) AS n_removed
  FROM toks{t} t LEFT JOIN sragg{t} a ON a.doc_id = t.doc_id
)"""


DD_SPAN_REMOVAL_SQL = f"""
WITH {_span_removal_ctes("documents")}
SELECT doc_id, clean_text, n_removed FROM srout ORDER BY doc_id
"""


def dd_semantic_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup end-to-end from TEXT: deterministic hashed-BOW
    embeddings (dim 32) bridge the documents table into the embedding
    operators; clusters = lang (any partitioner works — pair cost stays
    Σ|cluster|²); threshold 0.995 sits far above the 0.93 p99 of
    unrelated-pair cosines on this corpus."""
    from ..functions.doc_embed import with_doc_embeddings

    d = load_table(spark, sf_dir, "documents")
    e = with_doc_embeddings(d, "text", dim=32)
    out = dd.semantic_dedup(
        e, 0.995, id_col="doc_id", vec_col="embedding", cluster_col="lang"
    )
    return out.select(
        "doc_id", "lang", "dup_of", F.round("cos", 6).alias("cos")
    ).orderBy("doc_id")


DD_SEMANTIC_TEXT_SQL = f"""
WITH t AS (SELECT doc_id, lang, {_TOKEN_HASHES_SQL} AS th FROM documents),
c AS (
  SELECT doc_id, lang,
         list_transform(range(0, 32),
           f -> CAST(len(list_filter(th, h -> h % 32 = f)) AS DOUBLE)) AS cnt
  FROM t
),
v AS (
  SELECT doc_id, lang,
         CASE WHEN sqrt(list_dot_product(cnt, cnt)) > 0
              THEN list_transform(cnt, x -> x / sqrt(list_dot_product(cnt, cnt)))
              ELSE list_transform(cnt, x -> 0.0) END AS v
  FROM c
),
p AS (
  SELECT b.doc_id AS doc_id, b.lang AS lang, a.doc_id AS dup_of,
         list_dot_product(a.v, b.v) /
         (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos
  FROM v a JOIN v b ON a.lang = b.lang AND a.doc_id < b.doc_id
),
h AS (SELECT * FROM p WHERE cos >= 0.995),
r AS (
  SELECT doc_id, lang, dup_of, cos,
         row_number() OVER (PARTITION BY lang, doc_id ORDER BY dup_of, cos) AS rn
  FROM h
)
SELECT doc_id, lang, dup_of, ROUND(cos, 6) AS cos FROM r WHERE rn = 1
ORDER BY doc_id
"""


_TOKHASH_SQL = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(range(1, len(token) + 1), i -> ascii(substr(token, i, 1)))), "
    "(a, b) -> (a * 31 + b) % 2147483648)"
)


def sk_cms_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min Sketch audit: estimate the top-10 tokens' frequencies
    from a 4×256-cell sketch next to their exact counts — the sketch's
    one-sided error is visible (est >= exact always), and every cell is
    re-derived by the oracle (value-checked, not tolerance-checked)."""
    from ..operators.dedup import token_hashes
    from ..operators.sketches import cms_build, cms_estimate

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(tx.tokens(F.col("text"))).alias("token"))
    occ = toks.select(
        "token", F.element_at(token_hashes(F.col("token")), 1).alias("_h")
    )
    sketch = cms_build(occ, "_h", width=256, depth=4)
    top = (
        occ.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_cnt"), F.first("_h").alias("_h"))
        .orderBy(F.col("exact_cnt").desc(), "token")
        .limit(10)
    )
    est = cms_estimate(sketch, top, "_h", width=256, depth=4)
    return est.select("token", "exact_cnt", "est").orderBy(
        F.col("exact_cnt").desc(), "token"
    )


def _sk_cms_sql() -> str:
    from ..operators.dedup import _perm_constants
    from ..operators.sketches import cms_sql, permuted_sql

    consts = _perm_constants(4, seed=97)
    probe_arms = " UNION ALL ".join(
        f"SELECT token, exact_cnt, {d} AS _d, "
        f"({permuted_sql('h', a, b)}) % 256 AS _bucket FROM tq"
        for d, (a, b) in enumerate(consts)
    )
    return f"""
WITH toksq AS (SELECT unnest({TOKENS_SQL}) AS token FROM documents),
occ AS (SELECT token, {_TOKHASH_SQL} AS h FROM toksq),
{cms_sql("occ", "h", 256, 4)},
topq AS (
  SELECT token, COUNT(*) AS exact_cnt FROM toksq GROUP BY token
  ORDER BY exact_cnt DESC, token LIMIT 10
),
tq AS (SELECT token, exact_cnt, {_TOKHASH_SQL} AS h FROM topq),
probes AS ({probe_arms})
SELECT token, exact_cnt, MIN(COALESCE(c.cnt, 0)) AS est
FROM probes p LEFT JOIN cms c USING (_d, _bucket)
GROUP BY token, exact_cnt
ORDER BY exact_cnt DESC, token
"""


def sk_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable HyperLogLog: distinct-token estimate from 64 registers
    next to the exact count — registers, ranks, and the bias-corrected
    estimate are integer/closed-form arithmetic both engines re-derive
    bit-for-bit (unlike approx_count_distinct, whose sketch is
    engine-private)."""
    from ..operators.dedup import token_hashes
    from ..operators.sketches import hll_estimate, hll_registers

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(tx.tokens(F.col("text"))).alias("token"))
    occ = toks.select(F.element_at(token_hashes(F.col("token")), 1).alias("_h"))
    est = hll_estimate(hll_registers(occ, "_h", p=6), p=6)
    exact = toks.agg(F.countDistinct("token").alias("exact_distinct"))
    return est.crossJoin(exact)


def _sk_hll_sql() -> str:
    from ..operators.sketches import hll_sql

    return f"""
WITH toksq AS (SELECT unnest({TOKENS_SQL}) AS token FROM documents),
occ AS (SELECT {_TOKHASH_SQL} AS h FROM toksq),
{hll_sql("occ", "h", p=6)}
SELECT estimate, (SELECT COUNT(DISTINCT token) FROM toksq) AS exact_distinct
FROM hll
"""


def sk_quantile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch over event values: power-of-two
    fixed-point buckets (integer bit-length ladder — no float log) →
    nearest-rank quantile estimates from the cumulative histogram.
    ~42 cells of state regardless of cardinality; additive merge.
    Accuracy vs exact quantiles is pinned in tests/test_sketches.py."""
    from ..operators.sketches import histogram_quantiles, log_histogram

    e = load_table(spark, sf_dir, "events")
    hist = log_histogram(e.select("value"), "value", scale=100)
    return histogram_quantiles(hist, [0.5, 0.9, 0.99], scale=100)


def _sk_hist_sql() -> str:
    from ..operators.sketches import histogram_quantiles_sql, log_histogram_sql

    return f"""
WITH {log_histogram_sql("events", "value", 100)}
{histogram_quantiles_sql("hist", [0.5, 0.9, 0.99], 100)}
"""


def sk_quantile_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped quantile sketch: p50/p90/p99 of event values per event
    type from per-group log-bucket histograms (groups × ~42 cells —
    the cube form; every cell and estimate re-derived by the oracle)."""
    from ..operators.sketches import histogram_quantiles_by, log_histogram_by

    e = load_table(spark, sf_dir, "events")
    hist = log_histogram_by(
        e.select("event_type", "value"), ["event_type"], "value", scale=100
    )
    return histogram_quantiles_by(
        hist, ["event_type"], [0.5, 0.9, 0.99], scale=100
    ).orderBy("event_type")


def _sk_hist_by_sql() -> str:
    from ..operators.sketches import log_histogram_by_sql

    return f"""
WITH {log_histogram_by_sql("events", ["event_type"], "value", [0.5, 0.9, 0.99], 100)}
SELECT event_type, p50, p90, p99 FROM histq ORDER BY event_type
"""


def sk_hll_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped HLL: distinct users per event_type from per-group
    register tables (groups × 64 keys of state — the cube form) next to
    the exact distincts; both engines re-derive every register."""
    from ..operators.sketches import hll_estimate_by, hll_registers_by

    e = load_table(spark, sf_dir, "events")
    items = e.select("event_type", F.col("user_id").cast("long").alias("_h"))
    est = hll_estimate_by(
        hll_registers_by(items, ["event_type"], "_h", p=6), ["event_type"], p=6
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return est.join(exact, "event_type").orderBy("event_type")


def _sk_hll_by_sql() -> str:
    from ..operators.sketches import hll_by_sql

    return f"""
WITH src AS (SELECT event_type, CAST(user_id AS BIGINT) AS h FROM events),
{hll_by_sql("src", ["event_type"], "h", p=6)}
SELECT g.event_type, g.estimate, x.exact_distinct
FROM hllg g JOIN (
  SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
  FROM events GROUP BY event_type
) x USING (event_type)
ORDER BY event_type
"""


def tx_type_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary statistics per language: distinct token types, total
    tokens, type-token ratio — one explode + one two-level aggregate."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "lang", F.explode(tx.tokens(F.col("text"))).alias("tok")
    )
    return (
        toks.groupBy("lang")
        .agg(
            F.countDistinct("tok").alias("n_types"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
        .select(
            "lang",
            "n_types",
            "n_tokens",
            F.round(F.col("n_types") / F.col("n_tokens"), 6).alias("ttr"),
        )
        .orderBy("lang")
    )


TX_TTR_SQL = f"""
WITH toks AS (SELECT lang, unnest({TOKENS_SQL}) AS tok FROM documents)
SELECT lang, COUNT(DISTINCT tok) AS n_types, COUNT(*) AS n_tokens,
       ROUND(CAST(COUNT(DISTINCT tok) AS DOUBLE) / COUNT(*), 6) AS ttr
FROM toks GROUP BY lang ORDER BY lang
"""


def tx_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit: OLS slope of ln(freq) on ln(rank) over the top
    50 corpus tokens (rank by freq desc, token asc — deterministic).
    One token aggregate + a 50-row regression via covar/var aggregates;
    a healthy natural corpus sits near -1."""
    d = load_table(spark, sf_dir, "documents")
    freqs = (
        d.select(F.explode(tx.tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col("freq").desc(), "tok")
    top = freqs.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= 50
    )
    xy = top.select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    return xy.agg(
        F.round(F.covar_pop("x", "y") / F.var_pop("x"), 6).alias("zipf_slope"),
        F.count(F.lit(1)).alias("n_points"),
    )


TX_ZIPF_SQL = f"""
WITH toks AS (SELECT unnest({TOKENS_SQL}) AS tok FROM documents),
freqs AS (SELECT tok, COUNT(*) AS freq FROM toks GROUP BY tok),
top AS (
  SELECT tok, freq, row_number() OVER (ORDER BY freq DESC, tok) AS rank
  FROM freqs QUALIFY rank <= 50
),
xy AS (SELECT ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(freq AS DOUBLE)) AS y FROM top)
SELECT ROUND(covar_pop(x, y) / var_pop(x), 6) AS zipf_slope,
       COUNT(*) AS n_points
FROM xy
"""


def tx_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-training support: the first BPE step's adjacent
    char-pair counts over the word-frequency table (the only
    corpus-wide pass; the merge loop then runs on vocab only)."""
    from ..functions.bpe import pair_counts, with_symbols, word_frequencies

    d = load_table(spark, sf_dir, "documents")
    table = with_symbols(word_frequencies(d, "text"))
    return (
        pair_counts(table)
        .orderBy(F.col("cnt").desc(), "a", "b")
        .limit(15)
    )


TX_BPE_SQL = f"""
WITH words AS (SELECT unnest({TOKENS_SQL}) AS word FROM documents),
wf AS (SELECT word, COUNT(*) AS freq FROM words GROUP BY word),
pairs AS (
  SELECT substr(word, i, 1) AS a, substr(word, i + 1, 1) AS b,
         SUM(freq) AS cnt
  FROM wf, LATERAL (SELECT unnest(range(1, len(word))) AS i)
  GROUP BY 1, 2
)
SELECT a, b, cnt FROM pairs ORDER BY cnt DESC, a, b LIMIT 15
"""


def sp_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (α=0.5) language mixing: rebalance the corpus
    toward low-resource languages, √-mass allocation, portable
    hash-threshold admission — the mT5/XLM-R mixing rule."""
    from ..operators.sampling import temperature_sample

    d = load_table(spark, sf_dir, "documents")
    kept = temperature_sample(d, "lang", "doc_id", target_fraction_denom=2)
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("doc_id").alias("sum_ids"),
        )
        .orderBy("lang")
    )


def _sp_temp_sql() -> str:
    from ..operators.sampling import temperature_sample_sql

    return f"""
SELECT lang, COUNT(*) AS n_kept, CAST(SUM(doc_id) AS BIGINT) AS sum_ids
FROM ({temperature_sample_sql("lang", "doc_id", 2)})
GROUP BY lang ORDER BY lang
"""



def sp_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a (potentially hot-keyed) group:
    per event_type sum/count via (key, salt) partials then a merge — the
    result is salt-invariant, so the oracle is the plain GROUP BY."""
    from ..operators.skew import salted_sum

    e = load_table(spark, sf_dir, "events")
    out = salted_sum(e, ["event_type"], ["value"], salt_buckets=16)
    return out.select(
        "event_type",
        F.round("sum_value", 4).alias("sum_value"),
        F.col("n"),
    ).orderBy("event_type")


SP_SALTED_SQL = """
SELECT event_type, ROUND(SUM(value), 4) AS sum_value, COUNT(*) AS n
FROM events GROUP BY event_type ORDER BY event_type
"""



def tx_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality-quantile gate: drop each language's
    bottom-quartile documents by quality score — thresholds derived from
    the data (two-phase: exact nearest-rank quantile per group, broadcast
    filter back; corpus never globally sorts)."""
    from ..operators.stats import quantile_gate

    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "lang", tx.quality_score(F.col("text")).alias("q")
    )
    kept = quantile_gate(scored, "lang", "q", (1, 4), "doc_id")
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.round(F.sum("q"), 4).alias("sum_q"),
            F.sum("doc_id").alias("sum_ids"),
        )
        .orderBy("lang")
    )


TX_QGATE_SQL = f"""
WITH d AS (
  SELECT doc_id, lang,
         LENGTH(text) AS n,
         LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
         LENGTH(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS punct,
         len({TOKENS_SQL}) AS ntok
  FROM documents
), q AS (
  SELECT doc_id, lang,
         (CASE WHEN n > 0 THEN alpha * 1.0 / n ELSE 0.0 END) * 0.5
         + (1 - LEAST((CASE WHEN n > 0 THEN punct * 1.0 / n ELSE 0.0 END) * 5, 1.0)) * 0.25
         + (CASE WHEN ntok >= 5 AND ntok <= 5000 THEN 1.0 ELSE 0.5 END) * 0.25 AS q
  FROM d
), ranked AS (
  SELECT lang, q AS _v,
         row_number() OVER (PARTITION BY lang ORDER BY q, doc_id) AS _rn,
         COUNT(*) OVER (PARTITION BY lang) AS _n
  FROM q
), thr AS (
  SELECT lang, MAX(CASE WHEN _rn = (1 * _n + 4 - 1) // 4 THEN _v END) AS t
  FROM ranked GROUP BY lang
)
SELECT q.lang, COUNT(*) AS n_kept, ROUND(SUM(q.q), 4) AS sum_q,
       CAST(SUM(q.doc_id) AS BIGINT) AS sum_ids
FROM q JOIN thr ON q.lang = thr.lang
WHERE q.q >= thr.t
GROUP BY q.lang ORDER BY q.lang
"""


def _cluster_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-per-label-centroid assignment (k-means E-step), shared by
    ``sim_centroid_assign`` and ``dd_semantic``: centroids = rounded label
    means, distance = rounded L2², deterministic argmin (d2, then clabel).

    Round 4: the k·dim centroid table (5×64 doubles — metadata, the same
    driver carve-out as ``train_centroids_kmeans``) is collected and
    inlined as literals, so the assignment is a NARROW argmin fold over
    the corpus — the previous crossJoin(broadcast) + per-vector
    row_number window shuffled N·k rows through a corpus-sized exchange.
    The rounded-to-6 centroid values are bit-identical either way, so the
    DuckDB oracle (which re-derives them in SQL) still matches exactly.
    Shuffle census: one k·dim-key exchange for the centroid aggregate;
    the assignment itself shuffles nothing.  Returns
    (vec_id, label, v, clabel)."""
    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    cents = (
        e.select("label", F.posexplode("v").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(F.round(F.avg("x"), 6).alias("c"))
    )
    by_label: dict = {}
    for r in cents.collect():
        by_label.setdefault(r["label"], {})[r["dim"]] = r["c"]
    centroids = [
        (lbl, [m[d] for d in sorted(m)]) for lbl, m in sorted(by_label.items())
    ]

    def _d2(cvec: list[float]):
        return F.round(
            F.aggregate(
                F.zip_with(
                    "v",
                    F.array(*[F.lit(float(x)) for x in cvec]),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        )

    # stage every d2 as a named column FIRST (bind-once discipline): the
    # zip_with/aggregate HOFs are interpreted, so folding raw d2
    # expressions through a when-chain would re-evaluate earlier
    # distances exponentially (measured 17s vs 1.5s at sf0.1)
    staged = e.select(
        "vec_id",
        "label",
        "v",
        *[_d2(cvec).alias(f"_d{i}") for i, (_, cvec) in enumerate(centroids)],
    )
    best_c = None
    best_d = None
    # ascending clabel + strict < keeps the LOWEST label on d2 ties —
    # the same (d2, clabel) ordering the window form used
    for i, (lbl, _) in enumerate(centroids):
        d = F.col(f"_d{i}")
        if best_c is None:
            best_c, best_d = F.lit(lbl), d
        else:
            better = d < best_d
            best_c = F.when(better, F.lit(lbl)).otherwise(best_c)
            best_d = F.when(better, d).otherwise(best_d)
    return staged.select("vec_id", "label", "v", best_c.alias("clabel"))


def sim_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means E-step as a declared query: assign every embedding to its
    nearest per-label centroid and report the label-vs-assigned confusion
    counts (see ``_cluster_assign`` for the plan shape)."""
    asg = _cluster_assign(spark, sf_dir)
    return (
        asg.groupBy(F.col("label"), F.col("clabel").alias("assigned"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("label", "assigned")
    )


def dd_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) as a declared query: cluster by
    nearest label-centroid, then drop any vector dominated by an
    earlier-id cluster-mate with cosine >= τ.  The pair join is an
    equi-join on the cluster id — candidates bounded per cluster, never
    N² (``operators/dedup.py::semantic_dedup``).

    τ=0.35 is a *demonstration* threshold: the synthetic embeddings carry
    no planted near-dups (max pairwise cos ≈ 0.5), so production-realistic
    τ≈0.95 would return the empty set and verify nothing.  0.35 sits at
    the ~99.5th percentile of the pair distribution — a small, non-trivial
    removed set whose every row the oracle re-derives."""
    asg = _cluster_assign(spark, sf_dir).select(
        "vec_id", "v", F.col("clabel").alias("cluster")
    )
    removed = dd.semantic_dedup(asg, threshold=0.35)
    return removed.select(
        "vec_id",
        "cluster",
        "dup_of",
        F.round("cos", 6).alias("cos"),
    ).orderBy("vec_id")


DD_SEMANTIC_SQL = """
WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
), ex AS (
  SELECT label, unnest(embedding::DOUBLE[]) AS x,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
), cents AS (
  SELECT label AS clabel, i, ROUND(AVG(x), 6) AS c
  FROM ex GROUP BY 1, 2
), carr AS (
  SELECT clabel, list(c ORDER BY i) AS cv FROM cents GROUP BY clabel
), scored AS (
  SELECT e.vec_id, e.v, carr.clabel,
         ROUND(list_reduce(list_prepend(
             0.0,
             list_transform(range(1, 65),
                            i -> (v[i] - cv[i]) * (v[i] - cv[i]))),
           (a, b) -> a + b), 6) AS d2
  FROM e CROSS JOIN carr
), asg AS (
  SELECT vec_id, v, clabel,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, clabel) AS rn
  FROM scored
), cl AS (
  SELECT vec_id, v, clabel AS cluster FROM asg WHERE rn = 1
), hits AS (
  SELECT * FROM (
    SELECT b.vec_id, b.cluster, a.vec_id AS ida,
           list_dot_product(a.v, b.v) /
           (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS s
    FROM cl a JOIN cl b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  ) WHERE s >= 0.35
), best AS (
  SELECT vec_id, cluster, ida, s,
         row_number() OVER (PARTITION BY vec_id ORDER BY ida, s) AS rn2
  FROM hits
)
SELECT vec_id, cluster, ida AS dup_of, ROUND(s, 6) AS cos
FROM best WHERE rn2 = 1 ORDER BY vec_id
"""


def sim_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction 64→16 as a declared
    query: deterministic ±1 projection (``similarity.random_project``),
    reporting the first four reduced components and the input/output norms
    per vector — the norm columns audit the JL contraction the projection
    promises, the component columns pin the exact arithmetic."""
    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    proj = e.select(
        "vec_id", "v", sim.random_project(F.col("v"), 64, 16).alias("_r")
    )
    return proj.select(
        "vec_id",
        *[
            F.round(F.element_at("_r", j + 1), 6).alias(f"r{j}")
            for j in range(4)
        ],
        F.round(sim.norm(F.col("v")), 6).alias("norm_in"),
        F.round(sim.norm(F.col("_r")), 6).alias("norm_out"),
    ).orderBy("vec_id")


def tx_top_quality_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k: the 3 highest-quality documents per language.
    Spark 4 plans the rank-filter as WindowGroupLimit — each partition
    keeps only k rows per group BEFORE the window sort's shuffle, so the
    exchange carries k·#groups·#partitions rows, not the corpus
    (plan-asserted)."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "lang",
        "doc_id",
        F.round(tx.quality_score(F.col("text")), 6).alias("q"),
    )
    from pyspark.sql.window import Window as W

    rn = F.row_number().over(
        W.partitionBy("lang").orderBy(F.col("q").desc(), "doc_id")
    )
    return (
        scored.withColumn("rank", rn)
        .filter(F.col("rank") <= 3)
        .orderBy("lang", "rank")
    )


def _top_quality_sql() -> str:
    q = _quality_expr_sql("text")
    return f"""
WITH scored AS (
  SELECT lang, doc_id, ROUND({q}, 6) AS q FROM documents
), ranked AS (
  SELECT lang, doc_id, q,
         CAST(row_number() OVER (PARTITION BY lang ORDER BY q DESC, doc_id) AS INT) AS rank
  FROM scored
)
SELECT lang, doc_id, q, rank FROM ranked WHERE rank <= 3
ORDER BY lang, rank
"""


_TB_BUDGETS = {"en": 3000, "de": 1500, "fr": 800}


def sp_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mix selection: per language, keep the seeded-hash
    prefix of documents whose running token total fits the language's
    budget (``operators/sampling.py::select_to_token_budget`` — how a
    pretraining mix is carved when sources are allotted tokens, not
    document counts).  Languages without a budget drop entirely."""
    from ..operators.sampling import select_to_token_budget

    d = load_table(spark, sf_dir, "documents")
    out = select_to_token_budget(d, "lang", _TB_BUDGETS, seed=31)
    return out.select(
        "doc_id", "lang", "n_tokens", "cum_tokens"
    ).orderBy("lang", "doc_id")


def _sp_token_budget_sql(seed: int = 31) -> str:
    from ..operators.split import shuffle_hash_sql

    h = shuffle_hash_sql("doc_id", seed)
    budget = "CASE " + " ".join(
        f"WHEN lang = '{g}' THEN {b}" for g, b in _TB_BUDGETS.items()
    ) + " ELSE 0 END"
    return f"""
WITH t AS (
  SELECT doc_id, lang, CAST(len({TOKENS_SQL}) AS INT) AS n_tokens,
         {h} AS _h
  FROM documents
), c AS (
  SELECT doc_id, lang, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY _h, doc_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM t
)
SELECT doc_id, lang, n_tokens, cum_tokens FROM c
WHERE cum_tokens <= {budget}
ORDER BY lang, doc_id
"""


def sp_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (A-ES): 200 documents drawn
    with probability ∝ length — the fixed-k weight-proportional variant
    completing the sampling tier (`operators/sampling.py:weighted_sample`)."""
    from ..operators.sampling import weighted_sample

    d = load_table(spark, sf_dir, "documents")
    s = weighted_sample(d, "n_chars", 200, "doc_id")
    return s.select(
        "doc_id", "lang", "n_chars", F.round("_wkey", 6).alias("wkey")
    ).orderBy(F.col("wkey").desc(), "doc_id")


def _sp_weighted_sql() -> str:
    from ..operators.sampling import weighted_sample_sql

    inner = weighted_sample_sql("documents", "n_chars", 200, "doc_id")
    return (
        f"SELECT doc_id, lang, n_chars, ROUND(_wkey, 6) AS wkey "
        f"FROM ({inner}) ORDER BY wkey DESC, doc_id"
    )


def sim_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization — the 4× storage /
    bandwidth cut for the 100 TB embedding tier (codes travel as int8;
    one float scale per vector reconstructs).  Pure column algebra: the
    scale is materialized behind a projection boundary first (bind-once
    HOF discipline), then codes and reconstruction-MSE are narrow
    expressions; zero shuffle before the presentation orderBy.  The query
    audits the quantizer: per-vector scale, code checksum, and MSE —
    every value re-derived exactly by the oracle."""
    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    sc = e.select(
        "vec_id",
        "v",
        (
            F.greatest(
                F.array_max(F.transform("v", lambda x: F.abs(x))), F.lit(1e-12)
            )
            / F.lit(127.0)
        ).alias("_sc"),
    )
    q = sc.select(
        "vec_id",
        "v",
        "_sc",
        F.transform(
            "v",
            lambda x: F.least(
                F.lit(127),
                F.greatest(F.lit(-127), F.round(x / F.col("_sc")).cast("int")),
            ),
        ).alias("_q"),
    )
    mse = (
        F.aggregate(
            F.zip_with(
                "v",
                "_q",
                lambda x, c: (x - c * F.col("_sc")) * (x - c * F.col("_sc")),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        / F.size("v")
    )
    return q.select(
        "vec_id",
        F.round("_sc", 8).alias("scale"),
        F.aggregate("_q", F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "code_sum"
        ),
        F.round(mse, 10).alias("mse"),
    ).orderBy("vec_id")


SIM_QUANT_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sc AS (
  SELECT vec_id, v,
         greatest(list_max(list_transform(v, x -> abs(x))), 1e-12) / 127.0 AS s
  FROM e
), q AS (
  SELECT vec_id, v, s,
         list_transform(v, x -> least(127, greatest(-127, CAST(round(x / s) AS INT)))) AS c
  FROM sc
)
SELECT vec_id,
       ROUND(s, 8) AS scale,
       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), c), (a, x) -> a + x) AS BIGINT) AS code_sum,
       ROUND(list_reduce(list_prepend(0.0,
               list_transform(range(1, len(v) + 1), i -> (v[i] - c[i] * s) * (v[i] - c[i] * s))),
             (a, x) -> a + x) / len(v), 10) AS mse
FROM q ORDER BY vec_id
"""


_BM25_TERMS = ("vector", "hash", "stream")


def tx_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical retrieval: BM25 top-10 for a fixed query term set
    (`operators/retrieval.py` — query-term counting inside each doc's own
    token array: narrow map, zero shuffle; corpus stats are ONE broadcast
    aggregate row; ranking is TakeOrderedAndProject)."""
    from ..operators.retrieval import bm25_scores

    d = load_table(spark, sf_dir, "documents")
    s = bm25_scores(d, list(_BM25_TERMS))
    return (
        s.select("doc_id", F.round("score", 4).alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(10)
    )


def _bm25_sql(
    terms: tuple = _BM25_TERMS, k1: float = 1.2, b: float = 0.75
) -> str:
    idx = range(len(terms))
    tfs = ", ".join(
        f"len(list_filter(t, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(terms)
    )
    dfs = ", ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}" for i in idx
    )
    parts = " + ".join(
        f"ln((n - df{i} + 0.5) / (df{i} + 0.5) + 1.0) * "
        f"(tf{i} * {k1 + 1.0!r} / (tf{i} + {k1!r} * ({1.0 - b!r} + {b!r} * dl / avgdl)))"
        for i in idx
    )
    return f"""
WITH d AS (SELECT doc_id, {TOKENS_SQL} AS t FROM documents),
f AS (SELECT doc_id, len(t) AS dl, {tfs} FROM d),
s AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl, {dfs} FROM f)
SELECT doc_id, ROUND({parts}, 4) AS score
FROM f CROSS JOIN s
ORDER BY score DESC, doc_id LIMIT 10
"""


def tx_bm25_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 via the prebuilt inverted index
    (``operators/retrieval.py::build_bm25_index`` +
    ``bm25_scores_indexed``): query terms broadcast-equi-join the
    denormalized posting table (partition-prunable on token at scale);
    per-doc scores are identical to ``tx_bm25_search``'s no-explode path
    on every matching doc (pinned in tests/test_retrieval_index.py), so
    the two declared queries cross-check each other through the same
    oracle arithmetic."""
    from ..operators.retrieval import bm25_scores_indexed, build_bm25_index

    d = load_table(spark, sf_dir, "documents")
    postings, stats = build_bm25_index(d)
    s = bm25_scores_indexed(postings, stats, list(_BM25_TERMS))
    return (
        s.select("doc_id", F.round("score", 4).alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(10)
    )


def _bm25_indexed_sql(
    terms: tuple = _BM25_TERMS, k1: float = 1.2, b: float = 0.75
) -> str:
    """Oracle for the index path: the same BM25 arithmetic restricted to
    docs matching >= 1 query term (the index path never surfaces
    zero-score docs)."""
    idx = range(len(terms))
    tfs = ", ".join(
        f"len(list_filter(t, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(terms)
    )
    dfs = ", ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}" for i in idx
    )
    parts = " + ".join(
        f"ln((n - df{i} + 0.5) / (df{i} + 0.5) + 1.0) * "
        f"(tf{i} * {k1 + 1.0!r} / (tf{i} + {k1!r} * ({1.0 - b!r} + {b!r} * dl / avgdl)))"
        for i in idx
    )
    matched = " + ".join(f"tf{i}" for i in idx)
    return f"""
WITH d AS (SELECT doc_id, {TOKENS_SQL} AS t FROM documents),
f AS (SELECT doc_id, len(t) AS dl, {tfs} FROM d),
s AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl, {dfs} FROM f)
SELECT doc_id, ROUND({parts}, 4) AS score
FROM f CROSS JOIN s
WHERE {matched} > 0
ORDER BY score DESC, doc_id LIMIT 10
"""


def tx_bm25_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving twin of ``tx_bm25_indexed`` (VERDICT r5 task 6): the
    identical query answered from the PERSISTED token-bucketed index
    (``write_bm25_index`` + ``bm25_scores_persisted``).  The tokenize +
    posting build runs once per testdata fingerprint (offline at
    scale); what this query times is the serving path — static
    ``_tb IN (...)`` partition pruning to the query terms' buckets,
    then the broadcast equi-join scoring.  Scores are identical to the
    in-query index build, so the oracle is shared."""
    from ..operators.retrieval import bm25_scores_persisted, write_bm25_index

    path = _index_cache_path(sf_dir, "documents.parquet", "bm25")

    def _build():
        write_bm25_index(load_table(spark, sf_dir, "documents"), path)

    _cached_index(path, _build)
    s = bm25_scores_persisted(spark, path, list(_BM25_TERMS))
    return (
        s.select("doc_id", F.round("score", 4).alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(10)
    )


# fixed BPE merge table (ranked, applied in order) — a production
# tokenizer ships a frozen vocab; applying it is the scale operation
# (training is tx_bpe_pairs).  Common English digraph/trigraph merges.
_BPE_MERGES = (
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("e", "r"),
    ("o", "n"), ("r", "e"), ("in", "g"), ("a", "t"), ("e", "n"),
    ("o", "r"), ("an", "d"), ("t", "o"), ("o", "f"), ("e", "s"),
    ("s", "t"),
)


def tx_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION: encode every token with a frozen, ranked
    BPE merge table and count the resulting subword units (top 30).

    Pure string algebra, zero Python: each token becomes a
    ``|``-delimited symbol string (``that`` → ``|t||h||a||t|``) and
    each ranked merge is one literal ``replace`` (``|t||h|`` →
    ``|th|``) — the delimiters make symbol boundaries unambiguous, so
    ``replace`` IS the left-to-right all-occurrences merge of the
    Sennrich algorithm.  16 chained replaces stay inside whole-stage
    codegen; the only shuffle is the final count.  The oracle applies
    the identical replace chain in DuckDB."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(tx.tokens(F.col("text"))).alias("tok"))
    s = F.concat(
        F.lit("|"), F.concat_ws("||", F.split(F.col("tok"), "")), F.lit("|")
    )
    for x, y in _BPE_MERGES:
        s = F.replace(s, F.lit(f"|{x}||{y}|"), F.lit(f"|{x}{y}|"))
    sub = F.explode(
        F.split(F.expr(f"trim(BOTH '|' FROM {'_enc'})"), r"\|\|")
    ).alias("subword")
    return (
        toks.select(s.alias("_enc"))
        .select(sub)
        .groupBy("subword")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "subword")
        .limit(30)
    )


def _bpe_encode_sql() -> str:
    chars = (
        "'|' || array_to_string(list_transform(range(1, len(tok) + 1), "
        "i -> substr(tok, i, 1)), '||') || '|'"
    )
    expr = chars
    for x, y in _BPE_MERGES:
        expr = f"replace({expr}, '|{x}||{y}|', '|{x}{y}|')"
    return f"""
WITH toks AS (
  SELECT unnest({TOKENS_SQL}) AS tok FROM documents
),
enc AS (SELECT {expr} AS e FROM toks),
subs AS (SELECT unnest(string_split(trim(e, '|'), '||')) AS subword FROM enc)
SELECT subword, COUNT(*) AS n FROM subs
GROUP BY subword ORDER BY n DESC, subword LIMIT 30
"""


def _subword_count(tok):
    """Column expr: number of frozen-vocab BPE subwords in one token —
    the tx_bpe_encode replace chain, then counted as ``size(split(s,
    '||'))`` (symbol boundaries are exactly the double delimiters; no
    trim needed: the outer single pipes never form a segment)."""
    s = F.concat(F.lit("|"), F.concat_ws("||", F.split(tok, "")), F.lit("|"))
    for x, y in _BPE_MERGES:
        s = F.replace(s, F.lit(f"|{x}||{y}|"), F.lit(f"|{x}{y}|"))
    return F.size(F.split(s, r"\|\|"))


def tx_tokenize_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end TRAINING-FEED bridge: tokenize every document
    with the frozen BPE vocab (``tx_bpe_encode``'s replace chain),
    count SUBWORD units — the number a token budget actually meters,
    not whitespace words — then greedily pack documents into
    128-subword sequences per source shard and report per-bin fill.
    Tokenization is pure string algebra fused into the scan; packing is
    the sequential-per-shard applyInPandas recurrence; the oracle
    replays subword counting AND the packing recurrence (recursive
    CTE) end-to-end."""
    from ..operators.packing import pack_greedy

    d = load_table(spark, sf_dir, "documents")
    toks = tx.tokens(F.col("text"))
    # per-token subword count via the replace chain, summed per doc
    per_tok = F.transform(toks, _subword_count)
    n_sub = F.aggregate(
        per_tok, F.lit(0), lambda acc, x: acc + x
    ).alias("n_sub")
    t = d.select("source", "doc_id", n_sub)
    packed = pack_greedy(t, "source", "doc_id", "n_sub", _PACK_CAP)
    return (
        packed.groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_sub").alias("fill_subwords"),
            F.sum("doc_id").alias("sum_ids"),
        )
        .orderBy("source", "bin_id")
    )


def _tokenize_pack_sql() -> str:
    from ..operators.packing import pack_recurrence_sql

    chars = (
        "'|' || array_to_string(list_transform(range(1, len(tok) + 1), "
        "i -> substr(tok, i, 1)), '||') || '|'"
    )
    expr = chars
    for x, y in _BPE_MERGES:
        expr = f"replace({expr}, '|{x}||{y}|', '|{x}{y}|')"
    inner = (
        "SELECT source, doc_id, COALESCE(list_sum(list_transform("
        f"{TOKENS_SQL}, tok -> len(string_split(trim({expr}, '|'), '||'))"
        ")), 0) AS n_sub FROM documents"
    )
    body = pack_recurrence_sql(inner, "source", "doc_id", "n_sub", _PACK_CAP)
    return f"""
SELECT source, bin_id, COUNT(*) AS n_docs,
       CAST(SUM(n_sub) AS BIGINT) AS fill_subwords,
       CAST(SUM(doc_id) AS BIGINT) AS sum_ids
FROM ({body})
GROUP BY source, bin_id
ORDER BY source, bin_id
"""


def _rand_proj_sql(in_dim: int = 64, out_dim: int = 16, seed: int = 23) -> str:
    rows = sim._hyperplanes(in_dim, out_dim, seed)
    scale = out_dim ** -0.5  # exact binary double for power-of-4 out_dim
    comps = ",\n           ".join(
        f"list_dot_product(v, {row!r}::DOUBLE[]) * {scale!r}" for row in rows
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
p AS (SELECT vec_id, v, list_value({comps}) AS r FROM e)
SELECT vec_id,
       ROUND(r[1], 6) AS r0, ROUND(r[2], 6) AS r1,
       ROUND(r[3], 6) AS r2, ROUND(r[4], 6) AS r3,
       ROUND(sqrt(list_dot_product(v, v)), 6) AS norm_in,
       ROUND(sqrt(list_dot_product(r, r)), 6) AS norm_out
FROM p ORDER BY vec_id
"""


SIM_ASSIGN_SQL = """
WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
), ex AS (
  SELECT label, unnest(embedding::DOUBLE[]) AS x,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
), cents AS (
  SELECT label AS clabel, i, ROUND(AVG(x), 6) AS c
  FROM ex GROUP BY 1, 2
), carr AS (
  SELECT clabel, list(c ORDER BY i) AS cv FROM cents GROUP BY clabel
), scored AS (
  SELECT e.vec_id, e.label, carr.clabel,
         ROUND(list_reduce(list_prepend(
             0.0,
             list_transform(range(1, 65),
                            i -> (v[i] - cv[i]) * (v[i] - cv[i]))),
           (a, b) -> a + b), 6) AS d2
  FROM e CROSS JOIN carr
), asg AS (
  SELECT vec_id, label, clabel,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, clabel) AS rn
  FROM scored
)
SELECT label, clabel AS assigned, COUNT(*) AS n
FROM asg WHERE rn = 1
GROUP BY label, clabel ORDER BY label, assigned
"""


# --- MP4 / ISO-BMFF container -------------------------------------------------

_MP4_FR = 16  # bytes per fixture raw video sample
_MP4_TICKS = 40  # stts delta between samples (25 fps at 1 ms scale)


def _mp4_raw_build(batches):
    """Fixture for ``mm_mp4_demux``: document bytes become complete
    ``_MP4_FR``-byte raw video samples muxed into a genuine MP4
    (ftyp + mdat + moov with full stsd/stts/stsc/stsz/stco/stss
    tables, 'raw ' sample entry, chunks of 4, every 4th sample sync)."""
    import pandas as pd

    from ..functions.mp4 import Mp4Track, write_mp4

    tracks = [Mp4Track(1, "video", "raw", timescale=1000, width=4, height=4)]
    for pdf in batches:
        payloads = []
        for t in pdf["text"]:
            raw = t.encode("utf-8")
            n = len(raw) // _MP4_FR
            samples = [
                (
                    1,
                    i * _MP4_TICKS,
                    i % 4 == 0,
                    raw[i * _MP4_FR : (i + 1) * _MP4_FR],
                )
                for i in range(n)
            ]
            payloads.append(
                write_mp4(samples, tracks, chunk_every=4)
                if samples
                else None
            )
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def mm_mp4_demux(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MP4/ISO-BMFF demux (§2.11): document bytes become raw
    video samples muxed into a genuine MP4 (``functions/mp4.py`` —
    box tree, sample tables, sync table), then ``demux_mp4_samples``
    resolves every sample back through the stsc/stsz/stco chunk
    arithmetic with stts timestamps and stss keyframe flags.  The
    oracle re-derives sample count, timestamps, keyframe cadence and
    exact byte sums from the raw octets — any drift in box framing,
    chunk mapping or table encoding breaks the value hash.  The MP4
    twin of ``mm_mkv_demux``."""
    from ..operators.multimodal import demux_mp4_samples

    media = _cached_media(spark, sf_dir, "mp4raw", _mp4_raw_build)
    out = demux_mp4_samples(media)
    return out.select(
        F.col("media_id").alias("doc_id"),
        "track",
        "kind",
        "codec",
        "ts",
        "keyframe",
        "n_bytes",
        "byte_sum",
    ).orderBy("doc_id", "ts")


def _mm_mp4_sql() -> str:
    fr, tk = _MP4_FR, _MP4_TICKS
    return f"""
WITH {_CODES_CTE_SQL},
frames AS (
  SELECT doc_id, CAST(f AS INT) AS fno,
         CAST(list_sum(list_transform(range(0, {fr}), k ->
              CAST(cs[CAST(f * {fr} + k + 1 AS INT)] AS BIGINT))) AS BIGINT)
           AS byte_sum
  FROM codes, unnest(range(0, n_bytes // {fr})) AS t(f)
)
SELECT doc_id, CAST(1 AS INT) AS track, 'video' AS kind,
       'raw' AS codec,
       CAST(fno * {tk} AS BIGINT) AS ts,
       (fno % 4 = 0) AS keyframe,
       CAST({fr} AS INT) AS n_bytes, byte_sum
FROM frames ORDER BY doc_id, ts
"""


def _mp3_mp4_build(batches):
    """Fixture for ``mm_mp4_mp3_rms``: the SAME variable-length mono
    Layer III stream as ``_mp3_mkv_build`` (F = 1 + n_bytes mod 3
    frames, byte→bitstream mapping unchanged — the oracle is shared),
    muxed per the MP3-in-MP4 registration: one MPEG frame per sample
    in an ``mp4a`` track whose esds declares objectTypeIndication
    0x6B, timescale 44100, stts delta 1152 (the per-frame sample
    count), chunks of 2."""
    import numpy as np
    import pandas as pd

    from ..functions.mp3 import _FRAME_LEN, write_mp3_l3
    from ..functions.mp4 import Mp4Track, write_mp4

    tracks = [
        Mp4Track(
            1, "audio", "mp3",
            timescale=44100, sample_rate=44100, channels=1,
        )
    ]
    for pdf in batches:
        payloads = []
        for t in pdf["text"]:
            raw = t.encode("utf-8")
            nb = len(raw)
            if nb == 0:
                payloads.append(None)
                continue
            b = np.frombuffer(raw, np.uint8).astype(np.int64)
            nf = 1 + nb % 3
            q = np.empty((nf, 2, 576), np.int64)
            sfs = np.empty((nf, 2, 21), np.int64)
            for f in range(nf):
                for g in range(2):
                    gc = f * 2 + g
                    v = b[(576 * gc + np.arange(576)) % nb] % 3
                    q[f, g] = np.where(v == 0, 0, np.where(v == 1, 1, -1))
                    sfs[f, g] = b[(21 * gc + np.arange(21)) % nb] % 8
            stream = write_mp3_l3(q, sfs, global_gain=_MP3_GG)
            samples = [
                (
                    1,
                    f * 1152,
                    True,
                    stream[f * _FRAME_LEN : (f + 1) * _FRAME_LEN],
                )
                for f in range(nf)
            ]
            payloads.append(write_mp4(samples, tracks, chunk_every=2))
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def mm_mp4_mp3_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END MP3-in-MP4 decode: the ``mm_mkv_mp3_rms`` fixture
    stream re-muxed per the MP3-in-MP4 registration (``mp4a`` sample
    entry + esds objectTypeIndication 0x6B), demuxed back through the
    sample tables, reassembled in stts order and SAMPLE-decoded with
    cross-frame reconstruction state — one dropped or reordered
    sample changes every later PCM value and breaks the value hash.
    The oracle is the SAME generated fixed-point pipeline as the MKV
    twin (container-independent by construction: it replays from the
    pre-encode octets)."""
    from ..operators.multimodal import demux_mp4_decode_mp3_stats

    media = _cached_media(spark, sf_dir, "mp4mp3", _mp3_mp4_build)
    stats = demux_mp4_decode_mp3_stats(media)
    return stats.select(
        F.col("media_id").alias("doc_id"),
        "n_blocks",
        "sample_rate",
        "n_samples",
        "sum_sq",
        "fp",
        F.round(
            F.sqrt(F.col("sum_sq") / F.col("n_samples")), 6
        ).alias("rms"),
    ).orderBy("doc_id")


# --- lossless JPEG (SOF3) -------------------------------------------------------


def mm_jpeg_lossless_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOSSLESS JPEG decode (T.81 Annex H — the DNG/DICOM archive
    process, r10): document bytes become an 8×8 grayscale SOF3 stream
    whose PREDICTOR cycles 1..7 per document (all seven Annex-H
    prediction forms on the oracle-checked path), decoded through the
    magic-dispatched image pool.  Lossless, so the oracle is the SAME
    raw-octet pool as the BMP/PNG/GIF/TIFF twins — any drift in the
    prediction arithmetic, category coding or the mod-2^16 wrap
    breaks the value hash."""
    from ..operators.multimodal import decode_image_pool

    def build(batches):
        import numpy as np
        import pandas as pd

        from ..functions.codecs import write_jpeg_lossless

        n = _BMP_W * _BMP_H
        for pdf in batches:
            payloads = []
            for did, t in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                buf = t.encode("utf-8")[:n].ljust(n, b"\0")
                gray = np.frombuffer(buf, dtype=np.uint8).reshape(
                    _BMP_H, _BMP_W
                )
                payloads.append(
                    write_jpeg_lossless(gray, predictor=1 + did % 7)
                )
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = _cached_media(spark, sf_dir, "jpegll", build)
    pooled = decode_image_pool(media, _BMP_F)
    k = (_BMP_W // _BMP_F) * (_BMP_H // _BMP_F)
    sel = [
        F.round(F.element_at("pooled", i + 1), 6).alias(f"p{i}")
        for i in range(k)
    ]
    return pooled.select(
        F.col("media_id").alias("doc_id"), "width", "height", *sel
    ).orderBy("doc_id")


# --- ZIP archives ---------------------------------------------------------------

_ZIP_SLICE = 120  # chars of text per zip member


def _zip_build(batches):
    """Fixture for ``tx_zip_extract``: each document becomes one ZIP
    archive of its ``_ZIP_SLICE``-char text slices
    (``{doc_id:06d}/p{i:03d}.txt``), STORE for even doc_ids and
    DEFLATE for odd — so directory walking, both methods, CRC checks
    and offset re-derivation are all on the oracle-checked path."""
    import pandas as pd

    from ..functions.zipf import write_zip

    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            did = int(did)
            entries = [
                (
                    f"{did:06d}/p{i // _ZIP_SLICE:03d}.txt",
                    t[i : i + _ZIP_SLICE].encode("utf-8"),
                )
                for i in range(0, len(t), _ZIP_SLICE)
            ]
            payloads.append(
                write_zip(
                    entries, "store" if did % 2 == 0 else "deflate"
                )
                if entries
                else None
            )
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def tx_zip_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZIP dataset-dump ingestion (§2.11): archives unpacked via the
    central directory (``extract_zip_texts``), one row per member,
    CRC-verified.  The oracle re-derives member names (printf key
    arithmetic), methods (store/deflate by doc parity) and slice text
    from `documents` — any drift in directory parsing, local-header
    offset re-derivation or inflate breaks the value hash."""
    from ..operators.multimodal import extract_zip_texts

    media = _cached_media(spark, sf_dir, "zip", _zip_build)
    rows = extract_zip_texts(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "name",
        "method",
        F.length("txt").alias("n_chars"),
        tx.char_poly_hash(F.col("txt")).alias("txt_hash"),
    ).orderBy("doc_id", "name")


def _tx_zip_sql() -> str:
    w = _ZIP_SLICE
    ch = _char_hash_sql("t")
    return f"""
WITH slices AS (
  SELECT doc_id, CAST(i AS INT) AS sno,
         substr(text, CAST(1 + {w} * i AS BIGINT), {w}) AS t
  FROM documents,
       unnest(range(0, (len(text) + {w - 1}) // {w})) AS ts(i)
)
SELECT doc_id,
       printf('%06d/p%03d.txt', doc_id, sno) AS name,
       CASE WHEN doc_id % 2 = 0 THEN 'store' ELSE 'deflate' END AS method,
       CAST(len(t) AS INT) AS n_chars,
       {ch} AS txt_hash
FROM slices ORDER BY doc_id, name
"""


# --- compressed shards (lz4 / snappy / gzip funnel) -----------------------------


def _compress_build(batches):
    """Fixture for ``tx_compress_funnel``: each document's text is
    compressed into ONE shard with the codec its producer would have
    picked — lz4 frame for ``doc_id%6==0``, snappy framing stream for
    ``1``, gzip member for ``2``, Zstandard frame for ``3``, XZ for
    ``4``, bzip2 for ``5`` — so magic dispatch, all six decoders and
    every checksum layer sit on the oracle-checked path.  The zstd
    arm is encoded by the REAL C encoder (``pyarrow.Codec``) with a
    content checksum appended — our engine is decode-only for zstd by
    design, exactly the production shape where producers wrote the
    bytes; the xz/bz2 arms go through the C stdlib codecs both ways
    (pure-Python reimplementations would add no format coverage)."""
    import pandas as pd

    from ..functions.lz4 import compress_frame
    from ..functions.snappyf import compress_stream
    from ..functions.warc import gzip_member
    from ..functions.zstd import xxh64

    import pyarrow as pa

    import bz2
    import lzma

    zc = pa.Codec("zstd", compression_level=3)
    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            raw = t.encode("utf-8")
            m = int(did) % 6
            if m == 0:
                payloads.append(compress_frame(raw, block_checksum=True))
            elif m == 1:
                payloads.append(compress_stream(raw))
            elif m == 2:
                payloads.append(gzip_member(raw))
            elif m == 4:
                payloads.append(lzma.compress(raw, preset=1))
            elif m == 5:
                payloads.append(bz2.compress(raw, 1))
            else:
                fr = bytearray(zc.compress(raw))
                fr[4] |= 0x4  # set the content-checksum flag …
                fr += (xxh64(raw) & 0xFFFFFFFF).to_bytes(4, "little")
                payloads.append(bytes(fr))  # … so decode verifies it
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def tx_compress_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-shard admission funnel (§2.11): LZ4 frames, snappy
    framing streams, gzip members, Zstandard frames, XZ streams and
    bzip2 — the six codecs a store layer actually serves —
    magic-dispatched into one
    verified decode (``decompress_texts``; xxHash32/64, masked
    CRC-32C and CRC32+ISIZE all checked).  The oracle re-derives the
    codec from doc parity and the text from `documents`: any
    dispatch, decompression or checksum drift breaks the value hash.
    The lz4/snappy/zstd decoders are cross-validated against their C
    implementations in ``tests/test_compressf.py`` /
    ``tests/test_zstd.py``."""
    from ..operators.multimodal import decompress_texts

    media = _cached_media(spark, sf_dir, "compress", _compress_build)
    rows = decompress_texts(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "codec",
        F.length("txt").alias("n_chars"),
        tx.char_poly_hash(F.col("txt")).alias("txt_hash"),
    ).orderBy("doc_id")


def _tx_compress_sql() -> str:
    ch = _char_hash_sql("text")
    return f"""
SELECT doc_id,
       CASE doc_id % 6 WHEN 0 THEN 'lz4' WHEN 1 THEN 'snappy'
            WHEN 2 THEN 'gzip' WHEN 4 THEN 'xz' WHEN 5 THEN 'bz2'
            ELSE 'zstd' END AS codec,
       CAST(len(text) AS INT) AS n_chars,
       {ch} AS txt_hash
FROM documents ORDER BY doc_id
"""


# --- Avro object containers ------------------------------------------------------

_AVRO_SLICE = 150  # chars of text per avro record


def _avro_build(batches):
    """Fixture for ``src_avro_scan``: each document becomes one Avro
    object container of its ``_AVRO_SLICE``-char slice records
    ``{seq, txt, score, comment}`` — ``score=(seq*7+doc_id%13)/4.0``
    (exact in binary), ``comment`` exercising the nullable union on
    odd seqs — with the codec rotating null/deflate/snappy by
    ``doc_id%3`` and a doc-derived sync marker, so zigzag varints,
    unions, all three codecs, the snappy CRC and sync verification all
    sit on the oracle-checked path."""
    import hashlib

    import pandas as pd

    from ..functions.avrof import write_avro

    schema = {
        "type": "record",
        "name": "slice",
        "fields": [
            {"name": "seq", "type": "long"},
            {"name": "txt", "type": "string"},
            {"name": "score", "type": "double"},
            {"name": "comment", "type": ["null", "string"]},
        ],
    }
    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            did = int(did)
            recs = [
                {
                    "seq": i // _AVRO_SLICE,
                    "txt": t[i : i + _AVRO_SLICE],
                    "score": ((i // _AVRO_SLICE) * 7 + did % 13) / 4.0,
                    "comment": (
                        None
                        if (i // _AVRO_SLICE) % 2
                        else f"c{i // _AVRO_SLICE}"
                    ),
                }
                for i in range(0, len(t), _AVRO_SLICE)
            ]
            codec = ("null", "deflate", "snappy")[did % 3]
            sync = hashlib.sha1(f"sync{did}".encode()).digest()[:16]
            payloads.append(
                write_avro(recs, schema, codec, sync, block_records=8)
                if recs
                else None
            )
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def src_avro_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro interchange ingestion (§2.11): object containers decoded
    record-by-record (``extract_avro_records``; sync markers, zigzag
    varints, nullable unions, null/deflate/snappy codecs with the
    spec's snappy CRC-32).  The oracle re-derives every field from
    `documents` — slice arithmetic for ``seq``/``txt``, the exact
    quarter-valued ``score``, comment parity, codec by doc parity —
    so any binary-encoding or codec drift breaks the value hash.  No
    Avro library exists in this environment to cross-validate against
    (offline sandbox); the pin is the from-documents replay plus the
    snappy codec's own C cross-validation."""
    from ..operators.multimodal import extract_avro_records

    media = _cached_media(spark, sf_dir, "avro", _avro_build)
    rows = extract_avro_records(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "seq",
        "codec",
        F.length("txt").alias("n_chars"),
        tx.char_poly_hash(F.col("txt")).alias("txt_hash"),
        "score",
        F.col("comment").isNotNull().alias("has_comment"),
    ).orderBy("doc_id", "seq")


def _src_avro_sql() -> str:
    w = _AVRO_SLICE
    ch = _char_hash_sql("t")
    return f"""
WITH slices AS (
  SELECT doc_id, CAST(i AS BIGINT) AS seq,
         substr(text, CAST(1 + {w} * i AS BIGINT), {w}) AS t
  FROM documents,
       unnest(range(0, (len(text) + {w - 1}) // {w})) AS ts(i)
)
SELECT doc_id, seq,
       CASE doc_id % 3 WHEN 0 THEN 'null' WHEN 1 THEN 'deflate'
            ELSE 'snappy' END AS codec,
       CAST(len(t) AS INT) AS n_chars,
       {ch} AS txt_hash,
       (seq * 7 + doc_id % 13) / 4.0 AS score,
       seq % 2 = 0 AS has_comment
FROM slices ORDER BY doc_id, seq
"""


# --- PDF documents ----------------------------------------------------------------

_PDF_LINE = 90  # chars per PDF text line
_PDF_PAGE_LINES = 8  # lines per page


def _pdf_build(batches):
    """Fixture for ``tx_pdf_extract``: each document becomes one PDF
    whose pages show its text as ``_PDF_LINE``-char lines,
    ``_PDF_PAGE_LINES`` per page — classic-xref layout for even
    doc_ids, xref-stream + object-stream layout for odd (uncompressed
    content streams every third doc), so both cross-reference parse
    paths, FlateDecode, the TIFF predictor and object-stream
    resolution all sit on the oracle-checked path."""
    import pandas as pd

    from ..functions.pdf import write_pdf

    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            did = int(did)
            lines = [
                t[i : i + _PDF_LINE] for i in range(0, len(t), _PDF_LINE)
            ]
            pages = [
                lines[j : j + _PDF_PAGE_LINES]
                for j in range(0, len(lines), _PDF_PAGE_LINES)
            ]
            payloads.append(
                write_pdf(
                    pages,
                    mode="classic" if did % 2 == 0 else "xrefstream",
                    compress=did % 3 != 0,
                )
                if pages
                else None
            )
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def tx_pdf_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF-to-text ingestion (§2.11): page-tree walk + content-stream
    text collection over BOTH real-world file layouts — classic xref
    tables and xref streams with object streams
    (``extract_pdf_texts``).  The oracle re-derives each page's text
    from `documents` by the same line/page arithmetic: any drift in
    xref resolution, stream decoding, string unescaping or text-
    operator handling breaks the value hash."""
    from ..operators.multimodal import extract_pdf_texts

    media = _cached_media(spark, sf_dir, "pdf", _pdf_build)
    rows = extract_pdf_texts(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "page",
        F.length("txt").alias("n_chars"),
        tx.char_poly_hash(F.col("txt")).alias("txt_hash"),
    ).orderBy("doc_id", "page")


def _tx_pdf_sql() -> str:
    w = _PDF_LINE
    per = _PDF_PAGE_LINES
    ch = _char_hash_sql("page_text")
    return f"""
WITH lines AS (
  SELECT doc_id, CAST(i AS INT) AS lno,
         substr(text, CAST(1 + {w} * i AS BIGINT), {w}) AS t
  FROM documents,
       unnest(range(0, (len(text) + {w - 1}) // {w})) AS ts(i)
), pages AS (
  SELECT doc_id, CAST(lno // {per} AS INT) AS page,
         string_agg(t, chr(10) ORDER BY lno) AS page_text
  FROM lines GROUP BY doc_id, lno // {per}
)
SELECT doc_id, page,
       CAST(len(page_text) AS INT) AS n_chars,
       {ch} AS txt_hash
FROM pages ORDER BY doc_id, page
"""


# --- MediaWiki dumps ---------------------------------------------------------------

_WIKI_SLICE = 120  # chars of text per wiki paragraph


def _wiki_build(batches):
    """Fixture for ``tx_wiki_extract``: each document becomes one
    MediaWiki export XML whose single page's wikitext carries the
    ``_WIKI_SLICE``-char slices, each under a ``== h{doc}_{i} ==``
    heading and wrapped in a rotating decoration by slice parity —
    bold quotes, an internal link label, a trailing ``<ref>``, a
    leading template — all of which must strip back to the exact
    slice.  Every fifth doc ships the wikitext as a CDATA section
    (slices never contain ``]]>``: the charset is lowercase+space),
    the rest entity-escaped, so both XML character-data paths are on
    the oracle-checked path."""
    import pandas as pd

    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            did = int(did)
            parts = []
            for i in range(0, len(t), _WIKI_SLICE):
                sl = t[i : i + _WIKI_SLICE]
                k = i // _WIKI_SLICE
                parts.append(f"== h{did}_{k} ==")
                m = k % 4
                if m == 0:
                    parts.append(f"'''{sl}'''")
                elif m == 1:
                    parts.append(f"[[w{did}|{sl}]]")
                elif m == 2:
                    parts.append(f'{sl}<ref name="r{k}">cite {k}</ref>')
                else:
                    parts.append(f"{{{{tmpl|x={k}}}}}{sl}")
            if not parts:
                payloads.append(None)
                continue
            body = "\n".join(parts)
            if did % 5 == 0:
                text_node = f"<![CDATA[{body}]]>"
            else:
                text_node = (
                    body.replace("&", "&amp;")
                    .replace("<", "&lt;")
                    .replace(">", "&gt;")
                )
            xml = (
                '<?xml version="1.0" encoding="utf-8"?>\n'
                '<mediawiki xmlns="http://www.mediawiki.org/xml/'
                'export-0.10/" version="0.10">\n'
                "  <siteinfo><sitename>fixture</sitename></siteinfo>\n"
                "  <page>\n"
                f"    <title>Doc {did}</title>\n"
                "    <ns>0</ns>\n"
                f"    <id>{did}</id>\n"
                f"    <revision><id>1</id>"
                f'<text xml:space="preserve">{text_node}</text>'
                "</revision>\n"
                "  </page>\n"
                "</mediawiki>\n"
            )
            payloads.append(xml.encode("utf-8"))
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def tx_wiki_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wikipedia-dump ingestion (§2.11): MediaWiki export XML parsed
    with the strict XML kernel (entities AND CDATA paths), wikitext
    stripped to plain lines (``extract_wiki_lines``: headings,
    quotes, links, refs, nested templates).  The oracle re-derives
    title, line numbering, heading text and the recovered slices from
    `documents` — any XML, entity or markup-stripping drift breaks
    the value hash."""
    from ..operators.multimodal import extract_wiki_lines

    media = _cached_media(spark, sf_dir, "wiki", _wiki_build)
    rows = extract_wiki_lines(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "title",
        "lineno",
        F.length("txt").alias("n_chars"),
        tx.char_poly_hash(F.col("txt")).alias("txt_hash"),
    ).orderBy("doc_id", "lineno")


def _tx_wiki_sql() -> str:
    w = _WIKI_SLICE
    ch = _char_hash_sql("line")
    return f"""
WITH slices AS (
  SELECT doc_id, CAST(i AS INT) AS k,
         substr(text, CAST(1 + {w} * i AS BIGINT), {w}) AS t
  FROM documents,
       unnest(range(0, (len(text) + {w - 1}) // {w})) AS ts(i)
), lines AS (
  SELECT doc_id, 2 * k AS lineno,
         printf('h%d_%d', doc_id, k) AS line
  FROM slices
  UNION ALL
  SELECT doc_id, 2 * k + 1 AS lineno, rtrim(t) AS line
  FROM slices
)
SELECT doc_id, 'Doc ' || doc_id AS title, lineno,
       CAST(len(line) AS INT) AS n_chars,
       {ch} AS txt_hash
FROM lines ORDER BY doc_id, lineno
"""


# --- URL canonicalization -------------------------------------------------------


def tx_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-frontier URL dedup (§2.11): two deterministically MESSY
    variants of each document's URL (upper-cased scheme/host, explicit
    default port, unsorted query, fragment vs. none) canonicalize to
    ONE form via ``functions/urls.canonical_url`` — pure native
    expressions, whole-stage-codegen end to end, zero Python.  The
    oracle constructs the expected canonical string directly and
    expects exactly one merged row per document with ``n_variants=2``:
    any canonicalization drift yields either a hash break (wrong
    string) or a row-count break (variants fail to merge)."""
    from ..functions.urls import canonical_url

    d = load_table(spark, sf_dir, "documents")
    h = (F.col("doc_id") % 20).cast("string")
    did = F.col("doc_id").cast("string")
    nstr = F.col("n_chars").cast("string")
    base = F.concat(F.lit("/"), F.col("source"), F.lit("/"), did)
    u1 = F.concat(
        F.lit("HTTP://WWW.Site"), h, F.lit(".COM:80"), base,
        F.lit("?b="), nstr, F.lit("&a="), F.col("lang"), F.lit("#frag"),
    )
    u2 = F.concat(
        F.lit("http://www.site"), h, F.lit(".com"), base,
        F.lit("?a="), F.col("lang"), F.lit("&b="), nstr,
    )
    rows = d.select(
        "doc_id", F.explode(F.array(u1, u2)).alias("url")
    )
    return (
        rows.select(
            "doc_id", canonical_url(F.col("url")).alias("canonical")
        )
        .groupBy("doc_id", "canonical")
        .agg(F.count(F.lit(1)).alias("n_variants"))
        .orderBy("doc_id")
    )


def _tx_url_canonical_sql() -> str:
    return """
SELECT doc_id,
       'http://www.site' || CAST(doc_id % 20 AS VARCHAR) || '.com/'
         || source || '/' || CAST(doc_id AS VARCHAR)
         || '?a=' || lang || '&b=' || CAST(n_chars AS VARCHAR)
         AS canonical,
       CAST(2 AS BIGINT) AS n_variants
FROM documents ORDER BY doc_id
"""


# --- TIFF image container -------------------------------------------------------


def mm_tiff_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL TIFF decode (§2.11): document bytes become an 8×8
    grayscale TIFF whose compression CYCLES per document (none /
    PackBits / Deflate / TIFF-LZW, with horizontal-differencing
    predictor on the compressed variants, byte order alternating per
    doc), then ``decode_image_pool`` magic-dispatches to
    ``parse_tiff`` and 2×2 block-mean pools.  TIFF is lossless, so the
    oracle is the SAME raw-octet pool as the BMP/PNG/GIF twins — any
    drift in IFD layout, strip arithmetic, PackBits/LZW coding or the
    predictor breaks the value hash."""
    from ..operators.multimodal import decode_image_pool

    def build(batches):
        import numpy as np
        import pandas as pd

        from ..functions.tiff import write_tiff

        comps = ("none", "packbits", "deflate", "lzw")
        n = _BMP_W * _BMP_H
        for pdf in batches:
            payloads = []
            for did, t in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                buf = t.encode("utf-8")[:n].ljust(n, b"\0")
                gray = np.frombuffer(buf, dtype=np.uint8).reshape(
                    _BMP_H, _BMP_W
                )
                comp = comps[did % 4]
                payloads.append(
                    write_tiff(
                        gray,
                        compression=comp,
                        big_endian=did % 2 == 1,
                        rows_per_strip=3,
                        predictor=comp != "none",
                    )
                )
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = _cached_media(spark, sf_dir, "tiff", build)
    pooled = decode_image_pool(media, _BMP_F)
    k = (_BMP_W // _BMP_F) * (_BMP_H // _BMP_F)
    sel = [
        F.round(F.element_at("pooled", i + 1), 6).alias(f"p{i}")
        for i in range(k)
    ]
    return pooled.select(
        F.col("media_id").alias("doc_id"), "width", "height", *sel
    ).orderBy("doc_id")


# --- WebDataset tar shards ------------------------------------------------------

_WDS_SLICE = 128  # chars of text per shard sample


def _wds_build(batches):
    """Fixture for ``mm_webdataset_shard``: each document becomes one
    ``.tar.gz`` WebDataset shard whose samples are the text's
    ``_WDS_SLICE``-char slices — per sample three adjacent members
    ``<key>.txt`` / ``<key>.cls`` (the lang label) / ``<key>.id``,
    keys ``{doc_id:06d}-{i:03d}`` — the exact layout a WebDataset
    training loader reads sequentially."""
    import pandas as pd

    from ..functions.tarf import write_webdataset_shard

    for pdf in batches:
        payloads = []
        for did, t, lang in zip(
            pdf["doc_id"], pdf["text"], pdf["lang"]
        ):
            did = int(did)
            samples = [
                (
                    f"{did:06d}-{i // _WDS_SLICE:03d}",
                    [
                        ("txt", t[i : i + _WDS_SLICE].encode("utf-8")),
                        ("cls", str(lang).encode("utf-8")),
                        ("id", str(did).encode("ascii")),
                    ],
                )
                for i in range(0, len(t), _WDS_SLICE)
            ]
            payloads.append(
                write_webdataset_shard(samples) if samples else None
            )
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def mm_webdataset_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset SHARD ingestion (§2.11): the de-facto tar-shard
    layout of large-scale multimodal training data — ``.tar.gz``
    shards (ustar members, deterministic gzip framing) whose adjacent
    same-basename members form samples — parsed back into per-sample
    rows by ``extract_webdataset_samples``.  The oracle re-derives
    every sample (key arithmetic, slice text, label) from the
    `documents` table, so any drift in tar header layout, checksum
    handling, padding, gzip framing or the adjacency grouping breaks
    the value hash."""
    from ..operators.multimodal import extract_webdataset_samples

    media = _cached_media(
        spark, sf_dir, "wds", _wds_build, cols=("doc_id", "text", "lang")
    )
    rows = extract_webdataset_samples(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "key",
        "n_fields",
        "cls",
        F.length("txt").alias("n_chars"),
        tx.char_poly_hash(F.col("txt")).alias("txt_hash"),
    ).orderBy("doc_id", "key")


def _mm_wds_sql() -> str:
    w = _WDS_SLICE
    ch = _char_hash_sql("t")
    return f"""
WITH slices AS (
  SELECT doc_id, lang, CAST(i AS INT) AS sno,
         substr(text, CAST(1 + {w} * i AS BIGINT), {w}) AS t
  FROM documents,
       unnest(range(0, (len(text) + {w - 1}) // {w})) AS ts(i)
)
SELECT doc_id,
       printf('%06d-%03d', doc_id, sno) AS key,
       CAST(3 AS INT) AS n_fields,
       lang AS cls,
       CAST(len(t) AS INT) AS n_chars,
       {ch} AS txt_hash
FROM slices ORDER BY doc_id, key
"""


# --- web-crawl ingestion (WARC -> HTTP -> HTML -> text) ------------------------

_WARC_PAR = 80  # characters per generated <p> slice
_WARC_LINK_MOD = 500  # out-link target space: doc (7*id + k) % MOD
_WARC_LINKS = 3  # out-links per page (k = 1..3), in the nav


def _warc_build(batches):
    """Fixture: each document becomes ONE ``.warc.gz`` object (the
    Common Crawl layout — warcinfo + request + response records, one
    gzip member each) whose HTML body carries the doc text as
    ``_WARC_PAR``-char ``<p>`` slices (escaped), each closed by one
    numeric character reference (code ``33 + len(text) % 90``), inside
    dropped chrome (nav/header/footer/script/style).  HTTP coding
    varies deterministically: chunked transfer coding for
    ``doc_id % 3 == 0``, gzip content coding for ``doc_id % 4 == 0``,
    status 404 for ``doc_id % 13 == 5`` — so the extractor's every
    layer (member split, record filter, chunk reassembly, gzip decode,
    charset decode, tag/entity semantics) is on the oracle-checked
    path."""
    import pandas as pd

    from ..functions.html import escape_text
    from ..functions.warc import write_http_response, write_warc

    for pdf in batches:
        payloads = []
        for did, text, lang, source in zip(
            pdf["doc_id"], pdf["text"], pdf["lang"], pdf["source"]
        ):
            did = int(did)
            m = 33 + len(text) % 90
            paras = "".join(
                f"<p>{escape_text(text[i:i + _WARC_PAR])}&#{m};</p>"
                for i in range(0, len(text), _WARC_PAR)
            )
            nav_links = "".join(
                f'<li><a href="https://crawl.example.org/doc/'
                f'{(7 * did + k) % _WARC_LINK_MOD}">d{k}</a></li>'
                for k in range(1, _WARC_LINKS + 1)
            )
            html = (
                f"<html><head><title>Document {did}</title>"
                "<style>p{margin:0}</style>"
                "<script>var t = '<p>junk</p>';</script></head>"
                f"<body><nav><ul><li>Home</li>{nav_links}</ul></nav>"
                "<header>Crawl Fixture Site</header>"
                f"{paras}"
                f"<footer>&copy; fixture {did}</footer></body></html>"
            )
            body = html.encode("utf-8")
            url = f"https://crawl.example.org/{source}/{did}"
            status = 404 if did % 13 == 5 else 200
            resp = write_http_response(
                status,
                [
                    ("Content-Type", "text/html; charset=utf-8"),
                    ("Content-Language", str(lang)),
                ],
                body,
                chunked=did % 3 == 0,
                gzip_body=did % 4 == 0,
                chunk_size=64,
                reason="OK" if status == 200 else "Not Found",
            )
            req = (
                f"GET /{source}/{did} HTTP/1.1\r\n"
                "Host: crawl.example.org\r\n\r\n"
            ).encode()
            records = [
                (
                    {
                        "WARC-Type": "warcinfo",
                        "WARC-Record-ID": f"<urn:fixture:{did}:info>",
                        "Content-Type": "application/warc-fields",
                    },
                    b"software: asid-warc-fixture\r\n",
                ),
                (
                    {
                        "WARC-Type": "request",
                        "WARC-Record-ID": f"<urn:fixture:{did}:req>",
                        "WARC-Target-URI": url,
                        "Content-Type": "application/http; msgtype=request",
                    },
                    req,
                ),
                (
                    {
                        "WARC-Type": "response",
                        "WARC-Record-ID": f"<urn:fixture:{did}:resp>",
                        "WARC-Date": "2026-01-01T00:00:00Z",
                        "WARC-Target-URI": url,
                        "Content-Type": "application/http; msgtype=response",
                    },
                    resp,
                ),
            ]
            payloads.append(write_warc(records))
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def _warc_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cached_media(
        spark,
        sf_dir,
        "warc",
        _warc_build,
        cols=("doc_id", "text", "lang", "source"),
    )


_WARC_SRC_RE = r"^https://crawl\.example\.org/([^/]+)/"


def tx_warc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL web-crawl ingestion (§2.11): ``.warc.gz`` payloads split
    into gzip members, WARC records parsed and filtered to responses,
    HTTP parsed (chunked + gzip codings removed, charset decoded),
    HTML reduced to title + content text with boilerplate dropped —
    the operator is ``operators/webtext.extract_warc_text``, a
    zero-shuffle Arrow kernel.  The oracle re-derives the expected
    extracted text per document from the `documents` table (the
    fixture's paragraph slicing + entity markers are deterministic),
    so any drift in member framing, chunk reassembly, entity decoding
    or block/whitespace semantics breaks the value hash."""
    from ..operators.webtext import extract_warc_text

    rows = extract_warc_text(_warc_media(spark, sf_dir))
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "status",
        "content_language",
        F.regexp_extract("url", _WARC_SRC_RE, 1).alias("src"),
        "title",
        F.length("text").alias("n_chars"),
        tx.char_poly_hash(F.col("text")).alias("text_hash"),
        "n_records",
    ).orderBy("doc_id")


def _warc_expected_cte() -> str:
    """CTE ``ex``: the extractor's expected output text per document,
    re-derived from `documents` — ``_WARC_PAR``-char slices, leading
    whitespace trimmed per line (the extractor's line normalization;
    slices have no interior runs because the corpus has none), the
    per-paragraph marker character appended, lines joined by \\n."""
    p = _WARC_PAR
    return f"""
ex AS (
  SELECT doc_id, lang, source,
         CAST(CASE WHEN doc_id % 13 = 5 THEN 404 ELSE 200 END AS INT)
           AS status,
         array_to_string(
           list_transform(range(0, (len(text) + {p - 1}) // {p}),
             i -> ltrim(substr(text, CAST(1 + {p} * i AS BIGINT), {p}))
                  || chr(CAST(33 + len(text) % 90 AS INT))),
           chr(10)) AS t
  FROM documents)
"""


def _tx_warc_sql() -> str:
    ch = _char_hash_sql("t")
    return f"""
WITH {_warc_expected_cte()}
SELECT doc_id, status, lang AS content_language, source AS src,
       'Document ' || CAST(doc_id AS VARCHAR) AS title,
       CAST(len(t) AS INT) AS n_chars,
       {ch} AS text_hash,
       CAST(3 AS INT) AS n_records
FROM ex ORDER BY doc_id
"""


def _warc_quarantine_build(batches):
    """Fixture kernel for ``tx_warc_quarantine``: the ``_warc_build``
    payloads (hashed as a dep, so a builder change still refixtures),
    with docs ``doc_id % 7 == 3`` getting their leading gzip magic
    destroyed — a deterministic corrupt-subset so the quarantine path
    itself is oracle-checkable."""
    for pdf in _warc_build(batches):
        pdf["payload"] = [
            (b"XX" + p[2:] if p is not None and mid % 7 == 3 else p)
            for mid, p in zip(pdf["media_id"], pdf["payload"])
        ]
        yield pdf


def tx_warc_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUARANTINING crawl ingestion: ``extract_warc_text_admitting``
    turns each corrupt ``.warc.gz`` object into a rejected ROW (null
    fields + error class) instead of a failed Spark task — at crawl
    scale a truncated member is a statistical certainty.  The fixture
    corrupts a deterministic subset (``doc_id % 7 == 3``, gzip magic
    destroyed), so the oracle re-derives BOTH sides: the expected
    extracted text for admitted docs and (doc_id, 'ValueError') for
    the corrupted ones."""
    from ..operators.webtext import extract_warc_text_admitting

    media = _cached_media(
        spark,
        sf_dir,
        "warcquar",
        _warc_quarantine_build,
        cols=("doc_id", "text", "lang", "source"),
        deps=(_warc_build,),
    )
    rows = extract_warc_text_admitting(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        F.col("error").isNull().alias("admitted"),
        "error",
        "status",
        F.length("text").alias("n_chars"),
        tx.char_poly_hash(F.col("text")).alias("text_hash"),
    ).orderBy("doc_id")


def _tx_warc_quarantine_sql() -> str:
    ch = _char_hash_sql("t")
    return f"""
WITH {_warc_expected_cte()},
good AS (
  SELECT doc_id, TRUE AS admitted, CAST(NULL AS VARCHAR) AS error,
         status, CAST(len(t) AS INT) AS n_chars, {ch} AS text_hash
  FROM ex WHERE doc_id % 7 <> 3
),
rejected AS (
  SELECT doc_id, FALSE AS admitted, 'ValueError' AS error,
         CAST(NULL AS INT) AS status, CAST(NULL AS INT) AS n_chars,
         CAST(NULL AS BIGINT) AS text_hash
  FROM ex WHERE doc_id % 7 = 3
)
SELECT * FROM good UNION ALL SELECT * FROM rejected ORDER BY doc_id
"""


def gr_crawl_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END crawl link graph (§2.11): the WARC fixture pages
    carry REAL ``<a href>`` out-links in their nav (dropped for text,
    counted for the frontier — exactly a crawler's view), extracted by
    ``extract_warc_links`` (gzip member split → WARC/HTTP parse → HTML
    attribute scan), reduced to document edges, and ranked with the
    existing ``pagerank`` operator — the document-quality prior of
    web-corpus curation computed from the corpus's own link structure.
    Directed graph, NO symmetrization: targets live in
    ``[0, _WARC_LINK_MOD)`` and every node has out-links, so the
    dangling-free precondition holds while source-only nodes (ids ≥
    MOD at sf0.1) exercise the operator's left-join residual path.
    The oracle unrolls the identical six rounds with the same
    LEFT JOIN + COALESCE form."""
    from ..operators.graph import pagerank
    from ..operators.webtext import extract_warc_links

    links = extract_warc_links(_warc_media(spark, sf_dir))
    edges = links.select(
        F.col("media_id").alias("src"),
        F.regexp_extract("link", r"/doc/(\d+)$", 1)
        .cast("long")
        .alias("dst"),
    )
    ranks = pagerank(edges, damping=_PR_DAMP, iters=_PR_ITERS)
    return ranks.select(
        "node", F.round("rank", 6).alias("rank")
    ).orderBy("node")


def _gr_crawl_pagerank_sql() -> str:
    d, mod, nl = _PR_DAMP, _WARC_LINK_MOD, _WARC_LINKS
    ks = ", ".join(str(k) for k in range(1, nl + 1))
    parts = [
        f"""edges AS (
  SELECT doc_id AS src, (7 * doc_id + k) % {mod} AS dst
  FROM documents, unnest([{ks}]) AS t(k)
),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
nn AS (SELECT count(*) AS n FROM deg),
r0 AS (SELECT src, (1.0 / n) / deg AS contrib FROM deg, nn)"""
    ]
    for k in range(1, _PR_ITERS + 1):
        rank = f"(1 - {d}) / nn.n + {d} * COALESCE(g.inm, 0)"
        parts.append(
            f"""r{k} AS (
  SELECT deg.src, {rank} AS rank, ({rank}) / deg.deg AS contrib
  FROM deg CROSS JOIN nn
  LEFT JOIN (
    SELECT e.dst AS src, sum(r.contrib) AS inm
    FROM edges e JOIN r{k - 1} r ON e.src = r.src GROUP BY e.dst
  ) g ON g.src = deg.src
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT src AS node, ROUND(rank, 6) AS rank FROM r{_PR_ITERS}"
        + " ORDER BY node"
    )


_WARC_MIN_CHARS, _WARC_MAX_CHARS = 60, 520


def cur_warc_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end crawl curation: WARC → HTML text → HTTP-status gate
    → length gate → exact dedup on extracted text (survivor = min
    doc_id) → per-(src, lang) corpus stats.  One declarative plan:
    the extraction kernel is zero-shuffle, the dedup shuffles once on
    the text key, the final agg once on (src, lang) — the same shape
    at 100 TB."""
    from ..operators.webtext import extract_warc_text

    rows = extract_warc_text(_warc_media(spark, sf_dir)).select(
        F.col("media_id").alias("doc_id"),
        "status",
        F.col("content_language").alias("lang"),
        F.regexp_extract("url", _WARC_SRC_RE, 1).alias("src"),
        "text",
    )
    filt = rows.filter(
        (F.col("status") == 200)
        & F.length("text").between(_WARC_MIN_CHARS, _WARC_MAX_CHARS)
    ).withColumn("n_toks", tx.token_count(F.col("text")))
    surv = dd.exact_dedup(filt, ["text"], "doc_id")
    return (
        surv.groupBy("src", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("sum_chars"),
            F.sum("n_toks").alias("sum_toks"),
            F.sum("doc_id").alias("sum_ids"),
        )
        .orderBy("src", "lang")
    )


def _cur_warc_sql() -> str:
    toks_t = TOKENS_SQL.replace("text", "t")
    lo, hi = _WARC_MIN_CHARS, _WARC_MAX_CHARS
    return f"""
WITH {_warc_expected_cte()},
filt AS (
  SELECT doc_id, lang, source AS src, t,
         len({toks_t}) AS n_toks
  FROM ex
  WHERE status = 200 AND len(t) BETWEEN {lo} AND {hi}
),
surv AS (
  SELECT *, row_number() OVER (PARTITION BY t ORDER BY doc_id) AS rn
  FROM filt
)
SELECT src, lang, COUNT(*) AS n_docs,
       CAST(SUM(len(t)) AS BIGINT) AS sum_chars,
       CAST(SUM(n_toks) AS BIGINT) AS sum_toks,
       CAST(SUM(doc_id) AS BIGINT) AS sum_ids
FROM surv WHERE rn = 1
GROUP BY src, lang ORDER BY src, lang
"""


# --- TFRecord shards of tf.train.Example -------------------------------------

_TFR_SLICE = 96  # characters per generated example


def _tfrecord_build(batches):
    """Fixture for ``src_tfrecord_scan``: each document becomes one
    TFRecord shard with one ``tf.train.Example`` per ``_TFR_SLICE``-char
    text slice.  Features per example: ``key`` bytes
    ``{doc_id:06d}-{sno:03d}``, ``txt`` bytes slice, ``sno`` int64,
    ``delta`` int64 ``sno - 2`` (negative for the first two — the
    10-byte varint path), ``score`` packed float32
    ``[len + 0.25, sno + 0.5]`` (dyadic, so float32-exact and
    SQL-replicable)."""
    import pandas as pd

    from ..functions.protof import encode_example
    from ..functions.tfrecord import write_tfrecord

    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            did = int(did)
            recs = []
            for sno, i in enumerate(range(0, len(t), _TFR_SLICE)):
                s = t[i : i + _TFR_SLICE]
                recs.append(
                    encode_example(
                        {
                            "key": (
                                "bytes",
                                [f"{did:06d}-{sno:03d}".encode()],
                            ),
                            "txt": ("bytes", [s.encode("utf-8")]),
                            "sno": ("int64", [sno]),
                            "delta": ("int64", [sno - 2]),
                            "score": (
                                "float",
                                [len(s) + 0.25, sno + 0.5],
                            ),
                        }
                    )
                )
            payloads.append(write_tfrecord(recs) if recs else None)
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def src_tfrecord_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TFRecord ingestion (§2.11): the tf.data training-shard format —
    masked-CRC32C framed records of serialized ``tf.train.Example``
    protos — scanned back into typed per-example rows
    (``extract_tfrecord_examples``).  The oracle re-derives every
    feature (key arithmetic, slice text, int64s incl. the negative
    varint path, float32-exact scores) from `documents`, so drift in
    CRC masking, record framing, varint/zigzag decode, packed-float
    parsing or map-entry traversal breaks the value hash."""
    from ..operators.multimodal import extract_tfrecord_examples

    media = _cached_media(spark, sf_dir, "tfrecord", _tfrecord_build)
    rows = extract_tfrecord_examples(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "key",
        "n_feats",
        "sno",
        "delta",
        "score",
        F.length("txt").alias("n_chars"),
        tx.char_poly_hash(F.col("txt")).alias("txt_hash"),
    ).orderBy("doc_id", "key")


def _src_tfrecord_sql() -> str:
    w = _TFR_SLICE
    ch = _char_hash_sql("t")
    return f"""
WITH slices AS (
  SELECT doc_id, CAST(i AS BIGINT) AS sno,
         substr(text, CAST(1 + {w} * i AS BIGINT), {w}) AS t
  FROM documents,
       unnest(range(0, (len(text) + {w - 1}) // {w})) AS ts(i)
)
SELECT doc_id,
       printf('%06d-%03d', doc_id, sno) AS key,
       CAST(5 AS INT) AS n_feats,
       sno,
       sno - 2 AS delta,
       CAST(len(t) + 0.25 AS DOUBLE) AS score,
       CAST(len(t) AS INT) AS n_chars,
       {ch} AS txt_hash
FROM slices ORDER BY doc_id, key
"""


# --- MessagePack record shards -------------------------------------------------

_MSGPACK_SLICE = 112  # characters per generated record


def _msgpack_build(batches):
    """Fixture for ``src_msgpack_scan``: each document becomes one
    shard of concatenated msgpack maps, one per ``_MSGPACK_SLICE``-char
    slice.  Fields chosen to cross format-family boundaries: ``sno``
    positive fixint→uint8, ``neg`` ``-(1 + 300*sno)`` negative
    fixint→int16, ``frac`` float64 ``sno + 0.25``, ``ok`` bool,
    ``nil`` None, ``tags`` fixarray [lang, str(doc_id)], ``blob`` bin8
    of the slice's first UTF-8 bytes, plus key/txt strings (fixstr and
    str8 both occur)."""
    import pandas as pd

    from ..functions.msgpackf import pack

    for pdf in batches:
        payloads = []
        for did, t, lang in zip(pdf["doc_id"], pdf["text"], pdf["lang"]):
            did = int(did)
            parts = []
            for sno, i in enumerate(range(0, len(t), _MSGPACK_SLICE)):
                s = t[i : i + _MSGPACK_SLICE]
                parts.append(
                    pack(
                        {
                            "key": f"{did:06d}-{sno:03d}",
                            "sno": sno,
                            "neg": -(1 + 300 * sno),
                            "frac": sno + 0.25,
                            "ok": sno % 2 == 0,
                            "nil": None,
                            "cls": str(lang),
                            "tags": [str(lang), str(did)],
                            "blob": s.encode("utf-8")[:4],
                            "txt": s,
                        }
                    )
                )
            payloads.append(b"".join(parts) if parts else None)
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def src_msgpack_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MessagePack shard ingestion (§2.11): concatenated msgpack maps —
    a common record-shard layout — decoded by the strict pure-Python
    codec (``functions/msgpackf.py``) into typed rows
    (``extract_msgpack_records``).  The oracle re-derives every field
    from `documents` (key printf arithmetic, the negative-int family,
    float64 fractions, bool parity, tag counts, slice text), so drift
    in any format family's length/endianness handling breaks the
    value hash."""
    from ..operators.multimodal import extract_msgpack_records

    media = _cached_media(
        spark, sf_dir, "msgpack", _msgpack_build,
        cols=("doc_id", "text", "lang"),
    )
    rows = extract_msgpack_records(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "key",
        "n_fields",
        "sno",
        "neg",
        "frac",
        "ok",
        "cls",
        "n_tags",
        F.length("txt").alias("n_chars"),
        tx.char_poly_hash(F.col("txt")).alias("txt_hash"),
    ).orderBy("doc_id", "key")


def _src_msgpack_sql() -> str:
    w = _MSGPACK_SLICE
    ch = _char_hash_sql("t")
    return f"""
WITH slices AS (
  SELECT doc_id, lang, CAST(i AS BIGINT) AS sno,
         substr(text, CAST(1 + {w} * i AS BIGINT), {w}) AS t
  FROM documents,
       unnest(range(0, (len(text) + {w - 1}) // {w})) AS ts(i)
)
SELECT doc_id,
       printf('%06d-%03d', doc_id, sno) AS key,
       CAST(10 AS INT) AS n_fields,
       sno,
       -(1 + 300 * sno) AS neg,
       CAST(sno + 0.25 AS DOUBLE) AS frac,
       sno % 2 = 0 AS ok,
       lang AS cls,
       CAST(2 AS INT) AS n_tags,
       CAST(len(t) AS INT) AS n_chars,
       {ch} AS txt_hash
FROM slices ORDER BY doc_id, key
"""


# --- EPUB books -----------------------------------------------------------------

_EPUB_CH = 240  # characters per chapter
_EPUB_PAR = 60  # characters per paragraph within a chapter


def _epub_build(batches):
    """Fixture for ``tx_epub_extract``: each document becomes one EPUB
    whose chapters are ``_EPUB_CH``-char text slices and whose
    paragraphs are the chapters' stripped ``_EPUB_PAR``-char
    sub-slices (stripped so the extractor's per-line whitespace
    normalization is the identity and the oracle can replay it with
    ``trim``).  Chapter titles ``Chapter {chno:03d}``, book title
    ``Doc {doc_id}``, dc:language from the doc's lang."""
    import pandas as pd

    from ..functions.epub import write_epub

    for pdf in batches:
        payloads = []
        for did, t, lang in zip(pdf["doc_id"], pdf["text"], pdf["lang"]):
            did = int(did)
            chapters = []
            for chno, i in enumerate(range(0, len(t), _EPUB_CH)):
                ct = t[i : i + _EPUB_CH]
                paras = [
                    p
                    for j in range(0, len(ct), _EPUB_PAR)
                    if (p := ct[j : j + _EPUB_PAR].strip())
                ]
                chapters.append((f"Chapter {chno:03d}", paras))
            payloads.append(
                write_epub(f"Doc {did}", chapters, language=str(lang))
                if chapters
                else None
            )
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def tx_epub_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EPUB book-dump ingestion (§2.11): OCF container → container.xml
    → OPF manifest/spine → spine-ordered XHTML chapters → text
    (``extract_epub_chapters``) — ZIP, XML and HTML layers composed.
    The oracle re-derives chapter titles, OPF metadata and the exact
    extracted text (title line + trimmed paragraph lines) from
    `documents`, so drift in any layer — mixed-method ZIP, container
    indirection, spine ordering, XHTML text extraction — breaks the
    value hash."""
    from ..operators.multimodal import extract_epub_chapters

    media = _cached_media(
        spark, sf_dir, "epub", _epub_build, cols=("doc_id", "text", "lang")
    )
    rows = extract_epub_chapters(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "book",
        "language",
        "chno",
        "title",
        F.length("txt").alias("n_chars"),
        tx.char_poly_hash(F.col("txt")).alias("txt_hash"),
    ).orderBy("doc_id", "chno")


def _tx_epub_sql() -> str:
    c, p = _EPUB_CH, _EPUB_PAR
    ch = _char_hash_sql("t")
    return f"""
WITH chs AS (
  SELECT doc_id, lang, CAST(i AS INT) AS chno,
         substr(text, CAST(1 + {c} * i AS BIGINT), {c}) AS ct
  FROM documents,
       unnest(range(0, (len(text) + {c - 1}) // {c})) AS ts(i)
), lines AS (
  SELECT doc_id, lang, chno,
         printf('Chapter %03d', chno) || chr(10) ||
         array_to_string(
           list_filter(
             list_transform(range(0, (len(ct) + {p - 1}) // {p}),
               j -> trim(substr(ct, CAST(1 + {p} * j AS BIGINT), {p}))),
             x -> x <> ''),
           chr(10)) AS t
  FROM chs
)
SELECT doc_id,
       'Doc ' || doc_id AS book,
       lang AS language,
       chno,
       printf('Chapter %03d', chno) AS title,
       CAST(len(t) AS INT) AS n_chars,
       {ch} AS txt_hash
FROM lines ORDER BY doc_id, chno
"""


# --- subtitles (SRT / WebVTT funnel) --------------------------------------------

_SUB_SLICE = 48  # characters per cue
_SUB_LINE = 24  # characters per cue line


def _subtitle_build(batches):
    """Fixture for ``tx_subtitle_extract``: each document becomes one
    subtitle file — SRT for even doc_ids, WebVTT (with cue ids) for
    odd — one cue per ``_SUB_SLICE``-char slice, cue text split into
    two ``_SUB_LINE``-char lines (multi-line accumulation on the
    checked path).  Timings re-derivable in SQL:
    ``start = (doc_id % 5)*977000 + sno*2000 + (doc_id % 7)*17``
    (hours digit exercised), ``end = start + 1900``."""
    import pandas as pd

    from ..functions.subtitles import write_srt, write_webvtt

    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            did = int(did)
            cues = []
            for sno, i in enumerate(range(0, len(t), _SUB_SLICE)):
                s = t[i : i + _SUB_SLICE]
                lines = [
                    part
                    for part in (s[:_SUB_LINE], s[_SUB_LINE:])
                    if part
                ]
                start = (did % 5) * 977_000 + sno * 2000 + (did % 7) * 17
                cues.append((start, start + 1900, "\n".join(lines)))
            if not cues:
                payloads.append(None)
            elif did % 2 == 0:
                payloads.append(write_srt(cues))
            else:
                payloads.append(
                    write_webvtt(
                        cues, ids=[f"c{k}" for k in range(len(cues))]
                    )
                )
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def tx_subtitle_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subtitle ingestion funnel (§2.11): SRT and WebVTT files sniffed
    per payload and parsed into one row per cue
    (``extract_subtitle_cues``) — millisecond timing round-trip
    (HH:MM:SS,mmm vs HH:MM:SS.mmm), cue-id handling, verbatim
    multi-line text.  The oracle re-derives format by doc parity,
    timings by the fixture arithmetic and text from `documents`, so
    drift in timestamp formatting/parsing or line accumulation breaks
    the value hash."""
    from ..operators.multimodal import extract_subtitle_cues

    media = _cached_media(spark, sf_dir, "subtitle", _subtitle_build)
    rows = extract_subtitle_cues(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "fmt",
        "cueno",
        "start_ms",
        "end_ms",
        F.size(F.split("txt", "\n")).alias("n_lines"),
        F.length("txt").alias("n_chars"),
        tx.char_poly_hash(F.col("txt")).alias("txt_hash"),
    ).orderBy("doc_id", "cueno")


def _tx_subtitle_sql() -> str:
    w, ln = _SUB_SLICE, _SUB_LINE
    ch = _char_hash_sql("t")
    return f"""
WITH cues AS (
  SELECT doc_id, CAST(i AS INT) AS cueno,
         (doc_id % 5) * 977000 + i * 2000 + (doc_id % 7) * 17 AS start_ms,
         array_to_string(
           list_filter(
             [substr(text, CAST(1 + {w} * i AS BIGINT), {ln}),
              substr(text, CAST(1 + {w} * i + {ln} AS BIGINT), {ln})],
             x -> x <> ''),
           chr(10)) AS t
  FROM documents,
       unnest(range(0, (len(text) + {w - 1}) // {w})) AS ts(i)
)
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'srt' ELSE 'vtt' END AS fmt,
       cueno,
       start_ms,
       start_ms + 1900 AS end_ms,
       CAST(len(string_split(t, chr(10))) AS INT) AS n_lines,
       CAST(len(t) AS INT) AS n_chars,
       {ch} AS txt_hash
FROM cues ORDER BY doc_id, cueno
"""


# --- MJPEG in AVI ----------------------------------------------------------------

_AVI_USEC = 40_000  # 25 fps


def mm_avi_mjpeg_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MJPEG-in-AVI frame decode (§2.11): the ``mm_mkv_jpeg_pool``
    pixels in a RIFF/AVI container instead of Matroska — same
    fixed-point JPEG layer (odd frames progressive SOF2, even
    baseline SOF0), different mux: hdrl/strl headers, word-aligned
    00dc movi chunks, idx1 legacy index (cross-checked on read),
    timestamps reconstructed from ``usec_per_frame``.  The oracle is
    the container-independent JPEG replay keyed by (doc_id, frame) —
    the MKV twin's SQL with AVI's timestamp arithmetic — so the two
    containers must agree bit-for-bit on every decoded pixel."""
    from ..operators.multimodal import demux_avi_decode_jpeg_pool

    n = _BMP_W * _BMP_H

    def build(batches):
        import numpy as np
        import pandas as pd

        from ..functions.avi import write_avi_mjpeg
        from ..functions.codecs import write_jpeg, write_jpeg_progressive

        for pdf in batches:
            payloads = []
            for t in pdf["text"]:
                raw = t.encode("utf-8")
                nf = min(_MJPEG_MAX_FRAMES, len(raw) // n)
                frames = [
                    (write_jpeg_progressive if i % 2 else write_jpeg)(
                        np.frombuffer(
                            raw, np.uint8, count=n, offset=i * n
                        ).reshape(_BMP_H, _BMP_W),
                        quality=_JPEG_QUALITY,
                    )
                    for i in range(nf)
                ]
                payloads.append(
                    write_avi_mjpeg(
                        frames, _BMP_W, _BMP_H, usec_per_frame=_AVI_USEC
                    )
                    if frames
                    else None
                )
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    media = _cached_media(spark, sf_dir, "avijpeg", build)
    pooled = demux_avi_decode_jpeg_pool(media, _BMP_F)
    k = (_BMP_W // _BMP_F) * (_BMP_H // _BMP_F)
    sel = [
        F.round(F.element_at("pooled", i + 1), 6).alias(f"p{i}")
        for i in range(k)
    ]
    return pooled.select(
        F.col("media_id").alias("doc_id"),
        "ts_ms",
        "keyframe",
        "width",
        "height",
        *sel,
    ).orderBy("doc_id", "ts_ms")


def _mm_avi_jpeg_sql() -> str:
    """Container-independent JPEG replay (the ``_mm_mkv_jpeg_sql``
    pipeline) with AVI's ``usec_per_frame``-derived timestamps."""
    ctes, cols = _jpeg_passes_sql("doc_id, fno")
    n = _BMP_W * _BMP_H
    ms = _AVI_USEC // 1000
    return f"""
WITH {_CODES_CTE_SQL},
shifted AS (
  SELECT doc_id, CAST(f AS INT) AS fno,
         list_transform(range(0, {n}), i ->
           CAST(cs[CAST(f * {n} + i + 1 AS INT)] AS BIGINT) - 128) AS xs
  FROM codes,
       unnest(range(0, LEAST(n_bytes // {n}, {_MJPEG_MAX_FRAMES}))) AS t(f)
),
{ctes}
SELECT doc_id, CAST(fno * {ms} AS BIGINT) AS ts_ms,
       TRUE AS keyframe,
       CAST({_BMP_W} AS INT) AS width, CAST({_BMP_H} AS INT) AS height,
{',' .join(cols)}
FROM pixels ORDER BY doc_id, ts_ms
"""


# --- EXIF metadata in JPEG APP1 --------------------------------------------------


def _exif_build(batches):
    """Fixture for ``mm_jpeg_exif``: each document with ≥64 text bytes
    becomes one 8×8 JPEG (baseline for even doc_ids, progressive for
    odd) with an EXIF APP1 spliced after SOI; every field is doc_id
    arithmetic so the oracle replays it in SQL."""
    import numpy as np
    import pandas as pd

    from ..functions.codecs import write_jpeg, write_jpeg_progressive
    from ..functions.exif import insert_jpeg_app1, write_exif

    n = _BMP_W * _BMP_H
    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            did = int(did)
            raw = t.encode("utf-8")
            if len(raw) < n:
                payloads.append(None)
                continue
            img = (write_jpeg_progressive if did % 2 else write_jpeg)(
                np.frombuffer(raw, np.uint8, count=n).reshape(
                    _BMP_H, _BMP_W
                ),
                quality=_JPEG_QUALITY,
            )
            app1 = write_exif(
                {
                    "make": "Fixture",
                    "model": f"Cam {did % 17}",
                    "orientation": 1 + did % 8,
                    "x_resolution": (72 + did % 10, 1),
                    "exposure_time": (1, 60 + did % 200),
                    "iso": 100 + (did % 40) * 25,
                    "datetime_original": (
                        f"2026:{1 + did % 12:02d}:{1 + did % 28:02d} "
                        f"{did % 24:02d}:{did % 60:02d}:{did * 7 % 60:02d}"
                    ),
                    "pixel_x": _BMP_W,
                    "pixel_y": _BMP_H,
                }
            )
            payloads.append(insert_jpeg_app1(img, app1))
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def mm_jpeg_exif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXIF metadata extraction (§2.11): a real JPEG marker walk finds
    the APP1 segment, then the TIFF-IFD chain (IFD0 → 0x8769 Exif
    sub-IFD) is decoded — ASCII, SHORT, LONG and RATIONAL types all on
    the checked path, over both SOF0 and SOF2 images.  The oracle
    replays the doc_id arithmetic behind every field, so drift in IFD
    layout, endian handling, inline-vs-offset values or the marker
    walk breaks the value hash."""
    from ..operators.multimodal import extract_jpeg_exif

    media = _cached_media(spark, sf_dir, "exif", _exif_build)
    rows = extract_jpeg_exif(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "make",
        "model",
        "orientation",
        "iso",
        "exp_num",
        "exp_den",
        "xres_num",
        "xres_den",
        "px_w",
        "px_h",
        "dto",
    ).orderBy("doc_id")


def _mm_jpeg_exif_sql() -> str:
    n = _BMP_W * _BMP_H
    return f"""
SELECT doc_id,
       'Fixture' AS make,
       'Cam ' || (doc_id % 17) AS model,
       CAST(1 + doc_id % 8 AS INT) AS orientation,
       CAST(100 + (doc_id % 40) * 25 AS INT) AS iso,
       CAST(1 AS BIGINT) AS exp_num,
       CAST(60 + doc_id % 200 AS BIGINT) AS exp_den,
       CAST(72 + doc_id % 10 AS BIGINT) AS xres_num,
       CAST(1 AS BIGINT) AS xres_den,
       CAST({_BMP_W} AS BIGINT) AS px_w,
       CAST({_BMP_H} AS BIGINT) AS px_h,
       printf('2026:%02d:%02d %02d:%02d:%02d',
              1 + doc_id % 12, 1 + doc_id % 28,
              doc_id % 24, doc_id % 60, doc_id * 7 % 60) AS dto
FROM documents WHERE len(text) >= {n} ORDER BY doc_id
"""


# --- QOI images ------------------------------------------------------------------


def _qoi_build(batches):
    """Fixture for ``mm_qoi_pool``: each document's leading text bytes
    become one 8×8 QOI image — RGB (192 bytes) for even doc_ids, RGBA
    (256 bytes) for odd — so the index cache, DIFF/LUMA deltas, runs
    and both literal ops all occur across the corpus."""
    import numpy as np
    import pandas as pd

    from ..functions.qoi import write_qoi

    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            did = int(did)
            ch = 3 + did % 2
            nb = _BMP_W * _BMP_H * ch
            raw = t.encode("utf-8")
            if len(raw) < nb:
                payloads.append(None)
                continue
            px = np.frombuffer(raw, np.uint8, count=nb).reshape(
                _BMP_H, _BMP_W, ch
            )
            payloads.append(write_qoi(px))
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def mm_qoi_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QOI image decode (§2.11): the lossless one-page-spec format —
    index cache, DIFF/LUMA wraparound deltas, runs, RGB/RGBA literals,
    strict end marker — decoded back to raster bytes
    (``decode_qoi_stats``).  Losslessness makes the oracle exact: the
    decoded component stream must equal the document's leading bytes
    verbatim (value-hash + byte-sum), RGB and RGBA mixed by doc
    parity."""
    from ..operators.multimodal import decode_qoi_stats

    media = _cached_media(spark, sf_dir, "qoi", _qoi_build)
    rows = decode_qoi_stats(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "width",
        "height",
        "channels",
        "byte_sum",
        F.length("txt").alias("n_bytes"),
        tx.char_poly_hash(F.col("txt")).alias("txt_hash"),
    ).orderBy("doc_id")


def _mm_qoi_sql() -> str:
    n = _BMP_W * _BMP_H
    ch = _char_hash_sql("t")
    return f"""
WITH imgs AS (
  SELECT doc_id,
         CAST(3 + doc_id % 2 AS INT) AS channels,
         substr(text, 1, {n} * (3 + doc_id % 2)) AS t
  FROM documents
  WHERE len(text) >= {n} * (3 + doc_id % 2)
)
SELECT doc_id,
       CAST({_BMP_W} AS INT) AS width,
       CAST({_BMP_H} AS INT) AS height,
       channels,
       CAST(list_sum(list_transform(range(1, len(t) + 1),
              i -> CAST(ascii(substr(t, CAST(i AS BIGINT), 1)) AS BIGINT)))
         AS BIGINT) AS byte_sum,
       CAST(len(t) AS INT) AS n_bytes,
       {ch} AS txt_hash
FROM imgs ORDER BY doc_id
"""


# --- DOCX office documents --------------------------------------------------------

_DOCX_PAR = 72  # characters per paragraph
_DOCX_RUN = 30  # first-run length within a paragraph


def _docx_build(batches):
    """Fixture for ``tx_docx_extract``: each document becomes one DOCX
    whose paragraphs are ``_DOCX_PAR``-char slices, each split into
    two runs at ``_DOCX_RUN`` chars (run concatenation and
    ``xml:space`` preservation on the checked path)."""
    import pandas as pd

    from ..functions.docx import write_docx

    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            paras = [
                [s[:_DOCX_RUN], s[_DOCX_RUN:]]
                if len(s) > _DOCX_RUN
                else [s]
                for i in range(0, len(t), _DOCX_PAR)
                for s in (t[i : i + _DOCX_PAR],)
            ]
            payloads.append(write_docx(paras) if paras else None)
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def tx_docx_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOCX ingestion (§2.11): the ECMA-376 package walked through its
    rels wiring to WordprocessingML paragraphs/runs
    (``extract_docx_paragraphs``) — ZIP and XML layers composed.  The
    oracle re-derives every paragraph from `documents` slices, so
    drift in package traversal, run concatenation or whitespace
    preservation breaks the value hash."""
    from ..operators.multimodal import extract_docx_paragraphs

    media = _cached_media(spark, sf_dir, "docx", _docx_build)
    rows = extract_docx_paragraphs(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "pno",
        F.length("txt").alias("n_chars"),
        tx.char_poly_hash(F.col("txt")).alias("txt_hash"),
    ).orderBy("doc_id", "pno")


def _tx_docx_sql() -> str:
    w = _DOCX_PAR
    ch = _char_hash_sql("t")
    return f"""
WITH paras AS (
  SELECT doc_id, CAST(i AS INT) AS pno,
         substr(text, CAST(1 + {w} * i AS BIGINT), {w}) AS t
  FROM documents,
       unnest(range(0, (len(text) + {w - 1}) // {w})) AS ts(i)
)
SELECT doc_id, pno,
       CAST(len(t) AS INT) AS n_chars,
       {ch} AS txt_hash
FROM paras ORDER BY doc_id, pno
"""


# --- Markdown ----------------------------------------------------------------------

_MD_SLICE = 64  # characters per markdown block


def _markdown_build(batches):
    """Fixture for ``tx_markdown_extract``: each document becomes one
    markdown file — an ATX heading, then one block per
    ``_MD_SLICE``-char slice rotating through five shapes by
    ``sno % 5`` (bold / italic / code span / list item / blockquote;
    emphasis and list variants use the stripped slice since their
    syntax cannot carry edge whitespace), a fenced code block, and an
    inline link."""
    import pandas as pd

    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            did = int(did)
            blocks = [f"# Doc {did}"]
            for sno, i in enumerate(range(0, len(t), _MD_SLICE)):
                s = t[i : i + _MD_SLICE]
                v = sno % 5
                if v == 0:
                    blocks.append(f"**{s.strip()}**")
                elif v == 1:
                    blocks.append(f"*{s.strip()}*")
                elif v == 2:
                    blocks.append(f"`{s}`")
                elif v == 3:
                    blocks.append(f"- {s.strip()}")
                else:
                    blocks.append(f"> {s}")
            blocks.append(f"```python\ncode {did} block\n```")
            blocks.append(f"[Doc {did}](https://example.org/{did})")
            payloads.append("\n\n".join(blocks).encode("utf-8"))
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def tx_markdown_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markdown ingestion (§2.11): the GitHub/docs-corpus text stage —
    headings, emphasis, code spans, list markers, blockquotes, fenced
    code and links all stripped to content lines
    (``extract_markdown_lines``).  The oracle re-derives every line
    (heading text, per-variant slice normalization, fence content,
    link label) from `documents`, so drift in any stripping rule
    breaks the value hash."""
    from ..operators.multimodal import extract_markdown_lines

    media = _cached_media(spark, sf_dir, "markdown", _markdown_build)
    rows = extract_markdown_lines(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "lineno",
        F.length("txt").alias("n_chars"),
        tx.char_poly_hash(F.col("txt")).alias("txt_hash"),
    ).orderBy("doc_id", "lineno")


def _tx_markdown_sql() -> str:
    w = _MD_SLICE
    ch = _char_hash_sql("t")
    return f"""
WITH slices AS (
  SELECT doc_id, CAST(i AS BIGINT) AS sno,
         substr(text, CAST(1 + {w} * i AS BIGINT), {w}) AS s
  FROM documents,
       unnest(range(0, (len(text) + {w - 1}) // {w})) AS ts(i)
), lines AS (
  SELECT doc_id, CAST(0 AS BIGINT) AS lineno, 'Doc ' || doc_id AS t
  FROM documents
  UNION ALL
  SELECT doc_id, 1 + sno,
         CASE WHEN sno % 5 IN (0, 1, 3) THEN trim(s) ELSE rtrim(s) END
  FROM slices
  UNION ALL
  SELECT doc_id, 1 + (len(text) + {w - 1}) // {w},
         'code ' || doc_id || ' block'
  FROM documents
  UNION ALL
  SELECT doc_id, 2 + (len(text) + {w - 1}) // {w}, 'Doc ' || doc_id
  FROM documents
)
SELECT doc_id, CAST(lineno AS INT) AS lineno,
       CAST(len(t) AS INT) AS n_chars,
       {ch} AS txt_hash
FROM lines ORDER BY doc_id, lineno
"""


# --- WebP lossless (VP8L) ---------------------------------------------------------

_WEBP_PAL_COLORS = 12  # palette-variant color count (≤16: bundling)


def _webp_build(batches):
    """Fixture for ``mm_webp_pool``: each document with ≥256 text
    bytes becomes one 8×8 lossless WebP, the stream features rotating
    by ``doc_id % 4`` — 0: color cache + LZ77; 1: SUBTRACT_GREEN;
    2: PREDICTOR (4×4 blocks, rotating modes); 3: COLOR_INDEXING over
    a fixed ``_WEBP_PAL_COLORS``-color palette (4-bit pixel bundling),
    indices from the text bytes.  Variants 0-2 take raw RGBA from the
    leading 256 bytes; variant 3 maps the leading 64 chars through
    palette color ``k = code % 12`` → ``(9k+1, 7k+2, 5k+3, 100)`` (all
    components ASCII-range so the oracle can rebuild the exact decoded
    string)."""
    import numpy as np
    import pandas as pd

    from ..functions.webp import write_webp

    n = _BMP_W * _BMP_H
    pal = np.array(
        [
            (9 * k + 1, 7 * k + 2, 5 * k + 3, 100)
            for k in range(_WEBP_PAL_COLORS)
        ],
        dtype=np.uint8,
    )
    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            did = int(did)
            raw = t.encode("utf-8")
            if len(raw) < 4 * n:
                payloads.append(None)
                continue
            v = did % 4
            if v == 3:
                idx = np.frombuffer(raw, np.uint8, count=n) % _WEBP_PAL_COLORS
                px = pal[idx].reshape(_BMP_H, _BMP_W, 4)
                payloads.append(write_webp(px, palette=True))
                continue
            px = np.frombuffer(raw, np.uint8, count=4 * n).reshape(
                _BMP_H, _BMP_W, 4
            )
            if v == 0:
                payloads.append(write_webp(px, cache_bits=5))
            elif v == 1:
                payloads.append(
                    write_webp(px, subtract_green=True, cache_bits=3)
                )
            else:
                payloads.append(write_webp(px, predictor_bits=2))
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def mm_webp_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebP-lossless decode (§2.11): real VP8L streams — canonical
    prefix codes with in-stream code-length codes, color cache, LZ77
    backrefs, SUBTRACT_GREEN / PREDICTOR / COLOR_INDEXING transforms
    with pixel bundling — decoded back to raster bytes
    (``decode_webp_stats``).  Losslessness makes the oracle exact:
    variants 0-2 must reproduce the document's leading 256 bytes
    verbatim, variant 3 the palette mapping of its leading 64 chars
    (value hash + byte sum)."""
    from ..operators.multimodal import decode_webp_stats

    media = _cached_media(spark, sf_dir, "webp", _webp_build)
    rows = decode_webp_stats(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "width",
        "height",
        "byte_sum",
        F.length("txt").alias("n_bytes"),
        tx.char_poly_hash(F.col("txt")).alias("txt_hash"),
    ).orderBy("doc_id")


def _mm_webp_sql() -> str:
    n = _BMP_W * _BMP_H
    p = _WEBP_PAL_COLORS
    ch = _char_hash_sql("t")
    return f"""
WITH imgs AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 3 THEN
           array_to_string(list_transform(range(1, {n + 1}), i ->
             chr(9 * (ascii(substr(text, CAST(i AS BIGINT), 1)) % {p}) + 1)
             || chr(7 * (ascii(substr(text, CAST(i AS BIGINT), 1)) % {p}) + 2)
             || chr(5 * (ascii(substr(text, CAST(i AS BIGINT), 1)) % {p}) + 3)
             || chr(100)), '')
         ELSE substr(text, 1, {4 * n}) END AS t
  FROM documents
  WHERE len(text) >= {4 * n}
)
SELECT doc_id,
       CAST({_BMP_W} AS INT) AS width,
       CAST({_BMP_H} AS INT) AS height,
       CAST(list_sum(list_transform(range(1, len(t) + 1),
              i -> CAST(ascii(substr(t, CAST(i AS BIGINT), 1)) AS BIGINT)))
         AS BIGINT) AS byte_sum,
       CAST(len(t) AS INT) AS n_bytes,
       {ch} AS txt_hash
FROM imgs ORDER BY doc_id
"""


# --- robots.txt (crawl politeness) -------------------------------------------------


def _robots_build(batches):
    """Fixture for ``tx_robots_rules``: each document becomes one
    robots.txt with a wildcard group (path-specific disallow + allow
    carve-out + crawl delay), a bot-specific group (blanket disallow
    with an anchored allow), comments, CRLF endings for odd doc_ids,
    and a sitemap — every field doc_id arithmetic."""
    import pandas as pd

    for pdf in batches:
        payloads = []
        for did in pdf["doc_id"]:
            did = int(did)
            k = did % 5
            lines = [
                "# fixture robots",
                "User-agent: *",
                f"Disallow: /private{k}/",
                f"Allow: /private{k}/ok",
                f"Crawl-delay: {1 + did % 9}",
                "",
                f"User-agent: bot{did % 3}",
                "Disallow: /",
                "Allow: /open$",
                "",
                f"Sitemap: https://example.org/{did}/sitemap.xml",
            ]
            sep = "\r\n" if did % 2 else "\n"
            payloads.append(sep.join(lines).encode("utf-8"))
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def tx_robots_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt evaluation (§2.11): the crawl-politeness gate — RFC
    9309 group selection (specific agent over ``*``), longest-match
    rules with Allow tie-wins, ``*``/``$`` wildcards, crawl delays and
    sitemaps (``evaluate_robots``).  The oracle replays every probe
    verdict from doc_id arithmetic, so drift in grouping, matching
    specificity or anchor handling breaks the value hash."""
    from ..operators.multimodal import evaluate_robots

    media = _cached_media(
        spark, sf_dir, "robots", _robots_build, cols=("doc_id",)
    )
    rows = evaluate_robots(
        media,
        [
            ("a_private", "crawler", "/private{k}/x"),
            ("a_ok", "crawler", "/private{k}/ok/page"),
            ("a_bot", "bot{b}", "/anything"),
            ("a_open", "bot{b}", "/open"),
            ("a_opensub", "bot{b}", "/open/sub"),
        ],
    )
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "n_groups",
        "delay",
        "sitemap",
        "a_private",
        "a_ok",
        "a_bot",
        "a_open",
        "a_opensub",
    ).orderBy("doc_id")


def _tx_robots_sql() -> str:
    return """
SELECT doc_id,
       CAST(2 AS INT) AS n_groups,
       CAST(1 + doc_id % 9 AS DOUBLE) AS delay,
       'https://example.org/' || doc_id || '/sitemap.xml' AS sitemap,
       FALSE AS a_private,
       TRUE AS a_ok,
       FALSE AS a_bot,
       TRUE AS a_open,
       FALSE AS a_opensub
FROM documents ORDER BY doc_id
"""


# --- TFRecord quarantine funnel ----------------------------------------------------


def _tfrecord_quarantine_build(batches):
    """Fixture kernel for ``src_tfrecord_quarantine``: the
    ``_tfrecord_build`` shards (hashed as a dep) with docs
    ``doc_id % 7 == 3`` getting their first data byte flipped — the
    data CRC then fails deterministically, so the quarantine path
    itself is oracle-checkable."""
    for pdf in _tfrecord_build(batches):
        pdf["payload"] = [
            (p[:12] + bytes([p[12] ^ 0xFF]) + p[13:])
            if p is not None and mid % 7 == 3
            else p
            for mid, p in zip(pdf["media_id"], pdf["payload"])
        ]
        yield pdf


def src_tfrecord_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUARANTINING TFRecord ingestion (§2.11): a flipped bit in a
    100 TB shard corpus must cost one shard, never the pass —
    ``extract_tfrecord_examples_admitting`` turns each corrupt shard
    into a rejected ROW (error class, null fields).  The fixture
    corrupts a deterministic subset (``doc_id % 7 == 3``, first data
    byte flipped → data-CRC failure), so the oracle re-derives BOTH
    sides: every admitted example and ``(doc_id, 'ValueError')`` for
    the corrupted shards."""
    from ..operators.multimodal import extract_tfrecord_examples_admitting

    media = _cached_media(
        spark,
        sf_dir,
        "tfrecquar",
        _tfrecord_quarantine_build,
        deps=(_tfrecord_build,),
    )
    rows = extract_tfrecord_examples_admitting(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        F.col("error").isNull().alias("admitted"),
        "error",
        "key",
        "sno",
        F.length("txt").alias("n_chars"),
        tx.char_poly_hash(F.col("txt")).alias("txt_hash"),
    ).orderBy("doc_id", "key")


def _src_tfrecord_quarantine_sql() -> str:
    w = _TFR_SLICE
    ch = _char_hash_sql("t")
    return f"""
WITH slices AS (
  SELECT doc_id, CAST(i AS BIGINT) AS sno,
         substr(text, CAST(1 + {w} * i AS BIGINT), {w}) AS t
  FROM documents,
       unnest(range(0, (len(text) + {w - 1}) // {w})) AS ts(i)
  WHERE doc_id % 7 <> 3
)
SELECT doc_id, TRUE AS admitted, CAST(NULL AS VARCHAR) AS error,
       printf('%06d-%03d', doc_id, sno) AS key, sno,
       CAST(len(t) AS INT) AS n_chars, {ch} AS txt_hash
FROM slices
UNION ALL
SELECT doc_id, FALSE, 'ValueError', NULL, NULL, NULL, NULL
FROM documents WHERE doc_id % 7 = 3
ORDER BY doc_id, key
"""


# --- sitemaps ----------------------------------------------------------------------

_SITEMAP_SLICE = 200  # characters per generated URL entry
_SITEMAP_FREQS = ("daily", "weekly", "monthly", "yearly")


def _sitemap_build(batches):
    """Fixture for ``tx_sitemap_urls``: each document becomes one
    sitemaps.org ``urlset`` with one ``<url>`` per
    ``_SITEMAP_SLICE``-char slice — loc/lastmod/changefreq/priority
    all doc_id+index arithmetic, entities in loc (&amp;) so XML
    unescaping is on the checked path."""
    import pandas as pd

    for pdf in batches:
        payloads = []
        for did, t, source in zip(
            pdf["doc_id"], pdf["text"], pdf["source"]
        ):
            did = int(did)
            n = -(-len(t) // _SITEMAP_SLICE)
            urls = []
            for i in range(n):
                freq = _SITEMAP_FREQS[(did + i) % 4]
                urls.append(
                    "<url>"
                    f"<loc>https://example.org/{source}/{did}/p{i}"
                    f"?a={i}&amp;b={did % 7}</loc>"
                    f"<lastmod>2026-{1 + did % 12:02d}-{1 + i % 28:02d}"
                    "</lastmod>"
                    f"<changefreq>{freq}</changefreq>"
                    f"<priority>0.{(did + i) % 10}</priority>"
                    "</url>"
                )
            xml = (
                '<?xml version="1.0" encoding="UTF-8"?>\n'
                '<urlset xmlns="http://www.sitemaps.org/schemas/'
                f'sitemap/0.9">{"".join(urls)}</urlset>'
            )
            payloads.append(xml.encode("utf-8"))
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def tx_sitemap_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap ingestion (§2.11): the crawl-frontier seeding stage —
    sitemaps.org ``urlset`` documents parsed through the strict XML
    layer into per-URL rows (``extract_sitemap_urls``), entity
    unescaping and typed priority on the checked path.  The oracle
    replays every field from doc_id arithmetic."""
    from ..operators.multimodal import extract_sitemap_urls

    media = _cached_media(
        spark, sf_dir, "sitemap", _sitemap_build,
        cols=("doc_id", "text", "source"),
    )
    rows = extract_sitemap_urls(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "uno",
        "loc",
        "lastmod",
        "changefreq",
        F.round("priority", 4).alias("priority"),
    ).orderBy("doc_id", "uno")


def _tx_sitemap_sql() -> str:
    w = _SITEMAP_SLICE
    freqs = ", ".join(f"'{f}'" for f in _SITEMAP_FREQS)
    return f"""
WITH urls AS (
  SELECT doc_id, source, CAST(i AS INT) AS uno
  FROM documents,
       unnest(range(0, (len(text) + {w - 1}) // {w})) AS ts(i)
)
SELECT doc_id, uno,
       'https://example.org/' || source || '/' || doc_id || '/p' || uno
         || '?a=' || uno || '&b=' || (doc_id % 7) AS loc,
       printf('2026-%02d-%02d', 1 + doc_id % 12, 1 + uno % 28) AS lastmod,
       [{freqs}][CAST((doc_id + uno) % 4 + 1 AS INT)] AS changefreq,
       ROUND(CAST((doc_id + uno) % 10 AS DOUBLE) / 10, 4) AS priority
FROM urls ORDER BY doc_id, uno
"""


def cur_shard_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end SHARD curation (§2.11): the batch twin of
    ``streaming/shards_stream.py`` over the corrupted-shard fixture —
    admitting TFRecord decode (corrupt shards quarantined, not
    fatal), a length gate, and exact-dedup with min-(doc_id, key)
    survivors — one DataFrame plan (``admit_shard_batch``; payload
    bytes never shuffle, one fingerprint row per example moves).
    The oracle replays the whole chain in SQL: slices of the
    non-corrupted docs, length-gated, ROW_NUMBER-deduplicated on the
    exact text."""
    from ..streaming.shards_stream import admit_shard_batch

    media = _cached_media(
        spark,
        sf_dir,
        "tfrecquar",
        _tfrecord_quarantine_build,
        deps=(_tfrecord_build,),
    )
    admitted, _, _ = admit_shard_batch(media, None, min_chars=4)
    return admitted.select(
        F.col("media_id").alias("doc_id"),
        "key",
        "sno",
        "n_chars",
        F.col("fp").alias("txt_hash"),
    ).orderBy("doc_id", "key")


def _cur_shard_sql() -> str:
    w = _TFR_SLICE
    ch = _char_hash_sql("t")
    return f"""
WITH slices AS (
  SELECT doc_id, CAST(i AS BIGINT) AS sno,
         substr(text, CAST(1 + {w} * i AS BIGINT), {w}) AS t
  FROM documents,
       unnest(range(0, (len(text) + {w - 1}) // {w})) AS ts(i)
  WHERE doc_id % 7 <> 3
), gated AS (
  SELECT doc_id, sno, printf('%06d-%03d', doc_id, sno) AS key, t,
         ROW_NUMBER() OVER (
           PARTITION BY t ORDER BY doc_id, printf('%06d-%03d', doc_id, sno)
         ) AS rn
  FROM slices WHERE len(t) BETWEEN 4 AND {1 << 20}
)
SELECT doc_id, key, sno,
       CAST(len(t) AS INT) AS n_chars,
       {ch} AS txt_hash
FROM gated WHERE rn = 1 ORDER BY doc_id, key
"""


# --- quoted CSV via the native Spark reader ---------------------------------------

_CSV_P = 10  # characters per constructed-field piece


def _csv_fixture_value(text: str) -> str:
    """The constructed field value: four ``_CSV_P``-char pieces joined
    with a comma, a double quote and a LINE BREAK — every character
    class RFC-4180 quoting has to protect."""
    p = _CSV_P
    return (
        text[:p] + "," + text[p : 2 * p] + '"' + text[2 * p : 3 * p]
        + "\n" + text[3 * p : 4 * p]
    )


def _csv_escape(v: str) -> str:
    if any(c in v for c in ',"\n'):
        return '"' + v.replace('"', '""') + '"'
    return v


def src_csv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quoted-CSV ingestion through the NATIVE Spark reader (§2.11):
    where a format is engine-native, the engine's own vectorized
    source is the right tool — the capability under test is the
    ingestion recipe (multiLine quoted fields, RFC-4180 doubled-quote
    escaping, embedded commas/quotes/line breaks) and its
    at-scale shape (the fixture writes one file, but ``spark.read
    .csv`` over a directory of shards parallelizes per file/split;
    multiLine disables intra-file splitting, the documented
    trade-off).  The fixture synthesizes one CSV (once per testdata
    fingerprint, auto-versioned on builder change) whose quoted field
    embeds all three hostile character classes, derived from the
    document text so the oracle re-derives every field with plain
    string arithmetic."""
    import ast
    import hashlib
    import inspect
    import os
    import textwrap

    src_bytes = b""
    for fn in (_csv_fixture_value, _csv_escape, src_csv_scan):
        src_bytes += _code_fingerprint_src(
            ast, textwrap.dedent(inspect.getsource(fn))
        )
    ver = hashlib.sha1(src_bytes).hexdigest()[:8]
    path = _index_cache_path(sf_dir, "documents.parquet", f"csvsrc-{ver}")

    def build():
        import pyarrow.parquet as pq

        tb = pq.read_table(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "lang", "text"],
        )
        rows = sorted(
            zip(
                tb.column("doc_id").to_pylist(),
                tb.column("lang").to_pylist(),
                tb.column("text").to_pylist(),
            )
        )
        os.makedirs(path, exist_ok=True)
        out = ["doc_id,lang,val"]
        for did, lang, text in rows:
            if len(text) < 4 * _CSV_P:
                continue
            out.append(
                f"{did},{_csv_escape(str(lang))},"
                f"{_csv_escape(_csv_fixture_value(text))}"
            )
        with open(os.path.join(path, "part-0.csv"), "w") as fh:
            fh.write("\n".join(out) + "\n")

    _cached_index(path, build)
    df = (
        spark.read.option("header", True)
        .option("multiLine", True)
        .option("quote", '"')
        .option("escape", '"')
        .schema("doc_id long, lang string, val string")
        .csv(path)
    )
    return df.select(
        "doc_id",
        "lang",
        F.length("val").alias("n_chars"),
        tx.char_poly_hash(F.col("val")).alias("val_hash"),
    ).orderBy("doc_id")


def _src_csv_sql() -> str:
    p = _CSV_P
    ch = _char_hash_sql("t")
    return f"""
WITH vals AS (
  SELECT doc_id, lang,
         substr(text, 1, {p}) || ',' || substr(text, {p + 1}, {p})
         || '"' || substr(text, {2 * p + 1}, {p}) || chr(10)
         || substr(text, {3 * p + 1}, {p}) AS t
  FROM documents WHERE len(text) >= {4 * p}
)
SELECT doc_id, lang,
       CAST(len(t) AS INT) AS n_chars,
       {ch} AS val_hash
FROM vals ORDER BY doc_id
"""


# --- ICO icons ---------------------------------------------------------------------


def _ico_build(batches):
    """Fixture for ``mm_ico_pool``: each document with ≥256 text bytes
    becomes one two-entry icon — entry 0 a grayscale 8×8 PNG from the
    leading 64 bytes, entry 1 a 24-bit DIB (doubled-height header +
    AND mask) from the next 192 bytes as RGB — so both member formats
    sit in ONE container on the oracle-checked path."""
    import numpy as np
    import pandas as pd

    from ..functions.ico import write_ico

    n = _BMP_W * _BMP_H
    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            raw = t.encode("utf-8")
            if len(raw) < 4 * n:
                payloads.append(None)
                continue
            gray = np.frombuffer(raw, np.uint8, count=n).reshape(
                _BMP_H, _BMP_W
            )
            rgb = np.frombuffer(
                raw, np.uint8, count=3 * n, offset=n
            ).reshape(_BMP_H, _BMP_W, 3)
            payloads.append(write_ico([("png", gray), ("dib", rgb)]))
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def mm_ico_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ICO container decode (§2.11): a real two-format container —
    ICONDIR directory, a PNG member and a doubled-height DIB member
    with its AND mask — decoded entry-by-entry with directory-vs-
    payload dimension cross-checks (``decode_ico_stats``).  Both
    member codecs are lossless, so the oracle is exact: entry 0 must
    reproduce the document's leading 64 bytes, entry 1 the next 192,
    verbatim."""
    from ..operators.multimodal import decode_ico_stats

    media = _cached_media(spark, sf_dir, "ico", _ico_build)
    rows = decode_ico_stats(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "imgno",
        "fmt",
        "width",
        "height",
        "byte_sum",
        F.length("txt").alias("n_bytes"),
        tx.char_poly_hash(F.col("txt")).alias("txt_hash"),
    ).orderBy("doc_id", "imgno")


def _mm_ico_sql() -> str:
    n = _BMP_W * _BMP_H
    ch = _char_hash_sql("t")
    return f"""
WITH entries AS (
  SELECT doc_id, CAST(0 AS INT) AS imgno, 'png' AS fmt,
         substr(text, 1, {n}) AS t
  FROM documents WHERE len(text) >= {4 * n}
  UNION ALL
  SELECT doc_id, CAST(1 AS INT), 'dib',
         substr(text, {n + 1}, {3 * n})
  FROM documents WHERE len(text) >= {4 * n}
)
SELECT doc_id, imgno, fmt,
       CAST({_BMP_W} AS INT) AS width,
       CAST({_BMP_H} AS INT) AS height,
       CAST(list_sum(list_transform(range(1, len(t) + 1),
              i -> CAST(ascii(substr(t, CAST(i AS BIGINT), 1)) AS BIGINT)))
         AS BIGINT) AS byte_sum,
       CAST(len(t) AS INT) AS n_bytes,
       {ch} AS txt_hash
FROM entries ORDER BY doc_id, imgno
"""


# --- tensor shards (safetensors / npz) ---------------------------------------------


def _safetensors_build(batches):
    """Fixture for ``src_safetensors_scan``: each document with ≥112
    text bytes becomes one safetensors file — ``emb`` f32 (8, 8) from
    the leading 64 bytes, ``ids`` i64 (32,) from the next 32,
    ``mask`` bool (16,) (odd codes) from the next 16, ``scale`` an
    f16 SCALAR ``(doc_id %% 1000) / 4`` (f16-exact), plus a metadata
    map — four dtypes, three ranks and the metadata path all
    oracle-checked."""
    import numpy as np
    import pandas as pd

    from ..functions.tensors import write_safetensors

    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            did = int(did)
            raw = t.encode("utf-8")
            if len(raw) < 112:
                payloads.append(None)
                continue
            payloads.append(
                write_safetensors(
                    {
                        "emb": np.frombuffer(raw, np.uint8, 64)
                        .reshape(8, 8)
                        .astype("<f4"),
                        "ids": np.frombuffer(
                            raw, np.uint8, 32, offset=64
                        ).astype("<i8"),
                        "mask": np.frombuffer(
                            raw, np.uint8, 16, offset=96
                        )
                        % 2
                        == 1,
                        "scale": np.float16((did % 1000) / 4),
                    },
                    metadata={"doc": str(did), "fmt": "fixture"},
                )
            )
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def src_safetensors_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """safetensors ingestion (§2.11): the modern checkpoint /
    feature-shard format — 8-byte header length, JSON tensor table,
    offset-tiled little-endian buffers (gaps/overlaps rejected: the
    format's safety property) — scanned into per-file stats
    (``extract_safetensors_stats``).  The oracle re-derives every
    stat from the document bytes and doc_id arithmetic."""
    from ..operators.multimodal import extract_safetensors_stats

    media = _cached_media(
        spark, sf_dir, "safetensors", _safetensors_build
    )
    rows = extract_safetensors_stats(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "n_tensors",
        "meta_doc",
        F.round("emb_sum", 4).alias("emb_sum"),
        "ids_sum",
        "mask_cnt",
        F.round("scale", 4).alias("scale"),
    ).orderBy("doc_id")


def _src_safetensors_sql() -> str:
    def codes(start, n):
        return (
            f"list_transform(range({start}, {start + n}), "
            f"i -> CAST(ascii(substr(text, CAST(i AS BIGINT), 1)) AS BIGINT))"
        )

    return f"""
SELECT doc_id,
       CAST(4 AS INT) AS n_tensors,
       CAST(doc_id AS VARCHAR) AS meta_doc,
       ROUND(CAST(list_sum({codes(1, 64)}) AS DOUBLE), 4) AS emb_sum,
       CAST(list_sum({codes(65, 32)}) AS BIGINT) AS ids_sum,
       CAST(len(list_filter({codes(97, 16)}, c -> c % 2 = 1)) AS INT)
         AS mask_cnt,
       ROUND(CAST(doc_id % 1000 AS DOUBLE) / 4, 4) AS scale
FROM documents WHERE len(text) >= 112 ORDER BY doc_id
"""


def _npz_build(batches):
    """Fixture for ``src_npz_scan``: each document with ≥84 text bytes
    becomes one ``.npz`` — ``a`` u1 (48,) raw codes, ``b`` i2 (24,)
    ``3*code - 200`` (negative i2 path), ``c`` f4 (12,)
    ``code + 0.5`` — three dtypes through the .npy header +
    store-method ZIP composition."""
    import numpy as np
    import pandas as pd

    from ..functions.tensors import write_npz

    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            raw = t.encode("utf-8")
            if len(raw) < 84:
                payloads.append(None)
                continue
            a = np.frombuffer(raw, np.uint8, 48)
            b = (
                3 * np.frombuffer(raw, np.uint8, 24, offset=48)
                .astype("<i2")
                - 200
            )
            c = (
                np.frombuffer(raw, np.uint8, 12, offset=72)
                .astype("<f4")
                + 0.5
            )
            payloads.append(write_npz({"a": a, "b": b, "c": c}))
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def src_npz_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NumPy ``.npz`` ingestion (§2.11): the ad-hoc tensor-dump format
    (the REFERENCE's own storage layer — ``asip_v2/archive.py`` saves
    scene tensors as .npz) made a first-class source: ZIP-of-.npy
    members, literal-eval header parsing, three dtypes incl. the
    negative-int16 path (``extract_npz_stats``).  The oracle
    re-derives every stat from the document bytes."""
    from ..operators.multimodal import extract_npz_stats

    media = _cached_media(spark, sf_dir, "npz", _npz_build)
    rows = extract_npz_stats(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "n_arrays",
        "a_sum",
        "b_sum",
        F.round("c_sum", 4).alias("c_sum"),
    ).orderBy("doc_id")


def _src_npz_sql() -> str:
    def codes(start, n):
        return (
            f"list_transform(range({start}, {start + n}), "
            f"i -> CAST(ascii(substr(text, CAST(i AS BIGINT), 1)) AS BIGINT))"
        )

    return f"""
SELECT doc_id,
       CAST(3 AS INT) AS n_arrays,
       CAST(list_sum({codes(1, 48)}) AS BIGINT) AS a_sum,
       CAST(list_sum(list_transform({codes(49, 24)}, c -> 3 * c - 200))
         AS BIGINT) AS b_sum,
       ROUND(CAST(list_sum({codes(73, 12)}) AS DOUBLE) + 6, 4) AS c_sum
FROM documents WHERE len(text) >= 84 ORDER BY doc_id
"""


# --- Arrow IPC streams -------------------------------------------------------------

_ARROW_SLICE = 80  # characters per record
_ARROW_BATCH = 3  # records per IPC batch


def _arrow_ipc_build(batches):
    """Fixture for ``src_arrow_ipc_scan``: each document becomes one
    Arrow IPC stream of ``(sno, txt, score)`` records —
    ``_ARROW_SLICE``-char slices, ``score = sno + 0.25`` — split into
    ``_ARROW_BATCH``-record batches so multi-batch streams are on the
    checked path."""
    import pandas as pd
    import pyarrow as pa

    schema = pa.schema(
        [("sno", pa.int64()), ("txt", pa.string()), ("score", pa.float64())]
    )
    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            recs = [
                (sno, t[i : i + _ARROW_SLICE], sno + 0.25)
                for sno, i in enumerate(
                    range(0, len(t), _ARROW_SLICE)
                )
            ]
            if not recs:
                payloads.append(None)
                continue
            sink = pa.BufferOutputStream()
            with pa.ipc.new_stream(sink, schema) as w:
                for at in range(0, len(recs), _ARROW_BATCH):
                    chunk = recs[at : at + _ARROW_BATCH]
                    w.write_batch(
                        pa.record_batch(
                            [
                                pa.array([r[0] for r in chunk], pa.int64()),
                                pa.array([r[1] for r in chunk], pa.string()),
                                pa.array([r[2] for r in chunk], pa.float64()),
                            ],
                            schema=schema,
                        )
                    )
            payloads.append(sink.getvalue().to_pybytes())
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def src_arrow_ipc_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow IPC stream ingestion (§2.11): the zero-copy interchange
    format feature pipelines hand around, read back through the SAME
    Arrow runtime Spark's Python boundary uses
    (``extract_arrow_ipc_rows``) — multi-batch streams, three typed
    columns.  The oracle re-derives every record (slice text, batch
    and row counts, the dyadic score) from `documents`."""
    from ..operators.multimodal import extract_arrow_ipc_rows

    media = _cached_media(spark, sf_dir, "arrowipc", _arrow_ipc_build)
    rows = extract_arrow_ipc_rows(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "n_batches",
        "n_rows",
        "sno",
        F.length("txt").alias("n_chars"),
        tx.char_poly_hash(F.col("txt")).alias("txt_hash"),
        F.round("score", 4).alias("score"),
    ).orderBy("doc_id", "sno")


def _src_arrow_ipc_sql() -> str:
    w, b = _ARROW_SLICE, _ARROW_BATCH
    ch = _char_hash_sql("t")
    return f"""
WITH slices AS (
  SELECT doc_id, CAST(i AS BIGINT) AS sno,
         substr(text, CAST(1 + {w} * i AS BIGINT), {w}) AS t,
         (len(text) + {w - 1}) // {w} AS nr
  FROM documents,
       unnest(range(0, (len(text) + {w - 1}) // {w})) AS ts(i)
)
SELECT doc_id,
       CAST((nr + {b - 1}) // {b} AS INT) AS n_batches,
       CAST(nr AS BIGINT) AS n_rows,
       sno,
       CAST(len(t) AS INT) AS n_chars,
       {ch} AS txt_hash,
       ROUND(CAST(sno AS DOUBLE) + 0.25, 4) AS score
FROM slices ORDER BY doc_id, sno
"""


# --- legacy rasters (TGA / PGM / PPM funnel) --------------------------------------


def _raster_build(batches):
    """Fixture for ``mm_raster_funnel``: docs with ≥192 text bytes
    rotate by ``doc_id % 3`` — 0: 8×8 24-bit TGA (RLE + bottom-up for
    even halves of that class, plain top-down otherwise), 1: 8×8 PGM
    from 64 bytes, 2: 8×8 PPM from 192 bytes — three lossless formats
    through one magic dispatch."""
    import numpy as np
    import pandas as pd

    from ..functions.rasters import write_pnm, write_tga

    n = _BMP_W * _BMP_H
    for pdf in batches:
        payloads = []
        for did, t in zip(pdf["doc_id"], pdf["text"]):
            did = int(did)
            raw = t.encode("utf-8")
            if len(raw) < 3 * n:
                payloads.append(None)
                continue
            v = did % 3
            if v == 0:
                rgb = np.frombuffer(raw, np.uint8, 3 * n).reshape(
                    _BMP_H, _BMP_W, 3
                )
                payloads.append(
                    write_tga(
                        rgb,
                        rle=did % 6 == 0,
                        top_down=did % 6 != 0,
                    )
                )
            elif v == 1:
                payloads.append(
                    write_pnm(
                        np.frombuffer(raw, np.uint8, n).reshape(
                            _BMP_H, _BMP_W
                        )
                    )
                )
            else:
                payloads.append(
                    write_pnm(
                        np.frombuffer(raw, np.uint8, 3 * n).reshape(
                            _BMP_H, _BMP_W, 3
                        )
                    )
                )
        yield pd.DataFrame(
            {"media_id": pdf["doc_id"], "payload": payloads}
        )


def mm_raster_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Legacy-raster funnel (§2.11): TGA (plain/RLE, both origins) and
    netpbm PGM/PPM — the long-tail formats of scraped archives —
    magic-dispatched into one lossless decode
    (``decode_raster_stats``).  Exact oracle: every variant must
    reproduce its document's leading bytes verbatim."""
    from ..operators.multimodal import decode_raster_stats

    media = _cached_media(spark, sf_dir, "raster", _raster_build)
    rows = decode_raster_stats(media)
    return rows.select(
        F.col("media_id").alias("doc_id"),
        "fmt",
        "width",
        "height",
        "channels",
        "byte_sum",
        F.length("txt").alias("n_bytes"),
        tx.char_poly_hash(F.col("txt")).alias("txt_hash"),
    ).orderBy("doc_id")


def _mm_raster_sql() -> str:
    n = _BMP_W * _BMP_H
    ch = _char_hash_sql("t")
    return f"""
WITH imgs AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'tga' WHEN 1 THEN 'pgm'
              ELSE 'ppm' END AS fmt,
         CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 3 END AS channels,
         substr(text, 1,
                CASE WHEN doc_id % 3 = 1 THEN {n} ELSE {3 * n} END) AS t
  FROM documents WHERE len(text) >= {3 * n}
)
SELECT doc_id, fmt,
       CAST({_BMP_W} AS INT) AS width,
       CAST({_BMP_H} AS INT) AS height,
       CAST(channels AS INT) AS channels,
       CAST(list_sum(list_transform(range(1, len(t) + 1),
              i -> CAST(ascii(substr(t, CAST(i AS BIGINT), 1)) AS BIGINT)))
         AS BIGINT) AS byte_sum,
       CAST(len(t) AS INT) AS n_bytes,
       {ch} AS txt_hash
FROM imgs ORDER BY doc_id
"""


REGISTRY = {
    "dd_exact": (dd_exact, DD_EXACT_SQL),
    "dd_duplicate_spans": (dd_duplicate_spans, DD_SPANS_SQL),
    "dd_span_removal": (dd_span_removal, DD_SPAN_REMOVAL_SQL),
    "tx_bpe_pairs": (tx_bpe_pairs, TX_BPE_SQL),
    "tx_bpe_encode": (tx_bpe_encode, _bpe_encode_sql()),
    "tx_tokenize_pack": (tx_tokenize_pack, _tokenize_pack_sql()),
    "tx_type_token_ratio": (tx_type_token_ratio, TX_TTR_SQL),
    "sk_cms_top_tokens": (sk_cms_top_tokens, _sk_cms_sql()),
    "sk_hll_distinct": (sk_hll_distinct, _sk_hll_sql()),
    "sk_hll_by_group": (sk_hll_by_group, _sk_hll_by_sql()),
    "sk_quantile_histogram": (sk_quantile_histogram, _sk_hist_sql()),
    "sk_quantile_by_group": (sk_quantile_by_group, _sk_hist_by_sql()),
    "tx_zipf_slope": (tx_zipf_slope, TX_ZIPF_SQL),
    "dd_semantic_text": (dd_semantic_text, DD_SEMANTIC_TEXT_SQL),
    "dd_embedding_neardup": (dd_embedding_neardup, DD_EMB_SQL),
    "dd_jaccard_pairs": (dd_jaccard_pairs, DD_JACCARD_SQL),
    "dd_minhash_lsh": (dd_minhash_lsh, _minhash_sql()),
    "dd_incremental": (dd_incremental, _incremental_sql()),
    "dd_cluster": (dd_cluster, _cluster_sql()),
    "dd_cluster_best": (dd_cluster_best, _cluster_best_sql()),
    "ds_contrastive_pairs": (ds_contrastive_pairs, _contrastive_sql()),
    "sp_group_quota": (sp_group_quota, _sp_quota_sql()),
    "sp_stratified": (sp_stratified, _sp_strat_sql()),
    "sp_mixture": (sp_mixture, _sp_mix_sql()),
    "sp_temperature_mixture": (sp_temperature_mixture, _sp_temp_sql()),
    "sp_salted_agg": (sp_salted_agg, SP_SALTED_SQL),
    "dc_contamination": (dc_contamination, _dc_sql()),
    "dc_bloom_prefilter": (dc_bloom_prefilter, _dc_sql()),
    "dc_fuzzy_contamination": (dc_fuzzy_contamination, _dc_fuzzy_sql()),
    "tx_classifier_score": (tx_classifier_score, _clf_sql()),
    "cur_pipeline": (cur_pipeline, _cur_sql()),
    "cur_pipeline_v2": (cur_pipeline_v2, _cur_v2_sql()),
    "cur_funnel": (cur_funnel, _cur_funnel_sql()),
    "tx_length_quantiles": (tx_length_quantiles, _tx_quant_sql()),
    "tx_top_tokens": (tx_top_tokens, TX_TOP_SQL),
    "tx_normalize_redact": (tx_normalize_redact, _tx_norm_sql()),
    "tx_gopher_rules": (tx_gopher_rules, TX_GOPHER_SQL),
    "tx_chunking": (tx_chunking, TX_CHUNK_SQL),
    "tx_packing": (tx_packing, _tx_packing_sql()),
    "dd_simhash": (dd_simhash, _simhash_sql()),
    "dd_simhash_pairs": (dd_simhash_pairs, _simhash_pairs_sql()),
    "sim_topk_cosine": (sim_topk_cosine, SIM_TOPK_SQL),
    "sim_ivf_adc": (sim_ivf_adc, SIM_IVF_ADC_SQL),
    "sim_ivf_pq": (sim_ivf_pq, SIM_IVF_PQ_SQL),
    "sim_ivf_pq_serve": (sim_ivf_pq_serve, SIM_IVF_PQ_SQL),
    "ds_dsir_select": (ds_dsir_select, _dsir_sql()),
    "ds_dsir_resample": (ds_dsir_resample, _dsir_resample_sql()),
    "sim_ann_lsh": (sim_ann_lsh, _ann_lsh_sql()),
    "sim_ann_lsh_tables": (sim_ann_lsh_tables, _ann_lsh_tables_sql()),
    "sim_label_centroids": (sim_label_centroids, SIM_CENTROIDS_SQL),
    "sim_centroid_assign": (sim_centroid_assign, SIM_ASSIGN_SQL),
    "sim_random_projection": (sim_random_projection, _rand_proj_sql()),
    "tx_bm25_search": (tx_bm25_search, _bm25_sql()),
    "tx_bm25_indexed": (tx_bm25_indexed, _bm25_indexed_sql()),
    "tx_bm25_serve": (tx_bm25_serve, _bm25_indexed_sql()),
    "sim_quantize_int8": (sim_quantize_int8, SIM_QUANT_SQL),
    "sp_weighted_sample": (sp_weighted_sample, _sp_weighted_sql()),
    "sp_token_budget": (sp_token_budget, _sp_token_budget_sql()),
    "tx_top_quality_per_lang": (tx_top_quality_per_lang, _top_quality_sql()),
    "dd_semantic": (dd_semantic, DD_SEMANTIC_SQL),
    "tx_token_stats": (tx_token_stats, TX_TOKEN_SQL),
    "tx_langid": (tx_langid, _langid_sql()),
    "tx_quality": (tx_quality, TX_QUALITY_SQL),
    "tx_quality_gate": (tx_quality_gate, TX_QGATE_SQL),
    "tx_fingerprint": (tx_fingerprint, TX_FP_SQL),
    "mm_byte_features": (mm_byte_features, MM_SQL),
    "mm_raw_pool": (mm_raw_pool, _mm_raw_sql()),
    "mm_frame_sample": (mm_frame_sample, _mm_frames_sql()),
    "mm_window_rms": (mm_window_rms, _mm_rms_sql()),
    "mm_wav_rms": (mm_wav_rms, _mm_wav_sql()),
    "mm_bmp_pool": (mm_bmp_pool, _mm_bmp_sql()),
    "mm_png_pool": (mm_png_pool, _mm_bmp_sql()),
    "mm_gif_pool": (mm_gif_pool, _mm_bmp_sql()),
    "mm_jpeg_pool": (mm_jpeg_pool, _mm_jpeg_sql()),
    "mm_jpeg_progressive": (mm_jpeg_progressive, _mm_jpeg_prog_sql()),
    "mm_wav_dft": (mm_wav_dft, _mm_wav_dft_sql()),
    "mm_mkv_demux": (mm_mkv_demux, _mm_mkv_sql()),
    "mm_mkv_jpeg_pool": (mm_mkv_jpeg_pool, _mm_mkv_jpeg_sql()),
    "mm_flac_rms": (mm_flac_rms, _mm_flac_sql()),
    "mm_mkv_flac_rms": (mm_mkv_flac_rms, _mm_mkv_flac_sql()),
    "gr_pagerank": (gr_pagerank, _gr_pagerank_sql()),
    "gr_pagerank_weighted": (gr_pagerank_weighted, _gr_pagerank_sql(True)),
    "gr_pagerank_incremental": (
        gr_pagerank_incremental,
        _gr_pagerank_incr_sql(),
    ),
    "mm_audio_curation": (mm_audio_curation, _mm_audio_curation_sql()),
    "mm_audio_incremental": (mm_audio_incremental, _mm_audio_incremental_sql()),
    "mm_gif_frames": (mm_gif_frames, _mm_gif_frames_sql()),
    "mm_id3_tags": (mm_id3_tags, _mm_id3_sql()),
    "mm_mp3_meta": (mm_mp3_meta, _mm_mp3_sql()),
    "mm_mp3_rms": (mm_mp3_rms, _mm_mp3_rms_sql()),
    "mm_mp3_stereo_rms": (mm_mp3_stereo_rms, _mm_mp3_rms_sql(2)),
    "mm_mkv_mp3_rms": (
        mm_mkv_mp3_rms,
        _mm_mp3_rms_sql(1, "(1 + n_bytes % 3)"),
    ),
    "mm_mp3_ms_rms": (mm_mp3_ms_rms, _mm_mp3_rms_sql(2, ms=True)),
    "mm_mp3_intensity_rms": (
        mm_mp3_intensity_rms,
        _mm_mp3_rms_sql(2, intensity=True),
    ),
    "mm_mp3_general": (mm_mp3_general, _mm_mp3_general_sql()),
    "mm_audio_multicodec": (mm_audio_multicodec, _mm_audio_multicodec_sql()),
    "mm_audio_multicodec3": (
        mm_audio_multicodec3,
        _mm_audio_multicodec3_sql(),
    ),
    "mm_audio_quarantine": (
        mm_audio_quarantine,
        _mm_audio_quarantine_sql(),
    ),
    "mm_image_quarantine": (
        mm_image_quarantine,
        _mm_image_quarantine_sql(),
    ),
    "tx_bigram_lm": (tx_bigram_lm, _bigram_lm_sql()),
    "ds_leakage_safe_split": (ds_leakage_safe_split, _leakage_split_sql()),
    "tx_warc_extract": (tx_warc_extract, _tx_warc_sql()),
    "cur_warc_pipeline": (cur_warc_pipeline, _cur_warc_sql()),
    "tx_warc_quarantine": (tx_warc_quarantine, _tx_warc_quarantine_sql()),
    "mm_mp4_demux": (mm_mp4_demux, _mm_mp4_sql()),
    "mm_ogg_flac_rms": (mm_ogg_flac_rms, _mm_mkv_flac_sql()),
    "mm_webdataset_shard": (mm_webdataset_shard, _mm_wds_sql()),
    "mm_tiff_pool": (mm_tiff_pool, _mm_bmp_sql()),
    "mm_audio_multicodec4": (
        mm_audio_multicodec4,
        _mm_audio_multicodec4_sql(),
    ),
    "tx_url_canonical": (tx_url_canonical, _tx_url_canonical_sql()),
    "gr_crawl_pagerank": (gr_crawl_pagerank, _gr_crawl_pagerank_sql()),
    "tx_zip_extract": (tx_zip_extract, _tx_zip_sql()),
    "tx_compress_funnel": (tx_compress_funnel, _tx_compress_sql()),
    "src_avro_scan": (src_avro_scan, _src_avro_sql()),
    "tx_pdf_extract": (tx_pdf_extract, _tx_pdf_sql()),
    "tx_wiki_extract": (tx_wiki_extract, _tx_wiki_sql()),
    "src_tfrecord_scan": (src_tfrecord_scan, _src_tfrecord_sql()),
    "src_msgpack_scan": (src_msgpack_scan, _src_msgpack_sql()),
    "tx_epub_extract": (tx_epub_extract, _tx_epub_sql()),
    "tx_subtitle_extract": (tx_subtitle_extract, _tx_subtitle_sql()),
    "mm_avi_mjpeg_pool": (mm_avi_mjpeg_pool, _mm_avi_jpeg_sql()),
    "mm_jpeg_exif": (mm_jpeg_exif, _mm_jpeg_exif_sql()),
    "mm_qoi_pool": (mm_qoi_pool, _mm_qoi_sql()),
    "tx_docx_extract": (tx_docx_extract, _tx_docx_sql()),
    "tx_markdown_extract": (tx_markdown_extract, _tx_markdown_sql()),
    "mm_webp_pool": (mm_webp_pool, _mm_webp_sql()),
    "tx_robots_rules": (tx_robots_rules, _tx_robots_sql()),
    "src_tfrecord_quarantine": (
        src_tfrecord_quarantine,
        _src_tfrecord_quarantine_sql(),
    ),
    "tx_sitemap_urls": (tx_sitemap_urls, _tx_sitemap_sql()),
    "cur_shard_pipeline": (cur_shard_pipeline, _cur_shard_sql()),
    "src_csv_scan": (src_csv_scan, _src_csv_sql()),
    "mm_ico_pool": (mm_ico_pool, _mm_ico_sql()),
    "src_safetensors_scan": (
        src_safetensors_scan,
        _src_safetensors_sql(),
    ),
    "src_npz_scan": (src_npz_scan, _src_npz_sql()),
    "src_arrow_ipc_scan": (src_arrow_ipc_scan, _src_arrow_ipc_sql()),
    "mm_raster_funnel": (mm_raster_funnel, _mm_raster_sql()),
    "mm_jpeg_lossless_pool": (mm_jpeg_lossless_pool, _mm_bmp_sql()),
    "mm_mp4_mp3_rms": (
        mm_mp4_mp3_rms,
        _mm_mp3_rms_sql(1, "(1 + n_bytes % 3)"),
    ),
}
