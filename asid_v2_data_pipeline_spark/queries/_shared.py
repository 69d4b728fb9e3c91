"""Shared infrastructure for the §2.11 query families: the
serving-index / media-fixture caches (build once per testdata+code
fingerprint, outside timed paths), the byte-bounded Arrow read, and
the SQL fragments every oracle builder composes.  Split out of the
former queries/scale.py (VERDICT r10 task 3)."""

from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession
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
            "functions/vorbis.py",
            "functions/opus.py",
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


def _quality_expr_sql(t: str = "text") -> str:
    """quality_score as one SQL expression (explicit DOUBLE casts — no
    DECIMAL creep; mirrors functions.text.quality_score op-for-op)."""
    alpha = f"LENGTH(regexp_replace({t}, '[^A-Za-z]', '', 'g'))"
    punct = f"LENGTH(regexp_replace({t}, '[^.,;:!?]', '', 'g'))"
    ar = f"(CASE WHEN LENGTH({t}) > 0 THEN CAST({alpha} AS DOUBLE) / LENGTH({t}) ELSE 0.0 END)"
    pr = f"(CASE WHEN LENGTH({t}) > 0 THEN CAST({punct} AS DOUBLE) / LENGTH({t}) ELSE 0.0 END)"
    ok = f"(CASE WHEN len({TOKENS_SQL}) >= 5 AND len({TOKENS_SQL}) <= 5000 THEN 1.0 ELSE 0.5 END)"
    return f"({ar} * 0.5 + (1 - LEAST({pr} * 5, 1.0)) * 0.25 + {ok} * 0.25)"


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


def _parallel(
    d: DataFrame, key: str = "doc_id", cols: tuple[str, ...] | None = None
) -> DataFrame:
    """Scan-parallelism hop for the compute-heavy query families (r13,
    guide §2.5 "one huge unsplittable file"): every driver testdata
    table is ONE parquet file with ONE row group → one input split, so
    all narrow scan-stage work — tokenize, char hashing, quality
    regexes, classifier/vector folds, Arrow kernels — would serialize
    onto a single core at every SF.  Hash-repartition on the (dense,
    unique) id spreads rows near-uniformly and deterministically;
    results are row-set identical, only placement changes.

    ``cols`` (r14, VERDICT r13 item 6 / guide §2.3 "project before the
    exchange"): the columns the downstream pipeline actually consumes —
    the hop's exchange then carries ONLY those, never the full row (at
    100 TB an unprojected hop would shuffle every payload byte before
    any narrowing; callers that genuinely need every column pass
    ``None``).  Scale-adaptive: the session's defaultParallelism, never
    a constant — the driver's lower-core bench runs resize it
    automatically, and at production scale (inputs already in many
    splits) a pipeline drops this hop entirely."""
    import os

    if cols is not None:
        d = d.select(*cols)
    if os.environ.get("SPARK_GRAFT_NO_PARALLEL_HOP"):  # A/B escape hatch
        return d
    sp = d.sparkSession
    return d.repartition(sp.sparkContext.defaultParallelism, key)

REGISTRY: dict = {}
