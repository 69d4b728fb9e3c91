"""Lexical retrieval scoring (BM25) — the inverted-index complement to the
vector tier (`operators/similarity.py`).

For a *query-time* term set (a handful of tokens), the classic
index-lookup shape inverts: instead of exploding the corpus into a
(doc, token) posting table and shuffling it, each document counts the
query terms inside its own token array (``size(filter(...))`` per term) —
a narrow map over the corpus, zero shuffle, no explode.  Corpus
statistics (N, avgdl, per-term document frequency) reduce to ONE
aggregate row, broadcast back for scoring; ranking ends in
TakeOrderedAndProject.  At 100 TB that is: one scan + one scalar agg +
one scan-local score pass.

For *offline* all-terms scoring (building a static index), the explode →
groupBy posting-list form is the right shape instead; ``posting_lists``
provides it.

Okapi BM25 (Robertson et al.): idf(t) = ln((N - df + ½)/(df + ½) + 1),
score = Σ idf · tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)).
"""

from __future__ import annotations

import struct

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def spark_string_hash(s: str, seed: int = 42) -> int:
    """Driver-side replica of Spark's ``F.hash`` on a StringType column
    (Murmur3 x86_32 over the UTF-8 bytes with Spark's seed and its
    per-byte tail mixing) — lets the serving path compute a query
    term's partition bucket WITHOUT launching a Spark job (profiled at
    ~0.35 s per ``tx_bm25_serve`` call in round 8, pure job-dispatch
    overhead for a 4-row hash).  Equality with ``F.hash`` is pinned in
    tests/test_retrieval_index.py over fixed unicode cases and random
    strings; any Spark-side change breaks that test, not silently the
    pruning."""
    data = s.encode("utf-8")
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h1 = seed & 0xFFFFFFFF

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (32 - r))) & 0xFFFFFFFF

    def mix(h1: int, k1: int) -> int:
        k1 = rotl((k1 * c1) & 0xFFFFFFFF, 15) * c2 & 0xFFFFFFFF
        return (rotl(h1 ^ k1, 13) * 5 + 0xE6546B64) & 0xFFFFFFFF

    n4 = len(data) // 4 * 4
    for i in range(0, n4, 4):
        h1 = mix(h1, struct.unpack_from("<i", data, i)[0] & 0xFFFFFFFF)
    for i in range(n4, len(data)):
        b = data[i] - 256 if data[i] >= 128 else data[i]  # signed byte
        h1 = mix(h1, b & 0xFFFFFFFF)
    h1 ^= len(data)
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & 0xFFFFFFFF
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & 0xFFFFFFFF
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def _tf(arr: Column, term: str) -> Column:
    return F.size(F.filter(arr, lambda x: x == F.lit(term)))


def posting_lists(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Offline inverted-index shape: (token, doc, tf) posting table —
    explode + one groupBy; partition by token for index serving."""
    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    )
    return toks.groupBy("token", id_col).agg(F.count(F.lit(1)).alias("tf"))


def build_bm25_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    materialize: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """The serving-index pair for ``bm25_scores_indexed``:

    - postings ``(token, doc, tf, _dl)`` — the posting table denormalized
      with the document length, so query-time scoring needs NO corpus
      join at all (the standard BM25 index layout; at 100 TB write it
      partitioned by a hash of ``token`` for query-term pruning);
    - stats — ONE row ``(_n, _avgdl)``.

    The document length rides THROUGH the explode as a grouping column
    (it is functionally dependent on the doc id), so the build is one
    tokenize scan + one groupBy shuffle — the round-6 shape
    (``posting_lists`` ⋈ lens) paid a second tokenize scan and a
    doc-keyed shuffle join for the same rows (the r7 profiling item,
    PLANS.md "Round-7 tx_bm25_indexed").

    r14 (VERDICT r13 item 1): BOTH outputs now derive from ONE tokenized
    projection ``(id, _dl, _toks)`` — pre-r14 ``stats`` re-tokenized the
    corpus through a second ``tokens()`` scan.  With ``materialize=True``
    that projection is ``localCheckpoint``-ed, so an in-query build pays
    the tokenize pass EXACTLY ONCE even though postings and stats
    materialize in different jobs (the ``matched`` checkpoint inside
    ``bm25_scores_indexed`` vs the final scoring job).  Default off:
    callers that write the index out (``write_bm25_index``) materialize
    both outputs in one job anyway and should not pay a third
    token-array copy.
    """
    # coalesce: size(tokens(NULL)) is NULL, which avg() would SKIP while
    # count() counts the row — _avgdl and _n would then disagree about
    # the doc set and the closed-form append update could never match a
    # rebuild.  NULL text = zero-length document, consistently.
    tok = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    ).select(
        F.col(id_col),
        F.coalesce(F.size("_toks"), F.lit(0)).alias("_dl"),
        "_toks",
    )
    if materialize:
        tok = tok.localCheckpoint()
    postings = (
        tok.select(F.col(id_col), "_dl", F.explode("_toks").alias("token"))
        .groupBy("token", id_col, "_dl")
        .agg(F.count(F.lit(1)).alias("tf"))
        .select("token", id_col, "tf", "_dl")
    )
    stats = tok.agg(
        F.count(F.lit(1)).alias("_n"), F.avg("_dl").alias("_avgdl")
    )
    return postings, stats


def bm25_scores_indexed(
    postings: DataFrame,
    stats: DataFrame | tuple[int, float],
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    materialize: bool = True,
) -> DataFrame:
    """Score against a prebuilt inverted index (``build_bm25_index``) —
    the query path when the corpus is indexed offline: the (tiny) query
    term set broadcast-EQUI-JOINS the posting table on ``token``
    (partition-pruned to the query terms' postings at scale), per-term
    document frequencies come from one groupBy over those matched
    postings, and the final per-doc sum shuffles only candidate rows
    (Σ df(term) of them), never the corpus.

    Returns (id, score) for every doc matching ≥ 1 term — identical
    scores to ``bm25_scores`` on those docs (equality pinned in
    tests/test_retrieval_index.py; ``bm25_scores`` gives non-matching
    docs an explicit 0).  Duplicate query terms contribute once per
    occurrence, like the no-explode path.

    ``matched`` feeds BOTH the per-term df aggregation and the scoring
    join; ``materialize`` (default on) localCheckpoints it — candidate
    rows only, small — so a LAZY ``postings`` plan (an in-query index
    build) executes once, not once per consumer.  With postings read
    from a persisted index table the checkpoint is merely a small
    cache either way.

    ``stats`` is either the one-row (_n, _avgdl) DataFrame (lazy
    plans: in-query builds, incremental twins) or a plain
    ``(n, avgdl)`` tuple — the serving path has already fetched the
    stats row to the driver, and literals skip a broadcast exchange
    per query."""
    if not terms:
        raise ValueError("empty query term set")
    from collections import Counter

    sp = postings.sparkSession
    q = sp.createDataFrame(
        [(t, c) for t, c in Counter(terms).items()], "token string, _w int"
    )
    matched = postings.join(F.broadcast(q), "token")
    if materialize:
        matched = matched.localCheckpoint()
    dfs = matched.groupBy("token").agg(F.count(F.lit(1)).alias("_df"))
    if isinstance(stats, tuple):
        n_lit, avgdl_lit = stats
        n_col = F.lit(float(n_lit))
        avgdl_col = F.lit(float(avgdl_lit))
    else:
        n_col, avgdl_col = F.col("_n"), F.col("_avgdl")
    idf = F.log(
        (n_col - F.col("_df") + F.lit(0.5))
        / (F.col("_df") + F.lit(0.5))
        + F.lit(1.0)
    )
    part = (
        F.col("_w")
        * idf
        * (
            F.col("tf")
            * F.lit(k1 + 1.0)
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / avgdl_col)
            )
        )
    )
    scored = matched.join(F.broadcast(dfs), "token")
    if not isinstance(stats, tuple):
        scored = scored.crossJoin(F.broadcast(stats))
    return (
        scored.select(F.col(id_col), part.alias("_p"))
        .groupBy(id_col)
        .agg(F.sum("_p").alias("score"))
    )


def write_bm25_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> None:
    """Persist the serving index: postings partitioned by token-hash
    bucket (``_tb = pmod(hash(token), n_buckets)``) plus the one-row
    stats table.  A query then reads ONLY its terms' buckets — static
    partition pruning over ``n_buckets`` directories (asserted in
    tests/test_retrieval_index.py) — instead of the full posting table.
    ``n_buckets`` sizes the pruning granularity: at 100 TB pick it so a
    bucket is a few files (e.g. 4096).  The bucket count is stored with
    the index (stats row), so the query side picks it up automatically
    and a conflicting explicit value raises."""
    postings, stats = build_bm25_index(docs, id_col, text_col)
    # reserved _bid=-2 marks the bootstrap build (ad-hoc appends use -1,
    # streaming batch ids start at 0) — the same replay-idempotency
    # layout as write_ivf_index's cells table
    p = postings.withColumn(
        "_tb", F.pmod(F.hash("token"), F.lit(n_buckets))
    ).withColumn("_bid", F.lit(-2))
    (
        p.repartition(F.col("_tb"))
        .write.mode("overwrite")
        .partitionBy("_tb", "_bid")
        .parquet(f"{path}/postings")
    )
    # stats carries n_buckets too: the index is self-describing, so the
    # query side cannot silently prune with a different bucket count
    # than the writer used (which would drop matching postings);
    # _last_bid records the most recent append's batch id for replay
    # detection
    stats.withColumn("_n_buckets", F.lit(n_buckets)).withColumn(
        "_last_bid", F.lit(-2)
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/stats")


def bm25_scores_persisted(
    spark,
    path: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    n_buckets: int | None = None,
) -> DataFrame:
    """``bm25_scores_indexed`` against the PERSISTED index written by
    ``write_bm25_index``: the query terms' hash buckets are computed
    DRIVER-SIDE (``spark_string_hash``, the pinned Murmur3 replica of
    ``F.hash`` — round 8 profiling measured ~0.35 s of pure
    job-dispatch overhead for the previous 4-row hash job) and pushed
    as a static ``_tb IN (...)`` partition filter, so the postings
    scan touches only those buckets' files.  The one-row stats table
    is fetched ONCE and scoring runs with (n, avgdl) literals — no
    per-query broadcast exchange.  Scoring is then the usual broadcast
    equi-join on token — candidate rows only.

    ``n_buckets=None`` (default) reads the bucket count STORED with the
    index; an explicit value that disagrees raises instead of silently
    pruning away matching postings."""
    if not terms:
        raise ValueError("empty query term set")
    spark.catalog.refreshByPath(f"{path}/stats")
    row = spark.read.parquet(f"{path}/stats").first()
    stored = row["_n_buckets"]
    if n_buckets is None:
        n_buckets = stored
    elif n_buckets != stored:
        raise ValueError(
            f"index at {path} was written with n_buckets={stored}, "
            f"query asked for {n_buckets}: pruning would drop postings"
        )
    buckets = sorted({spark_string_hash(t) % n_buckets for t in terms})
    spark.catalog.refreshByPath(f"{path}/postings")
    postings = (
        spark.read.parquet(f"{path}/postings")
        .filter(F.col("_tb").isin(buckets))
        .drop("_tb", "_bid")
    )
    return bm25_scores_indexed(
        postings,
        (row["_n"], row["_avgdl"]),
        terms,
        k1,
        b,
        id_col,
        materialize=True,
    )


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document against the query ``terms`` (see module
    docstring for the plan shape).  Returns (id, score) unranked — chain
    ``.orderBy(desc(score), id).limit(k)`` for top-k retrieval."""
    if not terms:
        raise ValueError("empty query term set")
    d = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("_t"))
    f = d.select(
        id_col,
        F.size("_t").alias("_dl"),
        *[_tf(F.col("_t"), t).alias(f"_tf{i}") for i, t in enumerate(terms)],
    )
    stats = f.agg(
        F.count(F.lit(1)).alias("_n"),
        F.avg("_dl").alias("_avgdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("int")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )
    score = None
    for i in range(len(terms)):
        idf = F.log(
            (F.col("_n") - F.col(f"_df{i}") + F.lit(0.5))
            / (F.col(f"_df{i}") + F.lit(0.5))
            + F.lit(1.0)
        )
        tf = F.col(f"_tf{i}")
        part = idf * (
            tf
            * F.lit(k1 + 1.0)
            / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / F.col("_avgdl")))
        )
        score = part if score is None else score + part
    return f.crossJoin(F.broadcast(stats)).select(
        id_col, score.alias("score")
    )


def append_bm25_index(
    spark,
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_id: int | None = None,
) -> dict:
    """Incremental BM25 maintenance: append a new-document batch into
    the persisted index without rebuilding — the batch's postings land
    in their token-hash buckets (untouched buckets' files never
    rewritten) and the one-row stats table updates EXACTLY
    (``N' = N + n``; ``avgdl' = (N·avgdl + Σdl)/N'`` — both closed
    form, no corpus rescan).  Query-time document frequencies come from
    the matched postings themselves, so they are automatically correct
    after any append; scores equal a full rebuild (equality-tested).

    Batch counts come from the DOCUMENT table, not the postings: a
    zero-token document emits no postings but still counts toward N and
    avgdl, exactly as the full rebuild counts it.

    ``batch_id`` (for streaming / retried callers): postings land under
    ``(_tb, _bid=batch_id)`` via DYNAMIC partition overwrite and the
    stats row records ``_last_bid`` — a replayed LAST batch rewrites
    exactly its own partitions and skips the (already applied) stats
    update, so foreachBatch's at-least-once delivery converges
    (single-writer, in-order batches — the same contract as
    ``append_ivf_index``).  A crash between the postings write and the
    stats write is healed by the retry: the postings overwrite is
    idempotent and the stats update then applies once.
    ``batch_id=None`` is a plain ad-hoc append (``_bid=-1``), NOT
    idempotent under retry.

    New ids are NOT deduplicated against the index (append-sink
    contract — dedupe upstream).  Returns ``{"appended_docs": n,
    "touched_buckets": k}``."""
    spark.catalog.refreshByPath(f"{path}/stats")
    stats_full = spark.read.parquet(f"{path}/stats")
    srow = stats_full.first()
    n_buckets = srow["_n_buckets"]
    if batch_id is not None and srow["_last_bid"] == batch_id:
        return {"appended_docs": 0, "touched_buckets": 0, "replayed": True}

    # document-level stats FIRST, from the doc table (includes docs
    # that tokenize to nothing; NULL text counts as zero-length — the
    # same coalesce as build_bm25_index, so append == rebuild holds)
    lens = new_docs.select(
        F.coalesce(F.size(tokens(F.col(text_col))), F.lit(0)).alias("_dl")
    )
    brow = lens.agg(
        F.count(F.lit(1)).alias("n"), F.sum("_dl").alias("dl")
    ).first()
    n_new, dl_sum = brow["n"], brow["dl"] or 0

    postings, _ = build_bm25_index(new_docs, id_col, text_col)
    bid = -1 if batch_id is None else int(batch_id)
    p = (
        postings.withColumn("_tb", F.pmod(F.hash("token"), F.lit(n_buckets)))
        .withColumn("_bid", F.lit(bid))
        .localCheckpoint()
    )
    k_touched = p.select("_tb").distinct().count()
    writer = p.repartition(F.col("_tb")).write.partitionBy("_tb", "_bid")
    if batch_id is None:
        writer.mode("append").parquet(f"{path}/postings")
    else:
        # writer-level option, not session conf (foreachBatch clones
        # the session — see append_ivf_index)
        writer.option("partitionOverwriteMode", "dynamic").mode(
            "overwrite"
        ).parquet(f"{path}/postings")
    n0, avg0 = srow["_n"], srow["_avgdl"]
    n1 = n0 + n_new
    avg1 = (n0 * avg0 + dl_sum) / n1 if n1 else 0.0
    spark.createDataFrame(
        [(n1, float(avg1), n_buckets, bid)],
        "_n long, _avgdl double, _n_buckets int, _last_bid int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/stats")
    spark.catalog.refreshByPath(f"{path}/postings")
    # postings written and bucket count taken — the staging checkpoint
    # is spent (r13 opt, guide §5)
    from ..session import release_checkpoint

    release_checkpoint(p)
    return {"appended_docs": n_new, "touched_buckets": k_touched}
