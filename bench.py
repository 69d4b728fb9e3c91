#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
COMPACT JSON line (≤2 KB — the driver tails stdout): {"metric": ...,
"value": total_sec, "unit": "sec", "queries": {name: median_sec},
"sf": ...}.  Per-query minima, round-over-round deltas and methodology
detail go to stderr and the committed sidecar BENCH_DETAIL.json.

Each query runs $SPARK_GRAFT_BENCH_PASSES (default 3) timed passes
(count() on the result — result sets are small aggregates, so this
measures compute, not driver transfer); the headline number per query is
the MEDIAN, with the min reported alongside ("queries_min").  Round 3's
single-shot numbers showed ±5–15% drift on sub-1.5s queries that was pure
run-to-run noise (VERDICT r3 "What's wrong #2") — medians make
round-over-round deltas adjudicable.

Warmup (disclosed methodology): before the timed pass, every headline
query runs once at sf0.001.  The schemas are identical across SF dirs, so
this populates the Catalyst planner caches, janino's generated-class cache
and the JVM JIT for the exact code paths being measured — the timed pass
then measures steady-state execution at the target SF, not first-call
compile time (which is amortized to zero on any long-running cluster and
was the dominant, noisy term in single-shot numbers: e.g. q1 2.4s cold vs
0.55s steady-state).
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: relational joins/aggs, patch ops, dedup, similarity,
# text, windows — one per operator family, the scale-sensitive ones.
# Round 3 adds the three round-2 scale-stress queries (VERDICT r2 task 8)
# so their measured wins stay pinned round-over-round, plus the two new
# shuffle-heavy capabilities (duplicate-span detection; banded range join).
HEADLINE = [
    "q1_pricing_summary",
    "q3_order_revenue",
    "q5_nation_revenue",
    "w1_tumbling_patches",
    "w4_avg_pool",
    "w8_stitch_roundtrip",
    "c2_one_hot_binary",
    "dd_exact",
    "dd_minhash_lsh",
    "sim_topk_cosine",
    "tx_token_stats",
    "t_tumbling_window",
    "cur_pipeline",
    "dc_contamination",
    "dd_jaccard_pairs",
    "dd_duplicate_spans",
    "t_interval_join",
    # round 4: the semantic-dedup fix (assignment derived once) and the
    # new inverted-index BM25 path, so their costs stay pinned
    "dd_semantic",
    "tx_bm25_indexed",
    # round 5: the real-codec multimodal path (container build + parse
    # per document inside mapInPandas), so its cost stays pinned
    "mm_wav_rms",
    # round-5 third session: the extended flagship (classifier gate +
    # span rewrite + fuzzy decontam), the substring-removal transform,
    # the fuzzy decontam tier alone, and the PQ ANN stage
    "cur_pipeline_v2",
    "dd_span_removal",
    "dc_fuzzy_contamination",
    "sim_ivf_pq",
    # round 6 (VERDICT r5 task 6): persisted-index SERVING twins — the
    # build-inclusive numbers above stay for continuity; these track the
    # scale-relevant query-only latency (index built once per testdata
    # fingerprint outside the timed passes, like any offline index job)
    "sim_ivf_pq_serve",
    "tx_bm25_serve",
    # round 6: the lossy-codec round-trip (heaviest new mapInPandas
    # kernel) and the training-feed bridge (BPE subword counting fused
    # into packing) — pinned so their cost tracks round-over-round
    "mm_jpeg_pool",
    "tx_tokenize_pack",
    # round 7: end-to-end video frame decode (MKV demux ∘ per-frame JPEG
    # decode ∘ pool — 4 frames/doc, the heaviest mapInPandas kernel;
    # pure-Python codec disclosed as the correctness reference, libjpeg
    # swap documented in SCALE.md)
    "mm_mkv_jpeg_pool",
    # round 7 second session: end-to-end compressed audio (FLAC encode
    # with exact-rice-cost subframe search inside the fixture build +
    # MKV A_FLAC reassembly + full decode with CRC/MD5 verification) —
    # the audio sibling of the MJPEG pin above
    "mm_mkv_flac_rms",
    # round 7 second session: the iterative-graph plan shape (6 power-
    # method rounds = 6 keyed join+agg stages over a checkpointed edge
    # table)
    "gr_pagerank",
    # round 8: MP3 Layer III sample decode (bitstream parse +
    # fixed-point reconstruction per document) and the warm-start
    # incremental PageRank (8 keyed join+agg rounds across two graph
    # phases)
    "mm_mp3_rms",
    "gr_pagerank_incremental",
    # round 8 second block: the mixed-codec curation funnel (FLAC+MP3
    # dispatch into one admission schema + fingerprint dedup)
    "mm_audio_multicodec",
    # round 9 (VERDICT r8 task 6): with fixture payloads cached, the
    # headline keeps ONE query per kernel family — mm_mkv_mp3_rms
    # (MKV∘MP3: both kernels already pinned via mm_mkv_jpeg_pool +
    # mm_mp3_rms) and mm_audio_curation (FLAC decode + dedup funnel:
    # covered by mm_mkv_flac_rms + mm_audio_multicodec) moved to the
    # sweep's long tail
    # round 10 second pass: two NEW kernel families — web-crawl
    # ingestion (gzip member split + WARC/HTTP parse + HTML extraction
    # per document) and MP4/ISO-BMFF demux (sample-table chunk
    # arithmetic); one representative each, the decode-composition
    # twins (cur_warc_pipeline, mm_mp4_mp3_rms) stay in the sweep
    "tx_warc_extract",
    "mm_mp4_demux",
    # round 10 sixth pass: two NEW kernel families with real per-byte
    # Python cost — TFRecord scan (table-driven CRC-32C over every
    # shard byte + protobuf tf.Example decode) and WebP lossless
    # (VP8L prefix-code decode per document); the lighter siblings
    # (msgpack/epub/docx/markdown/subtitles/exif/qoi/avi) stay in the
    # sweep's long tail
    "src_tfrecord_scan",
    "mm_webp_pool",
    # round 11: the Ogg-metadata kernel family (Vorbis header/setup
    # parse + Opus TOC duration arithmetic) — one representative; the
    # opus/quarantine twins stay in the sweep
    "mm_ogg_vorbis_meta",
]


def _calibrate(spark) -> dict:
    """Host-calibration probe (VERDICT r10 task 1): a fixed synthetic
    workload pair measured at the start of every headline/sweep run so
    round-over-round deltas can be adjudicated across host/boot changes
    (r9→r10 showed three windows disagreeing ±40% on identical code).

    - ``jvm_range_sum_sec``: whole-stage-codegen aggregation over a
      fixed ``spark.range`` — tracks JVM/parallel-scan throughput.
    - ``py_loop_sec``: a single-thread pure-Python LCG tight loop —
      tracks the interpreter/CPU side that the Arrow codec kernels use.

    Each probe runs one untimed warmup pass (codegen / allocator) then
    5 timed passes; the median is recorded.  Results land in the compact
    stdout line AND both sidecars, so the driver's BENCH_r{N}.json
    carries them into the next round's comparison."""
    import statistics

    def jvm_probe() -> float:
        t0 = time.time()
        spark.range(50_000_000).selectExpr(
            "sum(id % 7) AS s", "count(*) AS n"
        ).collect()
        return time.time() - t0

    def py_probe() -> float:
        t0 = time.time()
        acc = 1
        for i in range(2_000_000):
            acc = (acc * 1103515245 + i) & 0xFFFFFFFF
        assert acc >= 0
        return time.time() - t0

    jvm_probe(), py_probe()  # warmup (codegen + JIT), untimed
    jvm = [jvm_probe() for _ in range(5)]
    py = [py_probe() for _ in range(5)]
    cal = {
        "jvm_range_sum_sec": round(statistics.median(jvm), 4),
        "py_loop_sec": round(statistics.median(py), 4),
    }
    print(
        f"# calibration: jvm {cal['jvm_range_sum_sec']:.4f}s "
        f"py {cal['py_loop_sec']:.4f}s "
        f"(medians of 5; jvm spread {min(jvm):.4f}-{max(jvm):.4f})",
        file=sys.stderr,
    )
    return cal


def _micro_probe() -> float:
    """A ~30 ms single-thread Python probe run right AFTER each
    query's timed passes (r11): the start-of-run calibration pair
    adjudicates cross-boot drift, but a mid-run host burst evades it
    — this per-query trace turns those bursts into data (a query that
    measured slow while its adjacent probe also spiked is host, not
    code).  Min of 3 so scheduler jitter doesn't self-flag."""
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        acc = 1
        for i in range(300_000):
            acc = (acc * 1103515245 + i) & 0xFFFFFFFF
        assert acc >= 0
        best = min(best, time.time() - t0)
    return best


def _probe_flags(probes: dict[str, float]) -> list[str]:
    """Queries whose adjacent micro-probe ran >1.5x the run median —
    the burst-window markers.  1.5x, not 2x: the observed bursts are
    sustained ~1.4-1.8x CPU-contention windows (r11 close: a flagged
    contiguous sweep stretch probed 34-57 ms against a 31 ms median),
    and min-of-3 already filters one-off scheduler jitter."""
    if not probes:
        return []
    import statistics

    med = statistics.median(probes.values())
    return [k for k, v in probes.items() if med > 0 and v > 1.5 * med]


def _host_factor(prev_cal: dict | None, cal: dict) -> float | None:
    """How much slower (>1) or faster (<1) this host window is than the
    one that produced ``prev_cal``: the geometric mean of the JVM and
    Python probe ratios, clamped to [0.5, 3.0] so a broken probe can
    never widen the perf gate by more than 3x (clamping is disclosed on
    stderr by the callers when it binds)."""
    if not prev_cal:
        return None
    try:
        jf = cal["jvm_range_sum_sec"] / float(prev_cal["jvm_range_sum_sec"])
        pf = cal["py_loop_sec"] / float(prev_cal["py_loop_sec"])
    except (KeyError, TypeError, ZeroDivisionError):
        return None
    return max(0.5, min(3.0, (jf * pf) ** 0.5))


def sweep() -> None:
    """Full-surface timing sweep (VERDICT r7 task 1): ONE timed pass
    over EVERY declared query at sf0.01 (the headline covers ~32 of
    154; the rest had no perf record, so a regression there was
    invisible until it broke the parity-suite wall clock).  Writes the
    committed sidecar BENCH_SWEEP.json and diffs round-over-round
    against the previous sweep, flagging any query >2x its prior time.

    Methodology: same warmup discipline as the headline (each query
    runs once at sf0.001 first, so the timed pass measures steady-state
    execution, not codegen/JIT compile); single pass — the sweep is a
    tripwire for order-of-magnitude regressions, not a median-grade
    benchmark (that's the headline's job)."""
    from asid_v2_data_pipeline_spark.queries import all_queries
    from asid_v2_data_pipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="bench-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    cal = _calibrate(spark)

    warm_dir = "/root/testdata/sf0.001"
    warm = os.path.isdir(warm_dir) and os.path.abspath(
        warm_dir
    ) != os.path.abspath(sf_dir)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    timings: dict[str, float] = {}
    probes: dict[str, float] = {}
    for name in sorted(queries):
        fn = queries[name]
        if warm:
            fn(spark, warm_dir).count()
        # one untimed pre-pass for every query (see the headline loop:
        # index / media-fixture cache builds are offline jobs; the
        # timed pass measures the declared operator)
        fn(spark, sf_dir).count()
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)
        probes[name] = round(_micro_probe(), 4)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "sweep_total",
        "value": total,
        "unit": "sec",
        "sf": float(sf),
        "passes": 1,
        "warmup": warm,
        "n_queries": len(timings),
        "calibration": cal,
        "queries": timings,
        # per-query micro-probe trace (r11): burst-window markers for
        # adjudicating transient flags — see _micro_probe
        "probe_after": probes,
        "probe_burst_queries": _probe_flags(probes),
    }
    for k in out["probe_burst_queries"]:
        print(
            f"# PROBE BURST near {k}: adjacent micro-probe "
            f"{probes[k]*1000:.0f}ms vs run median — treat a "
            f"same-query flag as host, not code",
            file=sys.stderr,
        )

    here = os.path.dirname(os.path.abspath(__file__))
    sidecar = os.path.join(here, "BENCH_SWEEP.json")
    prev = None
    if os.path.exists(sidecar):
        try:
            with open(sidecar) as fh:
                prev = json.load(fh)
        except (OSError, ValueError):
            prev = None
    if prev and prev.get("sf") == out["sf"]:
        pq = prev.get("queries", {})
        # the >2x tripwire fires on the calibration-NORMALIZED number
        # (VERDICT r10 task 1): the previous time is first scaled by the
        # host factor measured from the synthetic probe pair, so a
        # uniformly slower boot doesn't flag every query.  With no
        # previous calibration record the factor is 1.0 (raw compare).
        factor = _host_factor(prev.get("calibration"), cal) or 1.0
        out["host_factor_vs_prev"] = round(factor, 4)
        print(f"# host factor vs previous sweep: {factor:.3f}x", file=sys.stderr)
        flagged = {}
        raw_flagged: list[str] = []
        for k, v in timings.items():
            if k in pq and pq[k] >= 0.05:
                if v > 2.0 * pq[k]:
                    raw_flagged.append(k)
                if v > 2.0 * pq[k] * factor:
                    flagged[k] = {
                        "prev": pq[k],
                        "prev_normalized": round(pq[k] * factor, 3),
                        "now": v,
                    }
        out["flagged_over_2x"] = flagged
        # r12 (ADVICE): keep the raw-flagged NAMES, not just the count —
        # the clamped host factor (<=3.0) can suppress a genuine up-to-6x
        # slowdown inside a slow calibration window, and the suppressed
        # queries must stay auditable from the sidecar alone.
        out["flagged_over_2x_raw_count"] = len(raw_flagged)
        out["flagged_over_2x_raw_queries"] = sorted(raw_flagged)
        for k, d in sorted(flagged.items(), key=lambda kv: -kv[1]["now"]):
            print(
                f"# FLAGGED >2x (normalized): {k} {d['prev']:.3f}s "
                f"(norm {d['prev_normalized']:.3f}s) -> {d['now']:.3f}s",
                file=sys.stderr,
            )
        if not flagged:
            print(
                "# no query exceeded 2x its normalized previous sweep time"
                f" ({len(raw_flagged)} would have flagged raw:"
                f" {sorted(raw_flagged)})",
                file=sys.stderr,
            )
    with open(sidecar, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"# sweep sidecar: {sidecar}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "sweep_total",
                "value": total,
                "unit": "sec",
                "sf": float(sf),
                "n_queries": len(timings),
                "calibration": cal,
                "host_factor_vs_prev": out.get("host_factor_vs_prev"),
                "flagged_over_2x": len(out.get("flagged_over_2x", {})),
            }
        )
    )
    spark.stop()


def main() -> None:
    from asid_v2_data_pipeline_spark.queries import all_queries
    from asid_v2_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # JVM/codegen warmup so the timed pass doesn't pay boot/compile costs:
    # run each headline query once at the smallest SF (identical schemas →
    # identical generated code; see module docstring)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    cal = _calibrate(spark)
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and os.path.abspath(warm_dir) != os.path.abspath(SF_DIR):
        t0 = time.time()
        for name in HEADLINE:
            queries[name](spark, warm_dir).count()
        print(f"# warmup pass (sf0.001): {time.time() - t0:.3f}s", file=sys.stderr)

    import statistics

    passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3")))
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    timings: dict[str, float] = {}
    timings_min: dict[str, float] = {}
    probes: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        times = []
        n = 0
        # one untimed pre-pass for EVERY query (r10 sixth pass: the
        # old `_serve`/`mm_` guard missed the fixture-backed src_/tx_
        # families, so a first-run cache build could land inside a
        # timed pass).  This forces the once-per-fingerprint index /
        # fixture-payload builds (offline jobs at scale) outside the
        # timed passes and warms the page cache uniformly — the
        # number tracks the declared operator (VERDICT r8 task 1).
        fn(spark, SF_DIR).count()
        for _ in range(passes):
            t0 = time.time()
            n = fn(spark, SF_DIR).count()
            times.append(time.time() - t0)
        timings[name] = round(statistics.median(times), 3)
        timings_min[name] = round(min(times), 3)
        probes[name] = round(_micro_probe(), 4)
        shown = "/".join(f"{t:.3f}" for t in times)
        print(
            f"# {name}: median {timings[name]:.3f}s min {timings_min[name]:.3f}s"
            f" [{shown}] ({n} rows)",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    # The FINAL stdout line must stay compact: the driver records only a
    # bounded tail of stdout, and round 6's single line (medians + mins +
    # deltas for 28 queries) outgrew it — the driver got `parsed: null`
    # and the round's perf record was lost (VERDICT r6 task 1).  Contract
    # now: stdout = metric/value/sf/passes/warmup + per-query MEDIANS
    # only (~1 KB at 28 queries); mins, deltas and methodology detail go
    # to stderr + the committed sidecar BENCH_DETAIL.json.
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "passes": passes,
        "sf": float(sf),
        # methodology tag (ADVICE r2): deltas are only meaningful against
        # baselines recorded with the same warmup discipline
        "warmup": True,
        # host-calibration probe (r11): lives in the compact stdout line
        # so the driver's BENCH_r{N}.json carries it to the next round
        "calibration": cal,
    }
    detail = dict(out)
    detail["queries_min"] = timings_min
    # per-query micro-probe trace (r11): burst-window markers — a
    # query whose adjacent probe spiked measured inside a host burst;
    # re-run before reading its delta as code (see _micro_probe)
    detail["probe_after"] = probes
    detail["probe_burst_queries"] = _probe_flags(probes)
    for k in detail["probe_burst_queries"]:
        print(
            f"# PROBE BURST near {k}: adjacent micro-probe "
            f"{probes[k]*1000:.0f}ms vs run median — treat this "
            f"query's delta as host window, not code",
            file=sys.stderr,
        )

    # Round-over-round hygiene: diff against the most recent BENCH_r{N}.json
    # (same 12-query set every round) so regressions are visible per query.
    # Deltas go to stderr + a "deltas" key; the stdout contract stays ONE line.
    import glob
    import re

    prev_files = sorted(
        glob.glob(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_r*.json")),
        key=lambda p: int(re.search(r"BENCH_r(\d+)\.json$", p).group(1)),
    )
    if prev_files:
        try:
            with open(prev_files[-1]) as fh:
                prev = json.load(fh)
            # the driver wraps the bench line under "parsed" (null when
            # its tail capture failed to parse, e.g. round 6)
            prev = prev.get("parsed") or prev
            pq = prev.get("queries", {})
            # methodology guard: rounds >= 2 ran with warmup (the tag only
            # exists from round 3 on); never diff against the no-warmup r1
            prev_round = int(
                re.search(r"BENCH_r(\d+)\.json$", prev_files[-1]).group(1)
            )
            prev_warmup = prev.get("warmup", prev_round >= 2)
            if prev.get("sf") == out["sf"] and pq and prev_warmup == out["warmup"]:
                # deltas reported BOTH raw and calibration-normalized
                # (r11): the normalized column scales the previous
                # round's time by the host factor from the probe pair,
                # separating code effects from boot/window drift
                factor = _host_factor(prev.get("calibration"), cal)
                deltas = {
                    k: round(v - pq[k], 3) for k, v in timings.items() if k in pq
                }
                detail["baseline_round"] = os.path.basename(prev_files[-1])
                detail["deltas"] = deltas
                if factor is not None:
                    detail["host_factor_vs_prev"] = round(factor, 4)
                    detail["deltas_normalized"] = {
                        k: round(v - pq[k] * factor, 3)
                        for k, v in timings.items()
                        if k in pq
                    }
                    print(
                        f"# host factor vs {os.path.basename(prev_files[-1])}:"
                        f" {factor:.3f}x",
                        file=sys.stderr,
                    )
                for k, d in sorted(deltas.items(), key=lambda kv: kv[1]):
                    pct = 100.0 * d / pq[k] if pq[k] else 0.0
                    if factor is not None:
                        dn = timings[k] - pq[k] * factor
                        pn = 100.0 * dn / (pq[k] * factor) if pq[k] else 0.0
                        print(
                            f"# delta {k}: {d:+.3f}s ({pct:+.0f}%) |"
                            f" normalized {dn:+.3f}s ({pn:+.0f}%)",
                            file=sys.stderr,
                        )
                    else:
                        print(
                            f"# delta {k}: {d:+.3f}s ({pct:+.0f}%)",
                            file=sys.stderr,
                        )
        except (OSError, ValueError, KeyError) as exc:
            print(f"# delta comparison skipped: {exc}", file=sys.stderr)

    sidecar = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    try:
        with open(sidecar, "w") as fh:
            json.dump(detail, fh, indent=1, sort_keys=True)
            fh.write("\n")
        print(f"# detail sidecar: {sidecar}", file=sys.stderr)
    except OSError as exc:  # read-only checkout: detail still on stderr
        print(f"# detail sidecar skipped: {exc}", file=sys.stderr)

    line = json.dumps(out)
    # hard guard on the stdout contract — fail loudly here, not silently
    # in the driver's tail capture
    assert len(line) <= 2048, f"stdout bench line too long: {len(line)} bytes"
    print(line)
    spark.stop()


if __name__ == "__main__":
    if "--sweep" in sys.argv[1:]:
        sweep()
    else:
        main()
