"""Quiet-window sweep sentry (VERDICT r12 task 1).

Every r12 sweep window was burst-degraded; the round-over-round sweep
deltas are unusable until a re-base from a genuinely quiet window.
This sentry probes the host with bench.py's own calibration pair and
launches the full 207-query sweep ONLY when the JVM probe lands under
the threshold (clean ≈ 0.20 s; default gate 0.24 s ≈ 1.2x clean),
retrying for up to ``--max-minutes``.  The sweep subprocess re-probes
at its own start (the calibration lands in BENCH_SWEEP.json), so the
gate here is a pre-filter, not the recorded evidence.

Usage: python tools/quiet_sweep.py [--gate 0.24] [--max-minutes 240]
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time

sys.path.insert(0, ".")


def probe() -> float:
    """One calibration in a fresh Spark session (boot cost ~6 s) —
    fresh so the probe sees the same cold-ish JVM the sweep will."""
    from asid_v2_data_pipeline_spark.session import get_spark

    import bench

    spark = get_spark(app_name="quiet-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    cal = bench._calibrate(spark)
    spark.stop()
    return cal["jvm_range_sum_sec"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gate", type=float, default=0.24)
    ap.add_argument("--max-minutes", type=float, default=240)
    ap.add_argument("--sleep", type=float, default=180)
    ap.add_argument(
        "--headline",
        action="store_true",
        help="run the headline bench (bench.py, 3 passes) instead of the sweep",
    )
    args = ap.parse_args()
    t_end = time.time() + args.max_minutes * 60
    attempt = 0
    while time.time() < t_end:
        attempt += 1
        j = probe()
        print(f"# probe {attempt}: jvm {j:.4f}s (gate {args.gate})", flush=True)
        if j <= args.gate:
            print("# window quiet — launching run", flush=True)
            cmd = [sys.executable, "bench.py"]
            if not args.headline:
                cmd.append("--sweep")
            rc = subprocess.call(cmd)
            print(f"# sweep exited {rc}", flush=True)
            if rc == 0:
                return
            # a failed sweep (not a noisy one) is a bug — stop retrying
            sys.exit(rc)
        time.sleep(args.sleep)
    print("# no quiet window found within the budget", flush=True)
    sys.exit(3)


if __name__ == "__main__":
    main()
