"""Accept a bench run as the secondary regression reference
(BENCH_PREV.json — bench.py's two-tier guard, r6 verdict task #3).

Refuses non-gate-scale runs (ADVICE r7): accepting an sf0.01 smoke
line would write sub-scale timings into the secondary tier, and
bench.py's guard — which only checks the CURRENT run's sf — would then
compare sf0.1 timings against sf0.01 references.
"""

from __future__ import annotations

import json
import os
import sys

GATE_SF = 0.1


def main() -> None:
    run_path = sys.argv[1]
    d = json.load(open(run_path))
    if d.get("sf") != GATE_SF:
        sys.exit(
            f"refusing to accept non-gate-scale run: sf={d.get('sf')!r} "
            f"(the secondary tier must be sf={GATE_SF} to compare "
            "like-with-like)"
        )
    out = {
        "queries": d["queries"],
        "sf": d["sf"],
        "accepted_total": d["value"],
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BENCH_PREV.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(f"accepted {run_path} -> BENCH_PREV.json "
          f"({len(d['queries'])} queries, total {d['value']}s)")


if __name__ == "__main__":
    main()
