"""Render the CD-lag table (r4 VERDICT task 2) from an ENDURANCE.json:
per-pass wall time vs the configured cadence interval as the map grows.

    python scripts/cd_lag_table.py [ENDURANCE.json]
"""

import json
import sys

import numpy as np


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "ENDURANCE.json"
    d = json.load(open(path))
    rows = d["cd_rows"]
    cadence = d.get("cd_cadence_wall_s", 0.0)
    print(f"| pass | frame | rays | cd_s | lag vs {cadence:.1f}s cadence | "
          f"full_builds | merges | rss MB |")
    print("|---|---|---|---|---|---|---|---|")
    for k, r in enumerate(rows):
        lag = r["cd_s"] / cadence if cadence else float("nan")
        print(f"| {k} | {r['frame']} | {r['rays']//1000}k | {r['cd_s']:.1f} "
              f"| {lag:.1f}x | {r['full_builds']} | {r.get('merges', 0)} "
              f"| {r['rss_mb']} |")
    cd = [r["cd_s"] for r in rows]
    if not cd:
        print("\n(no CD passes ran)")
        return
    steady = cd[2:] if len(cd) > 4 else cd
    print(f"\nfirst steady pass {steady[0]:.1f}s, last {steady[-1]:.1f}s "
          f"(ratio {steady[-1]/max(steady[0],1e-9):.1f}x), median "
          f"{np.median(cd):.1f}s, max {max(cd):.1f}s")


if __name__ == "__main__":
    main()
