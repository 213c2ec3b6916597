#!/usr/bin/env python
"""Cross-round bench comparison under the noise rule PLANS.md §Bench variance
defines: a per-query move counts as a REAL regression/improvement only if the
new median sits outside the old median ± the larger of the two recorded
relative spreads (falling back to the measured worst-case 0.35 single-run
band when a side has no spread — i.e. pre-round-9 artifacts or non-repeated
queries).

Usage: python tools/bench_compare.py OLD.json NEW.json [--threshold 0.0]

Accepts either the driver's BENCH_r{N}.json (the parsed stdout line under
"parsed", or the raw line format) or a bench_full.json sidecar. Prints one
line per real mover plus a suite summary; exit code 1 if any regression.
"""

from __future__ import annotations

import json
import sys

# The noise band has TWO components: within-process run-to-run spread (the
# recorded repeat_spread, 7-35% measured) and BETWEEN-process variance (JVM
# lifetime, page cache, CPU frequency state), measured at up to +40% on
# sub-3s queries across two same-code benches in one day (kmeans medians
# 1.58 vs 2.22, r9 — PLANS.md §Bench variance). The recorded spread only
# sees the first component, so the comparison band is floored at 0.35.
BAND_FLOOR = 0.35
# ... and the same between-process evidence shows sub-2.5s queries swinging
# ±0.5-0.8s absolute with no code change, so moves under this many seconds
# never flag regardless of ratio (a true 2x regression on a 0.5s query is
# indistinguishable from process noise at this scale — the suite total and
# the >2.5s queries are where a real regression must show).
ABS_FLOOR_SEC = 1.0


def load(path: str) -> tuple[dict[str, float], dict[str, float]]:
    """-> (per-query sec, per-query relative spread)"""
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    queries = d.get("queries") or {}
    spread = d.get("repeat_spread") or {}
    return (
        {k: float(v) for k, v in queries.items()},
        {k: float(v) for k, v in spread.items()},
    )


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=0.0)
    ns = ap.parse_args()
    thresh = ns.threshold
    old_q, old_s = load(ns.old)
    new_q, new_s = load(ns.new)
    common = sorted(set(old_q) & set(new_q))
    if not common:
        sys.exit("no common queries between the two benches — nothing to compare")
    regressions, improvements = [], []
    for name in common:
        o, n = old_q[name], new_q[name]
        band = max(
            old_s.get(name, 0.0), new_s.get(name, 0.0), BAND_FLOOR, thresh
        )
        if abs(n - o) < ABS_FLOOR_SEC:
            continue
        if n > o * (1 + band):
            regressions.append((name, o, n, band))
        elif n < o * (1 - band):
            improvements.append((name, o, n, band))
    for name, o, n, band in sorted(regressions, key=lambda r: r[2] - r[1], reverse=True):
        print(f"REGRESSION {name}: {o:.2f}s -> {n:.2f}s (band ±{band:.0%})")
    for name, o, n, band in sorted(improvements, key=lambda r: r[1] - r[2], reverse=True):
        print(f"improvement {name}: {o:.2f}s -> {n:.2f}s (band ±{band:.0%})")
    to = sum(old_q[n] for n in common)
    tn = sum(new_q[n] for n in common)
    print(
        f"suite (common {len(common)} queries): {to:.1f}s -> {tn:.1f}s "
        f"({tn / to - 1:+.1%}); {len(regressions)} regressions, "
        f"{len(improvements)} improvements outside noise"
    )
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
