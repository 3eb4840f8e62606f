"""Bench regression gate: diff two bench JSON artifacts per query.

Catches the repartition-class trade (a change that speeds the heavy
queries while silently taxing the cheap ones) on the builder's side
of the fence, before the driver's per-round record does.

Accepts either format:
- bench.py's own output line: {"queries": {name: sec, ...}, ...}
- the driver's BENCH_r{N}.json wrapper: {"tail": "<truncated JSON
  text>", ...} — per-query times are recovered from the tail with a
  regex (the wrapper truncates the head, so the OLDEST alphabetical
  queries may be absent; comparison runs over the intersection).

Usage:
    python tools/bench_compare.py OLD.json NEW.json [--ratio 2.0]
                                  [--abs 0.3] [--annotate]

Exit 1 iff any query regressed by more than `ratio`x AND more than
`abs` seconds (both thresholds must trip — ratio alone flags noise on
10 ms queries, absolute alone flags noise on multi-second ones).

r12 (r11 VERDICT task 6): bench totals on this box drift ±20%
run-to-run, and every round burned time re-litigating which per-query
moves were box noise. The compare now DECOMPOSES the delta: the
median per-query ratio over the stable commons estimates the diffuse
box-speed drift, and only queries whose drift-ADJUSTED move clears
the thresholds are reported as signal. ``--annotate`` writes the
decomposition into NEW.json itself (a ``compare`` block), so the
committed bench artifact self-documents noise vs signal.
"""

from __future__ import annotations

import json
import re
import statistics
import sys


def load_timings(path: str) -> dict[str, float]:
    with open(path) as fh:
        data = json.load(fh)
    if isinstance(data, dict) and isinstance(data.get("queries"), dict):
        return {k: float(v) for k, v in data["queries"].items() if float(v) >= 0}
    tail = data.get("tail", "") if isinstance(data, dict) else ""
    pairs = re.findall(r'"([a-z0-9_]+)": (-?[0-9.]+)', tail)
    out = {}
    for k, v in pairs:
        try:
            v = float(v)
        except ValueError:
            continue
        if k not in ("n", "rc", "cpus", "sf", "value", "n_queries", "n_failed") and v >= 0:
            out[k] = v
    if not out:
        raise SystemExit(f"{path}: no per-query timings found")
    return out


def main(argv: list[str]) -> int:
    args = [a for a in argv]
    ratio = 2.0
    abs_floor = 0.3
    annotate = False
    if "--ratio" in args:
        i = args.index("--ratio")
        ratio = float(args[i + 1])
        del args[i : i + 2]
    if "--abs" in args:
        i = args.index("--abs")
        abs_floor = float(args[i + 1])
        del args[i : i + 2]
    if "--annotate" in args:
        annotate = True
        args.remove("--annotate")
    if len(args) != 2:
        print(__doc__)
        return 2
    old, new = load_timings(args[0]), load_timings(args[1])
    common = sorted(set(old) & set(new))
    if not common:
        print("no common queries between the two artifacts")
        return 2

    # diffuse box-speed drift: the median per-query ratio over commons
    # big enough to carry signal (>= 0.2 s on the old side). A uniform
    # +15% on every family is the box; per-query deviations FROM that
    # median are the candidate regressions/improvements.
    stable = [n for n in common if old[n] >= 0.2]
    drift = (
        statistics.median(new[n] / old[n] for n in stable) if stable else 1.0
    )

    regressions, improvements, outliers = [], [], []
    for name in common:
        o, n = old[name], new[name]
        if n > o * ratio and n - o > abs_floor:
            regressions.append((name, o, n))
        elif o > n * ratio and o - n > abs_floor:
            improvements.append((name, o, n))
        # drift-adjusted signal: the move this query made BEYOND the
        # diffuse median drift (reported, not gated — the 2x/0.3s gate
        # above stays the hard trip-wire)
        adj = o * drift
        if o >= 0.2 and n > adj * 1.5 and n - adj > 0.5:
            outliers.append(
                {"query": name, "old": o, "new": n,
                 "drift_adjusted_old": round(adj, 3)}
            )

    tot_old = sum(old[n] for n in common)
    tot_new = sum(new[n] for n in common)
    print(
        f"{len(common)} common queries: total {tot_old:.1f} s -> {tot_new:.1f} s"
        f" ({tot_new - tot_old:+.1f} s); median per-query drift "
        f"{drift - 1:+.1%} (box-speed estimate over {len(stable)} stable rows)"
    )
    for o_row in outliers:
        print(
            f"  above-drift  {o_row['query']}: {o_row['old']:.2f} -> "
            f"{o_row['new']:.2f} s (drift-adjusted baseline "
            f"{o_row['drift_adjusted_old']:.2f} s)"
        )
    for name, o, n in sorted(improvements, key=lambda t: t[1] - t[2]):
        print(f"  faster  {name}: {o:.2f} -> {n:.2f} s")
    for name, o, n in sorted(regressions, key=lambda t: t[1] - t[2]):
        print(f"  REGRESSED {name}: {o:.2f} -> {n:.2f} s (>{ratio}x and >{abs_floor}s)")

    if annotate:
        with open(args[1]) as fh:
            artifact = json.load(fh)
        artifact["compare"] = {
            "baseline": args[0],
            "n_common": len(common),
            "total_old_sec": round(tot_old, 3),
            "total_new_sec": round(tot_new, 3),
            "median_drift_ratio": round(drift, 4),
            "above_drift_outliers": outliers,
            "gate_regressions": [
                {"query": nm, "old": o, "new": n} for nm, o, n in regressions
            ],
        }
        with open(args[1], "w") as fh:
            json.dump(artifact, fh, indent=1)
        print(f"annotated {args[1]} with the decomposition")

    if regressions:
        print(f"\nFAIL: {len(regressions)} regression(s) past {ratio}x/{abs_floor}s")
        return 1
    print("OK: no regressions past the gate")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
