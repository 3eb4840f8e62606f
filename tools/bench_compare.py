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
                                  [--abs 0.3]

Exit 1 iff any query regressed by more than `ratio`x AND more than
`abs` seconds (both thresholds must trip — ratio alone flags noise on
10 ms queries, absolute alone flags noise on multi-second ones).
"""

from __future__ import annotations

import json
import re
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
    if "--ratio" in args:
        i = args.index("--ratio")
        ratio = float(args[i + 1])
        del args[i : i + 2]
    if "--abs" in args:
        i = args.index("--abs")
        abs_floor = float(args[i + 1])
        del args[i : i + 2]
    if len(args) != 2:
        print(__doc__)
        return 2
    old, new = load_timings(args[0]), load_timings(args[1])
    common = sorted(set(old) & set(new))
    if not common:
        print("no common queries between the two artifacts")
        return 2

    regressions, improvements = [], []
    for name in common:
        o, n = old[name], new[name]
        if n > o * ratio and n - o > abs_floor:
            regressions.append((name, o, n))
        elif o > n * ratio and o - n > abs_floor:
            improvements.append((name, o, n))

    tot_old = sum(old[n] for n in common)
    tot_new = sum(new[n] for n in common)
    print(
        f"{len(common)} common queries: total {tot_old:.1f} s -> {tot_new:.1f} s"
        f" ({tot_new - tot_old:+.1f} s)"
    )
    for name, o, n in sorted(improvements, key=lambda t: t[1] - t[2]):
        print(f"  faster  {name}: {o:.2f} -> {n:.2f} s")
    for name, o, n in sorted(regressions, key=lambda t: t[1] - t[2]):
        print(f"  REGRESSED {name}: {o:.2f} -> {n:.2f} s (>{ratio}x and >{abs_floor}s)")
    if regressions:
        print(f"\nFAIL: {len(regressions)} regression(s) past {ratio}x/{abs_floor}s")
        return 1
    print("OK: no regressions past the gate")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
