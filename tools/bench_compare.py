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
10 ms queries, absolute alone flags noise on multi-second ones), OR a
previously-passing query is now failed (-1.0) or absent from a
full-format NEW artifact (r12 ADVICE: regression-to-failure used to
read as a green compare; tail-truncated driver artifacts only warn,
since their head loss is truncation, not regression).

r13 adds box normalization: when both artifacts carry the fixed
``calibration_sec`` yardstick (tools/calibrate.py), the compare prints
the measured box-speed ratio and box-normalized totals alongside the
raw ones, and flags rows whose min-of-N rep protocol differs.

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


def _load(path: str) -> dict:
    with open(path) as fh:
        return json.load(fh)


def load_timings(path: str, include_failed: bool = False) -> dict[str, float]:
    """Per-query seconds. Failed queries carry the -1.0 sentinel and
    are dropped unless ``include_failed`` — the compare needs them so a
    regression-to-FAILURE reads as a missing/failed row, not as a
    silently-shrunk common set (r12 ADVICE)."""
    data = _load(path)
    if isinstance(data, dict) and isinstance(data.get("queries"), dict):
        return {
            k: float(v)
            for k, v in data["queries"].items()
            if include_failed or float(v) >= 0
        }
    tail = data.get("tail", "") if isinstance(data, dict) else ""
    pairs = re.findall(r'"([a-z0-9_]+)": (-?[0-9.]+)', tail)
    out = {}
    for k, v in pairs:
        try:
            v = float(v)
        except ValueError:
            continue
        if k not in ("n", "rc", "cpus", "sf", "value", "n_queries", "n_failed") and (
            include_failed or v >= 0
        ):
            out[k] = v
    if not out:
        raise SystemExit(f"{path}: no per-query timings found")
    return out


def is_full_artifact(path: str) -> bool:
    """True for bench.py's own complete format; False for the driver's
    tail-wrapper, whose truncated HEAD makes absence indistinguishable
    from truncation (missing-query detection then warns, never gates)."""
    data = _load(path)
    return isinstance(data, dict) and isinstance(data.get("queries"), dict)


def calibration_of(path: str) -> float | None:
    """The artifact's ``calibration_sec`` box-speed yardstick (r13,
    tools/calibrate.py), or None for pre-r13 artifacts."""
    data = _load(path)
    v = data.get("calibration_sec") if isinstance(data, dict) else None
    # explicit positivity test (r14, r13 ADVICE): a 0.0 would be an
    # invalid yardstick, not an absent one — either way unusable as a
    # divisor, but say so without leaning on truthiness
    return float(v) if v is not None and float(v) > 0 else None


def rep_counts_of(path: str) -> dict[str, int]:
    data = _load(path)
    rc = data.get("rep_counts") if isinstance(data, dict) else None
    return {k: int(v) for k, v in rc.items()} if isinstance(rc, dict) else {}


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
    # r12 ADVICE: a query that FAILED in the new run records -1.0 and
    # used to vanish from `common`, so a regression-to-failure read as
    # a green compare. Surface previously-passing queries that are now
    # failed or absent, and gate on them like a regression.
    new_all = load_timings(args[1], include_failed=True)
    new_full = is_full_artifact(args[1])
    missing = sorted(set(old) - set(new_all))
    now_failed = sorted(n for n in set(old) & set(new_all) if new_all[n] < 0)
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
    # r13: when both artifacts carry the fixed calibration yardstick,
    # report the box-speed ratio it MEASURED and the box-normalized
    # total (t / calibration_sec) — the drift median above estimates
    # box speed from the workload itself; the calibration row measures
    # it independently of any code change.
    cal_old, cal_new = calibration_of(args[0]), calibration_of(args[1])
    box_ratio = None
    if cal_old and cal_new:
        box_ratio = cal_new / cal_old
        print(
            f"calibration: {cal_old:.3f} s -> {cal_new:.3f} s "
            f"(box {box_ratio - 1:+.1%}); box-normalized total "
            f"{tot_old / cal_old:.1f} -> {tot_new / cal_new:.1f} cal-units "
            f"({tot_new / cal_new - tot_old / cal_old:+.1f})"
        )
    # r13 (r12 ADVICE): rows measured under DIFFERENT rep protocols
    # (min-of-1/2 vs the HEAVY_SECONDS min-of-3 upgrade) are bimodal
    # noise, not signal — name them so nobody reads a protocol flip as
    # a perf change.
    rc_old, rc_new = rep_counts_of(args[0]), rep_counts_of(args[1])
    protocol_mismatch = sorted(
        n
        for n in common
        if n in rc_old and n in rc_new and rc_old[n] != rc_new[n]
    )
    if protocol_mismatch:
        print(
            f"rep-protocol differs on {len(protocol_mismatch)} row(s) "
            f"(treat their deltas as protocol, not perf): "
            + ", ".join(
                f"{n} ({rc_old[n]}->{rc_new[n]} reps)"
                for n in protocol_mismatch
            )
        )
    for name in missing:
        tag = "MISSING" if new_full else "missing?(tail-truncated artifact)"
        print(f"  {tag}  {name}: {old[name]:.2f} s in old, absent from new")
    for name in now_failed:
        print(f"  NOW-FAILED {name}: {old[name]:.2f} s in old, -1.0 in new")
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
            "calibration_box_ratio": (
                round(box_ratio, 4) if box_ratio is not None else None
            ),
            "missing_from_new": missing,
            "failed_in_new": now_failed,
            "rep_protocol_mismatch": protocol_mismatch,
            "above_drift_outliers": outliers,
            "gate_regressions": [
                {"query": nm, "old": o, "new": n} for nm, o, n in regressions
            ],
        }
        with open(args[1], "w") as fh:
            json.dump(artifact, fh, indent=1)
        print(f"annotated {args[1]} with the decomposition")

    gated_missing = missing if new_full else []
    if regressions or gated_missing or now_failed:
        print(
            f"\nFAIL: {len(regressions)} regression(s) past "
            f"{ratio}x/{abs_floor}s, {len(gated_missing)} missing, "
            f"{len(now_failed)} now-failed"
        )
        return 1
    print("OK: no regressions past the gate")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
