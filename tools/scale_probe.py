"""Scale-ratio gate: times registered queries at two SFs and flags
super-linear growth (r5 VERDICT task 4 — the regression gate that
would have caught the fixed-bucket/fixed-cell quadratics before the
judge did).

For each query: min-of-`reps` wall time of full execution via the
noop sink (same protocol as bench.py) at the BASE dir and the BIG
dir, then ratio = big/base. With 10x data a linear operator lands
well under the default 5x bound (per-partition work grows, but so
does parallelism headroom); pair-count-driven operators may
legitimately exceed it — list those in ALLOWED_RATIOS with a comment
and a tighter documented bound instead of letting them hide.

Usage:
    python tools/scale_probe.py [base_dir] [big_dir] [query ...]
        [--json OUT.json] [--bounds 10x|100x|zipf|zipf100x]

Exit code 1 if any query exceeds its bound (default 5.0, per-query
overrides in ALLOWED_RATIOS), so it can gate the end-of-round
checklist.

``--bounds 100x`` selects the 100x-calibrated bound set
(ALLOWED_RATIOS_100X) for probes against a 100x big dir
(sf0.1 -> localdata/sf10). r7's pairs probe reused the 10x bounds
against 100x data, so a healthy run recorded 8 expected-but-alarming
``exceeds`` flags; a gate whose green state has known-red rows is not
a gate (r7 VERDICT task 3) — the 100x run now exits 1 on a real
violation and 0 when healthy, same as the 10x run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_BOUND = 5.0

# Per-query ratio bounds where >5x at 10x data is EXPECTED and
# documented, not a defect. Keep each entry justified.
ALLOWED_RATIOS: dict[str, float] = {
    # True near-dup PAIR COUNT grows faster than N by the generator's
    # design (sf1.0 plants dense dup clusters: shingle true pairs grow
    # 462x at 10x docs — tools/candidate_counts.py), and signature
    # build cost is per-doc-length; counts quantified in PERF.md.
    "doc_minhash_lsh_pairs": 12.0,
    "doc_shingle_candidates": 12.0,
    "doc_passage_dedup": 8.0,
    # runs BOTH pair pipelines above and intersects them — inherits
    # their pair-count-driven growth (measured 6.5x at 10x data).
    "dedup_method_agreement": 12.0,
    "dedup_method_agreement_slice": 12.0,  # r11: same arms, 1/8 slices
    # exact deletion-neighborhood join: variant-bucket population is
    # bounded by LOCAL near-match density, which on the synthetic
    # dense sequential keyspace grows ~N^0.5 (max bucket 66 → 192 for
    # 10x; candidate rows 32x for 10x — still 4.5x below the naive
    # blocked join and exact). Measured 4.8-6.2x wall at 10x data.
    "fuzzy_name_pairs": 8.0,
    # Candidate volume is ~N*MAX_CELL/2 (linear) but output pair
    # count itself grows ~N; 10x data → ~10x compute by design.
    "semantic_dedup": 15.0,
    "embedding_near_dup_pairs": 15.0,
    # log-round pointer jumping: rounds grow with log(N) on top of
    # linear per-round cost.
    "doc_dup_clusters": 8.0,
    "doc_dedup_keeplist": 8.0,
    # r9 1/8-shingle-slice twins of the two above (the sf10 exact-
    # verification variants): same CC pipeline, same growth shape.
    "doc_dup_clusters_slice": 8.0,
    "doc_dedup_keeplist_slice": 8.0,
    "doc_dedup_quality_keeplist": 8.0,  # r11: same CC family
    "doc_dedup_quality_keeplist_slice": 8.0,
    "cluster_safe_split": 8.0,  # r11: same CC family
    "cluster_safe_split_slice": 8.0,
    # r7 slice-verification variants: full signature/banding cost plus
    # 1/K of the parent's pair-count-driven candidate work — inherit
    # the parent's bound.
    "doc_minhash_lsh_pairs_slice": 12.0,
    # r10 streaming near-dup store round-trips: the full and sliced
    # variants run the SAME signature/banding/verify kernel as
    # doc_minhash_lsh_pairs over (history ∪ batch), plus O(batch)
    # store ingest — inherit its pair-count-driven bound.
    "incremental_neardup_pairs": 12.0,
    "incremental_neardup_pairs_slice": 12.0,
    "doc_simhash_pairs_slice": 12.0,
    "embedding_near_dup_pairs_slice": 15.0,
    "semantic_dedup_slice": 15.0,
    # simhash pairs: pair-count-driven like minhash (r6 measured 1.3x
    # at 10x, 15.7x at 100x post-refinement) — same family bound.
    "doc_simhash_pairs": 12.0,
    # linear token scan whose sf0.1 base is fixed-overhead-dominated
    # (~0.24 s); at 10x the big wall is only ~1.3 s so the ratio reads
    # 5-6x on tiny absolute times (r8 artifact: 5.67x under the noise
    # floor). Explicit bound so the row is gated on its own terms
    # instead of hiding under MIN_BIG_SECONDS (r8 VERDICT task 3).
    "doc_token_stats": 8.0,
}

# 100x-data bounds (sf0.1 base -> sf10 big). Linear work at 100x data
# on a fixed 32-thread box is ~100x compute spread over ~3x more
# usable parallelism headroom plus amortized fixed overhead, so even
# healthy linear operators land around 5-15x wall; the pair families
# additionally carry pair-count growth (true near-dup pairs grow 462x
# at 100x docs by the generator's design — tools/candidate_counts.py).
# Each bound = r7/r8 measured ratio (SCALE_PROBE_r7_sf10_pairs.json)
# x ~1.3 headroom for machine noise; a query creeping past that is a
# real regression, not jitter.
DEFAULT_BOUND_100X = 15.0
ALLOWED_RATIOS_100X: dict[str, float] = {
    # bucket BUILD dominates (n_vectors x n_tables x planes zip_with
    # dots — linear in N; the A/B-tested indexed-fold alternative was
    # 3x slower); the ratio reads high only because the sf0.1 base is
    # fixed-overhead-dominated. Candidate join itself is id-only.
    "ann_lsh_topk": 8.0,  # measured 5.2x (r7), linear build
    "dedup_method_agreement": 20.0,  # measured 15.1x (both pair pipelines)
    # r11 slice twin: both arms on deterministic 1/8 universes — the
    # pair-count-driven growth is the full query's, damped ~8x; bound
    # inherited from the MinHash-slice family
    "dedup_method_agreement_slice": 24.0,
    "doc_minhash_lsh_pairs": 24.0,  # measured 17.7x
    # r10 streaming near-dup store round-trips: the SAME signature /
    # banding / verify kernel as doc_minhash_lsh_pairs over
    # (history ∪ batch) plus O(batch) store ingest — inherit its
    # pair-count-driven 100x bound.
    "incremental_neardup_pairs": 24.0,
    "incremental_neardup_pairs_slice": 24.0,
    # r12 (r11 VERDICT task 7): the two cluster-store round-trips
    # measured 3.5x/3.8x at 100x data in r11 under the 15x default —
    # pin ~2x headroom over measurement so a future regression trips
    # the exit-1 gate instead of hiding under the default (the
    # embedding_near_dup_pairs 20->12 tightening pattern). Growth is
    # the LSH-kernel families' pair-count shape, damped by the
    # per-batch restriction to pairs touching the batch.
    "incremental_dup_clusters": 8.0,
    "incremental_dup_clusters_slice": 8.0,
    "doc_shingle_candidates": 45.0,  # measured 33.1x (110x candidate growth)
    # r14 (r13 VERDICT task 3): the CAPPED twin measured 14.63x at
    # 100x in r13 — 0.4% under the 15x default, so ordinary box
    # jitter could trip a healthy row. The ratio reads high only
    # because the cap makes the sf0.1 base FIXED-OVERHEAD-dominated
    # (~1.9 s, mostly job setup); capped candidate growth itself is
    # linearized by max_shingle_df (uncapped twin: 33x). Bound =
    # measured x ~1.35 headroom, same derivation discipline as every
    # entry above.
    "doc_shingle_candidates_capped": 20.0,
    # r11 Arrow-vectorized in-bucket cosine verify (bit-equal to the
    # r9 expression kernel, pinned by test) cut sf10 24.7 -> 7.7 s
    # min-of-3 and sf0.1 1.37 -> 1.04 s: measured ratio ~7.4x; bound
    # TIGHTENED 20 -> 12 (r10 VERDICT task 3). True near-dup pairs
    # still grow 462x at 100x docs by the generator's design, so the
    # wall stays sub-linear in output.
    "embedding_near_dup_pairs": 12.0,
    "fuzzy_name_pairs": 8.0,  # r7 44.1x -> r8 4.4x (corpus-prefix strip)
    "neo4j_dryrun_batches": 13.0,  # measured 9.1x (serial-sink emulation)
    "semantic_dedup": 10.0,  # measured 5.8x
    # r9 in-bucket hamming verify (candidates filtered to the 0.3%
    # survivor set BEFORE the pair-dedup shuffle): sf10 32.4 -> 12.0 s.
    # Bound = fresh measured ratio x ~1.6 headroom.
    "doc_simhash_pairs": 12.0,
    # r15: the CC/keeplist family's first 100x probe rows (they sit on
    # the sf10 ORACLE exclusion list — the recursive-CTE closure is the
    # DuckDB-side quadratic — so only 10x rows existed before). Their
    # ratios read high MECHANICALLY: the r15 driver union-find cut the
    # sf0.1 base 35-50% (fixed job overhead removed), while the sf10
    # wall is pair-GENERATION-dominated and unchanged vs the r14 code
    # (interleaved sf10 A/B: doc_dedup_keeplist 49.7 s r14 vs
    # 44.4-50.6 s r15; cluster_safe_split_slice 26.5 vs 26.2-26.9 —
    # OPTIMIZATION_r15.md). Pair counts at 100x grow like the
    # shared-shingle arm of dedup_method_agreement (its 100x bound:
    # 20x on a 2x-slower base). Bounds = r15 measured ratio x ~1.4
    # headroom, the file's standard derivation.
    "doc_dup_clusters": 42.0,        # measured 30.2x
    "doc_dup_clusters_slice": 24.0,  # measured 15.9x
    "doc_dedup_keeplist": 55.0,      # measured 39.0x
    "doc_dedup_keeplist_slice": 42.0,  # measured 30.2x
    "doc_dedup_quality_keeplist": 40.0,  # measured 28.5x
    "doc_dedup_quality_keeplist_slice": 28.0,  # measured 20.0x
    "cluster_safe_split": 28.0,      # measured 20.3x
    "cluster_safe_split_slice": 32.0,  # measured 22.4x
}

# Zipf-skew bounds (r13, r12 VERDICT task 5): base sf0.1 (uniform) ->
# big localdata/sf1.0_zipf (10x volume, tools/make_sf.py --zipf:
# geometric hot text templates peaking at 7.5%-of-corpus shingle df,
# exact-duplicate hot vector groups peaking at 1.5%). Ratios carry the
# 10x volume AND whatever extra work the skew induces (hot-bucket
# candidate mass, exact-duplicate hot-vector TRUE pairs), so a row
# whose skew handling regressed reads directly as a ratio blowup
# against the uniform base.
# r13 measurement: every probed row landed 1.0-2.1x for 10x ZIPF data
# (worst: doc_shingle_candidates_capped 2.09x, incremental_neardup_pairs
# 1.97x, incremental_dup_clusters 1.62x, semantic_dedup 1.66x,
# doc_minhash_lsh_pairs 1.43x, embedding_near_dup_pairs 1.32x,
# doc_simhash_pairs 1.21x) — the skew machinery (hot-chunk refinement,
# banded candidates, per-key caps, MAX_CELL) absorbs the heat, so the
# zipf bound is the uniform-10x default with >2x headroom over every
# measurement and NO per-query exceptions: a zipf row needing one would
# itself be the regression the probe exists to catch.
DEFAULT_BOUND_ZIPF = 5.0
ALLOWED_RATIOS_ZIPF: dict[str, float] = {}

# Zipf at 100x (r14, r13 VERDICT task 5): base sf0.1 (uniform) -> big
# localdata/sf10_zipf (100x volume AND the r13 skew shape — hot
# templates to 7.5%-of-corpus shingle df, hot vector groups to 1.5%).
# Ratios carry 100x volume + skew-induced extra work, so the
# reference frame is the uniform-100x bound set: a skew-handling
# regression reads as a zipf ratio blowing past the same row's
# uniform-100x bound. r14 measurement (12 rows, cal 0.499): every row
# fits the UNIFORM-100x bounds with no zipf-specific exception —
# worst doc_shingle_candidates_capped 17.6x under its 20x bound (vs
# 14.6x uniform: the skew adds ~20%, inside the entry's headroom);
# the pair/store families land 1.7-9.5x (minhash capped 9.5x,
# neardup round-trips ~6x, dup-cluster round-trips 4.2x, embedding
# pairs 6.0x). Keep this dict a VERBATIM copy of ALLOWED_RATIOS_100X:
# a future zipf row needing its own looser entry IS the skew
# regression this probe exists to catch.
DEFAULT_BOUND_ZIPF_100X = DEFAULT_BOUND_100X
ALLOWED_RATIOS_ZIPF_100X: dict[str, float] = dict(ALLOWED_RATIOS_100X)

# Floor below which ratios are noise, not signal: a 0.2s query going
# to 0.9s is scheduler jitter on a 32-thread local JVM, not a scale
# defect. Only queries whose BIG time clears this are gated.
MIN_BIG_SECONDS = 1.5


def main() -> int:
    args = [a for a in sys.argv[1:]]
    out_json = None
    if "--json" in args:
        i = args.index("--json")
        out_json = args[i + 1]
        del args[i : i + 2]
    bounds_tag = "10x"
    if "--bounds" in args:
        i = args.index("--bounds")
        bounds_tag = args[i + 1]
        del args[i : i + 2]
    if bounds_tag not in ("10x", "100x", "zipf", "zipf100x"):
        print(
            f"unknown --bounds {bounds_tag!r} (want 10x, 100x, zipf or "
            "zipf100x)",
            file=sys.stderr,
        )
        return 2
    bounds, default_bound = {
        "10x": (ALLOWED_RATIOS, DEFAULT_BOUND),
        "100x": (ALLOWED_RATIOS_100X, DEFAULT_BOUND_100X),
        "zipf": (ALLOWED_RATIOS_ZIPF, DEFAULT_BOUND_ZIPF),
        "zipf100x": (ALLOWED_RATIOS_ZIPF_100X, DEFAULT_BOUND_ZIPF_100X),
    }[bounds_tag]
    base_dir = args[0] if args else "/root/testdata/sf0.1"
    big_dir = args[1] if len(args) > 1 else "/root/repo/localdata/sf1.0"
    only = set(args[2:])

    from hubspot_neo4j_pipeline_spark.plans import get_queries
    from hubspot_neo4j_pipeline_spark.session import get_spark

    spark = get_spark(app_name="scale_probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))

    def timed(fn, sf_dir: str) -> float | None:
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            except Exception as exc:
                print(f"probe error at {sf_dir}: {exc}", file=sys.stderr)
                return None
            finally:
                spark.catalog.clearCache()
            el = time.perf_counter() - t0
            best = el if best is None or el < best else best
        return best

    registry = get_queries()
    unknown = only - set(registry)
    if unknown:
        # a typo'd filter must fail loudly, not probe zero queries and
        # exit green — this is a GATE, silent passes defeat it
        print(f"unknown query name(s): {sorted(unknown)}", file=sys.stderr)
        return 2

    rows = []
    failures = []
    for name, fn in sorted(registry.items()):
        if only and name not in only:
            continue
        t_base = timed(fn, base_dir)
        t_big = timed(fn, big_dir)
        if t_base is None or t_big is None:
            failures.append((name, "error"))
            rows.append({"query": name, "base": t_base, "big": t_big, "ratio": None})
            continue
        ratio = t_big / t_base if t_base > 0 else float("inf")
        bound = bounds.get(name, default_bound)
        gated = t_big >= MIN_BIG_SECONDS and ratio > bound
        row = {
            "query": name,
            "base": round(t_base, 3),
            "big": round(t_big, 3),
            "ratio": round(ratio, 2),
            "bound": bound,
            "exceeds": gated,
        }
        if ratio > bound and not gated:
            # the bound was exceeded but the big wall sits under the
            # jitter floor — say so IN the artifact, so no committed
            # row ever reads ratio > bound unexplained (r8 VERDICT
            # task 3: doc_token_stats drifted past its bound invisibly
            # until it would have crossed the floor already red)
            row["note"] = (
                f"over bound but big < {MIN_BIG_SECONDS}s noise floor; "
                "not gated — absolute time too small to be signal"
            )
        rows.append(row)
        flag = " <<< EXCEEDS" if gated else ""
        print(
            f"{name:36s} base={t_base:7.3f}s big={t_big:8.3f}s "
            f"ratio={ratio:7.2f}x bound={bound:.0f}x{flag}"
        )
        if gated:
            failures.append((name, f"{ratio:.1f}x > {bound:.0f}x"))

    print(f"\n{len(rows)} probed, {len(failures)} exceed bounds")
    for name, why in failures:
        print(f"  FAIL {name}: {why}")
    if out_json:
        # r13 (r12 VERDICT task 1): stamp the box's speed into the
        # artifact (same fixed calibration task as bench.py) so probe
        # ratios/absolutes from different rounds can be compared
        # box-normalized instead of by folklore box adjustments.
        from tools.calibrate import calibration_sec

        with open(out_json, "w") as fh:
            json.dump(
                {
                    "base_dir": base_dir,
                    "big_dir": big_dir,
                    "bounds": bounds_tag,
                    "calibration_sec": calibration_sec(spark),
                    "rows": rows,
                },
                fh,
                indent=1,
            )
        from tools import gatefresh

        gatefresh.record([out_json])  # gate-freshness (r11): artifact pins the engine code it measured
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
