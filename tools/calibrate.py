"""Box-speed calibration for timing artifacts (r12 VERDICT task 1).

Every round's perf claims were judged against artifacts produced on
boxes whose speed differs 15-20% round-to-round, and nothing in the
artifacts could normalize that away — the r12 flagship bar dispute
("17.3 s vs a 16 s bar set on a faster box") is exactly the failure.
This module gives every timing artifact a fixed, DATA-INDEPENDENT
yardstick: one seeded in-memory Spark aggregation of fixed
cardinality, min-of-`reps` wall time, recorded as ``calibration_sec``.
Two artifacts' per-query times can then be compared box-normalized
(t / calibration_sec), turning "the box was slower" from folklore into
a number (tools/bench_compare.py prints both raw and normalized
deltas; PERF.md keeps the box-class history).

The task is chosen to look like the engine's own hot path — a
range-generated 48M-row scan through whole-stage-codegen arithmetic
into a 9973-key hash aggregate with one shuffle — so it co-varies with
the engine's real sensitivity to CPU speed, thread steal, and shuffle
overhead, rather than with disk or JIT warmup. It reads no files and
uses no randomness, so the SAME work runs on every box, every round.
"""

from __future__ import annotations

import time

# Fixed workload constants — changing any of these breaks comparability
# of calibration_sec across rounds, so don't. ~1-2 s on the r12-class
# 32-thread boxes: big enough to dwarf scheduling jitter, small enough
# to run min-of-3 in every artifact without moving the gate's runtime.
CAL_ROWS = 48_000_000
CAL_PARTITIONS = 32
CAL_KEYS = 9_973  # prime, so id % CAL_KEYS spreads uniformly


def calibration_sec(spark, reps: int = 3) -> float:
    """Min-of-`reps` wall seconds for the fixed calibration aggregate.

    Callers run this AFTER their own JVM warmup so the number measures
    the box, not codegen compilation of the first-ever stage.
    """
    df = (
        spark.range(0, CAL_ROWS, 1, CAL_PARTITIONS)
        .selectExpr(
            f"id % {CAL_KEYS} AS k",
            # cheap but un-foldable per-row arithmetic (multiplies by a
            # Knuth-style odd constant) keeps the scan CPU-bound
            "(id * 2654435761) % 1000003 AS v",
        )
        .groupBy("k")
        .agg({"v": "sum", "*": "count"})
    )
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        el = time.perf_counter() - t0
        best = el if best is None or el < best else best
    return round(best, 3)
