"""Overlap INDEPENDENT store ingests from a small driver thread pool
(optimization guide §2.6: actions are only sequential because driver
code calls them sequentially — independent jobs submitted concurrently
back-fill executor capacity freed by each other's stage tails).

Applies to delta commits that are independent by the LSM segment
contract (streaming/segments.py): an ``update_batch`` that never reads
existing store state writes only its own ``deltas/b<id>`` dir, and the
store's visible state is a pure function of the COMMITTED ids, not of
wall-clock commit order. Historical backfill — loading N already-known
micro-batches with explicit ids — is exactly that case, so the batches
may ingest concurrently. What may NOT run concurrently with anything:

* compaction (it snapshots ``live_deltas`` and its ``sweep`` removes
  ``_tmp-*`` dirs, which would tear a mid-write ingest's tmp) — run it
  AFTER joining the pool, with the trigger disabled inside the pool
  (``compact_every`` larger than the batch count);
* the SCD2 ``upsert_batch`` (classifies against ``read_current`` — a
  true sequential dependency);
* a vector-store FIRST ingest (it pins the plane set later batches
  must bucket with).

Meta pins under concurrency are convergent: every concurrent pinner
derives the identical value (bucket count from store params, dtype
from the shared batch schema), and ``segments.write_meta`` commits
each write with a per-writer tmp + atomic replace, so any interleaving
ends at the same meta.

Production note: this is the same technique a cluster deployment uses
to hide stage-tail idle during backfill; Structured Streaming's
foreachBatch path stays strictly sequential (one live micro-batch at a
time) and never goes through this helper.
"""

from __future__ import annotations

from typing import Callable


def run_concurrently(*thunks: Callable[[], None], max_workers: int = 3) -> None:
    """Run independent zero-arg ingest thunks on a small thread pool
    and re-raise the first failure (after every thread has finished,
    so no thunk is left mid-write when the caller proceeds to a
    compaction or read). Job descriptions/groups stay correct per
    thread via ``inheritable_thread_target``; 2-3 in flight is plenty
    (guide §2.6) — enough to fill stage tails, not enough to fight
    over executor slots."""
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.util import inheritable_thread_target

    if len(thunks) == 1:
        thunks[0]()
        return
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        futures = [pool.submit(inheritable_thread_target(t)) for t in thunks]
        errs = []
        for f in futures:
            try:
                f.result()
            except Exception as exc:  # join ALL before raising
                errs.append(exc)
        if errs:
            raise errs[0]
