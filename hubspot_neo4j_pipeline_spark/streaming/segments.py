"""Shared LSM-style segment-store primitives for streaming state kept
on plain parquet (no table-format jar available offline).

Extracted from the r9 gram store so the OTHER O(store)-per-batch
maintainer (the streaming SCD2 upsert) can reuse the identical
commit/replay/crash contract instead of re-deriving it:

    store/
      meta.json        atomic commit pointer (tmp + os.replace):
                       {"base": "base-<n>"|null, "consumed_through": k}
      base-<n>/        the compacted view (layout is the domain
                       store's business — bucket- or key-partitioned)
      deltas/b<id>/    ONE directory per ingested micro-batch,
                       written to a _tmp dir then os.rename'd into
                       place: the rename IS the commit, so a
                       half-written delta is never visible

Contracts (see streaming/gram_store.py's docstring for the full
crash-point walk-through):
  * a batch id is ingested iff ``deltas/b<id>`` exists or
    id <= consumed_through — exact per-batch replay guard, safe under
    out-of-order redelivery;
  * every mutation before the meta.json os.replace is invisible to
    readers and garbage-collectable (``sweep``);
  * readers resolve ONLY meta's base plus deltas with
    id > consumed_through.
"""

from __future__ import annotations

import json
import os
import shutil

META = "meta.json"
DELTAS = "deltas"


def read_meta(store_path: str) -> dict:
    p = os.path.join(store_path, META)
    if not os.path.exists(p):
        return {"base": None, "consumed_through": -1}
    with open(p) as fh:
        return json.load(fh)


def write_meta(store_path: str, meta: dict) -> None:
    """Atomic commit: tmp file + os.replace — readers see the old or
    the new pointer, never a torn one. This replace is the ONLY
    mutation that changes what a reader resolves.

    The tmp name is unique per writer (pid + thread id): concurrent
    INDEPENDENT ingests (streaming/backfill.py, guide §2.6) may pin
    identical meta values from two driver threads at once, and a
    shared tmp name would let one writer os.replace the file out from
    under the other mid-commit (measured: FileNotFoundError under a
    2-thread backfill). Unique tmps make every replace self-contained;
    last writer wins, and concurrent pinners write identical dicts by
    construction (pin values derive from store params and batch
    schema, not from wall order).

    ``CHECK_CONVERGENT_META`` (r15, r14 VERDICT hardening): the
    identical-dicts convention above is load-bearing — a future store
    pinning batch-DEPENDENT meta through a concurrent backfill would
    corrupt silently. With the flag on (tests), the committed pointer
    is read back and must equal the dict this writer just wrote; any
    divergent concurrent pinner trips the assertion in one of the two
    writers."""
    import threading

    tmp = os.path.join(
        store_path, f"{META}.tmp-{os.getpid()}-{threading.get_ident()}"
    )
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(store_path, META))
    if CHECK_CONVERGENT_META:
        committed = read_meta(store_path)
        assert committed == json.loads(json.dumps(meta)), (
            "non-convergent concurrent write_meta: committed "
            f"{committed!r} != written {meta!r} — concurrent pinners "
            "must write identical dicts (streaming/backfill.py)"
        )


# Debug assertion for the concurrent-pinner convention in write_meta —
# off in production (an extra read per commit), switched on by the
# test suite (tests/conftest.py) so every store tour the tests run
# verifies the convention end-to-end.
CHECK_CONVERGENT_META = False


def committed_deltas(store_path: str) -> dict[int, str]:
    """batch_id -> absolute delta dir, committed (renamed) dirs only."""
    d = os.path.join(store_path, DELTAS)
    if not os.path.isdir(d):
        return {}
    out: dict[int, str] = {}
    for name in os.listdir(d):
        if name.startswith("b") and name[1:].isdigit():
            out[int(name[1:])] = os.path.join(d, name)
    return out


def live_deltas(store_path: str, meta: dict | None = None) -> dict[int, str]:
    """Deltas a reader must resolve: committed and not yet folded into
    the base (id > consumed_through). Stranded consumed dirs a crash
    left behind are excluded here and removed by ``sweep``."""
    meta = meta or read_meta(store_path)
    return {
        b: p
        for b, p in committed_deltas(store_path).items()
        if b > meta["consumed_through"]
    }


def sweep(store_path: str, meta: dict) -> None:
    """Remove leftovers a crash between commit and cleanup can strand:
    consumed deltas, base dirs meta doesn't point to, orphan _tmp
    ingest dirs. Nothing here is reader-resolvable, but sweep must NOT
    run concurrently with an in-flight ingest of the same store (the
    documented no-compaction-during-ingest discipline,
    streaming/backfill.py): it would tear a mid-write ``_tmp-`` dir.
    Meta tmp files are additionally pid-guarded below, so even a
    misplaced concurrent sweep cannot yank a live writer's tmp out
    from under its os.replace (r15, r14 ADVICE)."""
    for bid, path in committed_deltas(store_path).items():
        if bid <= meta["consumed_through"]:
            shutil.rmtree(path, ignore_errors=True)
    own_prefix = f"{META}.tmp-{os.getpid()}-"
    for name in os.listdir(store_path):
        full = os.path.join(store_path, name)
        if name.startswith("base-") and name != (meta["base"] or ""):
            shutil.rmtree(full, ignore_errors=True)
        elif name.startswith("_tmp-"):
            shutil.rmtree(full, ignore_errors=True)
        elif name.startswith(META + ".tmp") and not name.startswith(
            own_prefix
        ):
            # a crash between write_meta's dump and replace strands a
            # per-writer tmp file (never reader-resolvable). The name
            # encodes the writer's pid: tmps of THIS process are
            # skipped — they may belong to an in-flight write_meta on
            # another driver thread; a dead process's tmps (different
            # pid) are always fair game.
            try:
                os.remove(full)
            except OSError:
                pass


def already_ingested(store_path: str, batch_id: int) -> bool:
    meta = read_meta(store_path)
    return batch_id <= meta["consumed_through"] or batch_id in committed_deltas(
        store_path
    )


def next_batch_id(store_path: str) -> int:
    meta = read_meta(store_path)
    return max([meta["consumed_through"], *committed_deltas(store_path)]) + 1


MANIFEST = "_delta_manifest.json"

# commit_delta's manifest needs the delta's distinct bucket ids + row
# count. Below this many parquet BYTES the driver reads the single
# bucket column itself (pyarrow — microseconds, zero Spark jobs);
# above it, a Spark aggregation job does it distributed. Micro-batch
# deltas are small by construction, so the driver path is the normal
# case; the threshold only guards a bulk misuse (someone committing a
# corpus-sized frame as one delta).
MANIFEST_DRIVER_MAX_BYTES = 128 * 1024 * 1024


def _delta_parquet_files(tmp: str) -> list[str]:
    return [
        os.path.join(tmp, name)
        for name in os.listdir(tmp)
        if name.endswith(".parquet")
    ]


def _manifest_counts(df, tmp: str, bucket_col: str) -> tuple[list[int], int]:
    """(sorted distinct bucket ids, row count) of the just-written tmp
    parquet. Driver-side single-column pyarrow read when the delta is
    small (no Spark job — r12: the per-delta manifest job was ~0.4 s of
    fixed overhead on every micro-batch ingest); Spark aggregation
    past MANIFEST_DRIVER_MAX_BYTES. Either way a slim re-read of the
    written bytes, never a recompute of the batch plan."""
    files = _delta_parquet_files(tmp)
    if sum(os.path.getsize(f) for f in files) <= MANIFEST_DRIVER_MAX_BYTES:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        touched: set[int] = set()
        rows = 0
        for f in files:
            t = pq.read_table(f, columns=[bucket_col])
            rows += t.num_rows
            touched.update(
                int(v) for v in pc.unique(t.column(bucket_col)).to_pylist()
                if v is not None
            )
        return sorted(touched), rows
    per_bucket = (
        df.sparkSession.read.parquet(tmp).groupBy(bucket_col).count().collect()
    )
    return sorted(r[0] for r in per_bucket), int(sum(r[1] for r in per_bucket))


# Driver-side delta commit (r14 round-2, the round-1 "not yet
# optimized" #1; guide §5 — the driver can own driver-bounded work).
# A micro-batch delta is typically a few thousand slim rows, but the
# Spark write job still pays write-task launch + the Hadoop committer
# (_temporary dirs, per-task + job commit renames) + the manifest's
# re-read of the written files — measured ~0.1-0.3 s of fixed cost per
# commit at sf0.1 against a 0.5-0.7 s total. When the PLANNER estimates
# the delta small, the driver collects it as one Arrow table (same
# single plan execution the write job pays), writes one parquet file
# with pyarrow, and derives the manifest from the in-memory table —
# zero extra I/O. Gates, conservative in both directions:
#   * planner estimate (optimizedPlan().stats().sizeInBytes) must be
#     under DRIVER_COMMIT_MAX_EST — estimates on these post-aggregate
#     plans measured within ~5x of actual Arrow bytes, and an eagerly
#     checkpointed input (the SCD2 upsert path) reports "unknown"
#     (huge), so bulk and unknown-size deltas keep the distributed
#     write;
#   * the collected table's ACTUAL bytes must be under
#     DRIVER_COMMIT_MAX_ACTUAL or the Spark path re-executes (rare
#     misestimate; correctness never depends on the gate).
# Byte compatibility is pinned by test_driver_commit_parity: for every
# store's delta shape (strings/longs/decimals/timestamps/bool/arrays)
# the pyarrow-written file reads back through spark.read.parquet with
# identical dtypes and rows as a Spark-written one.
DRIVER_COMMIT_MAX_EST = 16 * 1024 * 1024
DRIVER_COMMIT_MAX_ACTUAL = 128 * 1024 * 1024


def plan_size_estimate(df) -> int | None:
    """Catalyst's optimized-plan output-size estimate in bytes, or
    None when the API is unavailable. An UNKNOWN size (LogicalRDD
    inputs — checkpoints, driver frames) surfaces as a huge number, so
    comparing against a small threshold naturally fails the gate. Used
    by stores whose final delta plan joins a driver frame (the vector
    store's pinned-planes row): they estimate on the parquet-rooted
    subplan BEFORE that join and pass ``est_bytes`` to commit_delta."""
    try:
        return int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return None


def _try_driver_table(df, est_bytes: int | None = None):
    """The delta as a pyarrow table IF the planner (or the caller's
    ``est_bytes`` override) thinks it is small, else None. Any failure
    (stats API drift, Arrow conversion of an exotic type, result-size
    cap) falls back to the Spark write."""
    try:
        est = est_bytes if est_bytes is not None else plan_size_estimate(df)
        if est is None or est > DRIVER_COMMIT_MAX_EST:
            return None
        # NOTE: toArrow() materializes the full delta on the driver
        # BEFORE the actual-size check below, so a pathological
        # underestimate (<16 MB estimate on a genuinely large delta)
        # is bounded only by spark.driver.maxResultSize (default 1 GB)
        # until the 128 MB cap rejects it post-collect. MAX_EST is
        # sized ~8x under MAX_ACTUAL precisely so the observed ~5x
        # estimate error keeps est*5 under the cap; a maxResultSize
        # abort lands in this except and falls back to the
        # distributed write (fallback pinned by
        # test_driver_commit_fallback_on_misestimate).
        tbl = df.toArrow()
        if tbl.nbytes > DRIVER_COMMIT_MAX_ACTUAL:
            return None
        return tbl
    except Exception:
        return None


def commit_delta(
    df,
    store_path: str,
    batch_id: int,
    bucket_col: str | None = None,
    est_bytes: int | None = None,
) -> None:
    """Write ``df`` as delta segment b<batch_id>: parquet into a _tmp
    dir, then one atomic os.rename. A crashed previous attempt's _tmp
    is cleared first (it was never reader-visible).

    Small deltas (planner-estimated — see _try_driver_table) execute
    the plan ONCE into a driver Arrow table and commit as a single
    pyarrow-written file, skipping the write job's committer overhead
    and the manifest re-read; large or unknown-size deltas take the
    distributed write exactly as before. ``est_bytes`` lets a caller
    whose final plan hides its size behind a driver-frame join supply
    the estimate itself (see plan_size_estimate).

    ``bucket_col`` (r10, bucket-partial compaction): name of an
    integer bucket column carried by ``df``. When given, the distinct
    bucket ids present in the batch are collected from the
    just-written tmp parquet (a slim re-read, never a recompute of the
    batch plan) — or straight from the driver table on the small-delta
    path — into a ``_delta_manifest.json`` INSIDE the delta dir —
    written before the rename, so the manifest commits atomically with
    the data. Compactions use the union of live manifests to merge
    only touched buckets and carry the rest of the base over by
    hard-link (``untouched_partitions`` / ``link_tree``)."""
    os.makedirs(os.path.join(store_path, DELTAS), exist_ok=True)
    tmp = os.path.join(store_path, f"_tmp-b{batch_id}")
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    manifest: tuple[list[int], int] | None = None
    wrote_driver = False
    tbl = _try_driver_table(df, est_bytes)
    if tbl is not None:
        # the whole driver path — write AND manifest derivation — is
        # guarded (r15, r14 ADVICE): an Arrow-compute failure in the
        # manifest used to abort the commit with a stranded _tmp dir
        # instead of falling back like every other driver-path failure
        try:
            import pyarrow.compute as pc
            import pyarrow.parquet as pq

            os.makedirs(tmp)
            pq.write_table(
                tbl, os.path.join(tmp, "part-00000-driver.parquet"),
                compression="zstd",
            )
            if bucket_col is not None:
                manifest = (
                    sorted(
                        int(v)
                        for v in pc.unique(tbl.column(bucket_col)).to_pylist()
                        if v is not None
                    ),
                    tbl.num_rows,
                )
            wrote_driver = True
        except Exception:
            shutil.rmtree(tmp, ignore_errors=True)
            manifest = None
    if not wrote_driver:
        df.write.mode("overwrite").parquet(tmp)
        if bucket_col is not None:
            # one slim pass over the just-written parquet gives BOTH
            # the touched-bucket list (partial compaction) and the
            # delta's row count (r11: scale-adaptive bucket sizing) —
            # see _manifest_counts for the small-delta driver shortcut
            manifest = _manifest_counts(df, tmp, bucket_col)
    if manifest is not None:
        touched, rows = manifest
        with open(os.path.join(tmp, MANIFEST), "w") as fh:
            json.dump(
                {"bucket_col": bucket_col, "touched": touched, "rows": rows},
                fh,
            )
    os.rename(tmp, os.path.join(store_path, DELTAS, f"b{batch_id}"))


def delta_manifest(delta_path: str) -> dict | None:
    """The delta's bucket manifest, or None for pre-r10 deltas written
    without one (compactions then fall back to a full-base rewrite)."""
    p = os.path.join(delta_path, MANIFEST)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def touched_buckets(deltas: dict[int, str], bucket_col: str) -> list[int] | None:
    """Union of the live deltas' touched buckets, or None if ANY delta
    lacks a manifest / disagrees on the bucket column (mixed-layout
    stores compact via the full path — correctness never depends on
    the manifests, they only shrink the compaction's I/O)."""
    out: set[int] = set()
    for _bid, path in deltas.items():
        m = delta_manifest(path)
        if m is None or m.get("bucket_col") != bucket_col:
            return None
        out.update(m["touched"])
    return sorted(out)


def link_tree(src_dir: str, dst_dir: str) -> None:
    """Hard-link every file of ``src_dir`` into a fresh ``dst_dir``
    (copy on filesystems without link support). Used to carry a base's
    untouched bucket partitions into the next base generation without
    rewriting their bytes — the links share inodes, so the carry-over
    is O(files), not O(bytes)."""
    os.makedirs(dst_dir, exist_ok=True)
    for name in os.listdir(src_dir):
        s = os.path.join(src_dir, name)
        d = os.path.join(dst_dir, name)
        if os.path.isdir(s):
            link_tree(s, d)
        else:
            try:
                os.link(s, d)
            except OSError:
                shutil.copy2(s, d)


def assemble_partial_base(
    store_path: str,
    old_base: str,
    merged_tmp: str,
    new_base: str,
    bucket_col: str,
    touched: list[int],
) -> None:
    """Build ``new_base`` from a partial-compaction merge: hard-link
    the old base's untouched ``<bucket_col>=K`` partition dirs, move
    the freshly-merged touched partitions in from ``merged_tmp``, then
    one os.rename into place. Everything happens under a ``_tmp-``
    name the sweeper reclaims, and the old base stays intact until the
    meta replace commits the new one — identical crash contract to the
    full rewrite."""
    touched_names = {f"{bucket_col}={t}" for t in touched}
    tmp_base = os.path.join(store_path, f"_tmp-{new_base}")
    if os.path.exists(tmp_base):
        shutil.rmtree(tmp_base)
    os.makedirs(tmp_base)
    old_path = os.path.join(store_path, old_base)
    prefix = f"{bucket_col}="
    for name in os.listdir(old_path):
        if name.startswith(prefix) and name not in touched_names:
            link_tree(os.path.join(old_path, name), os.path.join(tmp_base, name))
    for name in os.listdir(merged_tmp):
        if name.startswith(prefix):
            os.rename(os.path.join(merged_tmp, name), os.path.join(tmp_base, name))
    shutil.rmtree(merged_tmp, ignore_errors=True)
    os.rename(tmp_base, os.path.join(store_path, new_base))


def pin_n_buckets(store_path: str, meta: dict, n_buckets: int) -> int:
    """The store's bucket count, pinned in meta at first ingest.
    Partial compaction carries untouched base partitions over
    verbatim, which is only sound when every delta and every base
    generation share ONE bucketing — later callers passing a
    different count get the pinned one back."""
    if meta.get("n_buckets"):
        return meta["n_buckets"]
    meta["n_buckets"] = n_buckets
    write_meta(store_path, meta)
    return n_buckets


def pin_value(store_path: str, meta: dict, key: str, value) -> None:
    """Pin an immutable store property (e.g. the id column's Spark
    dtype) in meta at first ingest and RAISE on any later mismatch —
    the same provenance rule as ``pin_n_buckets``, but for properties
    where silently keeping the old value would corrupt semantics
    instead of just layout (r10 ADVICE: a store whose min-owner ids
    switch from long to string mid-life silently flips min() from
    numeric to lexicographic)."""
    if meta.get(key) is not None:
        if meta[key] != value:
            raise ValueError(
                f"store {store_path} pinned {key}={meta[key]!r} at first "
                f"ingest, got {value!r} — rebuild the store to change it"
            )
        return
    meta[key] = value
    write_meta(store_path, meta)


# Scale-adaptive bucketing (r11, r10 VERDICT task 5). A store's bucket
# count is still pinned for LAYOUT consistency (every live delta and
# the base must share one bucketing for partial carry-over), but it is
# no longer pinned for LIFE: at compaction time — the one moment the
# whole visible state is rewritten into a single new generation — the
# count may GROW (power-of-2 steps) when the store has outgrown it.
# Sizing rule: keep ~ROWS_PER_BUCKET rows per bucket in the compacted
# base, so per-bucket partition work stays bounded as the store grows
# 10-1000x; without growth, production batch sizes eventually touch
# every bucket and partial compaction degrades to the full rewrite.
# Growth always takes the full-rewrite path (the manifests' bucket ids
# are meaningless under the new modulus) and commits the new count in
# the same atomic meta replace as the new base — deltas written after
# it pick the grown count up from meta via pin_n_buckets.
ROWS_PER_BUCKET = 2_000_000


def grown_n_buckets(
    meta: dict,
    deltas: dict[int, str],
    n_buckets: int,
    rows_per_bucket: int = ROWS_PER_BUCKET,
) -> int:
    """Bucket count for the NEXT base generation: doubled until the
    store's known row count fits ~rows_per_bucket per bucket; never
    shrinks. Row counts come from meta's ``base_rows`` (recorded at
    every compaction) plus the live deltas' manifest ``rows`` — when
    either is missing (pre-r11 state) the current count is kept, so
    correctness never depends on the sizing metadata."""
    total = 0
    if meta.get("base"):
        if meta.get("base_rows") is None:
            return n_buckets
        total += int(meta["base_rows"])
    for _bid, path in deltas.items():
        m = delta_manifest(path)
        if m is None or "rows" not in m:
            return n_buckets
        total += int(m["rows"])
    grown = n_buckets
    while total > grown * rows_per_bucket:
        grown *= 2
    return grown


def base_row_count(spark, store_path: str, base_name: str) -> int:
    """Row count of a committed base — parquet-footer metadata only,
    read driver-side with pyarrow (r12: the previous Spark count was
    footer-cheap too but scheduled a whole job per compaction; the
    store lives on a local filesystem by the segments contract —
    os.rename IS the commit — so the driver can read the footers
    directly). Recorded in meta as ``base_rows`` for the next
    compaction's sizing decision. ``spark`` is unused, kept for call
    symmetry with the store modules."""
    import pyarrow.parquet as pq

    total = 0
    for root, _dirs, files in os.walk(os.path.join(store_path, base_name)):
        for name in files:
            if name.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(root, name)).metadata.num_rows
    return total


def write_base(df, store_path: str, base_name: str, bucket_col: str) -> bool:
    """Write a compacted base generation, hive-partitioned by
    ``bucket_col``. Returns False — with the destination REMOVED —
    when ``df`` had no rows: partitionBy on a 0-row frame writes no
    part files at all, leaving a directory Spark cannot re-read
    (UNABLE_TO_INFER_SCHEMA; surfaced r12 when a slice-twin corpus
    restriction made a whole compaction window empty). Callers then
    commit ``base: None``: a store whose merged visible state has
    zero rows IS the empty store, and every reader already handles
    that. Rows are never deleted by any store's merge rule, so this
    only happens when the base was already None and every live delta
    was empty."""
    dest = os.path.join(store_path, base_name)
    df.repartition(bucket_col).write.partitionBy(bucket_col).mode(
        "overwrite"
    ).parquet(dest)
    for _root, _dirs, files in os.walk(dest):
        if any(f.endswith(".parquet") for f in files):
            return True
    shutil.rmtree(dest, ignore_errors=True)
    return False


def next_base_name(meta: dict) -> str:
    gen = int(meta["base"].split("-")[1]) + 1 if meta["base"] else 0
    return f"base-{gen}"


def store_stats(store_path: str) -> dict:
    """Operational introspection: one dict describing the store's
    visible state — base generation and its recorded row count, live
    delta ids with manifest row counts, the pinned layout/provenance
    properties, and the touched-bucket fraction the NEXT compaction
    would merge (1.0 when any live delta lacks a manifest or a growth
    is pending). Reads meta + manifests only — no data scan, safe on
    a live store."""
    meta = read_meta(store_path)
    deltas = live_deltas(store_path, meta)
    delta_rows: dict[int, int | None] = {}
    touched: set | None = set()
    for bid, path in sorted(deltas.items()):
        m = delta_manifest(path)
        delta_rows[bid] = None if m is None else int(m.get("rows", -1))
        if touched is not None and m is not None and "touched" in m:
            touched.update(m["touched"])
        else:
            touched = None
    n_buckets = meta.get("n_buckets")
    pending_growth = (
        grown_n_buckets(meta, deltas, n_buckets) != n_buckets
        if n_buckets and deltas
        else False
    )
    frac = None
    if n_buckets:
        if pending_growth or touched is None or not meta.get("base"):
            frac = 1.0 if deltas else 0.0
        else:
            frac = len(touched) / n_buckets
    layout_keys = {
        "base", "consumed_through", "n_buckets", "base_n_buckets",
        "base_rows",
    }
    return {
        "base": meta["base"],
        "base_rows": meta.get("base_rows"),
        "n_buckets": n_buckets,
        "base_n_buckets": meta.get("base_n_buckets"),
        "consumed_through": meta["consumed_through"],
        "live_delta_ids": sorted(deltas),
        "live_delta_rows": delta_rows,
        "next_compaction_bucket_fraction": frac,
        "pending_bucket_growth": pending_growth,
        "pinned": {
            k: v for k, v in meta.items() if k not in layout_keys
        },
    }


def bootstrap_base(
    df,
    store_path: str,
    bucket_col: str,
    n_buckets: int,
    extra_meta: dict | None = None,
) -> None:
    """Day-0 BULK LOAD: write ``df`` (already in the store's row
    shape, carrying ``bucket_col``) directly as the first compacted
    base — one partitioned write plus one atomic meta commit: the
    right path for loading an existing corpus into a store before
    streaming starts. Refuses on a non-empty store (bootstrap is not
    an upsert).

    The commit records ``consumed_through: -1`` (r12, ADVICE fix):
    the base carries the bootstrapped data and no deltas exist to
    resurrect, so -1 is safe — and anything else silently DROPS the
    first streamed micro-batch, because Structured Streaming batch
    ids start at 0 on a fresh checkpoint and the replay guard treats
    id <= consumed_through as already applied. Pinned by
    test_bootstrap_then_stream_batch_zero."""
    meta = read_meta(store_path)
    if meta["base"] or committed_deltas(store_path):
        raise ValueError(
            f"bootstrap requires an empty store, {store_path} is not"
        )
    os.makedirs(store_path, exist_ok=True)
    base = "base-0"
    if not write_base(df, store_path, base, bucket_col):
        raise ValueError(
            "bootstrap_base got a 0-row frame — nothing to bulk-load; "
            "start streaming into the empty store instead"
        )
    write_meta(
        store_path,
        {
            **meta,
            **(extra_meta or {}),
            "base": base,
            "consumed_through": -1,
            "n_buckets": n_buckets,
            "base_n_buckets": n_buckets,
            "base_rows": base_row_count(df.sparkSession, store_path, base),
        },
    )


def sized_n_buckets(n_rows: int, floor: int = 32) -> int:
    """Bucket count for a bulk load of ``n_rows`` store rows — the
    compaction growth rule applied up front (power-of-2, ~
    ROWS_PER_BUCKET rows per bucket, never below the default floor)."""
    n = floor
    while n_rows > n * ROWS_PER_BUCKET:
        n *= 2
    return n
