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
    mutation that changes what a reader resolves."""
    tmp = os.path.join(store_path, META + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(store_path, META))


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
    ingest dirs. Safe any time — nothing here is reader-resolvable."""
    for bid, path in committed_deltas(store_path).items():
        if bid <= meta["consumed_through"]:
            shutil.rmtree(path, ignore_errors=True)
    for name in os.listdir(store_path):
        full = os.path.join(store_path, name)
        if name.startswith("base-") and name != (meta["base"] or ""):
            shutil.rmtree(full, ignore_errors=True)
        elif name.startswith("_tmp-"):
            shutil.rmtree(full, ignore_errors=True)


def already_ingested(store_path: str, batch_id: int) -> bool:
    meta = read_meta(store_path)
    return batch_id <= meta["consumed_through"] or batch_id in committed_deltas(
        store_path
    )


def next_batch_id(store_path: str) -> int:
    meta = read_meta(store_path)
    return max([meta["consumed_through"], *committed_deltas(store_path)]) + 1


def commit_delta(df, store_path: str, batch_id: int) -> None:
    """Write ``df`` as delta segment b<batch_id>: parquet into a _tmp
    dir, then one atomic os.rename. A crashed previous attempt's _tmp
    is cleared first (it was never reader-visible)."""
    os.makedirs(os.path.join(store_path, DELTAS), exist_ok=True)
    tmp = os.path.join(store_path, f"_tmp-b{batch_id}")
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    df.write.mode("overwrite").parquet(tmp)
    os.rename(tmp, os.path.join(store_path, DELTAS, f"b{batch_id}"))


def next_base_name(meta: dict) -> str:
    gen = int(meta["base"].split("-")[1]) + 1 if meta["base"] else 0
    return f"base-{gen}"
