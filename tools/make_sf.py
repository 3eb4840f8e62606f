"""Synthesize a larger SF locally by structure-preserving replication
of the driver's sf0.1 tables (r4 VERDICT task 1: turn the 100x-scale
posture from argument into measurement).

Usage: python tools/make_sf.py [dest_dir] [--mult N] [--src sf_dir]
Default: 10x sf0.1 -> /root/repo/localdata/sf1.0 (~6M lineitem rows).

Replication rules (copy c = 0..N-1; copy 0 is the original bytes):
- Dense surrogate keys shift by c * key_range, preserving referential
  integrity (orders->customer, lineitem->orders/part/supplier,
  events.user_id->customer key space, embeddings<->documents id space).
- Key-derived names (Customer#..., Supplier#...) are regenerated from
  the NEW key so name-match operators (entity match, fuzzy pairs) see
  10x unique entities, not 10 aliases of each — a naive copy would
  manufacture a 100x name-join blowup that no real 10x corpus has.
- Document text mutates per copy: every word at position p with
  (p-1) % 7 == (c-1) % 7 becomes word~c. WITHIN a copy the mutation is
  position-aligned, so exact-dup groups and shingle-overlap structure
  replicate exactly (near-dup pair count scales linearly); ACROSS
  copies only ~1/7 of 5-gram windows avoid both copies' mutated slots,
  so cross-copy Jaccard lands far below the dedup thresholds — 10x
  data means ~10x dup pairs, not 100x. n_chars is recomputed.
- Embeddings rotate by c positions: within-copy cosines are preserved
  exactly (near-dup/ANN structure replicates linearly); cross-copy
  cosines decorrelate. vec_ids shift in DOCUMENT id space (c * 5000)
  so the text<->embedding 1:1 audit join stays copy-aligned.
- Timestamps are left as-is: 10x volume in the same window (event
  density grows with scale; the calendar doesn't).

Output timestamps are written by DuckDB as naive microsecond parquet
TIMESTAMPs — the same read path (inferTimestampNTZ=false) both engines
already use for the driver's files.

``--zipf`` (r13, r12 VERDICT task 5): the replicated corpora above are
uniform-ish — hot keys existed only in unit-scale pytest fixtures
(tests/test_skew_stress.py), so the 10x/100x probes never exercised
the skew paths at scale. The flag deterministically skews the TEXT and
VECTOR columns on top of the normal replication:

- documents: 15% of docs (arithmetic hash of the final doc_id — no
  engine hash functions, reproducible forever) get one of 8 shared
  8-word boilerplate templates PREPENDED, with geometric (zipf-head)
  mass: template 7 owns ~half the hot docs, template 6 a quarter, ...
  down to template 0 at ~1/256 (r14 doc fix — the rank expression's
  floor(log2) puts the mass on the HIGH ranks; earlier docs said the
  opposite; the skew shape itself was always geometric)
  Hot template shingles then have document frequency up to ~7% of the
  corpus — the stop-phrase/boilerplate skew max_shingle_df /
  max_band_df exist for, at data scale.
- embeddings: 3% of vectors are REPLACED by one of 8 shared template
  vectors under the same geometric rank rule — exact-duplicate hot
  directions, the bucket heat max_bucket_df and the IVF/SemDeDup cell
  caps exist for.
"""

from __future__ import annotations

import argparse
import os

import duckdb

DEFAULT_SRC = "/root/testdata/sf0.1"
DEFAULT_DEST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "localdata", "sf1.0"
)

# key ranges of the sf0.1 source (dense 0..N-1; asserted at run time)
RANGES = {
    "customer": 15_000,
    "supplier": 1_000,
    "part": 20_000,
    "orders": 150_000,
    "events": 100_000,
    "documents": 5_000,
    "embeddings": 2_000,
}

MUTATE_TEXT = """
    CASE WHEN c = 0 THEN text ELSE array_to_string(
        list_transform(string_split(text, ' '),
            (w, p) -> CASE WHEN (p - 1) % 7 = (c - 1) % 7
                           THEN w || '~' || c ELSE w END),
        ' ') END
"""


def _copies(con: duckdb.DuckDBPyConnection, mult: int) -> None:
    con.execute(f"CREATE OR REPLACE TEMP TABLE copies AS SELECT unnest(range({mult})) AS c")


# --zipf skew expressions (deterministic integer arithmetic on the
# FINAL ids — no engine hash() whose value could drift across DuckDB
# versions). _ZIPF_RANK maps a key to 0..7 with geometric mass
# (zipf-head shape): floor(log2(1+x)) of an 8-bit arithmetic hash, so
# rank 7 carries ~half the mass, rank 6 a quarter, ... and rank 0 is
# the RAREST (1/256) — the high rank is the hot template (r14 doc
# fix; the code and the measured 7.5% hot-shingle df were always
# consistent, the old comment had the ordering inverted).
_Z = 2_654_435_761  # Knuth multiplicative constant


def _zipf_hot(key: str, pct: int) -> str:
    return f"(({key} * {_Z}) % 100 + 100) % 100 < {pct}"


def _zipf_rank(key: str) -> str:
    # floor(log2(1+x)) for x in 0..255 -> 0..8, clamped to 0..7
    return (
        f"least(CAST(floor(log2(1 + (({key} * {_Z}) % 256 + 256) % 256)) "
        f"AS BIGINT), 7)"
    )


def generate(src: str, dest: str, mult: int, zipf: bool = False) -> None:
    os.makedirs(dest, exist_ok=True)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}/{t}.parquet'")
    # sanity: dense key spaces as documented (a driver regeneration with
    # different ranges must fail loudly, not silently corrupt joins)
    for t, n in RANGES.items():
        key = {
            "customer": "c_custkey", "supplier": "s_suppkey",
            "part": "p_partkey", "orders": "o_orderkey",
            "events": "event_id", "documents": "doc_id",
            "embeddings": "vec_id",
        }[t]
        lo, hi, cnt = con.execute(
            f"SELECT min({key}), max({key}), count(*) FROM {t}"
        ).fetchone()
        assert (lo, hi, cnt) == (0, n - 1, n), f"{t}: unexpected key space {(lo, hi, cnt)}"

    _copies(con, mult)
    C, S, P, O, E, D = (
        RANGES["customer"], RANGES["supplier"], RANGES["part"],
        RANGES["orders"], RANGES["events"], RANGES["documents"],
    )

    def copy_out(name: str, sql: str) -> None:
        out = f"{dest}/{name}.parquet"
        con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{name}: {n} rows")

    copy_out("region", "SELECT * FROM region")
    copy_out("nation", "SELECT * FROM nation")
    copy_out("customer", f"""
        SELECT c_custkey + c * {C} AS c_custkey,
               'Customer#' || lpad(CAST(c_custkey + c * {C} AS VARCHAR), 9, '0')
                   AS c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM customer, copies ORDER BY c_custkey""")
    copy_out("supplier", f"""
        SELECT s_suppkey + c * {S} AS s_suppkey,
               'Supplier#' || lpad(CAST(s_suppkey + c * {S} AS VARCHAR), 9, '0')
                   AS s_name,
               s_nationkey, s_acctbal
        FROM supplier, copies ORDER BY s_suppkey""")
    copy_out("part", f"""
        SELECT p_partkey + c * {P} AS p_partkey,
               p_name, p_brand, p_type, p_size, p_retailprice
        FROM part, copies ORDER BY p_partkey""")
    copy_out("orders", f"""
        SELECT o_orderkey + c * {O} AS o_orderkey,
               o_custkey + c * {C} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM orders, copies ORDER BY o_orderkey""")
    copy_out("lineitem", f"""
        SELECT l_orderkey + c * {O} AS l_orderkey,
               l_partkey + c * {P} AS l_partkey,
               l_suppkey + c * {S} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM lineitem, copies ORDER BY l_orderkey, l_linenumber""")
    copy_out("events", f"""
        SELECT event_id + c * {E} AS event_id,
               ts,
               user_id + c * {C} AS user_id,
               event_type, value, props
        FROM events, copies ORDER BY event_id""")
    zipf_text = ""
    if zipf:
        # 8-word template per rank (distinct words per rank, so each
        # template's 4 interior 5-gram shingles are hot keys of THAT
        # rank's document mass)
        tpl = (
            "array_to_string(list_transform(range(8), "
            f"i -> 'zipftpl' || {_zipf_rank('doc_id')} || 'w' || i), ' ')"
        )
        zipf_text = f"""
        , skewed AS (
            SELECT doc_id,
                   CASE WHEN {_zipf_hot('doc_id', 15)}
                        THEN {tpl} || ' ' || text ELSE text END AS text,
                   lang, source
            FROM mutated
        )"""
    copy_out("documents", f"""
        WITH mutated AS (
            SELECT doc_id + c * {D} AS doc_id,
                   {MUTATE_TEXT} AS text,
                   lang, source
            FROM documents, copies
        ){zipf_text}
        SELECT doc_id, text, lang, source,
               CAST(strlen(text) AS BIGINT) AS n_chars
        FROM {"skewed" if zipf else "mutated"} ORDER BY doc_id""")
    zipf_vec = ""
    if zipf:
        # one exact shared vector per rank: integer-derived floats, so
        # regeneration is bit-identical
        zipf_vec = (
            f"CASE WHEN {_zipf_hot('vec_id', 3)} THEN "
            f"CAST(list_transform(range(64), i -> "
            f"CAST(((i * 31 + {_zipf_rank('vec_id')} * 17) % 13) - 6 AS "
            f"FLOAT) / 6) AS FLOAT[]) ELSE embedding END"
        )
    copy_out("embeddings", f"""
        WITH rep AS (
            SELECT vec_id + c * {D} AS vec_id,
                   CASE WHEN c = 0 THEN embedding
                        ELSE CAST(list_concat(embedding[(c % 64) + 1:],
                                              embedding[1:(c % 64)]) AS FLOAT[])
                   END AS embedding,
                   label
            FROM embeddings, copies
        )
        SELECT vec_id,
               {zipf_vec if zipf else "embedding"} AS embedding,
               label
        FROM rep ORDER BY vec_id""")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("dest", nargs="?", default=DEFAULT_DEST)
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--src", default=DEFAULT_SRC)
    ap.add_argument(
        "--zipf", action="store_true",
        help="skew text/vector columns with deterministic zipf-head "
        "hot keys (r13 skew probe data)",
    )
    args = ap.parse_args()
    generate(args.src, args.dest, args.mult, zipf=args.zipf)
    print(
        f"wrote {args.dest} ({args.mult}x {args.src}"
        f"{', zipf-skewed' if args.zipf else ''})"
    )
