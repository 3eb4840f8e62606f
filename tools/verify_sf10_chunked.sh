#!/bin/bash
# 100x-scale exact verification, chunked: each chunk runs in its own
# process so a single oracle blowing past the box's memory cannot take
# the whole artifact down — the chunk fails, the rest complete, and
# the merge records exactly which queries passed. DuckDB is bounded
# via SPARK_GRAFT_DUCKDB_MEM (tools/verify_queries.py) — the r7 run
# found DuckDB 1.0's memory_limit does not cover every list-vector
# allocation, so isolation is the real backstop.
#
# The query list is DERIVED FROM THE REGISTRY minus the documented
# exclusions below (r7 ADVICE: a hardcoded list silently dropped newly
# registered queries from 100x verification until someone remembered
# to append them). A new query is sf10-verified by default; excluding
# one requires an entry HERE with a reason.
set -u
SF_DIR="${1:-localdata/sf10}"
OUT="${2:-CORRECTNESS_LOCAL_sf10.json}"
shift 2 || true

# Queries whose DUCKDB ORACLE is infeasible at sf10 (the Spark side
# scales; the naive SQL mirror is the quadratic). Each has a
# deterministic *_slice twin IN the derived list (cell-exact 1/K
# bucket sample mirrored in both engines) and/or a scale_probe row, so
# the operator itself is still 100x-verified.
EXCLUDE=(
  doc_minhash_lsh_pairs        # oracle = full signature self-join; slice twin runs
  doc_simhash_pairs            # oracle = full chunk self-join; slice twin runs
  embedding_near_dup_pairs     # oracle = full bucket self-join; slice twin runs
  semantic_dedup               # oracle = full in-cell pair scan; slice twin runs
  dedup_method_agreement       # oracle runs BOTH pair pipelines above (r7 OOM)
  doc_shingle_candidates       # oracle = all-pairs shared-shingle CTE (19M rows, r7 OOM)
  doc_dup_clusters             # oracle = the same shared-shingle CTE + recursive reachability; slice twin runs (r9)
  doc_dedup_keeplist           # ditto; slice twin runs (r9)
  doc_dedup_quality_keeplist   # ditto (r11); slice twin runs
  cluster_safe_split           # ditto (r11); slice twin runs
  incremental_neardup_pairs    # oracle = the full minhash signature self-join (doc_minhash_lsh_pairs' infeasibility); slice twin incremental_neardup_pairs_slice runs (r10)
  incremental_dup_clusters     # oracle = the same full signature self-join PLUS recursive reachability over its pairs (r11); slice twin incremental_dup_clusters_slice runs
)

QUERIES=($(python - "${EXCLUDE[@]}" <<'PYEOF'
import sys
sys.path.insert(0, ".")
from hubspot_neo4j_pipeline_spark.plans import QUERIES
excl = set(sys.argv[1:])
unknown = excl - set(QUERIES)
if unknown:
    sys.exit(f"EXCLUDE names not in registry (stale?): {sorted(unknown)}")
print("\n".join(sorted(set(QUERIES) - excl)))
PYEOF
)) || { echo "query-list derivation failed"; exit 2; }
echo "=== ${#QUERIES[@]} queries (registry minus ${#EXCLUDE[@]} documented exclusions)"

CHUNK="${SPARK_GRAFT_CHUNK:-4}"
# per-chunk wall cap: a pathological oracle must fail ITS chunk, not
# stall the whole artifact (the merge records the gap)
CHUNK_TIMEOUT="${SPARK_GRAFT_CHUNK_TIMEOUT:-1800}"
mkdir -p /tmp/sf10_chunks
rm -f /tmp/sf10_chunks/chunk_*.json
i=0
n=0
while [ $i -lt ${#QUERIES[@]} ]; do
  part=("${QUERIES[@]:$i:$CHUNK}")
  echo "=== chunk $n: ${part[*]}"
  timeout "$CHUNK_TIMEOUT" python -u tools/verify_queries.py "$SF_DIR" --json "/tmp/sf10_chunks/chunk_$n.json" "${part[@]}" 2>&1 \
    | grep -E "PASS|FAIL|rows-only|pass," || echo "chunk $n: process died or timed out"
  i=$((i + CHUNK))
  n=$((n + 1))
done
python - "$SF_DIR" "$OUT" "${QUERIES[@]}" <<'EOF'
import glob, json, sys
sf_dir, out = sys.argv[1], sys.argv[2]
expected = set(sys.argv[3:])
merged = {}
for p in sorted(glob.glob("/tmp/sf10_chunks/chunk_*.json")):
    with open(p) as fh:
        d = json.load(fh)
    merged.update(d.get("queries", {}))
missing = sorted(expected - set(merged))
summary = {
    "sf_dir": sf_dir,
    "n_pass": sum(1 for v in merged.values() if v.get("status") == "pass"),
    "n_fail": sum(1 for v in merged.values() if v.get("status") == "fail"),
    "n_rows_only": sum(1 for v in merged.values() if v.get("status") == "rows_only"),
    "n_missing": len(missing),
    "missing": missing,
    "compare": "rows + sorted columns + exact cell values + dtype-kind parity",
    "note": (
        "chunked processes (tools/verify_sf10_chunked.sh); query list = full "
        "registry minus the script's documented oracle-infeasible exclusions; "
        "a query in `missing` = its chunk's process died (OOM) or timed out"
    ),
    "queries": dict(sorted(merged.items())),
}
with open(out, "w") as fh:
    json.dump(summary, fh, indent=1)
print(f"merged {len(merged)} queries -> {out}: {summary['n_pass']} pass, "
      f"{summary['n_fail']} fail, {len(missing)} missing")
EOF
