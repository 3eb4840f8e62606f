#!/bin/bash
# 100x-scale exact verification, chunked: each chunk runs in its own
# process so a single oracle blowing past the box's memory cannot take
# the whole artifact down — the chunk fails, the rest complete, and
# the merge records exactly which queries passed. DuckDB is bounded
# via SPARK_GRAFT_DUCKDB_MEM (tools/verify_queries.py) — the r7 run
# found DuckDB 1.0's memory_limit does not cover every list-vector
# allocation, so isolation is the real backstop.
set -u
SF_DIR="${1:-localdata/sf10}"
OUT="${2:-CORRECTNESS_LOCAL_r7_sf10.json}"
shift 2 || true
QUERIES=(
  asof_order_before_event change_summary cluster_balanced_sample curation_funnel
  current_state daily_event_spine deals_by_company doc_exact_dedup
  doc_language_id doc_token_stats engaged_contacts event_sessionization
  fuzzy_name_pairs lineitem_moments order_value_median recent_activity
  relationship_diff scd2_golden_merge scd2_version_chain soft_delete_candidates
  source_temperature_weights top_deals_by_value windowed_event_counts
  ann_ivf_topk_trained doc_minhash_lsh_pairs_slice doc_simhash_pairs_slice
  embedding_near_dup_pairs_slice semantic_dedup_slice
  contacts_by_lifecycle_stage contacts_by_owner owner_summary campaign_stats
  funnel_conversion active_archived_union url_derivation clean_projection
  epoch_roundtrip property_hash type_dispatched_projection json_event_projection
  vector_norms doc_embedding_join_audit embedding_centroids ivf_assignment
  ann_bruteforce_topk ann_quantized_topk ann_ivf_topk ann_lsh_topk
  stratified_doc_sample dataset_split_assignment edge_match_resolution
  staged_entity_match two_hop_traversal recent_changes ownership_change_history
  neo4j_dryrun_batches
)
CHUNK="${SPARK_GRAFT_CHUNK:-4}"
mkdir -p /tmp/sf10_chunks
rm -f /tmp/sf10_chunks/chunk_*.json
i=0
n=0
while [ $i -lt ${#QUERIES[@]} ]; do
  part=("${QUERIES[@]:$i:$CHUNK}")
  echo "=== chunk $n: ${part[*]}"
  python -u tools/verify_queries.py "$SF_DIR" --json "/tmp/sf10_chunks/chunk_$n.json" "${part[@]}" 2>&1 \
    | grep -E "PASS|FAIL|rows-only|pass," || echo "chunk $n: process died"
  i=$((i + CHUNK))
  n=$((n + 1))
done
python - "$SF_DIR" "$OUT" <<'EOF'
import glob, json, sys
sf_dir, out = sys.argv[1], sys.argv[2]
merged = {}
for p in sorted(glob.glob("/tmp/sf10_chunks/chunk_*.json")):
    with open(p) as fh:
        d = json.load(fh)
    merged.update(d.get("queries", {}))
summary = {
    "sf_dir": sf_dir,
    "n_pass": sum(1 for v in merged.values() if v.get("status") == "pass"),
    "n_fail": sum(1 for v in merged.values() if v.get("status") == "fail"),
    "n_rows_only": sum(1 for v in merged.values() if v.get("status") == "rows_only"),
    "compare": "rows + sorted columns + exact cell values + dtype-kind parity",
    "note": "chunked processes (tools/verify_sf10_chunked.sh); a missing query = its chunk's process died (OOM)",
    "queries": dict(sorted(merged.items())),
}
with open(out, "w") as fh:
    json.dump(summary, fh, indent=1)
print(f"merged {len(merged)} queries -> {out}: {summary['n_pass']} pass, {summary['n_fail']} fail")
EOF
