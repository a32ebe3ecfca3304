"""COVERAGE.md is the judge-facing inventory map — every backticked
query name it claims must actually exist in the registry, and every
registered query must be mentioned somewhere in COVERAGE.md."""

from __future__ import annotations

import re
from pathlib import Path

from kamiyo_hive_spark.plans.registry import load_registry

DOC = Path(__file__).resolve().parent.parent / "COVERAGE.md"

# module-level helpers that legitimately appear in backticks but are
# not registry queries
NON_QUERY_TOKENS = {
    "connected_components", "merkle_proof", "verify_merkle_proof",
    "llm_batch_infer", "tier_band", "init_warehouse", "queries",
    "oracle_sql", "might_contain", "persist", "lead", "explain",
    "merkle_root_poseidon", "merkle_proof_poseidon", "verify_poseidon_proof",
    # module functions documented alongside their registered wrappers
    "connected_components_largestar", "force_directed_positions",
    "rewrite_where", "sample_frames", "parse_avi", "merge_partitioned",
    "optimize_partitioned", "verify_unmoved_keys", "zorder_optimize",
    "materialize_dvs", "delete_where_dv", "_dvs_on", "_conflicts",
    "dv_state", "read_changes", "zorder_optimize_partitioned",
    "stats_cols", "append_partitioned",
}

# queries registered only when a runtime feature exists (may be absent)
CONDITIONAL_QUERIES = {"streaming_commit_reveal_tws"}


def test_coverage_doc_names_resolve():
    reg = load_registry()
    text = DOC.read_text()
    claimed = set(re.findall(r"`([a-z0-9_]+)`", text))
    claimed_queries = {c for c in claimed if "_" in c} - NON_QUERY_TOKENS
    # drop file/module mentions like functions/skew.py captured without slash
    claimed_queries = {c for c in claimed_queries if not c.endswith("py")}
    missing = sorted(
        c for c in claimed_queries if c not in reg and c not in CONDITIONAL_QUERIES
    )
    assert not missing, f"COVERAGE.md claims unknown queries: {missing}"


def test_all_queries_documented():
    reg = load_registry()
    text = DOC.read_text()
    undocumented = sorted(n for n in reg if f"`{n}`" not in text)
    assert not undocumented, f"registered but not in COVERAGE.md: {undocumented}"
