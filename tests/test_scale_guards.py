"""Static scale guards: plan anti-patterns that are invisible at test
scale factors but fatal at 100 TB are banned at the source level.

`Window.orderBy(...)` with no `partitionBy` funnels the entire input
through ONE task (the canonical single-partition scale-killer — VERDICT
r1 findings 1-2). The scalable replacements live in
`operators/merkle.py:global_sorted_index` (range-partitioned two-pass
rank) and the ntile closed form in `price_decile_stats`.
"""

from __future__ import annotations

import ast
import pathlib

PKG = pathlib.Path(__file__).resolve().parent.parent / "kamiyo_hive_spark"


def test_no_global_window_orderby():
    offenders = []
    for path in sorted(PKG.rglob("*.py")):
        tree = ast.parse(path.read_text())
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Attribute)
                and node.attr == "orderBy"
                and isinstance(node.value, ast.Name)
                and node.value.id == "Window"
            ):
                offenders.append(f"{path.relative_to(PKG.parent)}:{node.lineno}")
    assert not offenders, (
        "global (partition-less) Window.orderBy is banned — use "
        f"global_sorted_index or a closed-form rank instead: {offenders}"
    )


def test_filters_reach_parquet_scan(spark, sf_dir):
    """Representative predicates must appear as PushedFilters on the
    parquet scan (the 'filters reach the scan' design rule — at 100 TB
    row-group statistics pruning is the first line of defense)."""
    from kamiyo_hive_spark.plans.registry import load_registry

    reg = load_registry()
    expectations = {
        "flagship_runs_listing": "EqualTo(c_mktsegment,BUILDING)",
        "conj_filter_parts": "EqualTo(p_type,ECONOMY)",
        "ci_substring_search": "IsNotNull(p_name)",
    }
    for name, frag in expectations.items():
        plan = (
            reg[name]
            .builder(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert frag in plan, f"{name}: expected pushed filter {frag!r} in scan"
