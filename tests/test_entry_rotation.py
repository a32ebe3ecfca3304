"""Driver-contract ordering invariants (__spark_entry__).

The entry dicts must be a deterministic, harness-agnostic enumeration
of the registry: a complete permutation in registry (module-load)
order, with queries()/oracle_sql() keyed consistently. The harness owns
its own sampling strategy over this dict (ADVICE r3: any builder-side
reordering keyed to past sample files games prefix-sampling and is
forbidden).
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry  # noqa: E402
from kamiyo_hive_spark.plans.registry import load_registry  # noqa: E402


def test_queries_is_complete_permutation():
    reg = load_registry()
    names = list(entry.queries())
    assert sorted(names) == sorted(reg)
    assert len(names) == len(set(names))


def test_registry_order_not_sample_history_order():
    """Entry order must equal registry order — independent of which
    queries appear in CORRECTNESS_r*.json files."""
    reg = load_registry()
    assert list(entry.queries()) == list(reg)


def test_oracle_sql_subset_and_order():
    names = list(entry.queries())
    osql = entry.oracle_sql()
    assert set(osql) <= set(names)
    positions = [names.index(n) for n in osql]
    assert positions == sorted(positions)
