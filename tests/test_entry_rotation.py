"""Driver-contract rotation invariants (__spark_entry__).

The external harness checks a PREFIX of queries(); the rotation must
(a) keep the dict a complete permutation of the registry, (b) surface
never-driver-sampled queries first, and (c) keep queries()/oracle_sql()
keyed consistently.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry  # noqa: E402
from kamiyo_hive_spark.plans.registry import load_registry  # noqa: E402


def _sampled() -> set[str]:
    out: set[str] = set()
    for p in REPO.glob("CORRECTNESS_r*.json"):
        out.update(json.loads(p.read_text()).keys())
    return out


def test_queries_is_complete_permutation():
    reg = load_registry()
    names = list(entry.queries())
    assert sorted(names) == sorted(reg)
    assert len(names) == len(set(names))


def test_never_sampled_come_first():
    sampled = _sampled()
    names = list(entry.queries())
    fresh = [n for n in names if n not in sampled]
    # every fresh query must precede every sampled one
    if fresh and len(fresh) < len(names):
        last_fresh = max(names.index(n) for n in fresh)
        first_seen = min(names.index(n) for n in names if n in sampled)
        assert last_fresh < first_seen


def test_oracle_sql_subset_and_order():
    names = list(entry.queries())
    osql = entry.oracle_sql()
    assert set(osql) <= set(names)
    positions = [names.index(n) for n in osql]
    assert positions == sorted(positions)
