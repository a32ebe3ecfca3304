"""SCD2 point-in-time enrichment: the property the hash replay can't
name — the join must use the version valid AT FACT TIME, not the
latest version (time-travel leakage), plus a row-level replay."""

from __future__ import annotations

from pyspark.sql import functions as F

from kamiyo_hive_spark.catalog import table
from kamiyo_hive_spark.operators.asof import (
    SCD2_USER_MOD,
    scd2_point_in_time_enrich,
)


def _dim_and_facts(spark, sf_dir):
    e = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id") % SCD2_USER_MOD == 0)
        .select("user_id", "event_type", "ts", "event_id", "value")
        .collect()
    )
    dim, facts = {}, []
    for r in sorted(e, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        if r["event_type"] in ("signup", "error"):
            lst = dim.setdefault(r["user_id"], [])
            if not lst or lst[-1][1] != r["event_type"]:
                lst.append((r["ts"], r["event_type"]))
        elif r["event_type"] == "purchase":
            facts.append((r["user_id"], r["ts"]))
    return dim, facts


def test_no_time_travel_leakage(spark, sf_dir):
    """Recompute both the point-in-time and the (wrong) latest-version
    enrichment in pure Python; the operator must match the former and
    (on this data) differ from the latter."""
    dim, facts = _dim_and_facts(spark, sf_dir)

    def pit_status(uid, ts):
        prior = [s for (t, s) in dim.get(uid, []) if t <= ts]
        return prior[-1] if prior else "none"

    def latest_status(uid):
        lst = dim.get(uid, [])
        return lst[-1][1] if lst else "none"

    want_pit: dict = {}
    want_latest: dict = {}
    for uid, ts in facts:
        want_pit[pit_status(uid, ts)] = want_pit.get(pit_status(uid, ts), 0) + 1
        want_latest[latest_status(uid)] = want_latest.get(latest_status(uid), 0) + 1
    got = {
        r["status_at_purchase"]: r["n_purchases"]
        for r in scd2_point_in_time_enrich(spark, sf_dir).collect()
    }
    assert got == want_pit
    assert want_pit != want_latest, (
        "test data no longer distinguishes point-in-time from latest — "
        "tighten the dimension population"
    )
