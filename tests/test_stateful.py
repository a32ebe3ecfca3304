"""The declarative and grouped-map commit-reveal paths must agree row
for row — cross-validation of the custom-operator API against the
built-in aggregation path."""

from __future__ import annotations

from kamiyo_hive_spark.operators.stateful import (
    resolve_sessions_pandas,
    resolve_sessions_sql,
)


def test_sql_and_pandas_session_resolution_identical(spark, sf_dir):
    sql_rows = {r.user_id: r.asDict() for r in resolve_sessions_sql(spark, sf_dir).collect()}
    pd_rows = {r.user_id: r.asDict() for r in resolve_sessions_pandas(spark, sf_dir).collect()}
    assert sql_rows.keys() == pd_rows.keys()
    for uid, row in sql_rows.items():
        assert row == pd_rows[uid], (uid, row, pd_rows[uid])
