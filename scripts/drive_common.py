"""Shared rendering/compare core for the driver-contract drives.

ONE module owns the row-rendering convention (VERDICT r9 finding 4):
`scripts/full_drive.py` (the per-round artifact writer) and
`scripts/drive_entry.py` (the verify skill's interactive drive) must
hash frames identically, or their verdicts stop being comparable and
the OS-timezone probe tests the wrong layer.

Rendering is pandas-based ON PURPOSE: `DataFrame.collect()`
materializes TimestampType through `datetime.fromtimestamp`, which
uses the OS timezone — no Spark conf can change that — so a
collect()-based drive false-fails every timestamp query the moment
the probe sets TZ=America/New_York, at ANY engine version. `toPandas()`
renders under the SESSION timezone (which `catalog.table` pins to UTC
at read), so the pandas path is the one that tests the engine rather
than pyspark's collect path.
"""

from __future__ import annotations

import datetime
import hashlib

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_views(con, sf_dir: str) -> None:
    """Register the testdata parquet tables as DuckDB views — the same
    pre-registration the external harness provides to oracle SQL."""
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )


def render(v) -> str:
    """One value -> one canonical string, identical for a Spark
    `toPandas()` cell and a DuckDB `fetchdf()` cell: floats via %.17g,
    datetimes microsecond-formatted, DATEs normalized to midnight
    (Spark yields `datetime.date`, DuckDB yields midnight
    datetime64 — see SKILL.md gotchas)."""
    import numpy as np
    import pandas as pd

    if v is None or (
        not isinstance(v, (list, tuple, np.ndarray)) and pd.isna(v)
    ):
        return "<null>"
    if isinstance(v, float):
        return "%.17g" % v
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return v.strftime("%Y-%m-%d") + " 00:00:00.000000"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(render(x) for x in v) + "]"
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    return str(v)


def frame_hash(pdf) -> str:
    """Order-insensitive value hash: columns sorted by name, rows
    sorted by rendered content — the external harness's comparison."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = sorted(
        "|".join(render(v) for v in row) for row in pdf.itertuples(index=False)
    )
    h = hashlib.md5()
    for r in rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()


def compare_query(spark, con, builder, sql: str | None, sf_dir: str) -> dict:
    """Run one registered query next to its oracle; returns the same
    record shape `full_drive.py` persists. `sql=None` runs the weaker
    rows-only contract (non-SQL-expressible ops)."""
    rec: dict = {"oracle": sql is not None}
    spdf = builder(spark, sf_dir).toPandas()
    rec["rows_spark"] = len(spdf)
    rec["spark_hash"] = frame_hash(spdf)
    rec["columns"] = sorted(spdf.columns)
    if sql is not None:
        ddf = con.execute(sql).fetchdf()
        rec["rows_oracle"] = len(ddf)
        rec["rows_ok"] = len(spdf) == len(ddf)
        rec["schema_ok"] = sorted(spdf.columns) == sorted(ddf.columns)
        rec["hash_ok"] = rec["spark_hash"] == frame_hash(ddf)
        rec["pass"] = rec["rows_ok"] and rec["schema_ok"] and rec["hash_ok"]
    else:
        rec["pass"] = len(spdf) >= 0 and len(spdf.columns) > 0
    return rec
