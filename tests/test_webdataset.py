"""WebDataset ingest: shard layout, pair completeness, and the
no-shuffle plan — contract properties beyond the value hash."""

from __future__ import annotations

import os
import tarfile

from kamiyo_hive_spark.operators.multimodal import (
    WDS_SHARDS,
    _wds_dir,
    webdataset_ingest,
)


def test_shard_layout_and_pairing(spark, sf_dir):
    src = _wds_dir(spark, sf_dir)
    shards = sorted(f for f in os.listdir(src) if f.endswith(".tar"))
    assert len(shards) == WDS_SHARDS
    with tarfile.open(os.path.join(src, shards[0])) as tf:
        names = tf.getnames()
    keys = {n.rsplit(".", 1)[0] for n in names}
    exts = {n.rsplit(".", 1)[1] for n in names}
    assert exts == {"txt", "png"}
    assert len(names) == 2 * len(keys)  # every sample has both members


def test_result_and_plan(spark, sf_dir):
    df = webdataset_ingest(spark, sf_dir)
    rows = df.collect()
    assert len(rows) == WDS_SHARDS
    assert all(r["complete_pairs"] for r in rows)
    assert all(r["n_samples"] > 0 for r in rows)
    # per-shard parallel map: no exchange anywhere in the plan (the
    # orderBy on WDS_SHARDS rows collapses to a driver-side sort of a
    # tiny result — assert no aggregation-driven shuffle at least)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" not in plan
