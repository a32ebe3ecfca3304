"""Partition-spec evolution through the txlog: per-file-spec pruning
must drop only provably-irrelevant files (same-spec, different value),
keep every other-spec file, and record the spec history in the log."""

from __future__ import annotations

import os

from kamiyo_hive_spark.plans.registry import load_registry
from kamiyo_hive_spark.sources.sinks import SCRATCH
from kamiyo_hive_spark.sources.txlog import TxLog


def _root(sf_dir: str) -> str:
    return os.path.join(SCRATCH, f"txlog_pspec_{os.path.basename(sf_dir)}")


def test_pruning_per_file_spec(spark, sf_dir):
    reg = load_registry()
    df = reg["acid_partition_evolution"].builder(spark, sf_dir)
    files = df.inputFiles()
    log = TxLog(_root(sf_dir))
    all_files = log.snapshot_files()
    # v0 (status spec): only the status=F directory survives pruning
    status_read = [f for f in files if "status=" in f]
    assert status_read and all("status=F/" in f for f in status_read)
    assert any("status=" in f and "status=F/" not in f for f in all_files)
    # v1 (o_year spec): CANNOT be pruned on status — every file read
    year_all = {f for f in all_files if "o_year=" in f}
    year_read = {f.split(os.path.basename(log.root) + "/")[-1] for f in files if "o_year=" in f}
    assert len(year_read) == len(year_all)


def test_spec_history_recorded(spark, sf_dir):
    reg = load_registry()
    reg["acid_partition_evolution"].builder(spark, sf_dir)  # ensure staged
    log = TxLog(_root(sf_dir))
    specs = [log._read_commit(v).spec for v in range(log.version() + 1)]
    assert specs == ["status", "o_year"]


def test_pruned_files_no_false_negative(spark, sf_dir):
    reg = load_registry()
    reg["acid_partition_evolution"].builder(spark, sf_dir)
    log = TxLog(_root(sf_dir))
    # pruning on a value that exists nowhere in v0 still keeps ALL
    # v1 files (other spec) and drops every v0 directory
    pruned = log.pruned_files("status", "ZZ")
    assert all("o_year=" in f for f in pruned)
    # and pruning on the spec the second generation used keeps v0
    pruned2 = log.pruned_files("o_year", "1998")
    assert {f for f in pruned2 if "status=" in f} == {
        f for f in log.snapshot_files() if "status=" in f
    }
    assert all("o_year=1998/" in f for f in pruned2 if "o_year=" in f)
