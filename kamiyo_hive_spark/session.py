"""SparkSession factory.

Local-mode defaults tuned for the test container (local[N], single JVM)
while keeping every setting cluster-safe: nothing here assumes a single
machine except the master URL, which is overridable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "kamiyo-hive-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    - AQE on: runtime coalescing, broadcast-join demotion/promotion and
      skew-join splitting replace hand-tuned plans at any scale factor.
    - Session timezone pinned to UTC so event-time semantics match the
      DuckDB oracle (naive-UTC timestamps) bit-for-bit.
    - Arrow enabled for every pandas interchange (toPandas, pandas UDFs).
    - Opt-in persistent metastore: ``SPARK_GRAFT_HIVE=1`` enables Hive
      support over a local Derby metastore (path pinned by
      ``SPARK_GRAFT_METASTORE_DIR``, default `.scratch/metastore`), so
      `init_warehouse` DDL survives session restarts — the local twin
      of the cluster deployment's shared Hive metastore. Default stays
      the in-memory catalog: Derby allows ONE process at a time, which
      would serialize parallel test runs.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    n_shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Respect the advisory partition size when coalescing instead of
        # preserving parallelism: sub-second inputs collapse to a few
        # real tasks (measured ~10% off the per-query floor at sf0.1)
        # and at warehouse scale it is the setting that actually honors
        # the 64 MB advisory target.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    if os.environ.get("SPARK_GRAFT_HIVE") == "1":
        ms_dir = os.environ.get(
            "SPARK_GRAFT_METASTORE_DIR", "/root/repo/.scratch/metastore"
        )
        os.makedirs(ms_dir, exist_ok=True)
        builder = (
            builder.config("spark.sql.catalogImplementation", "hive")
            .config(
                "javax.jdo.option.ConnectionURL",
                f"jdbc:derby:;databaseName={ms_dir}/metastore_db;create=true",
            )
            .config("spark.sql.warehouse.dir", f"{ms_dir}/warehouse")
            .enableHiveSupport()
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
