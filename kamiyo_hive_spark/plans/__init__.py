from kamiyo_hive_spark.plans.registry import REGISTRY, QuerySpec, load_registry, register  # noqa: F401
