from kamiyo_hive_spark.functions.money import dec, money_sum, one_minus, one_plus  # noqa: F401
