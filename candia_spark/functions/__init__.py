from candia_spark.functions.numeric import dsum, davg, dround, cv_expr  # noqa: F401
