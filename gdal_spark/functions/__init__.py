from gdal_spark.functions.rounding import (  # noqa: F401
    np_stable_round,
    sql_stable_round,
    stable_round,
)
