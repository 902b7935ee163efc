"""DDL pass-through + SQL result sink (SURVEY §2 row 7).

The reference's ExecuteSQL DDL surface (gcore/gdaldataset.cpp:6978-7248
AddFieldDefn / schema evolution; SQL result layer sinks) maps onto Spark
catalog DDL. No Iceberg runtime ships in this sandbox, so tables use the
session catalog's parquet provider — the statements (CREATE TABLE, CTAS,
INSERT INTO, ALTER TABLE ADD COLUMNS, DROP) are identical under Iceberg; at
cluster scale only the `USING` clause changes.
"""

import tempfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def wh(spark):
    return tempfile.mkdtemp(prefix="gdal_spark_wh_")


def test_create_insert_select_roundtrip(spark, wh):
    spark.sql("DROP TABLE IF EXISTS t_pages")
    spark.sql(
        f"CREATE TABLE t_pages (url STRING, lang STRING, n BIGINT) "
        f"USING parquet LOCATION '{wh}/t_pages'"
    )
    spark.sql(
        "INSERT INTO t_pages VALUES ('https://a', 'en', 1), "
        "('https://b', 'de', 2)"
    )
    got = spark.sql(
        "SELECT lang, sum(n) AS s FROM t_pages GROUP BY lang ORDER BY lang"
    ).collect()
    assert [(r["lang"], r["s"]) for r in got] == [("de", 2), ("en", 1)]


def test_ctas_from_engine_query(spark, wh):
    """SQL result sink: materialize an engine query into a catalog table
    (the `gdal vector sql ... --output` shape)."""
    from gdal_spark import queries as Q

    out = Q.QUERIES["tile_rollup"](spark, "/root/testdata/sf0.001")
    out.createOrReplaceTempView("rollup_v")
    spark.sql("DROP TABLE IF EXISTS t_rollup")
    spark.sql(
        f"CREATE TABLE t_rollup USING parquet LOCATION '{wh}/t_rollup' "
        "AS SELECT * FROM rollup_v"
    )
    n_tbl = spark.table("t_rollup").count()
    assert n_tbl == out.count() and n_tbl > 0


def test_alter_table_add_column_schema_evolution(spark, wh):
    """Schema-evolution DDL analog of GDALDataset AddFieldDefn
    (gdaldataset.cpp:6978+): ALTER TABLE ADD COLUMNS, old rows read as
    NULL, new writes fill it."""
    spark.sql("DROP TABLE IF EXISTS t_evo")
    spark.sql(
        f"CREATE TABLE t_evo (k BIGINT) USING parquet LOCATION '{wh}/t_evo'"
    )
    spark.sql("INSERT INTO t_evo VALUES (1)")
    spark.sql("ALTER TABLE t_evo ADD COLUMNS (extra STRING)")
    spark.sql("INSERT INTO t_evo VALUES (2, 'x')")
    rows = {r["k"]: r["extra"] for r in spark.table("t_evo").collect()}
    assert rows == {1: None, 2: "x"}


def test_partitioned_table_pruning(spark, wh):
    """Hive-partitioned catalog table: partition filter prunes at scan."""
    spark.sql("DROP TABLE IF EXISTS t_part")
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 4).alias("bucket")
    )
    df.write.partitionBy("bucket").mode("overwrite").parquet(f"{wh}/t_part")
    spark.sql(
        f"CREATE TABLE t_part (id BIGINT, bucket BIGINT) USING parquet "
        f"PARTITIONED BY (bucket) LOCATION '{wh}/t_part'"
    )
    spark.sql("MSCK REPAIR TABLE t_part")
    q = spark.table("t_part").filter(F.col("bucket") == 2)
    assert q.count() == 25
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        q.explain(True)
    assert "PartitionFilters" in buf.getvalue()
