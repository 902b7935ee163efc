"""North-rule flagship as a spark-submit job.

Usage (the --py-files contract):

    ZIP=$(python -c "import shutil,tempfile,os; \
      print(shutil.make_archive(os.path.join(tempfile.mkdtemp(),'gdal_spark'),'zip','<repo>', 'gdal_spark'))")
    spark-submit --master local[8] --py-files "$ZIP" scripts/flagship_job.py \
        --rows 1000000 --zoom 12

Runs the PIP spatial join + tile assignment over a synthetic derived-geotag
point table (the same job bench.py uses for scaling evidence) and prints one
JSON line with rows and docs/sec. On a cluster, swap --master; nothing else
changes — the package arrives via --py-files, the polygon dimension via
broadcast.
"""

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--zoom", type=int, default=12)
    ap.add_argument("--partitions", type=int, default=64)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("gdal_spark_flagship").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from gdal_spark.data.geotag import derived_lat, derived_lon
    from gdal_spark.data.pages import polygons_df
    from gdal_spark.operators.pip_join import pip_join
    from gdal_spark.operators.tiles import assign_tiles

    t0 = time.perf_counter()
    pts = spark.range(0, args.rows, numPartitions=args.partitions).select(
        F.col("id").alias("doc_id"),
        derived_lon(F.col("id")).alias("lon"),
        derived_lat(F.col("id")).alias("lat"),
    )
    joined = pip_join(pts, polygons_df(spark), how="left", first_match=True)
    out = assign_tiles(joined, zoom=args.zoom)
    n = out.count()
    dt = time.perf_counter() - t0
    print(json.dumps({
        "rows": n, "sec": round(dt, 3),
        "docs_per_sec": round(n / dt, 1) if dt > 0 else None,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
