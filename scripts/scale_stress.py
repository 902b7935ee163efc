"""Scale-stress evidence (VERDICT r4 next-step #8): synthesize a 10×
replica of the sf0.1 fixture (sf1.0-equivalent, ~1.5M orders / 6M lineitem
/ 50k documents / 20k embeddings) by key-shifted unioning, run the
flagship plus the heaviest fixture-scaling operators ONCE at both scales,
and print per-stage row counts — confirming the plans grow executor-side
only (no driver-side growth).

Run:  python scripts/scale_stress.py          (writes /tmp/gdalspark_sf1)
"""

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/gdalspark_sf1"
COPIES = 10

# (table, key columns to shift) — dims stay single-copy
SHIFT = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id"],
}
DIMS = ["region", "nation", "customer", "supplier", "part"]


def build():
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t, keys in SHIFT.items():
        out = f"{DST}/{t}.parquet"
        if os.path.exists(out):
            continue
        maxk = con.sql(
            f"SELECT max({keys[0]}) FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchone()[0]
        off = int(maxk) + 1
        cols = [r[0] for r in con.sql(
            f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchall()]
        sel = ", ".join(
            f"{c} + k.k * {off} AS {c}" if c in keys else c for c in cols
        )
        con.sql(
            f"COPY (SELECT {sel} FROM read_parquet('{SRC}/{t}.parquet'), "
            f"(SELECT unnest(range({COPIES})) AS k) k) TO '{out}' "
            f"(FORMAT parquet, ROW_GROUP_SIZE 262144)"
        )
        print(f"  built {t}: {off} -> {off * COPIES} rows")
    for t in DIMS:
        out = f"{DST}/{t}.parquet"
        if not os.path.exists(out):
            os.link(f"{SRC}/{t}.parquet", out)


def run(sf_dir: str, label: str, dens: float = 1.0):
    from pyspark.sql import functions as F

    from gdal_spark import get_spark
    from gdal_spark import queries as Q
    from gdal_spark.data.pages import polygons_df
    from gdal_spark.operators import cluster as CL
    from gdal_spark.operators.pip_join import pip_join
    from gdal_spark.operators.tiles import assign_tiles

    spark = get_spark(app_name=f"stress-{label}", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    rows = {}
    times = {}

    t0 = time.perf_counter()
    pts = Q.order_points(spark, sf_dir)
    joined = pip_join(pts, polygons_df(spark), how="left", first_match=True)
    out = assign_tiles(joined, zoom=12)
    rows["flagship_pip_tiles"] = out.count()
    times["flagship_pip_tiles"] = time.perf_counter() - t0

    for name in ["pip_cells_salted", "st_cluster_dbscan", "text_line_dedup",
                 "embed_ann_ivfpq", "tpch_q9", "dedup_clusters"]:
        t0 = time.perf_counter()
        rows[name] = Q.QUERIES[name](spark, sf_dir).count()
        times[name] = time.perf_counter() - t0

    # DBSCAN scaling decomposition.  The key-shifted replica lands 10x
    # points in the SAME synthetic cluster extent, so fixed-eps DBSCAN's
    # neighbor graph grows ~quadratically BY DEFINITION (density x10 ->
    # eps-pairs x~100) — the probe below counts those pairs so the
    # fixed-eps wall-time can be judged against the work actually owed.
    # The 100 TB shape (more extent at the SAME density — web corpora add
    # documents, not density) is modeled by shrinking eps by sqrt(growth):
    # expected neighbors-per-point stays scale-invariant and the run
    # should scale ~linearly.
    geo = Q._read(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id"),
        Q.clustered_lon(F.col("o_orderkey")).alias("x"),
        Q.clustered_lat(F.col("o_orderkey")).alias("y"),
    )
    t0 = time.perf_counter()
    rows["dbscan_eps_pairs"] = CL.within_eps_pairs(
        geo, eps=Q.DBSCAN_EPS).count()
    times["dbscan_eps_pairs"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    rows["dbscan_const_density"] = CL.cluster_dbscan(
        geo, eps=Q.DBSCAN_EPS * dens, minpts=Q.DBSCAN_MINPTS).count()
    times["dbscan_const_density"] = time.perf_counter() - t0
    spark.stop()
    return rows, times


def main():
    print("building 10x replica ...")
    build()
    print("running at sf0.1 ...")
    r1, t1 = run(SRC, "sf01")
    print("running at sf1.0 ...")
    r10, t10 = run(DST, "sf1", dens=1.0 / COPIES**0.5)
    print(f"\n{'query':24s} {'rows@0.1':>10s} {'rows@1.0':>10s} "
          f"{'t@0.1':>7s} {'t@1.0':>7s} {'ratio':>6s}")
    for k in r1:
        ratio = t10[k] / t1[k] if t1[k] > 0 else float("nan")
        print(f"{k:24s} {r1[k]:>10d} {r10[k]:>10d} "
              f"{t1[k]:>7.1f} {t10[k]:>7.1f} {ratio:>6.1f}")


if __name__ == "__main__":
    main()
