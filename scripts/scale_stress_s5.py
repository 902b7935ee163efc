"""Session-5 scale-stress evidence (continues BENCH.md §18/§18b): run the
row-scaling session-5 operators once at sf0.1 and once at the 10×
key-shifted replica, reporting rows + wall time — confirming the new
format sinks and corpus ops grow executor-side only.

Fixed-size gates (DTED/USGS-DEM cells, hist-match world raster, GCP
fixtures) are excluded by design: their cost is scale-invariant.

Run:  python scripts/scale_stress_s5.py    (reuses /tmp/gdalspark_sf1)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_stress import DST, SRC, build  # noqa: E402

GATES = [
    "spatialite_points_roundtrip",   # sqlite sink/scan, 150k -> 1.5M pts
    "xlsx_roundtrip",                # zip+XML sink/scan
    "ods_roundtrip",                 # OpenDocument sink/scan
    "gmt_roundtrip",                 # text sink/scan
    "text_unigram_tokenizer",        # corpus shuffle + bounded EM
    "text_pii_redact",               # row-linear JVM regex
]


def run(sf_dir: str, label: str):
    from gdal_spark import get_spark
    from gdal_spark import queries as Q

    spark = get_spark(app_name=f"stress5-{label}", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    rows, times = {}, {}
    for name in GATES:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        rows[name] = Q.QUERIES[name](spark, sf_dir).count()
        times[name] = time.perf_counter() - t0
    spark.stop()
    return rows, times


def main():
    build()
    print("running at sf0.1 ...")
    r1, t1 = run(SRC, "sf01")
    print("running at 10x ...")
    r10, t10 = run(DST, "sf1")
    print(f"\n| query | rows@0.1 | rows@1.0 | t@0.1 s | t@1.0 s | ratio |")
    print("|---|---|---|---|---|---|")
    for name in GATES:
        ratio = t10[name] / t1[name] if t1[name] else float("nan")
        print(f"| {name} | {r1[name]:,} | {r10[name]:,} | "
              f"{t1[name]:.1f} | {t10[name]:.1f} | {ratio:.1f}x |")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
