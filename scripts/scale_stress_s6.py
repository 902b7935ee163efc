"""Session-6 scale-stress evidence (continues BENCH.md §18/§18b/§21b):
run the row/corpus-scaling session-6 operators once at sf0.1 and once at
the 10× key-shifted replica, reporting rows + wall time — confirming the
new vector sink (JML), the projection pair, and the corpus-science block
(classifier training, KS drift, Zipf, entropy, DoReMi, UniMax) grow
executor-side only.

Fixed-size gates (the 96×96 grid drivers, the 240-contour WAsP layer,
the 96×96 Selafin mesh, the 200-arc E00 coverage) are excluded by
design: their cost is scale-invariant.

Run:  python scripts/scale_stress_s6.py    (reuses /tmp/gdalspark_sf1)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_stress import DST, SRC, build  # noqa: E402

GATES = [
    "jml_roundtrip",           # XML point sink/scan, 150k -> 1.5M pts
    "equal_earth_project",     # map-only column math, row-linear
    "mollweide_project",       # map-only, 8 materialized Newton steps
    "text_quality_train",      # 2 GD iterations over the design matrix
    "corpus_ks_drift",         # distributed prefix scan over the CDFs
    "text_zipf_fit",           # corpus freq + distributed rank
    "text_char_entropy",       # alphabet-bounded per-lang aggregate
    "corpus_doremi_weights",   # corpus surprisal + bounded EG step
    "corpus_unimax_alloc",     # one corpus aggregate + bounded greedy
]


def run(sf_dir: str, label: str):
    from gdal_spark import get_spark
    from gdal_spark import queries as Q

    spark = get_spark(app_name=f"stress6-{label}", master="local[32]")
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
    print("\n| query | rows@0.1 | rows@1.0 | t@0.1 s | t@1.0 s | ratio |")
    print("|---|---|---|---|---|---|")
    for name in GATES:
        ratio = t10[name] / t1[name] if t1[name] else float("nan")
        print(f"| {name} | {r1[name]:,} | {r10[name]:,} | "
              f"{t1[name]:.1f} | {t10[name]:.1f} | {ratio:.1f}x |")


if __name__ == "__main__":
    main()
