"""Unit tests for median-cut quantization and dithering operators."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gdal_spark.operators import quantize as QZ


def test_median_cut_two_colors():
    colors = np.array([[4, 4, 4], [252, 252, 252]], dtype=np.int64)
    counts = np.array([10, 30], dtype=np.int64)
    pal = QZ.median_cut(colors, counts, n_colors=4)
    # only 2 distinct colors -> exactly 2 palette entries, the colors
    assert pal.shape == (2, 3)
    assert pal.tolist() == [[4, 4, 4], [252, 252, 252]]


def test_median_cut_splits_longest_axis_and_is_deterministic():
    rng = np.random.RandomState(7)
    colors = rng.randint(0, 32, size=(200, 3)).astype(np.int64) * 8 + 4
    colors = np.unique(colors, axis=0)
    counts = np.arange(1, len(colors) + 1).astype(np.int64)
    p1 = QZ.median_cut(colors, counts, 16)
    p2 = QZ.median_cut(colors[::-1].copy(), counts[::-1].copy(), 16)
    assert p1.shape == (16, 3)
    assert (p1 == p2).all()  # input order must not matter
    # palette sorted by (r, g, b)
    keys = [tuple(c) for c in p1.tolist()]
    assert keys == sorted(keys)


def test_assign_palette_tie_breaks_lowest_index(spark):
    pal = np.array([[0, 0, 0], [2, 0, 0]], dtype=np.uint8)
    px = spark.createDataFrame([(0, 0, 1, 0, 0)], "x long, y long, r long, g long, b long")
    row = QZ.assign_palette_index(px, pal).collect()[0]
    assert row["pct_idx"] == 0  # equidistant -> first entry
    assert (row["pr"], row["pg"], row["pb"]) == (0, 0, 0)


def test_distributed_palette_matches_numpy(spark):
    from pyspark.sql import functions as F

    px = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    ).select(
        "x", "y",
        *[((F.col("x") * 31 + F.col("y") * 17 + c * 7) % 256).alias(n)
          for c, n in ((1, "r"), (2, "g"), (3, "b"))],
    )
    got = QZ.compute_median_cut_palette(px, 16)
    xs, ys = np.meshgrid(np.arange(64), np.arange(64))
    rgb = np.stack(
        [(xs * 31 + ys * 17 + c * 7) % 256 for c in (1, 2, 3)], axis=-1
    ).reshape(-1, 3).astype(np.int64)
    uniq, counts = np.unique(rgb // 8, axis=0, return_counts=True)
    order = np.lexsort((uniq[:, 2], uniq[:, 1], uniq[:, 0]))
    want = QZ.median_cut(uniq[order] * 8 + 4, counts[order], 16)
    assert (got == want).all()


def test_fs_reference_exact_palette_is_identity():
    pal = np.array([[0, 0, 0], [128, 64, 32], [255, 255, 255]], dtype=np.uint8)
    img = np.zeros((4, 4, 3), dtype=np.float64)
    img[:, :] = [128, 64, 32]
    idx = QZ.floyd_steinberg_reference(img, pal)
    assert (idx == 1).all()  # zero error everywhere -> no diffusion


def test_fs_reference_preserves_mean_brightness():
    # 25%-gray image with a black/white palette: FS should turn ~25% of
    # pixels white (error diffusion preserves local mean)
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    img = np.full((32, 32, 3), 64.0)
    idx = QZ.floyd_steinberg_reference(img, pal)
    frac_white = (idx == 1).mean()
    assert abs(frac_white - 64.0 / 255.0) < 0.02


def test_dither_fs_matches_reference_per_image(spark):
    rng = np.random.RandomState(3)
    pal = np.array([[0, 0, 0], [85, 85, 85], [170, 170, 170],
                    [255, 255, 255]], dtype=np.uint8)
    rows = []
    imgs = {}
    for image_id in (1, 2):
        img = rng.randint(0, 256, size=(8, 8, 3)).astype(np.float64)
        imgs[image_id] = img
        for y in range(8):
            for x in range(8):
                rows.append((image_id, x, y, int(img[y, x, 0]),
                             int(img[y, x, 1]), int(img[y, x, 2])))
    rng.shuffle(rows)  # operator must not depend on input row order
    df = spark.createDataFrame(
        rows, "image_id long, x long, y long, r long, g long, b long"
    )
    got = {}
    for r in QZ.dither_fs(df, pal).collect():
        got[(r["image_id"], r["y"], r["x"])] = r["pct_idx"]
    for image_id, img in imgs.items():
        want = QZ.floyd_steinberg_reference(img, pal)
        for y in range(8):
            for x in range(8):
                assert got[(image_id, y, x)] == want[y, x]
