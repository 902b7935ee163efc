"""Baseline JPEG codec (functions/jpeg.py): stream structure vs the T.81
marker grammar, Huffman table validity (Kraft, no all-ones code), roundtrip
quality bounds, DCT orthonormality, and quality-knob monotonicity."""

import numpy as np
import pytest

from gdal_spark.functions import jpeg as J


def _test_image(h=64, w=96, seed=3):
    rng = np.random.default_rng(seed)
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    img = (128 + 70 * np.sin(x / 11.0) + 45 * np.cos(y / 8.0)
           + rng.normal(0, 5, (h, w)))
    return np.clip(img, 0, 255).astype(np.uint8)


def test_dct_matrix_orthonormal():
    assert np.allclose(J._C @ J._C.T, np.eye(8), atol=1e-14)


def test_zigzag_is_permutation():
    assert sorted(J._ZIG.tolist()) == list(range(64))


def test_marker_structure():
    blob = J.encode_jpeg(_test_image(), quality=80)
    assert blob[:2] == b"\xFF\xD8" and blob[-2:] == b"\xFF\xD9"
    # walk segments up to SOS
    pos, seen = 2, []
    while True:
        assert blob[pos] == 0xFF
        tag = blob[pos + 1]
        seen.append(tag)
        ln = int.from_bytes(blob[pos + 2:pos + 4], "big")
        pos += 2 + ln
        if tag == 0xDA:
            break
    assert 0xE0 in seen and 0xDB in seen and 0xC0 in seen and 0xC4 in seen


def test_huffman_tables_valid():
    freqs = {0: 1000, 1: 500, 2: 80, 3: 10, 0xF0: 3, 0xAB: 1}
    bits, huffval = J._optimal_bits_huffval(freqs)
    assert sum(bits) == len(huffval) == len(freqs)
    assert max(
        ln for ln, n in enumerate(bits, start=1) for _ in range(n)
    ) <= 16
    # Kraft strictly < 1 (the reserved symbol keeps all-ones free)
    kraft = sum(n * 2.0 ** -(i + 1) for i, n in enumerate(bits))
    assert kraft < 1.0
    codes = J._canonical_codes(bits, huffval)
    for sym, (code, length) in codes.items():
        assert code != (1 << length) - 1, "all-ones code must stay reserved"


def test_roundtrip_gray_quality_bounds():
    img = _test_image()
    for q, mae_bound in ((95, 2.0), (85, 3.5), (50, 7.0)):
        back = J.decode_jpeg(J.encode_jpeg(img, quality=q))
        assert back.shape == img.shape and back.dtype == np.uint8
        mae = np.abs(back.astype(float) - img.astype(float)).mean()
        assert mae < mae_bound, (q, mae)


def test_roundtrip_rgb():
    g = _test_image()
    rgb = np.stack([g, np.roll(g, 9, axis=1), 255 - g], axis=-1)
    back = J.decode_jpeg(J.encode_jpeg(rgb, quality=90))
    assert back.shape == rgb.shape
    assert np.abs(back.astype(float) - rgb.astype(float)).mean() < 6.0


def test_flat_image_is_tiny_and_exact():
    img = np.full((40, 40), 77, dtype=np.uint8)
    blob = J.encode_jpeg(img, quality=85)
    back = J.decode_jpeg(blob)
    assert np.abs(back.astype(float) - 77).max() <= 1.0
    assert len(blob) < 700   # DC-only stream


def test_non_multiple_of_8_dims():
    img = _test_image(h=37, w=51)
    back = J.decode_jpeg(J.encode_jpeg(img, quality=90))
    assert back.shape == (37, 51)
    assert np.abs(back.astype(float) - img.astype(float)).mean() < 3.0


def test_quality_monotone_in_size():
    img = _test_image()
    sizes = [len(J.encode_jpeg(img, quality=q)) for q in (30, 60, 90)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_byte_stuffing_survives():
    # gradient tuned to produce 0xFF bytes in the entropy stream; the
    # decode must still parse (stuffed 0xFF00 vs real markers)
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (48, 48)).astype(np.uint8)
    blob = J.encode_jpeg(img, quality=95)
    assert b"\xff\x00" in blob  # stuffing actually happened
    back = J.decode_jpeg(blob)
    assert back.shape == img.shape
