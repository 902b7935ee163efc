"""PMTiles v3 codec tests (public protomaps/PMTiles spec; reference driver
ogr/ogrsf_frmts/pmtiles/)."""

import gzip
import tempfile

import numpy as np
import pytest

from gdal_spark.sources import pmtiles as PMT


def test_tileid_spec_anchor_values():
    """The spec's published tile-id ordering: z0 is 0; z1 walks the
    Hilbert curve (0,0)->(0,1)->(1,1)->(1,0); z2 starts at 5."""
    assert PMT.zxy_to_tileid(0, 0, 0) == 0
    assert PMT.zxy_to_tileid(1, 0, 0) == 1
    assert PMT.zxy_to_tileid(1, 0, 1) == 2
    assert PMT.zxy_to_tileid(1, 1, 1) == 3
    assert PMT.zxy_to_tileid(1, 1, 0) == 4
    assert PMT.zxy_to_tileid(2, 0, 0) == 5
    with pytest.raises(ValueError):
        PMT.zxy_to_tileid(1, 2, 0)


def test_tileid_inverse_exhaustive_low_zooms():
    for z in range(0, 6):
        seen = set()
        for x in range(1 << z):
            for y in range(1 << z):
                tid = PMT.zxy_to_tileid(z, x, y)
                assert PMT.tileid_to_zxy(tid) == (z, x, y)
                seen.add(tid)
        base = ((1 << (2 * z)) - 1) // 3
        assert seen == set(range(base, base + (1 << (2 * z))))


def test_tileid_numpy_mirror():
    z = 7
    xs = np.arange(1 << z).repeat(1 << z)
    ys = np.tile(np.arange(1 << z), 1 << z)
    got = PMT.tileid_np(z, xs, ys)
    for i in range(0, len(xs), 997):
        assert got[i] == PMT.zxy_to_tileid(z, int(xs[i]), int(ys[i]))


def test_directory_roundtrip_runs_and_contiguity():
    entries = [
        (0, 0, 100, 1),
        (1, 100, 50, 3),      # run of 3 ids sharing one blob
        (10, 150, 7, 1),      # contiguous: offset == prev+len -> varint 0
        (99, 0, 100, 1),      # content-dedup back-reference
    ]
    buf = PMT.encode_directory(entries)
    assert PMT.decode_directory(buf) == entries
    # the contiguous entry encodes as a single 0 byte in the offset block
    assert PMT.encode_directory([(0, 0, 5, 1), (1, 5, 5, 1)]).endswith(
        b"\x01\x00")


def test_varint_negative_raises():
    with pytest.raises(ValueError):
        PMT._uvarint(-1)


def test_write_parse_header_and_dedup(tmp_path):
    p = str(tmp_path / "t.pmtiles")
    blob_a, blob_b = b"A" * 40, b"B" * 10
    stats = PMT.write_pmtiles(
        [(0, 0, 0, blob_a), (1, 0, 0, blob_b), (1, 1, 1, blob_a)], p,
        tile_type=PMT.TILE_PNG)
    assert stats["n_entries"] == 3
    assert stats["n_contents"] == 2          # blob_a stored once
    assert stats["tile_bytes"] == 50
    h = PMT.parse_header(p)
    assert h["magic"] == PMT.MAGIC
    assert h["n_entries"] == 3 and h["n_contents"] == 2
    assert h["clustered"] == 1 and h["tile_type"] == PMT.TILE_PNG
    assert (h["min_zoom"], h["max_zoom"]) == (0, 1)
    assert h["min_lon_e7"] == -1800000000
    ents = PMT.read_entries(p)
    assert [t for t, _, _ in ents] == [0, 1, 3]
    # dedup: ids 0 and 3 point at the same absolute offset
    assert ents[0][1] == ents[2][1] and ents[0][2] == 40


def test_root_directory_is_gzip(tmp_path):
    p = str(tmp_path / "t.pmtiles")
    PMT.write_pmtiles([(0, 0, 0, b"xyz")], p)
    h = PMT.parse_header(p)
    raw = open(p, "rb").read()
    root = raw[h["root_off"]: h["root_off"] + h["root_len"]]
    assert root[:2] == b"\x1f\x8b"  # gzip magic
    assert PMT.decode_directory(gzip.decompress(root)) == [(0, 0, 3, 1)]


def test_pmtiles_spark_roundtrip(spark):
    p = tempfile.mkdtemp(prefix="pmt_rt_") + "/pyr.pmtiles"
    tiles = [(z, x, y, f"z{z}x{x}y{y}".encode() * 3)
             for z in (0, 1, 2) for x in range(1 << z)
             for y in range(1 << z)]
    PMT.write_pmtiles(tiles, p)
    back = {(r["zoom"], r["tx"], r["ty"]): bytes(r["tile_data"])
            for r in PMT.read_pmtiles(spark, p).collect()}
    assert len(back) == len(tiles) == 21
    for z, x, y, blob in tiles:
        assert back[(z, x, y)] == blob


def test_pmtiles_gzip_tile_compression(spark):
    p = tempfile.mkdtemp(prefix="pmt_gz_") + "/t.pmtiles"
    blob = b"not very compressible?" * 20
    PMT.write_pmtiles(
        [(0, 0, 0, gzip.compress(blob, mtime=0))], p,
        tile_compression=PMT.COMPRESS_GZIP)
    rows = PMT.read_pmtiles(spark, p).collect()
    assert bytes(rows[0]["tile_data"]) == blob  # decompressed on read
