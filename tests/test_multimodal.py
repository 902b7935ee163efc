"""Multimodal plumbing: schema, metadata pushdown, stub decode, frames."""

import pytest
from pyspark.sql import functions as F

from gdal_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_attach_and_metadata(spark, docs):
    media = M.attach_media(docs.limit(50))
    meta = M.media_metadata(media)
    rows = meta.select(
        "doc_id", "media_type", "detected_type", "magic", "media_bytes",
        "media_w", "media_h",
    ).collect()
    assert len(rows) == 50
    for r in rows:
        assert r["detected_type"] == r["media_type"]
        assert r["media_bytes"] == 4 + 14 + 128  # magic + header + 4*md5
        assert 16 <= r["media_w"] < 80


def test_decode_image_deterministic(spark, docs):
    media = M.attach_media(docs.limit(20))
    out = {r["doc_id"]: r for r in M.decode_image(media).collect()}
    assert len(out) == 20
    again = {r["doc_id"]: r for r in M.decode_image(media).collect()}
    for k in out:
        assert out[k]["mean_val"] == again[k]["mean_val"]
        assert out[k]["img_w"] == (k % 64) + 16
        assert out[k]["img_h"] == (k % 48) + 16


def test_decode_rejects_unknown_magic(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"XXXXgarbage"))], "doc_id long, media binary"
    )
    with pytest.raises(Exception) as ei:
        M.decode_image(df).collect()
    assert "NotImplementedError" in str(ei.value) or "codec" in str(ei.value)


def test_frame_sample_shape(spark, docs):
    media = M.attach_media(docs.limit(10))
    out = M.frame_sample(media, n_frames=4).collect()
    assert len(out) == 40
    assert {r["frame_idx"] for r in out} == {0, 1, 2, 3}


def test_resize_stub(spark, docs):
    media = M.attach_media(docs.limit(5))
    out = M.resize_stub(media, out_w=8, out_h=8).collect()
    for r in out:
        assert len(bytes(r["data"])) == 64


def test_frame_sample_nframes_partitions_payload(spark, docs):
    """Regression (ADVICE r1): slice size must derive from n_frames, not a
    hardcoded 4. With the 128-byte payload, n_frames=8 gives 16-byte slices
    covering the whole payload; the weighted mean of the 8 frame means must
    equal the full-payload mean (equal slice sizes) — impossible under the
    old bug, where frames 4..7 indexed past the payload and degraded to a
    1-byte fallback."""
    import numpy as np

    media = M.attach_media(docs.limit(6))
    payloads = {
        r["doc_id"]: bytes(r["media"])[18:] for r in media.collect()
    }
    for nf in (2, 8):
        out = M.frame_sample(media, n_frames=nf).collect()
        assert len(out) == 6 * nf
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(
                (r["frame_idx"], r["frame_mean"])
            )
        for did, frames in by_doc.items():
            b = np.frombuffer(payloads[did], dtype=np.uint8)
            n = len(b) // nf
            for fi, fm in frames:
                assert fm == float(np.round(b[fi * n:(fi + 1) * n].mean(), 6))
