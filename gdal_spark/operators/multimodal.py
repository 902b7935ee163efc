"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns + typed metadata structs — the
same stance GDAL's raster drivers take (bytes + geotransform/band metadata,
SURVEY.md §1.2), and the right 100 TB layout: parquet binary pages stay
compressed, metadata columns prune without touching payload bytes.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake decode, clearly marked) — but everything Spark-side is
real and tested: schema, Arrow batch shape, mapInPandas signatures,
partitioning, metadata pushdown.

Operators
---------
* ``attach_media``       — synthesize a deterministic media binary per row
                           (fake PNG/WAV-ish magic + payload) + metadata
* ``media_metadata``     — parse magic bytes / sizes into typed columns
                           (pure column math: substring/length on binary)
* ``decode_image``       — STUB decode → (h, w, mean_value) via the
                           deterministic fake codec (mapInPandas, Arrow)
* ``frame_sample``       — video frame sampling plumbing: explode N frame
                           offsets per row, stub per-frame features
* ``resize_stub``        — image resize signature (raises NotImplementedError
                           for real images; handles fake codec payloads)
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FAKE_MAGIC_IMG = b"FIMG"  # fake 'PNG'
FAKE_MAGIC_AUD = b"FAUD"  # fake 'WAV'


def attach_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Add (media: binary, media_type: string) columns, deterministic per id.

    Fake container layout (OUR format, ascii header so it is pure column
    math): ``MAGIC(4) | 'w=%04d;h=%04d;' | payload`` with
    payload = md5(id) repeated 4×. No UDF anywhere.
    """
    w = (F.col(id_col) % 64 + 16).cast("int")
    h = (F.col(id_col) % 48 + 16).cast("int")
    kind = F.when(F.col(id_col) % 3 == 0, F.lit("audio")).otherwise(F.lit("image"))
    magic = F.when(kind == "audio", F.lit(FAKE_MAGIC_AUD.decode())).otherwise(
        F.lit(FAKE_MAGIC_IMG.decode())
    )
    header = F.concat(
        F.lit("w="), F.lpad(w.cast("string"), 4, "0"),
        F.lit(";h="), F.lpad(h.cast("string"), 4, "0"), F.lit(";"),
    )
    payload = F.repeat(F.md5(F.col(id_col).cast("string")), 4)
    return df.select(
        "*",
        F.concat(magic, header, payload).cast("binary").alias("media"),
        kind.alias("media_type"),
        w.alias("media_w"),
        h.alias("media_h"),
    )


def media_metadata(df: DataFrame, media: str = "media") -> DataFrame:
    """Typed metadata from the binary column — pure column ops (substring on
    binary, length), so Catalyst prunes the payload when only metadata is
    selected downstream."""
    m = F.col(media)
    magic = F.substring(m, 1, 4).cast("string")
    return df.select(
        "*",
        magic.alias("magic"),
        F.length(m).alias("media_bytes"),
        F.when(magic == FAKE_MAGIC_IMG.decode(), F.lit("image"))
        .when(magic == FAKE_MAGIC_AUD.decode(), F.lit("audio"))
        .otherwise(F.lit("unknown"))
        .alias("detected_type"),
    )


def _fake_decode(buf: bytes) -> np.ndarray:
    """Deterministic fake codec: pixels = payload bytes tiled to (h, w).

    STUB — a real deployment swaps this for PIL/libvips decode; the Spark
    plumbing (Arrow batches in, struct rows out) is identical either way.
    """
    if buf[:4] not in (FAKE_MAGIC_IMG, FAKE_MAGIC_AUD):
        raise NotImplementedError(
            "real media decoding requires an image/audio codec not present "
            "in this environment; only the deterministic fake codec is "
            "supported here"
        )
    # header: MAGIC | w=%04d;h=%04d; | payload
    w = int(buf[6:10])
    h = int(buf[13:17])
    payload = np.frombuffer(buf[18:], dtype=np.uint8)
    reps = int(np.ceil(w * h / max(payload.size, 1)))
    return np.tile(payload, reps)[: w * h].reshape(h, w)


def decode_image(df: DataFrame, media: str = "media",
                 id_col: str = "doc_id") -> DataFrame:
    """Decode → per-image features (h, w, mean_val). Arrow-batched
    mapInPandas; per-batch numpy, no per-row Python beyond the byte parse."""
    schema = f"{id_col} long, img_h int, img_w int, mean_val double"
    id_i = df.columns.index(id_col)
    m_i = df.columns.index(media)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs, ws, means = [], [], [], []
            for rid, buf in zip(pdf.iloc[:, id_i], pdf.iloc[:, m_i]):
                arr = _fake_decode(bytes(buf))
                ids.append(rid)
                hs.append(arr.shape[0])
                ws.append(arr.shape[1])
                means.append(float(np.round(arr.mean(), 6)))
            yield pd.DataFrame(
                {id_col: ids, "img_h": hs, "img_w": ws, "mean_val": means}
            )

    return df.mapInPandas(run, schema)


def frame_sample(df: DataFrame, n_frames: int = 4, media: str = "media",
                 id_col: str = "doc_id") -> DataFrame:
    """Video-style frame sampling plumbing: N frame indices per row
    (flatMap/explode — partition count scales with output), stub per-frame
    feature = mean of a byte slice."""
    exploded = df.select(
        F.col(id_col), F.col(media),
        F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_idx"),
    )
    schema = f"{id_col} long, frame_idx int, frame_mean double"
    id_i, m_i, f_i = 0, 1, 2

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fids, means = [], [], []
            for rid, buf, fi in zip(
                pdf.iloc[:, id_i], pdf.iloc[:, m_i], pdf.iloc[:, f_i]
            ):
                b = bytes(buf)[18:]  # skip MAGIC + 'w=%04d;h=%04d;' header
                n = max(len(b) // max(1, n_frames), 1)
                sl = np.frombuffer(b[fi * n:(fi + 1) * n] or b[:1], dtype=np.uint8)
                ids.append(rid)
                fids.append(fi)
                means.append(float(np.round(sl.mean(), 6)))
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": fids, "frame_mean": means}
            )

    return exploded.mapInPandas(run, schema)


def resize_stub(df: DataFrame, out_w: int, out_h: int, media: str = "media",
                id_col: str = "doc_id") -> DataFrame:
    """Image resize: nearest-neighbour over the fake codec's pixel grid —
    the same warp-nearest index math as operators/tiles.py sample_nearest
    (gdalwarpkernel.cpp:5228 semantics), applied per image in numpy."""
    schema = f"{id_col} long, data binary, out_w int, out_h int"
    id_i = df.columns.index(id_col)
    m_i = df.columns.index(media)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for rid, buf in zip(pdf.iloc[:, id_i], pdf.iloc[:, m_i]):
                arr = _fake_decode(bytes(buf))
                h, w = arr.shape
                sx = (np.arange(out_w) + 0.5) * w / out_w
                sy = (np.arange(out_h) + 0.5) * h / out_h
                ix = np.minimum((sx + 1e-10).astype(int), w - 1)
                iy = np.minimum((sy + 1e-10).astype(int), h - 1)
                ids.append(rid)
                blobs.append(arr[np.ix_(iy, ix)].tobytes())
            yield pd.DataFrame(
                {id_col: ids, "data": blobs, "out_w": out_w, "out_h": out_h}
            )

    return df.mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# Audio path plumbing: synthesize deterministic PCM (the codec decode step
# stays a stub — no audio libs in this container), then run the REAL
# distributed pieces: block decimation (integer-factor resample), per-clip
# loudness stats.  An Arrow-batched kernel per clip; linear map at corpus
# scale.
# ---------------------------------------------------------------------------

AUDIO_SR = 16000
AUDIO_DECIM = 4


def synth_pcm(doc_id: int, n: int = 2048) -> np.ndarray:
    """Deterministic fake 'decoded' PCM for doc_id: a two-tone sine mix
    with doc-keyed frequencies (closed form, shared with the SQL oracle)."""
    t = np.arange(n, dtype=np.float64)
    f1 = 110.0 + (doc_id % 40) * 7.0
    f2 = 330.0 + (doc_id % 17) * 11.0
    return (
        np.sin(2.0 * np.pi * f1 * t / AUDIO_SR)
        + 0.5 * np.sin(2.0 * np.pi * f2 * t / AUDIO_SR)
    )


def audio_resample_stats(
    docs: DataFrame, n_samples: int = 2048, decim: int = AUDIO_DECIM,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per clip: decimate by ``decim`` (mean of each block — the polyphase
    box kernel), emit count, micro-unit energy sum, and an md5 digest of
    the micro-rounded resampled signal.  The synthesis stands in for the
    codec; everything after it is the production plumbing."""

    def run(batches):
        for pdf in batches:
            out = []
            for did in pdf[id_col]:
                pcm = synth_pcm(int(did), n_samples)
                blocks = pcm.reshape(-1, decim)
                # explicit left-associated sum — bit-parity with the SQL
                # oracle's a + b + c + d
                acc = blocks[:, 0]
                for k in range(1, decim):
                    acc = acc + blocks[:, k]
                res = acc / float(decim)
                vi = np.floor(res * 1e6 + 0.5).astype(np.int64)
                out.append({
                    id_col: int(did),
                    "n_out": int(vi.shape[0]),
                    "energy_micro": int(np.abs(vi).sum()),
                    "digest": __import__("hashlib").md5(
                        ",".join(str(int(v)) for v in vi).encode()
                    ).hexdigest(),
                })
            yield pd.DataFrame(out)

    return docs.select(id_col).mapInPandas(
        run, f"{id_col} long, n_out long, energy_micro long, digest string"
    )
