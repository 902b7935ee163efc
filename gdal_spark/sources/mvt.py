"""Mapbox Vector Tile (MVT) driver — the reference's MVT format
(``ogr/ogrsf_frmts/mvt/``; public vector-tile-spec 2.1): protobuf tiles of
features whose geometries are zigzag-delta command streams in tile-local
integer coordinates (extent 4096 by default).

This module implements the spec's wire format directly (varint + the three
wire types the tile schema uses) — no protobuf library — for POINT and
POLYGON layers:

* ``encode_tile(features)``  → tile bytes (one layer)
* ``decode_tile(buf)``       → the features back (ids, tags, geometry)

Spark mapping: encoding is per-(tile) ``applyInPandas`` over features
already quantized to tile-local coords by pure Column math (the same
lonlat→tile→pixel closed form as the render gates); a tile's feature set
is bounded by the tiling contract, never corpus-scale.  Decoding is a
map-only pass over tile blobs.
"""

from __future__ import annotations

from typing import Iterable

EXTENT = 4096

_MOVETO, _LINETO, _CLOSEPATH = 1, 2, 7
_POINT, _POLYGON = 1, 3


# ---------------------------------------------------------------------------
# protobuf primitives (wire types 0 = varint, 2 = length-delimited)
# ---------------------------------------------------------------------------

def _varint(n: int) -> bytes:
    if n < 0:
        # Python's arbitrary-precision `n >>= 7` never reaches 0 for a
        # negative int — the loop would spin forever inside an executor.
        # Negative ints must be zigzag-encoded (sint_value) by the caller.
        raise ValueError(f"varint requires a non-negative int, got {n}")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _ld(field: int, payload: bytes) -> bytes:
    return _key(field, 2) + _varint(len(payload)) + payload


def _packed(field: int, values: Iterable[int]) -> bytes:
    body = b"".join(_varint(v) for v in values)
    return _ld(field, body)


def _read_varint(buf: bytes, off: int) -> tuple[int, int]:
    shift, val = 0, 0
    while True:
        b = buf[off]
        off += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, off
        shift += 7


# ---------------------------------------------------------------------------
# geometry command streams
# ---------------------------------------------------------------------------

def _cmd(cmd_id: int, count: int) -> int:
    return (cmd_id & 0x7) | (count << 3)


def _encode_point_geom(px: int, py: int) -> list[int]:
    return [_cmd(_MOVETO, 1), _zigzag(px), _zigzag(py)]


def _encode_polygon_geom(ring: list[tuple[int, int]]) -> list[int]:
    """One exterior ring (first point NOT repeated at the end)."""
    out = [_cmd(_MOVETO, 1), _zigzag(ring[0][0]), _zigzag(ring[0][1])]
    out.append(_cmd(_LINETO, len(ring) - 1))
    cx, cy = ring[0]
    for x, y in ring[1:]:
        out += [_zigzag(x - cx), _zigzag(y - cy)]
        cx, cy = x, y
    out.append(_cmd(_CLOSEPATH, 1))
    return out


# ---------------------------------------------------------------------------
# tile encode / decode
# ---------------------------------------------------------------------------

def encode_tile(
    features: list[dict],
    layer_name: str = "layer0",
    extent: int = EXTENT,
) -> bytes:
    """``features``: dicts with ``id`` (int), ``attrs`` (dict[str,int]),
    and either ``point`` = (px, py) or ``ring`` = [(x, y), ...]."""
    keys: list[str] = []
    vals: list[int] = []

    def tag(k: str, v: int) -> tuple[int, int]:
        if k not in keys:
            keys.append(k)
        if v not in vals:
            vals.append(v)
        return keys.index(k), vals.index(v)

    feats = b""
    for f in sorted(features, key=lambda f: f["id"]):
        if not isinstance(f["id"], int) or f["id"] < 0:
            raise ValueError(f"feature id must be a uint64, got {f['id']!r}")
        tags: list[int] = []
        for k in sorted(f.get("attrs", {})):
            v = f["attrs"][k]
            if not isinstance(v, int):
                raise ValueError(
                    f"attr {k!r} must be int (got {type(v).__name__}); "
                    "this codec carries integer attributes only")
            ki, vi = tag(k, v)
            tags += [ki, vi]
        if "point" in f:
            gtype, geom = _POINT, _encode_point_geom(*f["point"])
        else:
            gtype, geom = _POLYGON, _encode_polygon_geom(f["ring"])
        body = (
            _key(1, 0) + _varint(f["id"])
            + _packed(2, tags)
            + _key(3, 0) + _varint(gtype)
            + _packed(4, geom)
        )
        feats += _ld(2, body)

    layer = (
        _key(15, 0) + _varint(2)                       # version = 2
        + _ld(1, layer_name.encode("utf-8"))
        + feats
        + b"".join(_ld(3, k.encode("utf-8")) for k in keys)
        # spec value message: int_value (field 4) for v >= 0,
        # sint_value (field 6, zigzag) for negatives
        + b"".join(
            _ld(4, (_key(4, 0) + _varint(v)) if v >= 0
                else (_key(6, 0) + _varint(_zigzag(v))))
            for v in vals)
        + _key(5, 0) + _varint(extent)
    )
    return _ld(3, layer)


def decode_tile(buf: bytes) -> dict:
    """Inverse of encode_tile: {'name', 'extent', 'version', 'features':
    [{'id', 'type', 'attrs', 'points': [(x, y), ...]}]}."""
    off = 0
    key, off = _read_varint(buf, off)
    assert key >> 3 == 3 and (key & 7) == 2, "not a layer field"
    ln, off = _read_varint(buf, off)
    layer = buf[off:off + ln]

    name, extent, version = "", EXTENT, 0
    raw_feats: list[bytes] = []
    keys: list[str] = []
    vals: list[int] = []
    o = 0
    while o < len(layer):
        k, o = _read_varint(layer, o)
        field, wire = k >> 3, k & 7
        if wire == 0:
            v, o = _read_varint(layer, o)
            if field == 15:
                version = v
            elif field == 5:
                extent = v
        else:
            n, o = _read_varint(layer, o)
            payload = layer[o:o + n]
            o += n
            if field == 1:
                name = payload.decode("utf-8")
            elif field == 2:
                raw_feats.append(payload)
            elif field == 3:
                keys.append(payload.decode("utf-8"))
            elif field == 4:
                kk, oo = _read_varint(payload, 0)
                vf = kk >> 3
                assert vf in (4, 6), f"unsupported value field {vf}"
                v, _ = _read_varint(payload, oo)
                vals.append(v if vf == 4 else _unzigzag(v))

    feats = []
    for fb in raw_feats:
        fid, gtype, tags, geom = 0, 0, [], []
        o = 0
        while o < len(fb):
            k, o = _read_varint(fb, o)
            field, wire = k >> 3, k & 7
            if wire == 0:
                v, o = _read_varint(fb, o)
                if field == 1:
                    fid = v
                elif field == 3:
                    gtype = v
            else:
                n, o = _read_varint(fb, o)
                payload = fb[o:o + n]
                o += n
                vv, oo = [], 0
                while oo < len(payload):
                    v, oo = _read_varint(payload, oo)
                    vv.append(v)
                if field == 2:
                    tags = vv
                elif field == 4:
                    geom = vv
        attrs = {
            keys[tags[i]]: vals[tags[i + 1]]
            for i in range(0, len(tags), 2)
        }
        pts, cx, cy, i = [], 0, 0, 0
        while i < len(geom):
            cmd = geom[i]
            i += 1
            cid, cnt = cmd & 0x7, cmd >> 3
            if cid in (_MOVETO, _LINETO):
                for _ in range(cnt):
                    cx += _unzigzag(geom[i])
                    cy += _unzigzag(geom[i + 1])
                    i += 2
                    pts.append((cx, cy))
            elif cid == _CLOSEPATH:
                pass
        feats.append(
            {"id": fid, "type": gtype, "attrs": attrs, "points": pts})
    return {"name": name, "extent": extent, "version": version,
            "features": feats}
