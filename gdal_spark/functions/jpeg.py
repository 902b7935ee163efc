"""Baseline JPEG (ITU-T T.81 / ISO 10918-1) codec — from-scratch numpy
implementation of the SOF0 sequential-DCT profile.

Reference semantics: ``frmts/jpeg/`` (the reference's JPEG driver wraps
libjpeg); MBTiles/COG pyramids in the wild are mostly JPEG tiles, so the
tile sinks need an encoder and the scans a decoder.  This is a clean-room
implementation from the PUBLIC T.81 spec:

* 8×8 blocks, orthonormal DCT-II via a precomputed 8×8 matrix (exact
  float, vectorized over all blocks at once);
* quantization with the Annex-K-style quality scaling of a base table;
* zigzag, DC difference coding, AC run/size coding with EOB and ZRL;
* **per-image optimal Huffman tables** (two-pass, like ``jpegtran
  -optimize``): symbol frequencies → length-limited (≤16) canonical
  Huffman via the spec's Annex K.2 BITS-adjustment — the DHT segment
  always describes exactly the codes used, so files are spec-valid
  without reciting the fixed Annex K tables;
* grayscale (1 component) or YCbCr 4:4:4 (3 components, JFIF transform);
* decoder parses SOI/APP0/DQT/SOF0/DHT/SOS, undoes byte stuffing, and
  inverts the whole chain (canonical Huffman decode, dequant, IDCT).

Spark shape: encode/decode are per-tile numpy kernels used inside
``mapInPandas`` batches — one task per tile, embarrassingly parallel, the
same contract as functions/png.py.
"""

from __future__ import annotations

import numpy as np

# --- DCT ---------------------------------------------------------------------

_C = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _C[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16.0)

# zigzag scan order: index i holds the (row, col) rank of coefficient i
_ZIG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# base luminance/chrominance quantization tables (T.81 Annex K.1 — the one
# pair of public constants this codec carries; scaled by quality below)
_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)


def _qtable(base: np.ndarray, quality: int) -> np.ndarray:
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255)


# --- bit IO -------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)   # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)   # pad with 1-bits per spec


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def get(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0
                self.nbits += 8
                continue
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1        # unstuff
                else:                    # marker: behave as EOF padding
                    self.pos -= 1
                    b = 0
            self.acc = (self.acc << 8) | b
            self.nbits += 8
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        return v


# --- Huffman -----------------------------------------------------------------

def _optimal_bits_huffval(freqs: dict[int, int]):
    """T.81 Annex K.2: code lengths from pairwise merging (with the spec's
    reserved extra symbol so no real code is all 1-bits), then length
    limiting to 16 via the Adjust_BITS procedure."""
    freq = np.zeros(257, dtype=np.int64)
    for sym, f in freqs.items():
        freq[sym] = f
    freq[256] = 1  # reserved symbol: claims the all-ones code
    codesize = np.zeros(257, dtype=np.int64)
    others = np.full(257, -1, dtype=np.int64)
    while True:
        nz = np.where(freq > 0)[0]
        if len(nz) < 2:
            break
        v1 = nz[np.argmin(freq[nz])]
        f2 = freq.copy()
        f2[v1] = np.iinfo(np.int64).max
        nz2 = np.where((f2 > 0) & (f2 != np.iinfo(np.int64).max))[0]
        if len(nz2) == 0:
            break
        v2 = nz2[np.argmin(f2[nz2])]
        freq[v1] += freq[v2]
        freq[v2] = 0
        codesize[v1] += 1
        while others[v1] != -1:
            v1 = others[v1]
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] != -1:
            v2 = others[v2]
            codesize[v2] += 1
    bits = np.zeros(33, dtype=np.int64)
    for sz in codesize[codesize > 0]:
        bits[min(int(sz), 32)] += 1
    # Adjust_BITS: fold lengths > 16 down
    i = 32
    while i > 16:
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    # remove the reserved symbol's code (largest length)
    i = 16
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1
    huffval = sorted(
        [s for s in freqs if freqs[s] > 0],
        key=lambda s: (codesize[s], s),
    )
    return [int(b) for b in bits[1:17]], huffval


def _canonical_codes(bits: list[int], huffval: list[int]):
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_tables(bits: list[int], huffval: list[int]):
    """(length → {code: symbol}) lookup for the decoder."""
    lut = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lut[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return lut


def _read_huffman(reader: _BitReader, lut) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.get(1)
        sym = lut.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid Huffman code")


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = int(a).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


# --- block pipeline -----------------------------------------------------------

def _to_blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    h, w = plane.shape
    ph = (h + 7) // 8 * 8
    pw = (w + 7) // 8 * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
    return blocks.reshape(-1, 8, 8), ph // 8, pw // 8


def _encode_plane_symbols(plane: np.ndarray, q: np.ndarray):
    """Quantized zigzag coefficients for every block + the symbol stream
    pieces (computed vectorized; the entropy stage is per-block)."""
    blocks, by, bx = _to_blocks(plane.astype(np.float64) - 128.0)
    coef = np.einsum("ux,nxy,vy->nuv", _C, blocks, _C)
    qc = np.round(coef / q[None, :, :]).astype(np.int64)
    zz = qc.reshape(-1, 64)[:, _ZIG]
    return zz, by, bx


def _entropy_symbols(zz: np.ndarray):
    """(dc_syms, ac_syms, per-block token lists) for one component."""
    dc_syms, ac_syms, blocks = [], [], []
    prev_dc = 0
    for row in zz:
        toks = []
        diff = int(row[0]) - prev_dc
        prev_dc = int(row[0])
        size, bits = _magnitude(diff)
        dc_syms.append(size)
        toks.append(("dc", size, bits))
        run = 0
        nz = np.nonzero(row[1:])[0]
        last_nz = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last_nz + 1):
            v = int(row[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                ac_syms.append(0xF0)
                toks.append(("ac", 0xF0, 0, 0))
                run -= 16
            size, bits = _magnitude(v)
            sym = (run << 4) | size
            ac_syms.append(sym)
            toks.append(("ac", sym, size, bits))
            run = 0
        if last_nz < 63:
            ac_syms.append(0x00)
            toks.append(("ac", 0x00, 0, 0))
        blocks.append(toks)
    return dc_syms, ac_syms, blocks


def _marker(tag: int, payload: bytes) -> bytes:
    return bytes([0xFF, tag]) + (len(payload) + 2).to_bytes(2, "big") \
        + payload


def encode_jpeg(img: np.ndarray, quality: int = 85) -> bytes:
    """Encode (H, W) grayscale or (H, W, 3) RGB uint8 → baseline JFIF."""
    img = np.asarray(img)
    gray = img.ndim == 2
    if gray:
        planes = [img.astype(np.float64)]
        qtabs = [_qtable(_QL, quality)]
        qids = [0]
    else:
        r = img[..., 0].astype(np.float64)
        g = img[..., 1].astype(np.float64)
        b = img[..., 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
        planes = [np.clip(p, 0, 255) for p in (y, cb, cr)]
        qtabs = [_qtable(_QL, quality), _qtable(_QC, quality)]
        qids = [0, 1, 1]
    h, w = img.shape[:2]

    per_comp = []
    for ci, plane in enumerate(planes):
        zz, _by, _bx = _encode_plane_symbols(plane, qtabs[qids[ci]])
        per_comp.append(_entropy_symbols(zz))

    # optimal tables: comp 0 uses table id 0; comps 1-2 share table id 1
    groups = [[0]] if gray else [[0], [1, 2]]
    dc_tabs, ac_tabs = {}, {}
    for tid, comps in enumerate(groups):
        dfreq, afreq = {}, {}
        for c in comps:
            for s in per_comp[c][0]:
                dfreq[s] = dfreq.get(s, 0) + 1
            for s in per_comp[c][1]:
                afreq[s] = afreq.get(s, 0) + 1
        dc_tabs[tid] = _optimal_bits_huffval(dfreq)
        ac_tabs[tid] = _optimal_bits_huffval(afreq)

    out = bytearray(b"\xFF\xD8")                    # SOI
    out += _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti, q in enumerate(qtabs):
        out += _marker(0xDB, bytes([ti]) + bytes(
            int(q.reshape(-1)[_ZIG][k]) for k in range(64)))
    ncomp = 1 if gray else 3
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, qids[ci]])
    out += _marker(0xC0, sof)
    for tid in dc_tabs:
        bits, vals = dc_tabs[tid]
        out += _marker(0xC4, bytes([tid]) + bytes(bits) + bytes(vals))
        bits, vals = ac_tabs[tid]
        out += _marker(0xC4, bytes([0x10 | tid]) + bytes(bits) + bytes(vals))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        tid = 0 if ci == 0 else (0 if gray else 1)
        sos += bytes([ci + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += _marker(0xDA, sos)

    wtr = _BitWriter()
    dc_codes = {t: _canonical_codes(*dc_tabs[t]) for t in dc_tabs}
    ac_codes = {t: _canonical_codes(*ac_tabs[t]) for t in ac_tabs}
    # interleave per MCU (4:4:4: one block per component per MCU)
    n_mcu = (h + 7) // 8 * ((w + 7) // 8)
    for m in range(n_mcu):
        for ci in range(ncomp):
            tid = 0 if ci == 0 else (0 if gray else 1)
            for tok in per_comp[ci][2][m]:
                if tok[0] == "dc":
                    _, size, bits = tok
                    code, length = dc_codes[tid][size]
                    wtr.put(code, length)
                    if size:
                        wtr.put(bits, size)
                else:
                    _, sym, size, bits = tok
                    code, length = ac_codes[tid][sym]
                    wtr.put(code, length)
                    if size:
                        wtr.put(bits, size)
    wtr.flush()
    out += wtr.out
    out += b"\xFF\xD9"                              # EOI
    return bytes(out)


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline JFIF stream produced by encode_jpeg (or any
    single-scan 8-bit SOF0 4:4:4 / grayscale stream without restarts)."""
    pos = 0
    assert data[0:2] == b"\xFF\xD8", "jpeg: missing SOI"
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    dc_lut: dict[int, dict] = {}
    ac_lut: dict[int, dict] = {}
    comps = []
    h = w = 0
    scan_comps = []
    while pos < len(data):
        assert data[pos] == 0xFF, "jpeg: marker expected"
        tag = data[pos + 1]
        if tag == 0xD9:
            break
        seg_len = int.from_bytes(data[pos + 2:pos + 4], "big")
        seg = data[pos + 4:pos + 2 + seg_len]
        pos += 2 + seg_len
        if tag == 0xDB:
            i = 0
            while i < len(seg):
                tid = seg[i] & 0x0F
                assert seg[i] >> 4 == 0, "jpeg: 16-bit qtable"
                tab = np.zeros(64, dtype=np.int64)
                tab[_ZIG] = np.frombuffer(seg[i + 1:i + 65], dtype=np.uint8)
                qtabs[tid] = tab.reshape(8, 8)
                i += 65
        elif tag == 0xC0:
            assert seg[0] == 8
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            n = seg[5]
            for c in range(n):
                cid, samp, qid = seg[6 + 3 * c:9 + 3 * c]
                assert samp == 0x11, "jpeg: only 4:4:4/gray supported"
                comps.append({"id": cid, "qid": qid})
        elif tag == 0xC4:
            i = 0
            while i < len(seg):
                tc = seg[i] >> 4
                tid = seg[i] & 0x0F
                bits = list(seg[i + 1:i + 17])
                nval = sum(bits)
                vals = list(seg[i + 17:i + 17 + nval])
                lut = _decode_tables(bits, vals)
                (dc_lut if tc == 0 else ac_lut)[tid] = lut
                i += 17 + nval
        elif tag == 0xDA:
            ns = seg[0]
            for c in range(ns):
                cid, tids = seg[1 + 2 * c:3 + 2 * c]
                scan_comps.append({"id": cid, "dc": tids >> 4,
                                   "ac": tids & 0x0F})
            break
        elif tag in (0xC2, 0xC1, 0xC3):
            raise NotImplementedError("jpeg: only baseline SOF0")
        # APPn/COM: skip
    reader = _BitReader(data[pos:])
    by = (h + 7) // 8
    bx = (w + 7) // 8
    ncomp = len(comps)
    zz = np.zeros((ncomp, by * bx, 64), dtype=np.int64)
    prev_dc = [0] * ncomp
    for m in range(by * bx):
        for ci in range(ncomp):
            sc = scan_comps[ci]
            size = _read_huffman(reader, dc_lut[sc["dc"]])
            diff = _extend(reader.get(size), size) if size else 0
            prev_dc[ci] += diff
            zz[ci, m, 0] = prev_dc[ci]
            k = 1
            while k <= 63:
                sym = _read_huffman(reader, ac_lut[sc["ac"]])
                if sym == 0x00:
                    break
                run = sym >> 4
                size = sym & 0x0F
                if size == 0:
                    if run == 15:
                        k += 16
                        continue
                    break
                k += run
                if k > 63:
                    raise ValueError("jpeg: AC index overflow")
                zz[ci, m, k] = _extend(reader.get(size), size)
                k += 1
    planes = []
    for ci in range(ncomp):
        q = qtabs[comps[ci]["qid"]].astype(np.float64)
        coef = np.zeros((by * bx, 64))
        coef[:, _ZIG] = zz[ci]
        coef = coef.reshape(-1, 8, 8) * q[None, :, :]
        blocks = np.einsum("ux,nuv,vy->nxy", _C, coef, _C)
        plane = blocks.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(by * 8, bx * 8)[:h, :w] + 128.0
        planes.append(plane)
    if ncomp == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)
