"""Baseline sequential JPEG (JFIF) codec — pure numpy + stdlib, written
from the public spec (ITU-T T.81 / ISO/IEC 10918-1; Annex K reference
tables, Annex C canonical Huffman, Annex F entropy coding).  Round-5
verdict item 5: closes the one media seam that was closable offline —
``media_codecs.decode_image`` previously raised behind the PIL gate for
JPEG bytes; PIL remains preferred when installed.

Scope (exactly baseline):
- decode: SOF0, 8-bit, 1 or 3 components, ANY sampling factors (generic
  MCU walk, replicate upsampling), DRI/RSTn restart intervals, 8/16-bit
  DQT precision, multi-table DHT segments;
- encode: 4:4:4 (or single-component grayscale), Annex K quantization
  tables scaled by the libjpeg-compatible quality formula, Annex K
  standard Huffman tables.

Performance notes: entropy decoding is inherently sequential, so the
per-symbol loop is plain-int Python against a 65536-entry (peek-16-bits →
symbol, length) flat lookup list; everything around it — dequantize,
inverse zigzag, IDCT (one einsum over all blocks), level shift, plane
assembly, color transform — is vectorized numpy.  ~1-3 ms per thumbnail-
sized image, which keeps the corpus-wide decode stage inside the sweep
budget.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants: zigzag, Annex K tables
# ---------------------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
_UNZIGZAG = np.argsort(ZIGZAG)

#: Annex K.1 luminance quantization table (zigzag? no — natural row order)
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)

#: Annex K.2 chrominance quantization table
QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

#: Annex K.3: (BITS counts per code length 1..16, HUFFVAL symbol list)
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

#: orthonormal 8-point DCT-II basis: forward F = C @ b @ C.T, inverse
#: b = C.T @ F @ C — the spec's normalization (A.3.3) exactly
_DCT = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _DCT[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


# ---------------------------------------------------------------------------
# canonical Huffman (Annex C): (BITS, HUFFVAL) → codes / decode LUT
# ---------------------------------------------------------------------------

def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length), canonical assignment (Annex C.2)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_lut(bits: list[int], vals: list[int]) -> list[int]:
    """Flat 65536-entry decode table: index = next 16 bits of the stream,
    value = (symbol << 8) | code_length (0 = invalid prefix).  One Python
    list-index per symbol at decode time.  Cached by table content —
    building the table costs more than decoding a thumbnail, and real
    corpora reuse the Annex-K tables across millions of images."""
    return _huff_lut_cached(tuple(bits), tuple(vals))


from functools import lru_cache  # noqa: E402


@lru_cache(maxsize=32)
def _huff_lut_cached(bits: tuple[int, ...], vals: tuple[int, ...]) -> list[int]:
    lut = [0] * 65536
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            base = code << (16 - ln)
            packed = (vals[k] << 8) | ln
            for i in range(base, base + (1 << (16 - ln))):
                lut[i] = packed
            code += 1
            k += 1
        code <<= 1
    return lut


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """Annex-K table scaled by the public libjpeg quality mapping."""
    q = min(max(int(quality), 1), 100)
    s = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((table * s + 50) // 100, 1, 255).astype(np.int64)


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing (B.1.1.5)
                self.buf.append(0x00)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits (F.1.2.3)
        return bytes(self.buf)


def _csize(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_blocks(
    w: _BitWriter, qcoef: np.ndarray, dc_codes, ac_codes, pred: int
) -> int:
    """Entropy-encode zigzagged quantized blocks (n, 64) of one component
    slice; returns the updated DC predictor."""
    for blk in qcoef:
        dc = int(blk[0])
        diff = dc - pred
        pred = dc
        s = _csize(diff)
        code, ln = dc_codes[s]
        w.put(code, ln)
        if s:
            w.put(diff if diff > 0 else diff + (1 << s) - 1, s)
        run = 0
        nz = np.nonzero(blk[1:])[0]
        last = int(nz[-1]) + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]  # ZRL
                w.put(code, ln)
                run -= 16
            s = _csize(v)
            code, ln = ac_codes[run * 16 + s]
            w.put(code, ln)
            w.put(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if last < 63:
            code, ln = ac_codes[0x00]  # EOB
            w.put(code, ln)
    return pred


def _plane_to_qcoef(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """uint8 plane (multiple-of-8 dims) → zigzagged quantized coefficients
    (nblocks, 64), row-major block order — all vectorized."""
    h, w = plane.shape
    blocks = (
        plane.astype(np.float64)
        .reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    ) - 128.0
    coef = np.einsum("ux,nxy,vy->nuv", _DCT, blocks, _DCT)
    q = np.round(coef / qtab.reshape(8, 8)).astype(np.int64)
    return q.reshape(-1, 64)[:, ZIGZAG]


_SUBSAMPLING = {
    "444": ((1, 1), (1, 1), (1, 1)),
    "422": ((2, 1), (1, 1), (1, 1)),
    "420": ((2, 2), (1, 1), (1, 1)),
}


def encode_jpeg(
    img: np.ndarray, quality: int = 75, subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF encode of a uint8 (H, W), (H, W, 1) or (H, W, 3) RGB
    image with Annex-K tables.  ``subsampling``: "444" (default), "422",
    or "420" (box-averaged chroma); ``restart_interval`` > 0 emits DRI +
    RSTn markers every that many MCUs (mainly exercised by the decoder
    tests — production synthesis uses the default single-interval scan)."""
    a = np.asarray(img)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, nc = a.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg expects 1 or 3 channels")
    samp = _SUBSAMPLING[subsampling][:nc] if nc == 3 else ((1, 1),)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    ph, pw = mcuy * 8 * vmax, mcux * 8 * hmax
    a = np.pad(a, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge").astype(np.float64)

    if nc == 3:
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    else:
        planes = [a[:, :, 0]]
    # per-component box-average downsample to its sampling grid
    ds_planes = []
    for (hc, vc), p in zip(samp, planes):
        fy, fx = vmax // vc, hmax // hc
        if fy > 1 or fx > 1:
            p = p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        ds_planes.append(np.clip(np.round(p), 0, 255))

    qt = [_quality_scale(QUANT_LUMA, quality), _quality_scale(QUANT_CHROMA, quality)]
    dc_codes = [_huff_codes(*HUFF_DC_LUMA), _huff_codes(*HUFF_DC_CHROMA)]
    ac_codes = [_huff_codes(*HUFF_AC_LUMA), _huff_codes(*HUFF_AC_CHROMA)]

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid in range(2 if nc == 3 else 1):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(v) for v in qt[tid][ZIGZAG])
    # SOF0
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for c, (hc, vc) in enumerate(samp):
        out += bytes([c + 1, (hc << 4) | vc, 0 if c == 0 else 1])
    # DHT
    tables = [(0x00, HUFF_DC_LUMA), (0x10, HUFF_AC_LUMA)]
    if nc == 3:
        tables += [(0x01, HUFF_DC_CHROMA), (0x11, HUFF_AC_CHROMA)]
    for tc, (bits, vals) in tables:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + bytes([tc])
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for c in range(nc):
        out += bytes([c + 1, 0x00 if c == 0 else 0x11])
    out += b"\x00\x3f\x00"

    # MCU-interleaved entropy coding (B.2.3): per MCU, each component in
    # scan order contributes its v×h blocks in raster order
    qcoefs = []
    grids = []
    for i, ((hc, vc), p) in enumerate(zip(samp, ds_planes)):
        qcoefs.append(_plane_to_qcoef(p, qt[0] if i == 0 else qt[1]))
        grids.append((mcuy * vc, mcux * hc))
    wtr = _BitWriter()
    preds = [0] * nc
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            out += wtr.flush()
            out += bytes([0xFF, 0xD0 + ((m // restart_interval - 1) % 8)])
            wtr = _BitWriter()
            preds = [0] * nc
        my, mx = divmod(m, mcux)
        for c, (hc, vc) in enumerate(samp):
            t = 0 if c == 0 else 1
            bw = grids[c][1]
            for vv in range(vc):
                for hh in range(hc):
                    row = (my * vc + vv) * bw + (mx * hc + hh)
                    preds[c] = _encode_blocks(
                        wtr, qcoefs[c][row : row + 1],
                        dc_codes[t], ac_codes[t], preds[c],
                    )
    out += wtr.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

class _Component:
    __slots__ = ("cid", "h", "v", "tq", "td", "ta", "blocks", "bw", "bh", "pred")


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline sequential JFIF bytes → uint8 (H, W, C).  Raises
    NotImplementedError for progressive (SOF2) / arithmetic / 12-bit
    streams — those stay behind the PIL seam."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    dc_luts: dict[int, list[int]] = {}
    ac_luts: dict[int, list[int]] = {}
    comps: list[_Component] = []
    h = w = 0
    restart_interval = 0
    n = len(data)

    while pos < n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            if marker == 0xD9:  # EOI
                break
            continue
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT — may hold several tables
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 15
                o += 1
                if pq:
                    tab = np.frombuffer(seg[o : o + 128], dtype=">u2").astype(np.int64)
                    o += 128
                else:
                    tab = np.frombuffer(seg[o : o + 64], dtype=np.uint8).astype(np.int64)
                    o += 64
                qtabs[tq] = tab[_UNZIGZAG]  # store natural order
        elif marker == 0xC4:  # DHT — may hold several tables
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 15
                bits = list(seg[o + 1 : o + 17])
                nv = sum(bits)
                vals = list(seg[o + 17 : o + 17 + nv])
                (ac_luts if tc else dc_luts)[th] = _huff_lut(bits, vals)
                o += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext. seq.)
            prec, h, w, nc = seg[0], struct.unpack_from(">H", seg, 1)[0], \
                struct.unpack_from(">H", seg, 3)[0], seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            for c in range(nc):
                comp = _Component()
                comp.cid = seg[6 + 3 * c]
                comp.h = seg[7 + 3 * c] >> 4
                comp.v = seg[7 + 3 * c] & 15
                comp.tq = seg[8 + 3 * c]
                comps.append(comp)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only baseline sequential JPEG supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            by_id = {c.cid: c for c in comps}
            scan = []
            for k in range(ns):
                c = by_id[seg[1 + 2 * k]]
                c.td = seg[2 + 2 * k] >> 4
                c.ta = seg[2 + 2 * k] & 15
                scan.append(c)
            pos += seglen
            return _decode_scan(
                data, pos, scan, qtabs, dc_luts, ac_luts, h, w, restart_interval
            )
        pos += seglen
    raise ValueError("no SOS marker in JPEG stream")


def _decode_scan(
    data: bytes, pos: int, comps: list[_Component], qtabs, dc_luts, ac_luts,
    h: int, w: int, restart_interval: int,
) -> np.ndarray:
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c.bw = mcux * c.h
        c.bh = mcuy * c.v
        c.blocks = np.zeros((c.bh * c.bw, 64), dtype=np.int64)
        c.pred = 0

    # strip stuffed bytes / restart markers up front: entropy data becomes
    # one contiguous byte string; each restart interval's byte-aligned
    # start offset is recorded so the reader can realign there (the
    # encoder 1-pads the byte before every RSTn)
    end = pos
    chunks: list[bytes] = []
    restart_offsets = [0]
    stripped_len = 0
    i = pos
    while i < len(data) - 1:
        if data[i] != 0xFF:
            i += 1
            continue
        m = data[i + 1]
        if m == 0x00:
            chunks.append(data[end : i + 1])  # keep the 0xFF, drop the stuffed 0x00
            stripped_len += i + 1 - end
            i += 2
            end = i
        elif 0xD0 <= m <= 0xD7:  # RSTn
            chunks.append(data[end:i])
            stripped_len += i - end
            restart_offsets.append(stripped_len)
            i += 2
            end = i
        else:  # any real marker terminates the scan
            chunks.append(data[end:i])
            end = i
            break
        continue
    else:
        chunks.append(data[end:])
    stream = b"".join(chunks)

    acc = 0
    nbits = 0
    sp = 0
    slen = len(stream)
    # per-MCU component block order (B.2.3): for each component in scan
    # order, v×h blocks in raster order
    order = []
    for ci, c in enumerate(comps):
        dlut = dc_luts[c.td]
        alut = ac_luts[c.ta]
        for vv in range(c.v):
            for hh in range(c.h):
                order.append((ci, vv, hh, dlut, alut))

    mcu_count = mcux * mcuy
    for m in range(mcu_count):
        if restart_interval and m and m % restart_interval == 0:
            # predictors reset at every restart; the reader realigns to the
            # recorded byte-aligned start of this interval's chunk
            for c in comps:
                c.pred = 0
            nbits = 0
            acc = 0
            r = m // restart_interval
            if r < len(restart_offsets):
                sp = restart_offsets[r]
        my, mx = divmod(m, mcux)
        for ci, vv, hh, dlut, alut in order:
            c = comps[ci]
            # ---- decode one block (inlined bit reader for speed) ----
            while nbits < 16:
                acc = (acc << 8) | (stream[sp] if sp < slen else 0)
                sp += 1
                nbits += 8
            packed = dlut[(acc >> (nbits - 16)) & 0xFFFF]
            s = packed >> 8
            nbits -= packed & 0xFF
            if s:
                while nbits < s:
                    acc = (acc << 8) | (stream[sp] if sp < slen else 0)
                    sp += 1
                    nbits += 8
                v = (acc >> (nbits - s)) & ((1 << s) - 1)
                nbits -= s
                if v < (1 << (s - 1)):
                    v -= (1 << s) - 1
                c.pred += v
            row = (my * c.v + vv) * c.bw + (mx * c.h + hh)
            blk = c.blocks[row]
            blk[0] = c.pred
            k = 1
            while k < 64:
                while nbits < 16:
                    acc = (acc << 8) | (stream[sp] if sp < slen else 0)
                    sp += 1
                    nbits += 8
                packed = alut[(acc >> (nbits - 16)) & 0xFFFF]
                sym = packed >> 8
                nbits -= packed & 0xFF
                s = sym & 15
                if s == 0:
                    if sym == 0xF0:  # ZRL
                        k += 16
                        continue
                    break  # EOB
                k += sym >> 4
                while nbits < s:
                    acc = (acc << 8) | (stream[sp] if sp < slen else 0)
                    sp += 1
                    nbits += 8
                v = (acc >> (nbits - s)) & ((1 << s) - 1)
                nbits -= s
                if v < (1 << (s - 1)):
                    v -= (1 << s) - 1
                if k < 64:
                    blk[k] = v
                k += 1
            acc &= (1 << nbits) - 1  # keep the int small

    # ---- vectorized reconstruction ----
    planes = []
    for c in comps:
        deq = (c.blocks[:, _UNZIGZAG] * qtabs[c.tq][None, :]).reshape(-1, 8, 8)
        spat = np.einsum("xu,nuv,yv->nxy", _DCT.T, deq.astype(np.float64), _DCT.T)
        spat = np.clip(np.round(spat) + 128.0, 0, 255).astype(np.uint8)
        plane = (
            spat.reshape(c.bh, c.bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c.bh * 8, c.bw * 8)
        )
        # replicate-upsample to full resolution, crop to (h, w)
        if c.h != hmax or c.v != vmax:
            plane = np.repeat(np.repeat(plane, vmax // c.v, axis=0), hmax // c.h, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return planes[0][:, :, None].copy()
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb], axis=2
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def jpeg_header(data: bytes) -> tuple[int, int]:
    """(width, height) from the SOFn marker — no entropy decode."""
    pos = 2
    n = len(data)
    while pos < n - 1:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            continue
        (seglen,) = struct.unpack_from(">H", data, pos)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            hh = struct.unpack_from(">H", data, pos + 3)[0]
            ww = struct.unpack_from(">H", data, pos + 5)[0]
            return ww, hh
        pos += seglen
    raise ValueError("no SOF marker in JPEG stream")
