"""Baseline + progressive JPEG codec in pure python + numpy — no native codec library.

Closes the reference's last honestly-gated image format in-sandbox
(reference media handling enters through convert_to_cx2 / figure refs;
our multimodal stages, stages/multimodal.py, decode via sources/minimedia
which dispatches JPEG here).

Scope (the ITU-T T.81 baseline sequential subset that covers the vast
majority of real-world JPEGs):

* decode: SOI/APPn/COM/DQT (8- and 16-bit tables)/DHT/SOF0/DRI/SOS/EOI,
  interleaved single-scan MCUs, sampling factors 1-2 per axis (4:4:4,
  4:2:2, 4:2:0, and grayscale), restart markers, byte unstuffing; PLUS
  (round 4) PROGRESSIVE (SOF2) and multi-scan sequential streams —
  spectral selection, successive approximation (DC/AC first and
  refinement passes, EOB runs) via the general scan machinery.
  Arithmetic coding, hierarchical/lossless modes and 12-bit precision
  raise ``UnsupportedJPEGError`` — honest gates, not silent garbage.
* encode: baseline 4:4:4 or 4:2:0, quality-scaled Annex-K quantization
  tables, standard Annex-K Huffman tables — exists so tests and
  synthetic corpora can round-trip pixels through the REAL decode path
  (JPEG is lossy; round-trip asserts bounded error, not equality).

The DCT/IDCT and dequantize run vectorized over all blocks of a
component (einsum against the 8×8 DCT basis); entropy (de)coding is a
per-symbol loop, which is the irreducible serial core of the format —
the multimodal stages run this inside an actor pool, one image per call,
so the parallel axis is images, not pixels.
"""
from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np


class UnsupportedJPEGError(NotImplementedError):
    """JPEG feature outside the baseline-sequential subset."""


class CorruptJPEGError(ValueError):
    """Malformed JPEG stream."""


# ---------------------------------------------------------------------------
# constants: zigzag, Annex-K quantization + Huffman tables, DCT basis
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)
UNZIGZAG = np.argsort(ZIGZAG)

Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex-K Huffman specs: (bits[1..16] counts, symbol values).
DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_basis() -> np.ndarray:
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    d = np.cos((2 * n + 1) * k * np.pi / 16) * np.sqrt(2.0 / 8.0)
    d[0, :] = np.sqrt(1.0 / 8.0)
    return d


_DCT = _dct_basis()


def _quality_tables(quality: int) -> Tuple[np.ndarray, np.ndarray]:
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (Q_LUMA, Q_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


# ---------------------------------------------------------------------------
# Huffman code construction (canonical, per T.81 C.2)
# ---------------------------------------------------------------------------

def _build_codes(bits: List[int], values: List[int]) -> Dict[int, Tuple[int, int]]:
    """symbol -> (code, length)."""
    codes: Dict[int, Tuple[int, int]] = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return codes


def _build_decoder(bits: List[int], values: List[int]) -> Dict[Tuple[int, int], int]:
    """(length, code) -> symbol."""
    table: Dict[Tuple[int, int], int] = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[idx]
            code += 1
            idx += 1
        code <<= 1
    return table


# ---------------------------------------------------------------------------
# bit I/O with 0xFF byte stuffing
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self._out = bytearray()
        self._acc = 0
        self._nbits = 0

    def put(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._nbits += length
        while self._nbits >= 8:
            b = (self._acc >> (self._nbits - 8)) & 0xFF
            self._out.append(b)
            if b == 0xFF:
                self._out.append(0x00)
            self._nbits -= 8
        self._acc &= (1 << self._nbits) - 1

    def flush(self) -> bytes:
        if self._nbits:
            pad = 8 - self._nbits
            self.put((1 << pad) - 1, pad)
        return bytes(self._out)


class _BitReader:
    """Reads an unstuffed entropy segment MSB-first."""

    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 0
        self._acc = 0
        self._nbits = 0

    def read_bit(self) -> int:
        if self._nbits == 0:
            if self._pos >= len(self._data):
                raise CorruptJPEGError("entropy data exhausted")
            self._acc = self._data[self._pos]
            self._pos += 1
            self._nbits = 8
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: Dict[Tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise CorruptJPEGError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    """Map the raw `size` bits to the signed coefficient (T.81 F.12)."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) multiple-of-8 plane -> (n_blocks, 8, 8) in raster block order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mh
    pw = (-w) % mw
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=2)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=2).round(), 0, 255).astype(np.uint8)


def _fdct_quant(blocks: np.ndarray, qtable: np.ndarray) -> np.ndarray:
    """(n, 8, 8) pixel blocks -> (n, 64) quantized zigzag coefficients."""
    f = np.einsum("ij,njk,lk->nil", _DCT, blocks.astype(np.float64) - 128.0, _DCT)
    q = np.round(f.reshape(-1, 64) / qtable.reshape(64)[None, :]).astype(np.int32)
    # reorder natural -> zigzag for entropy coding
    return q[:, ZIGZAG]


def _encode_component_blocks(
    writer: _BitWriter,
    blocks_zz: List[np.ndarray],
    dc_codes: List[Dict[int, Tuple[int, int]]],
    ac_codes: List[Dict[int, Tuple[int, int]]],
    order: List[int],
    predictors: List[int],
) -> None:
    """Encode one MCU: blocks_zz[i] is the i-th block (64 zigzag coeffs),
    order[i] the component index it belongs to."""
    for blk, ci in zip(blocks_zz, order):
        dc = int(blk[0])
        diff = dc - predictors[ci]
        predictors[ci] = dc
        size = _category(diff)
        code, length = dc_codes[ci][size]
        writer.put(code, length)
        if size:
            writer.put(diff if diff >= 0 else diff + (1 << size) - 1, size)
        run = 0
        ac = blk[1:]
        nz = np.nonzero(ac)[0]
        last = nz[-1] if len(nz) else -1
        for k in range(64 - 1):
            v = int(ac[k])
            if k > last:
                code, length = ac_codes[ci][0x00]  # EOB
                writer.put(code, length)
                break
            if v == 0:
                run += 1
                continue
            while run >= 16:
                code, length = ac_codes[ci][0xF0]  # ZRL
                writer.put(code, length)
                run -= 16
            size = _category(v)
            code, length = ac_codes[ci][(run << 4) | size]
            writer.put(code, length)
            writer.put(v if v >= 0 else v + (1 << size) - 1, size)
            run = 0


def _prep_quantized(img: np.ndarray, quality: int, subsample):
    """Shared encoder front half: color transform, subsampling, padding,
    FDCT + quantization.  Returns everything both the baseline and the
    progressive entropy coders need."""
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[:, :, 0]
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qy, qc = _quality_tables(quality)

    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
        qtab_of = [0]
    else:
        ycc = _rgb_to_ycbcr(img)
        y, cb, cr = ycc[:, :, 0], ycc[:, :, 1], ycc[:, :, 2]
        mode = {False: "444", True: "420"}.get(subsample, subsample)
        if mode == "420":
            ph, pw = (-h) % 2, (-w) % 2
            if ph or pw:
                cb = np.pad(cb, ((0, ph), (0, pw)), mode="edge")
                cr = np.pad(cr, ((0, ph), (0, pw)), mode="edge")
            cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        elif mode == "422":
            pw = (-w) % 2
            if pw:
                cb = np.pad(cb, ((0, 0), (0, pw)), mode="edge")
                cr = np.pad(cr, ((0, 0), (0, pw)), mode="edge")
            cb = cb.reshape(cb.shape[0], cb.shape[1] // 2, 2).mean(axis=2)
            cr = cr.reshape(cr.shape[0], cr.shape[1] // 2, 2).mean(axis=2)
            samp = [(2, 1), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qtab_of = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)

    # quantized zigzag blocks per component, in raster block order
    comp_blocks: List[np.ndarray] = []
    comp_bx: List[int] = []
    for ci, plane in enumerate(planes):
        hs, vs = samp[ci]
        tw = mcus_x * 8 * hs
        th = mcus_y * 8 * vs
        p = _pad_to(plane, 8, 8)
        p = np.pad(
            p,
            ((0, th - p.shape[0]), (0, tw - p.shape[1])),
            mode="edge",
        ) if (p.shape[0] < th or p.shape[1] < tw) else p[:th, :tw]
        qt = qy if qtab_of[ci] == 0 else qc
        comp_blocks.append(_fdct_quant(_to_blocks(p), qt))
        comp_bx.append(tw // 8)
    return (gray, h, w, samp, qtab_of, comp_blocks, comp_bx,
            mcus_x, mcus_y, qy, qc)


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """uint8 (H,W) | (H,W,1) grayscale or (H,W,3) RGB -> baseline JFIF bytes.

    subsample=True emits 4:2:0 chroma (box-averaged); False emits 4:4:4.
    restart_interval>0 emits DRI + RSTn markers every that many MCUs
    (exercises the decoder's resynchronization path).
    """
    (gray, h, w, samp, qtab_of, comp_blocks, comp_bx,
     mcus_x, mcus_y, qy, qc) = _prep_quantized(img, quality, subsample)

    dc_specs = [DC_LUMA_SPEC] + ([DC_CHROMA_SPEC] if not gray else [])
    ac_specs = [AC_LUMA_SPEC] + ([AC_CHROMA_SPEC] if not gray else [])
    dc_codes_tbl = [_build_codes(*s) for s in dc_specs]
    ac_codes_tbl = [_build_codes(*s) for s in ac_specs]
    ncomp = len(comp_blocks)
    dc_codes = [dc_codes_tbl[0 if ci == 0 else -1] for ci in range(ncomp)]
    ac_codes = [ac_codes_tbl[0 if ci == 0 else -1] for ci in range(ncomp)]

    scan = bytearray()
    writer = _BitWriter()
    predictors = [0] * ncomp
    mcu_i = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                scan += writer.flush()
                scan += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                writer = _BitWriter()
                predictors = [0] * ncomp
            blocks: List[np.ndarray] = []
            order: List[int] = []
            for ci in range(ncomp):
                hs, vs = samp[ci]
                bx = comp_bx[ci]
                for by in range(vs):
                    for bxx in range(hs):
                        bi = (my * vs + by) * bx + (mx * hs + bxx)
                        blocks.append(comp_blocks[ci][bi])
                        order.append(ci)
            _encode_component_blocks(
                writer, blocks, dc_codes, ac_codes, order, predictors
            )
            mcu_i += 1
    scan += writer.flush()
    scan = bytes(scan)

    # --- assemble the JFIF byte stream -------------------------------------
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    # DQT (zigzag order per spec)
    for tid, qt in enumerate([qy] + ([qc] if not gray else [])):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(x) for x in qt[ZIGZAG])
    # SOF0
    out += b"\xff\xc0" + struct.pack(">H", 8 + 3 * ncomp) + b"\x08"
    out += struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        hs, vs = samp[ci]
        out += bytes([ci + 1, (hs << 4) | vs, qtab_of[ci]])
    # DHT
    specs = [(0x00, DC_LUMA_SPEC), (0x10, AC_LUMA_SPEC)]
    if not gray:
        specs += [(0x01, DC_CHROMA_SPEC), (0x11, AC_CHROMA_SPEC)]
    for tc_id, (bits, values) in specs:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(values))
        out += bytes([tc_id]) + bytes(bits) + bytes(values)
    # DRI
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * ncomp) + bytes([ncomp])
    for ci in range(ncomp):
        dc_id = 0 if ci == 0 else 1
        ac_id = 0 if ci == 0 else 1
        out += bytes([ci + 1, (dc_id << 4) | ac_id])
    out += b"\x00\x3f\x00"
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder
# ---------------------------------------------------------------------------

# Dedicated AC table for progressive scans: EOBn (n up to 2^14) + ZRL +
# every (run, size≤10) pair, all at a fixed 9-bit length (176 < 511
# codes, all-ones never assigned).  Annex-K tables have exactly ONE slot
# of spare code space, so EOBn symbols cannot be appended to them; a
# fixed-length table is self-describing via DHT and prefix-free by
# construction — progressive output here optimizes for decoder-path
# coverage, not compression ratio.
_PROG_AC_VALUES = (
    [r << 4 for r in range(15)] + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
PROG_AC_SPEC = (
    [0, 0, 0, 0, 0, 0, 0, 0, len(_PROG_AC_VALUES), 0, 0, 0, 0, 0, 0, 0],
    _PROG_AC_VALUES,
)


class _ProgACWriter:
    """EOB-run + correction-bit bookkeeping shared by the AC scan
    encoders (T.81 G.1.2.2-3): the run and its buffered refinement bits
    flush together, immediately before the next emitted symbol."""

    def __init__(self, writer: _BitWriter, ac_codes):
        self.w = writer
        self.codes = ac_codes
        self.eobrun = 0
        self.bits: List[int] = []

    def flush(self) -> None:
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            code, length = self.codes[r << 4]
            self.w.put(code, length)
            if r:
                self.w.put(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.bits:
            self.w.put(b, 1)
        self.bits = []

    def end_block(self) -> None:
        self.eobrun += 1
        if self.eobrun == 0x3FFF:  # r <= 14 representable
            self.flush()


def _encode_ac_first(
    prog: _ProgACWriter, blk: np.ndarray, ss: int, se: int, al: int
) -> None:
    w, codes = prog.w, prog.codes
    band = [int(v) for v in blk[ss : se + 1]]
    tvals = [
        (abs(v) >> al) * (1 if v >= 0 else -1) for v in band
    ]
    if not any(tvals):
        prog.end_block()
        return
    prog.flush()
    r = 0
    last_nz = max(i for i, t in enumerate(tvals) if t)
    for i, t in enumerate(tvals):
        if i > last_nz:
            prog.end_block()  # trailing zeros: EOB for this block
            return
        if t == 0:
            r += 1
            continue
        while r > 15:
            code, length = codes[0xF0]
            w.put(code, length)
            r -= 16
        s = _category(t)
        code, length = codes[(r << 4) | s]
        w.put(code, length)
        w.put(t if t >= 0 else t + (1 << s) - 1, s)
        r = 0


def _encode_ac_refine(
    prog: _ProgACWriter, blk: np.ndarray, ss: int, se: int, al: int
) -> None:
    w, codes = prog.w, prog.codes
    band = [int(v) for v in blk[ss : se + 1]]
    absshift = [abs(v) >> al for v in band]
    newly = [i for i, t in enumerate(absshift) if t == 1]
    if not newly and not any(absshift):
        prog.end_block()
        return
    eob = newly[-1] if newly else -1
    r = 0
    pend: List[int] = []  # correction bits awaiting the next symbol
    for i, t in enumerate(absshift):
        if t == 0:
            r += 1
            continue
        # a ZRL fires at ANY nonzero once the zero-history run exceeds
        # 15 (libjpeg encode_mcu_AC_refine): the decoder consumes the
        # corrections positionally while advancing through the run
        while r > 15 and i <= eob:
            prog.flush()
            code, length = codes[0xF0]
            w.put(code, length)
            r -= 16
            for b in pend:
                w.put(b, 1)
            pend = []
        if t > 1:
            pend.append(t & 1)
            continue
        # newly significant (t == 1)
        prog.flush()
        code, length = codes[(r << 4) | 1]
        w.put(code, length)
        w.put(1 if band[i] >= 0 else 0, 1)
        for b in pend:
            w.put(b, 1)
        pend = []
        r = 0
    if r > 0 or pend:
        # trailing zero-history zeros / buffered corrections: the block
        # joins the (global) EOB run, its corrections buffered with it
        prog.bits.extend(pend)
        prog.end_block()


def encode_jpeg_progressive(
    img: np.ndarray, quality: int = 90, subsample: bool = False
) -> bytes:
    """uint8 grayscale/RGB -> PROGRESSIVE (SOF2) JFIF bytes.

    Scan script exercises every progressive decode path: interleaved DC
    first pass at Al=1 + DC refinement; per-component AC spectral bands
    (1-5, 6-63) first pass at Al=1 with EOB runs; per-component AC
    refinement passes to Al=0 (newly-significant symbols + correction
    bits).  Coefficients after all scans equal the baseline encoder's
    exactly, so decode(progressive) == decode(baseline) pixel-for-pixel.
    """
    (gray, h, w, samp, qtab_of, comp_blocks, comp_bx,
     mcus_x, mcus_y, qy, qc) = _prep_quantized(img, quality, subsample)
    ncomp = len(comp_blocks)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    comp_tbx = [-(-(-(-w * samp[k][0] // hmax)) // 8) for k in range(ncomp)]
    comp_tby = [-(-(-(-h * samp[k][1] // vmax)) // 8) for k in range(ncomp)]

    dc_specs = [DC_LUMA_SPEC] + ([DC_CHROMA_SPEC] if not gray else [])
    dc_codes_tbl = [_build_codes(*s) for s in dc_specs]
    dc_codes = [dc_codes_tbl[0 if ci == 0 else -1] for ci in range(ncomp)]
    ac_codes = _build_codes(*PROG_AC_SPEC)

    def entropy(fn) -> bytes:
        writer = _BitWriter()
        fn(writer)
        return writer.flush()

    def dc_first(writer: _BitWriter, al: int) -> None:
        predictors = [0] * ncomp
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci in range(ncomp):
                    hs, vs = samp[ci]
                    for by in range(vs):
                        for bx in range(hs):
                            bi = (my * vs + by) * comp_bx[ci] + (
                                mx * hs + bx
                            )
                            dc = int(comp_blocks[ci][bi][0]) >> al
                            diff = dc - predictors[ci]
                            predictors[ci] = dc
                            size = _category(diff)
                            code, length = dc_codes[ci][size]
                            writer.put(code, length)
                            if size:
                                writer.put(
                                    diff if diff >= 0
                                    else diff + (1 << size) - 1,
                                    size,
                                )

    def dc_refine(writer: _BitWriter, al: int) -> None:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci in range(ncomp):
                    hs, vs = samp[ci]
                    for by in range(vs):
                        for bx in range(hs):
                            bi = (my * vs + by) * comp_bx[ci] + (
                                mx * hs + bx
                            )
                            writer.put(
                                (int(comp_blocks[ci][bi][0]) >> al) & 1, 1
                            )

    def ac_scan(writer: _BitWriter, ci: int, ss: int, se: int,
                ah: int, al: int) -> None:
        prog = _ProgACWriter(writer, ac_codes)
        for row in range(comp_tby[ci]):
            for col in range(comp_tbx[ci]):
                blk = comp_blocks[ci][row * comp_bx[ci] + col]
                if ah == 0:
                    _encode_ac_first(prog, blk, ss, se, al)
                else:
                    _encode_ac_refine(prog, blk, ss, se, al)
        prog.flush()

    # ---- scan script ----
    scans: List[Tuple[List[Tuple[int, int, int]], int, int, int, int, bytes]] = []
    all_comps = [(ci + 1, 0 if ci == 0 else 1, 0) for ci in range(ncomp)]
    scans.append((all_comps, 0, 0, 0, 1,
                  entropy(lambda wr: dc_first(wr, 1))))
    for ci in range(ncomp):
        for ss, se in ((1, 5), (6, 63)):
            scans.append((
                [(ci + 1, 0, 0)], ss, se, 0, 1,
                entropy(lambda wr, c=ci, a=ss, b=se: ac_scan(
                    wr, c, a, b, 0, 1
                )),
            ))
    for ci in range(ncomp):
        for ss, se in ((1, 5), (6, 63)):
            scans.append((
                [(ci + 1, 0, 0)], ss, se, 1, 0,
                entropy(lambda wr, c=ci, a=ss, b=se: ac_scan(
                    wr, c, a, b, 1, 0
                )),
            ))
    scans.append((all_comps, 0, 0, 1, 0,
                  entropy(lambda wr: dc_refine(wr, 0))))

    # ---- assemble ----
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tid, qt in enumerate([qy] + ([qc] if not gray else [])):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(x) for x in qt[ZIGZAG])
    out += b"\xff\xc2" + struct.pack(">H", 8 + 3 * ncomp) + b"\x08"
    out += struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        hs, vs = samp[ci]
        out += bytes([ci + 1, (hs << 4) | vs, qtab_of[ci]])
    specs = [(0x00, DC_LUMA_SPEC), (0x10, PROG_AC_SPEC)]
    if not gray:
        specs.append((0x01, DC_CHROMA_SPEC))
    for tc_id, (bits, values) in specs:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(values))
        out += bytes([tc_id]) + bytes(bits) + bytes(values)
    for scan_comps, ss, se, ah, al, data in scans:
        ns = len(scan_comps)
        out += b"\xff\xda" + struct.pack(">H", 6 + 2 * ns) + bytes([ns])
        for cid, td, ta in scan_comps:
            out += bytes([cid, (td << 4) | ta])
        out += bytes([ss, se, (ah << 4) | al])
        out += data
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def _split_entropy(data: bytes, start: int) -> Tuple[List[bytes], int]:
    """From `start`, collect entropy-coded bytes split at RSTn markers and
    unstuffed (FF00 -> FF); returns (segments, index of terminating marker)."""
    segments: List[bytes] = []
    cur = bytearray()
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = data[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segments.append(bytes(cur))
            cur = bytearray()
            i += 2
        elif m == 0xFF:  # fill byte
            i += 1
        else:
            break
    segments.append(bytes(cur))
    return segments, i


def _apply_scan(
    scan: dict,
    comps,
    by_id,
    coeffs,
    comp_bx,
    comp_tbx,
    comp_tby,
    mcus_x: int,
    mcus_y: int,
) -> None:
    """Decode ONE scan (progressive or multi-scan sequential) into the
    coefficient store: spectral band [ss, se], successive-approximation
    bit position al with prior precision ah (T.81 G.2).  DC scans may be
    interleaved (multi-component MCU order); AC scans are always
    single-component in component-raster order.  Restart markers reset
    predictors and the EOB run."""
    ss, se = scan["ss"], scan["se"]
    ah, al = scan["ah"], scan["al"]
    scan_comps = scan["comps"]
    segments = scan["segments"]
    htabs = scan["htables"]
    rint = scan["restart_interval"]
    ns = len(scan_comps)
    if ss == 0 and se not in (0, 63):
        raise CorruptJPEGError("bad spectral band")
    if ss == 0 and se == 63 and (ah or al):
        raise CorruptJPEGError("approximation on a sequential scan")
    if ss > 0 and ns != 1:
        raise CorruptJPEGError("interleaved AC scan")

    seg_idx = 0
    reader = _BitReader(segments[0])
    predictors = [0] * len(comps)
    eobrun = 0
    p1 = 1 << al

    def restart():
        nonlocal seg_idx, reader, eobrun, predictors
        seg_idx += 1
        if seg_idx >= len(segments):
            raise CorruptJPEGError("missing restart segment")
        reader = _BitReader(segments[seg_idx])
        predictors = [0] * len(comps)
        eobrun = 0

    def units_and_targets():
        """Unit count + per-unit target blocks: MCU-interleaved when the
        scan has several components, component raster otherwise."""
        if ns > 1:
            return mcus_x * mcus_y
        k0 = by_id[scan_comps[0][0]]
        return comp_tbx[k0] * comp_tby[k0]

    def targets_of(u: int):
        if ns > 1:
            my, mx = divmod(u, mcus_x)
            out = []
            for cs, td, ta in scan_comps:
                k = by_id[cs]
                _, hs, vs, _ = comps[k]
                for by in range(vs):
                    for bx in range(hs):
                        out.append(
                            (k, td, ta,
                             (my * vs + by) * comp_bx[k] + mx * hs + bx)
                        )
            return out
        cs, td, ta = scan_comps[0]
        k = by_id[cs]
        row, col = divmod(u, comp_tbx[k])
        return [(k, td, ta, row * comp_bx[k] + col)]

    if ss == 0 and se == 63:
        # ---- full-band SEQUENTIAL scan (multi-scan SOF0 files) ----
        for u in range(units_and_targets()):
            if rint and u and u % rint == 0:
                restart()
            for k, td, ta, bi in targets_of(u):
                dc_tbl = htabs.get((0, td))
                ac_tbl = htabs.get((1, ta))
                if dc_tbl is None or ac_tbl is None:
                    raise CorruptJPEGError("missing Huffman table")
                size = reader.read_symbol(dc_tbl)
                diff = _extend(reader.read_bits(size), size)
                predictors[k] += diff
                cb_ = coeffs[k]
                cb_[bi, 0] = predictors[k]
                pos = 1
                while pos < 64:
                    sym = reader.read_symbol(ac_tbl)
                    if sym == 0x00:
                        break
                    r, s = sym >> 4, sym & 0x0F
                    if s == 0:
                        if r == 15:
                            pos += 16
                            continue
                        raise CorruptJPEGError("bad AC symbol")
                    pos += r
                    if pos >= 64:
                        raise CorruptJPEGError("AC run overflow")
                    cb_[bi, pos] = _extend(reader.read_bits(s), s)
                    pos += 1
        return

    if ss == 0:
        # ---- DC-only progressive scan ----
        for u in range(units_and_targets()):
            if rint and u and u % rint == 0:
                restart()
            for k, td, _ta, bi in targets_of(u):
                if ah == 0:  # first pass: Huffman-coded diffs << al
                    dc_tbl = htabs.get((0, td))
                    if dc_tbl is None:
                        raise CorruptJPEGError("missing DC table")
                    size = reader.read_symbol(dc_tbl)
                    diff = _extend(reader.read_bits(size), size)
                    predictors[k] += diff
                    coeffs[k][bi, 0] = predictors[k] << al
                else:  # refinement: one bit per block
                    if reader.read_bit():
                        coeffs[k][bi, 0] |= p1
        return

    # ---- AC scan (single component, raster order) ----
    cs, _, ta = scan_comps[0]
    k = by_id[cs]
    ac_tbl = htabs.get((1, ta))
    if ac_tbl is None:
        raise CorruptJPEGError("missing AC table")
    tbx, tby = comp_tbx[k], comp_tby[k]
    cb = coeffs[k]
    m1 = -p1

    def correct(bi: int, pos: int) -> None:
        # correction bit for an already-nonzero coefficient (G.1.2.3)
        if reader.read_bit():
            v = int(cb[bi, pos])
            if (v & p1) == 0:
                cb[bi, pos] = v + (p1 if v >= 0 else m1)

    for u in range(tbx * tby):
        if rint and u and u % rint == 0:
            restart()
        row, col = divmod(u, tbx)
        bi = row * comp_bx[k] + col
        if ah == 0:
            # ---- first AC pass: values are (decoded << al) ----
            if eobrun > 0:
                eobrun -= 1
                continue
            pos = ss
            while pos <= se:
                sym = reader.read_symbol(ac_tbl)
                r, s = sym >> 4, sym & 0x0F
                if s == 0:
                    if r == 15:  # ZRL
                        pos += 16
                        continue
                    eobrun = (1 << r) - 1 + (
                        reader.read_bits(r) if r else 0
                    )
                    break
                pos += r
                if pos > se:
                    raise CorruptJPEGError("AC band overflow")
                cb[bi, pos] = _extend(reader.read_bits(s), s) << al
                pos += 1
        else:
            # ---- AC refinement pass (libjpeg decode_mcu_AC_refine) ----
            pos = ss
            if eobrun == 0:
                while pos <= se:
                    sym = reader.read_symbol(ac_tbl)
                    r, s = sym >> 4, sym & 0x0F
                    val = 0
                    if s:
                        if s != 1:
                            raise CorruptJPEGError(
                                "refinement size > 1"
                            )
                        val = p1 if reader.read_bit() else m1
                    else:
                        if r != 15:
                            eobrun = (1 << r) + (
                                reader.read_bits(r) if r else 0
                            )
                            break
                        # r == 15: skip 16 zero-history coefficients
                    # advance over r zero-history positions, emitting
                    # correction bits for nonzero-history ones passed
                    while pos <= se:
                        if cb[bi, pos] != 0:
                            correct(bi, pos)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        pos += 1
                    if val and pos <= se:
                        cb[bi, pos] = val
                    pos += 1
            if eobrun > 0:
                # tail of an EOB run: only correction bits remain
                while pos <= se:
                    if cb[bi, pos] != 0:
                        correct(bi, pos)
                    pos += 1
                eobrun -= 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """JFIF/EXIF bytes -> uint8 array (H, W, 3) RGB or (H, W, 1).

    Baseline sequential (SOF0/1) single-scan streams take the fast path
    below; PROGRESSIVE (SOF2) and multi-scan sequential streams decode
    through the general scan machinery (_apply_scan): spectral selection,
    successive approximation (DC+AC first/refinement passes, EOB runs),
    interleaved DC scans, non-interleaved per-component scans, restart
    markers.  Arithmetic coding, hierarchical and 12-bit remain gated."""
    if payload[:2] != b"\xff\xd8":
        raise CorruptJPEGError("missing SOI")
    qtables: Dict[int, np.ndarray] = {}
    htables: Dict[Tuple[int, int], Dict[Tuple[int, int], int]] = {}
    restart_interval = 0
    frame = None  # (h, w, [(comp_id, hs, vs, tq)])
    progressive = False
    i = 2
    n = len(payload)
    scans: List[dict] = []
    while i < n:
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:  # EOI
            break
        if i + 4 > n:
            raise CorruptJPEGError("truncated marker segment")
        seglen = struct.unpack(">H", payload[i + 2 : i + 4])[0]
        body = payload[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(body):
                pq = body[j] >> 4
                tq = body[j] & 0x0F
                j += 1
                if pq == 0:
                    tbl = np.frombuffer(
                        body[j : j + 64], dtype=np.uint8
                    ).astype(np.int64)
                    j += 64
                else:
                    tbl = np.frombuffer(
                        body[j : j + 128], dtype=">u2"
                    ).astype(np.int64)
                    j += 128
                qtables[tq] = tbl  # zigzag order as stored
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(body):
                tc = body[j] >> 4
                th = body[j] & 0x0F
                bits = list(body[j + 1 : j + 17])
                nv = sum(bits)
                values = list(body[j + 17 : j + 17 + nv])
                htables[(tc, th)] = _build_decoder(bits, values)
                j += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 (seq) / SOF2 (prog)
            precision = body[0]
            if precision != 8:
                raise UnsupportedJPEGError(f"{precision}-bit precision")
            progressive = marker == 0xC2
            h, w = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid = body[6 + 3 * c]
                hv = body[7 + 3 * c]
                tq = body[8 + 3 * c]
                hs, vs = hv >> 4, hv & 0x0F
                if hs not in (1, 2) or vs not in (1, 2):
                    raise UnsupportedJPEGError(
                        f"sampling factor {hs}x{vs}"
                    )
                comps.append((cid, hs, vs, tq))
            frame = (h, w, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise UnsupportedJPEGError(
                "arithmetic / hierarchical / lossless JPEG"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise CorruptJPEGError("SOS before SOF")
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cs = body[1 + 2 * c]
                tdta = body[2 + 2 * c]
                scan_comps.append((cs, tdta >> 4, tdta & 0x0F))
            ss = body[1 + 2 * ns]
            se = body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            segments, i = _split_entropy(payload, i + 2 + seglen)
            scans.append(
                {
                    "comps": scan_comps,
                    "ss": ss,
                    "se": se,
                    "ah": ahal >> 4,
                    "al": ahal & 0x0F,
                    "segments": segments,
                    # tables/DRI are snapshotted at scan time: later DHT
                    # segments may redefine ids for later scans
                    "htables": dict(htables),
                    "restart_interval": restart_interval,
                }
            )
            continue
        # APPn / COM / others: skip
        i += 2 + seglen

    if frame is None or not scans:
        raise CorruptJPEGError("no frame/scan found")
    h, w, comps = frame

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    by_id = {c[0]: idx for idx, c in enumerate(comps)}

    ncomp = len(comps)
    # coefficient store per component: (n_blocks, 64) zigzag ints, laid
    # out on the INTERLEAVED (MCU-padded) grid; non-interleaved scans
    # cover the ceil(comp_dim/8) sub-grid of the same store
    comp_bx = [mcus_x * comps[k][1] for k in range(ncomp)]
    comp_by = [mcus_y * comps[k][2] for k in range(ncomp)]
    # true per-component block dims (T.81 A.2.2: non-interleaved scans
    # cover ceil(ceil(dim·sampling/max_sampling)/8) blocks, NOT the
    # MCU-padded grid)
    comp_tbx = [
        -(-(-(-w * comps[k][1] // hmax)) // 8) for k in range(ncomp)
    ]
    comp_tby = [
        -(-(-(-h * comps[k][2] // vmax)) // 8) for k in range(ncomp)
    ]
    coeffs = [
        np.zeros((comp_bx[k] * comp_by[k], 64), dtype=np.int32)
        for k in range(ncomp)
    ]

    baseline_fast = (
        not progressive
        and len(scans) == 1
        and scans[0]["ss"] == 0
        and scans[0]["se"] == 63
        and scans[0]["ah"] == 0
        and scans[0]["al"] == 0
        and len(scans[0]["comps"]) == ncomp
    )
    if baseline_fast:
        sc0 = scans[0]
        scan_comps = sc0["comps"]
        segments = sc0["segments"]
        htabs = sc0["htables"]
        rint = sc0["restart_interval"]
        total_mcus = mcus_x * mcus_y
        mcu = 0
        seg_idx = 0
        reader = _BitReader(segments[0])
        predictors = [0] * ncomp
        while mcu < total_mcus:
            if rint and mcu and mcu % rint == 0:
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise CorruptJPEGError("missing restart segment")
                reader = _BitReader(segments[seg_idx])
                predictors = [0] * ncomp
            my, mx = divmod(mcu, mcus_x)
            for sc in range(len(scan_comps)):
                cs, td, ta = scan_comps[sc]
                k = by_id[cs]
                _, hs, vs, _ = comps[k]
                dc_tbl = htabs.get((0, td))
                ac_tbl = htabs.get((1, ta))
                if dc_tbl is None or ac_tbl is None:
                    raise CorruptJPEGError("missing Huffman table")
                for by in range(vs):
                    for bx in range(hs):
                        blk = np.zeros(64, dtype=np.int32)
                        size = reader.read_symbol(dc_tbl)
                        diff = _extend(reader.read_bits(size), size)
                        predictors[k] += diff
                        blk[0] = predictors[k]
                        pos = 1
                        while pos < 64:
                            sym = reader.read_symbol(ac_tbl)
                            if sym == 0x00:  # EOB
                                break
                            run = sym >> 4
                            sz = sym & 0x0F
                            if sz == 0:
                                if run == 15:  # ZRL
                                    pos += 16
                                    continue
                                raise CorruptJPEGError("bad AC symbol")
                            pos += run
                            if pos >= 64:
                                raise CorruptJPEGError("AC run overflow")
                            blk[pos] = _extend(reader.read_bits(sz), sz)
                            pos += 1
                        bi = (my * vs + by) * comp_bx[k] + (mx * hs + bx)
                        coeffs[k][bi] = blk
            mcu += 1
    else:
        for sc0 in scans:
            _apply_scan(
                sc0, comps, by_id, coeffs,
                comp_bx, comp_tbx, comp_tby, mcus_x, mcus_y,
            )

    # dequantize + IDCT per component (vectorized over all blocks)
    planes = []
    for k in range(ncomp):
        _, hs, vs, tq = comps[k]
        qt = qtables.get(tq)
        if qt is None:
            raise CorruptJPEGError("missing quant table")
        dq = (coeffs[k].astype(np.float64) * qt[None, :])
        nat = np.zeros_like(dq)
        nat[:, ZIGZAG] = dq  # zigzag -> natural order
        blocks = nat.reshape(-1, 8, 8)
        pix = np.einsum("ji,njk,kl->nil", _DCT, blocks, _DCT) + 128.0
        bxc = comp_bx[k]
        byc = comp_by[k]
        plane = (
            pix.reshape(byc, bxc, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(byc * 8, bxc * 8)
        )
        # upsample to full resolution (sample-and-hold)
        ry, rx = vmax // vs, hmax // hs
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])

    if ncomp == 1:
        return np.clip(planes[0].round(), 0, 255).astype(np.uint8)[:, :, None]
    if ncomp == 3:
        return _ycbcr_to_rgb(planes[0], planes[1], planes[2])
    raise UnsupportedJPEGError(f"{ncomp}-component JPEG (CMYK?)")
