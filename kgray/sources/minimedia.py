"""Minimal pure-python media decoders — real in-sandbox decode for the
multimodal stages (stages/multimodal.py), no external codec libraries:

* PNG  — zlib inflate + scanline unfilter (None/Sub/Up/Average/Paeth);
  bit depth 8; color types gray / RGB / palette / gray+alpha / RGBA;
  non-interlaced.
* BMP  — BITMAPINFOHEADER, uncompressed 8/24/32-bit, bottom-up or
  top-down rows.
* PPM / PGM — binary P5/P6.
* WAV  — stdlib ``wave`` (PCM 8/16/32-bit).
* JPEG — baseline sequential AND progressive (sources/minijpeg.py:
  Huffman + DCT in numpy; 4:4:4 / 4:2:2 / 4:2:0 / grayscale, restart
  markers, spectral-selection/successive-approximation scans; only
  arithmetic coding stays gated).
* GIF  — 87a/89a, global/local palettes, interlace, variable-width LZW;
  ``gif_frames`` exposes every frame for the frame-sampling stage.
* AVI  — RIFF container walk (hdrl probe + movi chunk index, nested
  ``LIST rec`` groups, idx1 ignored); MJPEG video streams decode for
  real through minijpeg (``avi_probe`` / ``avi_frames`` /
  ``encode_avi_mjpeg``).  Non-MJPEG streams raise with the handler
  fourcc in the message — the per-reason media gate counts them.

Formats beyond these (non-MJPEG video codecs, arithmetic-coded JPEG)
still raise ``UnsupportedMediaError`` — the honest posture for codecs
that genuinely need a native library.  ``encode_png`` / ``encode_jpeg``
/ ``encode_gif`` / ``encode_avi_mjpeg`` exist so tests (and synthetic
corpora) can round-trip pixels through the real decode paths.
"""
from __future__ import annotations

import io
import struct
import zlib
from typing import Optional, Tuple

import numpy as np


class UnsupportedMediaError(NotImplementedError):
    """Payload format not decodable without a native codec library."""


# ---------------------------------------------------------------------------
# format detection
# ---------------------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def detect_format(payload: bytes) -> Optional[str]:
    """'png'|'bmp'|'ppm'|'pgm'|'wav'|'avi'|'jpeg'|'gif'|None."""
    if not payload or len(payload) < 12:
        return None
    if payload[:8] == _PNG_MAGIC:
        return "png"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] in (b"P6", b"P5"):
        return "ppm" if payload[:2] == b"P6" else "pgm"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "avi"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    return None


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

def _unfilter(raw: bytes, width: int, height: int, channels: int) -> np.ndarray:
    stride = width * channels
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(height):
        ft = raw[pos]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=pos + 1
        ).astype(np.int32)
        pos += 1 + stride
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for x in range(channels, stride):
                row[x] = (row[x] + row[x - channels]) & 0xFF
        elif ft == 2:  # Up
            row = (row + prev) & 0xFF
        elif ft == 3:  # Average
            for x in range(stride):
                left = row[x - channels] if x >= channels else 0
                row[x] = (row[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(stride):
                a = row[x - channels] if x >= channels else 0
                b = prev[x]
                c = prev[x - channels] if x >= channels else 0
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)
                row[x] = (row[x] + pred) & 0xFF
        else:
            raise UnsupportedMediaError(f"PNG filter type {ft}")
        out[y] = row.astype(np.uint8)
        prev = row
    return out


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → HxWxC uint8 array (palette expanded to RGB)."""
    if payload[:8] != _PNG_MAGIC:
        raise UnsupportedMediaError("not a PNG")
    pos = 8
    width = height = None
    bit_depth = color_type = None
    idat = bytearray()
    palette = None
    n = len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data[:13])
            )
            if interlace != 0:
                raise UnsupportedMediaError("interlaced PNG")
            if bit_depth != 8:
                raise UnsupportedMediaError(f"PNG bit depth {bit_depth}")
            if color_type not in _PNG_CHANNELS:
                raise UnsupportedMediaError(f"PNG color type {color_type}")
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise UnsupportedMediaError("PNG missing IHDR/IDAT")
    channels = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    flat = _unfilter(raw, width, height, channels)
    img = flat.reshape(height, width, channels)
    if color_type == 3:
        if palette is None:
            raise UnsupportedMediaError("palette PNG without PLTE")
        img = palette[img[:, :, 0]]
    return img


def encode_png(img: np.ndarray) -> bytes:
    """HxWxC (C in 1/2/3/4) uint8 → PNG bytes (filter 0, one IDAT)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------

def decode_bmp(payload: bytes) -> np.ndarray:
    if payload[:2] != b"BM":
        raise UnsupportedMediaError("not a BMP")
    (data_offset,) = struct.unpack("<I", payload[10:14])
    (hdr_size,) = struct.unpack("<I", payload[14:18])
    if hdr_size < 40:
        raise UnsupportedMediaError("pre-BITMAPINFOHEADER BMP")
    width, height = struct.unpack("<ii", payload[18:26])
    _planes, bpp = struct.unpack("<HH", payload[26:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    if compression != 0:
        raise UnsupportedMediaError(f"compressed BMP (method {compression})")
    top_down = height < 0
    height = abs(height)
    if bpp == 8:
        # palette: after the header, 4 bytes per entry (BGRX)
        pal_off = 14 + hdr_size
        palette = np.frombuffer(
            payload, dtype=np.uint8, count=(data_offset - pal_off)
        , offset=pal_off).reshape(-1, 4)[:, [2, 1, 0]]
        stride = (width + 3) & ~3
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=stride * height, offset=data_offset
        ).reshape(height, stride)[:, :width]
        img = palette[rows]
    elif bpp in (24, 32):
        c = bpp // 8
        stride = (width * c + 3) & ~3
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=stride * height, offset=data_offset
        ).reshape(height, stride)[:, : width * c].reshape(height, width, c)
        img = rows[:, :, [2, 1, 0]]  # BGR(A) → RGB
    else:
        raise UnsupportedMediaError(f"{bpp}-bit BMP")
    if not top_down:
        img = img[::-1]
    return np.ascontiguousarray(img)


# ---------------------------------------------------------------------------
# PPM / PGM
# ---------------------------------------------------------------------------

def decode_pnm(payload: bytes) -> np.ndarray:
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise UnsupportedMediaError("not a binary PGM/PPM")
    # header: magic, width, height, maxval — whitespace/comment separated
    toks = []
    pos = 2
    while len(toks) < 3 and pos < len(payload):
        ch = payload[pos : pos + 1]
        if ch == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
        elif ch.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            toks.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = toks
    if maxval > 255:
        raise UnsupportedMediaError("16-bit PNM")
    c = 3 if magic == b"P6" else 1
    img = np.frombuffer(
        payload, dtype=np.uint8, count=width * height * c, offset=pos
    ).reshape(height, width, c)
    return np.ascontiguousarray(img)


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------

def decode_wav(payload: bytes) -> Tuple[np.ndarray, int]:
    """WAV bytes → (samples float32 in [-1, 1] shaped (n, channels), rate)."""
    import wave

    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            rate = w.getframerate()
            nch = w.getnchannels()
            sw = w.getsampwidth()
            frames = w.readframes(w.getnframes())
    except wave.Error as e:
        raise UnsupportedMediaError(f"WAV parse failed: {e}") from e
    if sw == 1:
        arr = (
            np.frombuffer(frames, dtype=np.uint8).astype(np.float32) - 128.0
        ) / 128.0
    elif sw == 2:
        arr = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 4:
        arr = (
            np.frombuffer(frames, dtype="<i4").astype(np.float32)
            / 2147483648.0
        )
    else:
        raise UnsupportedMediaError(f"{sw * 8}-bit WAV")
    return arr.reshape(-1, nch), rate


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """float32 [-1,1] (n,) or (n, ch) → 16-bit PCM WAV bytes."""
    import wave

    if samples.ndim == 1:
        samples = samples[:, None]
    pcm = np.clip(samples * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(samples.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------------------
# GIF (87a/89a) — variable-width LZW, global/local palettes, interlace
# ---------------------------------------------------------------------------

def _gif_lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytes:
    """GIF-variant LZW: codes packed LSB-first, dynamic width 3..12 bits."""
    clear = 1 << min_code_size
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    acc = 0
    nbits = 0
    pos = 0
    out = bytearray()
    prev: Optional[bytes] = None
    while len(out) < n_pixels:
        while nbits < code_size:
            if pos >= len(data):
                # tolerated: some writers omit the explicit end code
                return bytes(out[:n_pixels])
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise UnsupportedMediaError("corrupt GIF LZW stream")
        out += entry
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    return bytes(out[:n_pixels])


def _gif_lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code_size + 1
    put(clear, code_size)
    w = b""
    for b in indices:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        put(table[w], code_size)
        table[wc] = next_code
        next_code += 1
        if next_code > (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code >= 4096:
            put(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        w = bytes([b])
    if w:
        put(table[w], code_size)
    put(end, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def gif_frames(payload: bytes) -> list:
    """All frames of a GIF as uint8 (h, w, 3) arrays (frame-local geometry;
    naive full-replace rendering — disposal-method compositing of partial
    frames onto the logical screen is out of scope and documented so)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise UnsupportedMediaError("not a GIF")
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8)
        gct = gct.reshape(-1, 3)
        pos += 3 * n
    frames = []
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise UnsupportedMediaError(f"unknown GIF block 0x{b:02x}")
        _left, _top, w, h, ipacked = struct.unpack(
            "<HHHHB", payload[pos + 1 : pos + 10]
        )
        pos += 10
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(
                payload[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(-1, 3)
            pos += 3 * n
        if pal is None:
            raise UnsupportedMediaError("GIF image with no color table")
        min_code_size = payload[pos]
        pos += 1
        lzw = bytearray()
        while pos < len(payload) and payload[pos] != 0:
            ln = payload[pos]
            lzw += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(
            _gif_lzw_decode(min_code_size, bytes(lzw), w * h), dtype=np.uint8
        )
        if len(idx) < w * h:
            idx = np.pad(idx, (0, w * h - len(idx)))
        grid = idx.reshape(h, w)
        if ipacked & 0x40:  # interlaced: reorder rows
            out = np.empty_like(grid)
            src = 0
            for start, step in _GIF_INTERLACE_PASSES:
                rows = range(start, h, step)
                for r in rows:
                    out[r] = grid[src]
                    src += 1
            grid = out
        frames.append(pal[np.minimum(grid, len(pal) - 1)])
    if not frames:
        raise UnsupportedMediaError("GIF with no image data")
    return frames


def decode_gif(payload: bytes) -> np.ndarray:
    """First frame of a GIF as uint8 (h, w, 3)."""
    return gif_frames(payload)[0]


def encode_gif(img: np.ndarray, frames: Optional[list] = None) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB (≤256 distinct colors) →
    GIF89a bytes; pass ``frames`` (list of same-shape arrays) for a
    multi-frame GIF sharing one palette.  Test/synthetic-corpus encoder."""
    imgs = [img] + list(frames or [])
    rgb = []
    for im in imgs:
        a = np.asarray(im, dtype=np.uint8)
        if a.ndim == 2:
            a = np.repeat(a[:, :, None], 3, axis=2)
        rgb.append(a[:, :, :3])
    h, w = rgb[0].shape[:2]
    flat = np.concatenate([a.reshape(-1, 3) for a in rgb])
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"{len(palette)} colors > 256 (quantize first)")
    bits = max(1, int(np.ceil(np.log2(max(2, len(palette))))))
    table_n = 1 << bits
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    pal = np.zeros((table_n, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    out += pal.tobytes()
    min_code_size = max(2, bits)
    offset = 0
    for a in rgb:
        n = a.shape[0] * a.shape[1]
        idx = inverse[offset : offset + n].astype(np.uint8).tobytes()
        offset += n
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(min_code_size)
        lzw = _gif_lzw_encode(min_code_size, idx)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


# ---------------------------------------------------------------------------
# AVI (RIFF) container — MJPEG video streams decode for real
# ---------------------------------------------------------------------------

def _riff_chunks(buf: bytes, pos: int, end: int):
    """Walk a run of RIFF chunks in buf[pos:end], yielding
    (fourcc, data_start, data_size).  Chunks are word-aligned (a pad
    byte follows odd sizes).  Truncated tails stop the walk rather than
    raising — callers decide whether a short container is an error."""
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        if pos + 8 + size > end:
            break
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)


def _avi_top(payload: bytes):
    if detect_format(payload) != "avi":
        raise UnsupportedMediaError("not an AVI container")
    (riff_size,) = struct.unpack("<I", payload[4:8])
    return _riff_chunks(payload, 12, min(len(payload), 8 + riff_size))


def avi_probe(payload: bytes) -> dict:
    """Container header probe: parse the ``avih`` main header inside
    ``LIST hdrl`` → {width, height, n_frames, us_per_frame, fps,
    duration_ms, handler} (handler = the video stream's fourcc from
    ``strh``, e.g. 'MJPG')."""
    avih = None
    handler = ""
    for fourcc, ds, size in _avi_top(payload):
        if fourcc != b"LIST" or payload[ds : ds + 4] != b"hdrl":
            continue
        for sub, sds, ssize in _riff_chunks(payload, ds + 4, ds + size):
            if sub == b"avih" and ssize >= 40:
                avih = struct.unpack("<10I", payload[sds : sds + 40])
            elif sub == b"LIST" and payload[sds : sds + 4] == b"strl":
                for s2, s2ds, s2size in _riff_chunks(
                    payload, sds + 4, sds + ssize
                ):
                    if (s2 == b"strh" and s2size >= 8
                            and payload[s2ds : s2ds + 4] == b"vids"):
                        handler = (
                            payload[s2ds + 4 : s2ds + 8]
                            .decode("ascii", "replace").strip("\x00 ")
                        )
        break
    if avih is None:
        raise UnsupportedMediaError("AVI without an avih main header")
    us_per_frame, _bps, _pad, _flags, n_frames, _init, _streams, _buf, \
        w, h = avih
    fps = 1_000_000.0 / us_per_frame if us_per_frame else 0.0
    return {
        "width": int(w),
        "height": int(h),
        "n_frames": int(n_frames),
        "us_per_frame": int(us_per_frame),
        "fps": fps,
        "duration_ms": int(n_frames * us_per_frame // 1000),
        "handler": handler,
    }


def _avi_frame_ranges(payload: bytes) -> list:
    """(start, size) byte ranges of every video frame chunk (``##dc`` /
    ``##db``) inside ``LIST movi``, recursing into nested ``LIST rec``
    groups.  Only ranges move — frame bytes are sliced lazily so a
    sampler can decode just the frames it picked."""
    ranges = []

    def walk(pos: int, end: int):
        for fourcc, ds, size in _riff_chunks(payload, pos, end):
            if fourcc == b"LIST" and payload[ds : ds + 4] == b"rec ":
                walk(ds + 4, ds + size)
            elif fourcc[2:4] in (b"dc", b"db"):
                ranges.append((ds, size))

    for fourcc, ds, size in _avi_top(payload):
        if fourcc == b"LIST" and payload[ds : ds + 4] == b"movi":
            walk(ds + 4, ds + size)
    return ranges


def avi_frames(payload: bytes, picks=None) -> list:
    """Decode AVI video frames as uint8 (h, w[, 3]) arrays.  ``picks``
    (iterable of frame indices) decodes ONLY those frames — the
    frame-sampling stage never pays for frames it skips.  MJPEG frames
    decode through minijpeg; any other stream codec raises
    ``UnsupportedMediaError`` naming the handler fourcc."""
    ranges = _avi_frame_ranges(payload)
    if not ranges:
        raise UnsupportedMediaError("AVI with no video frame chunks")
    idx = range(len(ranges)) if picks is None else picks
    out = []
    for i in idx:
        start, size = ranges[int(i)]
        frame = payload[start : start + size]
        if frame[:3] != b"\xff\xd8\xff":
            handler = ""
            try:
                handler = avi_probe(payload)["handler"]
            except UnsupportedMediaError:
                pass
            raise UnsupportedMediaError(
                f"AVI stream codec needs a native library: "
                f"{handler or 'unknown handler'}"
            )
        out.append(decode_image(frame))
    return out


def decode_avi(payload: bytes) -> np.ndarray:
    """First video frame of an MJPEG AVI as uint8 (h, w[, 3])."""
    return avi_frames(payload, picks=[0])[0]


def encode_avi_mjpeg(
    frames: list,
    fps: int = 10,
    quality: int = 90,
    subsample: bool = False,
) -> bytes:
    """Same-shape uint8 frames → RIFF AVI with an MJPEG video stream
    (avih + strl/strh/strf headers, movi '00dc' chunks, idx1 keyframe
    index).  Test/synthetic-corpus encoder, hermetic counterpart of the
    real ``avi_frames`` decode path."""
    from . import minijpeg

    if not frames:
        raise ValueError("encode_avi_mjpeg needs at least one frame")
    jpegs = [
        minijpeg.encode_jpeg(
            np.asarray(f, dtype=np.uint8), quality=quality,
            subsample=subsample,
        )
        for f in frames
    ]
    h, w = np.asarray(frames[0]).shape[:2]
    us_per_frame = int(round(1_000_000 / fps))
    buf_size = max(len(j) for j in jpegs)

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) & 1 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    avih = struct.pack(
        "<14I", us_per_frame, buf_size * fps, 0, 0x10,  # HASINDEX
        len(jpegs), 0, 1, buf_size, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H", b"vids", b"MJPG", 0, 0, 0, 0,
        1, fps, 0, len(jpegs), buf_size, 0xFFFF, 0, 0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
        w * h * 3, 0, 0, 0, 0,
    )
    strl = chunk(b"LIST", b"strl" + chunk(b"strh", strh)
                 + chunk(b"strf", strf))
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih) + strl)
    movi_body = b"".join(chunk(b"00dc", j) for j in jpegs)
    movi = chunk(b"LIST", b"movi" + movi_body)
    idx, off = bytearray(), 4  # offsets relative to the 'movi' fourcc
    for j in jpegs:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(j))
        off += 8 + len(j) + (len(j) & 1)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------------------
# unified decode + features
# ---------------------------------------------------------------------------

def decode_image(payload: bytes) -> np.ndarray:
    fmt = detect_format(payload)
    if fmt == "png":
        return decode_png(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    if fmt in ("ppm", "pgm"):
        return decode_pnm(payload)
    if fmt == "jpeg":
        from . import minijpeg

        # corrupt streams map to UnsupportedMediaError too, matching the
        # WAV path: decode stages quarantine/fall back, never crash
        try:
            return minijpeg.decode_jpeg(payload)
        except (minijpeg.UnsupportedJPEGError,
                minijpeg.CorruptJPEGError) as e:
            raise UnsupportedMediaError(str(e)) from e
    if fmt == "gif":
        try:
            return decode_gif(payload)
        except (struct.error, IndexError) as e:
            raise UnsupportedMediaError(f"corrupt GIF: {e}") from e
    if fmt == "avi":
        try:
            return decode_avi(payload)
        except (struct.error, IndexError) as e:
            raise UnsupportedMediaError(f"corrupt AVI: {e}") from e
    raise UnsupportedMediaError(
        f"no pure-python decoder for format {fmt or 'unknown'}"
    )


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample (numpy indexing, no loops)."""
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    xs = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return img[ys][:, xs]


def image_feature(img: np.ndarray, dim: int = 16) -> np.ndarray:
    """Deterministic real feature vector from pixels: per-channel mean/std
    (up to 3 channels → 6), a 8-bin gray histogram, and 2 gradient-energy
    stats — cheap, vectorized, content-derived (not a hash fake)."""
    arr = img.astype(np.float32)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    c = min(arr.shape[2], 3)
    feats = []
    for k in range(3):
        ch = arr[:, :, min(k, c - 1)]
        feats.append(ch.mean() / 255.0)
        feats.append(ch.std() / 255.0)
    gray = arr[:, :, :c].mean(axis=2)
    hist, _ = np.histogram(gray, bins=8, range=(0, 256))
    feats.extend((hist / max(1, gray.size)).tolist())
    gx = np.abs(np.diff(gray, axis=1)).mean() / 255.0 if gray.shape[1] > 1 else 0.0
    gy = np.abs(np.diff(gray, axis=0)).mean() / 255.0 if gray.shape[0] > 1 else 0.0
    feats.extend([gx, gy])
    out = np.asarray(feats[:dim], dtype=np.float32)
    if out.size < dim:
        out = np.pad(out, (0, dim - out.size))
    return out


def audio_feature(samples: np.ndarray, dim: int = 16) -> np.ndarray:
    """Deterministic real audio features: RMS, zero-crossing rate, and a
    coarse 14-band energy spectrum (rfft magnitudes, log-spaced bands)."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    n = len(mono)
    if n == 0:
        return np.zeros(dim, dtype=np.float32)
    rms = float(np.sqrt(np.mean(mono**2)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(mono).astype(np.int8)))))
    spec = np.abs(np.fft.rfft(mono))
    bands = np.array_split(spec, max(1, dim - 2))
    band_e = [float(np.sqrt(np.mean(b**2))) if len(b) else 0.0 for b in bands]
    total = max(1e-9, sum(band_e))
    out = np.asarray(
        [rms, zcr] + [e / total for e in band_e[: dim - 2]], dtype=np.float32
    )
    if out.size < dim:
        out = np.pad(out, (0, dim - out.size))
    return out
