"""Baseline JPEG + GIF codecs (round 3): lossy JPEG round-trips within
bounded error across quality / subsampling / restart-interval settings,
GIF round-trips exactly (palette lossless), interlaced GIF decodes,
honest gates for progressive JPEG, and the multimodal actor stages
running the new REAL kernels under Ray (animated-GIF frame sampling)."""
import struct

import numpy as np
import pyarrow as pa
import pytest

from kgray.sources import minijpeg as mj
from kgray.sources import minimedia as mm


def _gradient(h=48, w=64):
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[:, :, 0] = np.linspace(0, 255, w)[None, :].astype(np.uint8)
    img[:, :, 1] = np.linspace(255, 0, h)[:, None].astype(np.uint8)
    img[:, :, 2] = 128
    img[h // 4 : h // 2, w // 4 : w // 2] = [200, 50, 25]
    return img


# ---------------------------------------------------------------------------
# JPEG
# ---------------------------------------------------------------------------

def test_jpeg_roundtrip_444():
    img = _gradient()
    out = mj.decode_jpeg(mj.encode_jpeg(img, quality=95))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 2.0 and err.max() <= 32


def test_jpeg_roundtrip_420_and_422():
    img = _gradient(41, 53)  # odd dims force edge padding
    for mode in (True, "422"):
        out = mj.decode_jpeg(mj.encode_jpeg(img, quality=92, subsample=mode))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).mean() < 6.0


def test_jpeg_grayscale_single_component():
    g = _gradient()[:, :, 0]
    out = mj.decode_jpeg(mj.encode_jpeg(g, quality=95))
    assert out.shape == (48, 64, 1)
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).max() <= 16


def test_jpeg_restart_markers():
    """DRI/RSTn resynchronization: predictors reset per restart segment."""
    img = _gradient(96, 112)
    for sub in (False, True):
        for ri in (1, 3, 7):
            b = mj.encode_jpeg(img, quality=92, subsample=sub,
                               restart_interval=ri)
            assert b"\xff\xdd" in b  # DRI present
            out = mj.decode_jpeg(b)
            assert np.abs(out.astype(int) - img.astype(int)).mean() < 6.0


def test_jpeg_quality_monotone_size():
    img = _gradient()
    sizes = [len(mj.encode_jpeg(img, quality=q)) for q in (30, 60, 90)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_jpeg_progressive_header_without_scan_is_corrupt():
    """SOF2 no longer gates (the progressive decoder is real since
    round 4); a frame header with no scan is a CORRUPT stream, and the
    remaining honest gate is arithmetic coding (see
    test_arithmetic_still_gated)."""
    prog = (b"\xff\xd8\xff\xc2" + struct.pack(">H", 11)
            + b"\x08\x00\x10\x00\x10\x01\x01\x11\x00")
    with pytest.raises(mj.CorruptJPEGError):
        mj.decode_jpeg(prog)


def test_jpeg_corrupt_raises():
    with pytest.raises(mj.CorruptJPEGError):
        mj.decode_jpeg(b"\x00\x00not a jpeg")


def test_jpeg_16bit_quant_table_parses():
    """DQT with Pq=1 (16-bit entries) decodes — swap the 8-bit table."""
    img = _gradient(16, 16)
    b = bytearray(mj.encode_jpeg(img, quality=95))
    i = b.find(b"\xff\xdb")
    seglen = struct.unpack(">H", b[i + 2 : i + 4])[0]
    tid = b[i + 4]
    tbl8 = bytes(b[i + 5 : i + 5 + 64])
    wide = b"".join(struct.pack(">H", v) for v in tbl8)
    b[i : i + 2 + seglen] = (
        b"\xff\xdb" + struct.pack(">H", 3 + 128) + bytes([(1 << 4) | tid])
        + wide
    )
    out = mj.decode_jpeg(bytes(b))
    ref = mj.decode_jpeg(mj.encode_jpeg(img, quality=95))
    np.testing.assert_array_equal(out, ref)


# ---------------------------------------------------------------------------
# GIF
# ---------------------------------------------------------------------------

def test_gif_roundtrip_exact():
    img = (_gradient() // 64) * 64  # <= 256 distinct colors
    np.testing.assert_array_equal(mm.decode_gif(mm.encode_gif(img)), img)


def test_gif_grayscale_and_2color():
    rng = np.random.default_rng(5)
    bw = (rng.integers(0, 2, (33, 17)) * 255).astype(np.uint8)
    np.testing.assert_array_equal(
        mm.decode_gif(mm.encode_gif(bw))[:, :, 0], bw
    )


def test_gif_lzw_table_reset():
    """>4096 dictionary entries forces a mid-stream clear code."""
    rng = np.random.default_rng(3)
    big = (rng.integers(0, 8, (200, 300)) * 36).astype(np.uint8)
    out = mm.decode_gif(mm.encode_gif(big))
    np.testing.assert_array_equal(out, np.repeat(big[:, :, None], 3, 2))


def test_gif_multi_frame():
    img = (_gradient() // 64) * 64
    shifted = np.roll(img, 7, axis=1)
    frames = mm.gif_frames(mm.encode_gif(img, frames=[shifted]))
    assert len(frames) == 2
    np.testing.assert_array_equal(frames[0], img)
    np.testing.assert_array_equal(frames[1], shifted)


def test_gif_interlaced_decode():
    """Hand-build an interlaced GIF: rows stored in pass order must come
    back in display order."""
    img = (_gradient(16, 8) // 64) * 64
    plain = bytearray(mm.encode_gif(img))
    # re-encode by hand with interlace: reorder rows into pass order
    h, w = img.shape[:2]
    order = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, h, step))
    permuted = img[np.array(order)]
    enc = bytearray(mm.encode_gif(permuted))
    # image descriptor starts after header(6)+LSD(7)+GCT; find 0x2C
    gct_n = 2 << (enc[10] & 0x07)
    idesc = 13 + 3 * gct_n
    assert enc[idesc] == 0x2C
    enc[idesc + 9] |= 0x40  # set interlace flag
    out = mm.decode_gif(bytes(enc))
    np.testing.assert_array_equal(out, img)


def test_gif_too_many_colors_rejected():
    rng = np.random.default_rng(1)
    noisy = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    with pytest.raises(ValueError):
        mm.encode_gif(noisy)


# ---------------------------------------------------------------------------
# dispatch + actor stages
# ---------------------------------------------------------------------------

def test_decode_image_dispatch():
    img = _gradient()
    pal = (img // 64) * 64
    assert mm.detect_format(mj.encode_jpeg(img)) == "jpeg"
    assert mm.detect_format(mm.encode_gif(pal)) == "gif"
    assert mm.decode_image(mj.encode_jpeg(img)).shape == img.shape
    np.testing.assert_array_equal(mm.decode_image(mm.encode_gif(pal)), pal)


def test_media_decoder_strict_jpeg_gif():
    from kgray.stages.multimodal import MEDIA_FEATURE_DIM, MediaDecoder

    dec = MediaDecoder(strict=True)
    img = _gradient()
    meta = dec.decode("mem://j", mj.encode_jpeg(img, quality=90))
    assert (meta["width"], meta["height"]) == (64, 48)
    assert meta["feature"].shape == (MEDIA_FEATURE_DIM,)
    meta = dec.decode("mem://g", mm.encode_gif((img // 64) * 64))
    assert (meta["width"], meta["height"]) == (64, 48)


def test_frame_sampler_real_gif_frames(ray_session):
    """Animated GIF payloads get REAL per-frame features; the stubbed
    video path still works beside them in the same batch."""
    import ray.data

    from kgray.stages.multimodal import MEDIA_FEATURE_DIM, FrameSampler

    img = (_gradient(24, 32) // 64) * 64
    frames = [np.roll(img, k, axis=1) for k in (0, 4, 8, 12)]
    gif = mm.encode_gif(frames[0], frames=frames[1:])
    batch = pa.table(
        {
            "doc_id": pa.array(["g", "v"], pa.string()),
            "span_seq": pa.array([0, 0], pa.int32()),
            "media_ref": pa.array(["mem://anim", "s3://vid"], pa.string()),
            "modality": pa.array(["image", "video"], pa.string()),
            "duration_ms": pa.array([0, 2500], pa.int64()),
            "payload": pa.array([gif, None], pa.binary()),
        }
    )
    out = (
        ray.data.from_arrow(batch)
        .map_batches(FrameSampler, fn_constructor_kwargs={
            "interval_ms": 1000, "max_frames": 3},
            batch_format="pyarrow", concurrency=(1, 2), batch_size=8,
            num_cpus=1)
        .to_pandas()
    )
    g = out[out.doc_id == "g"].sort_values("frame_idx")
    assert len(g) == 3  # 4 frames capped to 3, uniformly re-spaced
    # real content-derived features: first frame's feature matches a
    # direct image_feature of the decoded first frame
    np.testing.assert_allclose(
        np.asarray(list(g.feature)[0], dtype=np.float32),
        mm.image_feature(frames[0], MEDIA_FEATURE_DIM),
        rtol=1e-6,
    )
    v = out[out.doc_id == "v"]
    assert len(v) == 3  # ceil(2500/1000) = 3 stub frames


# ---------------------------------------------------------------------------
# progressive JPEG (round 4): the hermetic round trip — the progressive
# encoder reuses the baseline quantizer, so after every scan (DC first +
# refinement, split AC spectral bands, AC successive-approximation
# refinement with EOB runs) the coefficients are IDENTICAL and the
# decoded pixels must equal the baseline decode bit-for-bit.
# ---------------------------------------------------------------------------

def test_progressive_roundtrip_matches_baseline():
    from kgray.sources.minijpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(7)
    cases = [
        (rng.randint(0, 256, (16, 16), dtype=np.uint8), {}),
        (rng.randint(0, 256, (21, 13), dtype=np.uint8), {}),
        (rng.randint(0, 256, (24, 24, 3), dtype=np.uint8), {}),
        (rng.randint(0, 256, (35, 27, 3), dtype=np.uint8),
         {"subsample": True}),
        (rng.randint(0, 256, (33, 18, 3), dtype=np.uint8),
         {"subsample": "422"}),
    ]
    yy, xx = np.mgrid[0:64, 0:48]
    smooth = ((np.sin(xx / 19) + np.cos(yy / 23)) * 60 + 128).astype(
        np.uint8
    )
    cases.append((np.stack([smooth] * 3, axis=2), {}))  # deep EOB runs
    for img, kw in cases:
        for q in (90, 40):
            base = decode_jpeg(encode_jpeg(img, quality=q, **kw))
            prog = decode_jpeg(
                encode_jpeg_progressive(img, quality=q, **kw)
            )
            assert np.array_equal(base, prog), (img.shape, kw, q)


def test_progressive_is_sof2():
    from kgray.sources.minijpeg import encode_jpeg_progressive

    p = encode_jpeg_progressive(
        np.zeros((8, 8), dtype=np.uint8), quality=90
    )
    assert b"\xff\xc2" in p  # SOF2 marker present
    assert p.count(b"\xff\xda") >= 4  # genuinely multi-scan


def test_arithmetic_still_gated():
    from kgray.sources.minijpeg import UnsupportedJPEGError, decode_jpeg

    sof9 = bytes([0xFF, 0xD8, 0xFF, 0xC9, 0x00, 0x0B,
                  8, 0, 8, 0, 8, 1, 1, 0x11, 0])
    with pytest.raises(UnsupportedJPEGError):
        decode_jpeg(sof9)


def test_media_decoder_strict_decodes_progressive(ray_session):
    """The multimodal strict path now REALLY decodes progressive JPEG."""
    import pyarrow as pa

    from kgray.sources.minijpeg import encode_jpeg_progressive
    from kgray.stages.multimodal import MediaDecoder

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (24, 17, 3), dtype=np.uint8)
    payload = encode_jpeg_progressive(img, quality=85)
    batch = pa.table(
        {
            "doc_id": pa.array(["d1"], pa.string()),
            "span_seq": pa.array([0], pa.int32()),
            "media_ref": pa.array(["mem://prog"], pa.string()),
            "payload": pa.array([payload], pa.binary()),
        }
    )
    out = MediaDecoder(strict=True)(batch).to_pandas()
    assert int(out.width[0]) == 17 and int(out.height[0]) == 24
    assert out.unsupported[0] is None
