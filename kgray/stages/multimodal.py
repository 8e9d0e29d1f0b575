"""Multimodal (image/audio/video) column plumbing.

Media items are opaque ``binary`` payloads / ``media_ref`` URIs with typed
metadata, processed by actor-pool ``map_batches`` stages with small batches
(large payloads → keep batch_size low so batch × concurrency fits worker
heaps).  The image/audio codecs are NOT in this container, so the decode
kernels are stubbed two ways:

- ``strict=True``  → NotImplementedError (the honest production posture);
- ``strict=False`` → a deterministic fake (crc-seeded) so the Ray-side
  plumbing — schemas, batch sizes, actor signatures, output layout — is
  fully exercised and tested.

Swapping in PIL/ffmpeg later only replaces the marked kernel bodies.
"""
from __future__ import annotations

import zlib
from typing import Optional

import numpy as np
import pyarrow as pa

MEDIA_FEATURE_DIM = 16


def _fake_decode(ref: str, payload: Optional[bytes]) -> dict:
    """Deterministic stand-in decode: dimensions + feature vector seeded by
    content identity (media_ref, payload crc)."""
    seed = zlib.crc32((ref or "").encode()) ^ (
        zlib.crc32(payload) if payload else 0
    )
    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    return {
        "width": int(rng.randint(64, 1920)),
        "height": int(rng.randint(64, 1080)),
        "feature": rng.standard_normal(MEDIA_FEATURE_DIM).astype(np.float32),
    }


class MediaDecoder:
    """Actor stage: media chunks → decoded metadata + feature vector.

    Input: rows with (doc_id, span_seq, media_ref[, payload]).
    Output: (doc_id, span_seq, media_ref, width, height,
             feature list<float>).
    """

    def __init__(self, strict: bool = False):
        # real backend init (codec contexts, model weights) would go here —
        # once per actor, never per batch
        self.strict = strict

    def decode(self, ref: str, payload: Optional[bytes]) -> dict:
        if self.strict:
            raise NotImplementedError(
                "media decoding requires image/audio libraries not present "
                "in this container; run with strict=False for the "
                "deterministic fake"
            )
        return _fake_decode(ref, payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        payloads = (
            batch.column("payload").to_pylist()
            if "payload" in batch.schema.names
            else [None] * len(refs)
        )
        decoded = [self.decode(r, p) for r, p in zip(refs, payloads)]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "span_seq": batch.column("span_seq"),
                "media_ref": batch.column("media_ref"),
                "width": pa.array([d["width"] for d in decoded], pa.int32()),
                "height": pa.array([d["height"] for d in decoded], pa.int32()),
                "feature": pa.array(
                    [d["feature"].tolist() for d in decoded],
                    pa.list_(pa.float32()),
                ),
            }
        )


class MediaResizer:
    """Actor stage: clamp media dimensions to a bounding box (metadata-level
    op; the pixel resample kernel is the stubbed part)."""

    def __init__(self, max_w: int = 512, max_h: int = 512):
        self.max_w, self.max_h = max_w, max_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch.column("width").to_numpy(zero_copy_only=False)
        h = batch.column("height").to_numpy(zero_copy_only=False)
        scale = np.minimum(
            1.0, np.minimum(self.max_w / w, self.max_h / h)
        )
        out_w = np.maximum(1, np.floor(w * scale + 0.5)).astype(np.int32)
        out_h = np.maximum(1, np.floor(h * scale + 0.5)).astype(np.int32)
        t = batch.set_column(
            batch.schema.get_field_index("width"), "width", pa.array(out_w)
        )
        return t.set_column(
            t.schema.get_field_index("height"), "height", pa.array(out_h)
        )


def media_chunks(chunks):
    """Filter a CHUNKS dataset down to media spans."""
    import pyarrow.compute as pc

    return chunks.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "media")),
        batch_format="pyarrow",
    )


def decode_media(chunks, concurrency=(1, 4), batch_size: int = 64):
    """documents' media spans → decoded feature table (actor pool).

    batch_size deliberately small: with real payloads each row is MBs."""
    return media_chunks(chunks).map_batches(
        MediaDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
