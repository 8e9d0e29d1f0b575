"""Span explode + admission filter + span-sequence invariant check.

Explode turns one document row (doc_id, spans) into one row per span with its
ordinal position ``span_seq`` — the Ray-Data equivalent of the reference's
ordinal-keyed paragraph dict (pub.py:42-66).  EVERY span is kept as a row
(media/ref/title/short included) with an ``admitted`` flag instead of being
filtered away, so that

  * downstream extraction stages filter on ``admitted`` (pub.py:51-58
    semantics: skip section kinds {ref, title}; skip text < 20 chars; media
    spans pass through, never extracted from), and
  * ``reassemble_documents`` can re-group chunks into (doc_id, spans) and
    verify the per-row span-sequence invariant (kind, text, media_ref, order)
    against the input — the invariant named in BASELINE.json input_hint.

All batch functions are Arrow-native (zero-copy in, vectorized kernels).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import schemas

_DROP_KINDS = ("ref", "title")  # pub.py:51-52
_MIN_TEXT_LEN = 20              # pub.py:57-58


def explode_spans(batch: pa.Table) -> pa.Table:
    """documents batch → chunks batch (one row per span, all spans kept)."""
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    lengths = pc.list_value_length(spans).to_numpy(zero_copy_only=False)
    lengths = np.nan_to_num(lengths, nan=0).astype(np.int64)
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    doc_rep = pa.array(np.repeat(doc_ids, lengths), pa.string())
    # per-span ordinal within each doc: ranges concatenated
    seq = pa.array(
        np.concatenate([np.arange(n, dtype=np.int32) for n in lengths])
        if len(lengths)
        else np.array([], dtype=np.int32),
        pa.int32(),
    )
    flat = spans.flatten()  # struct array of all spans in order
    kind = flat.field("kind")
    text = flat.field("text")
    media_ref = flat.field("media_ref")
    offset = flat.field("offset")
    is_content = pc.invert(pc.is_in(kind, value_set=pa.array(_DROP_KINDS)))
    admitted = pc.and_(
        pc.and_(pc.equal(kind, "text"), is_content),
        pc.greater_equal(pc.utf8_length(text), _MIN_TEXT_LEN),
    )
    out = pa.table(
        {
            "doc_id": doc_rep,
            "span_seq": seq,
            "kind": kind,
            "text": text,
            "media_ref": media_ref,
            "offset": offset,
            "admitted": admitted,
        }
    )
    return schemas.validate_schema(out, schemas.CHUNKS, "explode_spans")


def filter_admitted(batch: pa.Table) -> pa.Table:
    """Keep only spans eligible for annotation/extraction."""
    return batch.filter(batch.column("admitted"))


def reassemble_documents(chunks: pa.Table) -> pa.Table:
    """Re-group a (complete) chunks table back to (doc_id, spans).

    Used by the invariant check: sort by (doc_id, span_seq) and rebuild the
    span list per document.  Intended for per-group use inside
    ``groupby('doc_id').map_groups`` or on small test tables.
    """
    chunks = chunks.sort_by([("doc_id", "ascending"), ("span_seq", "ascending")])
    doc = chunks.column("doc_id").to_pylist()
    rows: dict[str, list] = {}
    kinds = chunks.column("kind").to_pylist()
    texts = chunks.column("text").to_pylist()
    refs = chunks.column("media_ref").to_pylist()
    offs = chunks.column("offset").to_pylist()
    for i, d in enumerate(doc):
        rows.setdefault(d, []).append(
            {"kind": kinds[i], "text": texts[i], "media_ref": refs[i],
             "offset": offs[i]}
        )
    return pa.Table.from_pydict(
        {"doc_id": list(rows.keys()), "spans": list(rows.values())},
        schema=schemas.DOCUMENTS,
    )


def check_span_invariant(original: pa.Table, reassembled: pa.Table) -> None:
    """Raise AssertionError unless span sequences match exactly per doc_id."""
    def to_map(t: pa.Table) -> dict:
        return {
            d: [(s["kind"], s["text"], s["media_ref"]) for s in spans]
            for d, spans in zip(
                t.column("doc_id").to_pylist(), t.column("spans").to_pylist()
            )
        }

    a, b = to_map(original), to_map(reassembled)
    if a != b:
        missing = set(a) ^ set(b)
        if missing:
            raise AssertionError(f"span invariant: doc set differs: {missing}")
        for d in a:
            if a[d] != b[d]:
                raise AssertionError(f"span invariant violated for {d}")


def sliding_chunks(
    docs: "ray.data.Dataset", window: int = 20, stride: int = 10
) -> "ray.data.Dataset":
    """Overlapping sliding-window chunks — the RAG-prep shape (windows
    of ``window`` tokens every ``stride`` tokens, trailing windows
    ragged).  Pure map-side explode, no shuffle; tokenisation is a plain
    single-space split (string_split semantics, matching the oracle).

    Output: (doc_id, chunk_seq, n_tokens, chunk), chunk_seq dense from 0
    per document.
    """
    import numpy as np
    import pyarrow as pa

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_id, out_seq, out_n, out_chunk = [], [], [], []
        for d, t in zip(ids, texts):
            toks = (t or "").split(" ")
            n = len(toks)
            seq = 0
            for start in range(0, n, stride):
                piece = toks[start : start + window]
                out_id.append(d)
                out_seq.append(seq)
                out_n.append(len(piece))
                out_chunk.append(" ".join(piece))
                seq += 1
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "chunk_seq": pa.array(out_seq, pa.int64()),
                "n_tokens": pa.array(out_n, pa.int64()),
                "chunk": pa.array(out_chunk, pa.string()),
            }
        )

    return docs.map_batches(explode, batch_format="pyarrow")
