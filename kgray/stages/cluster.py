"""Surface-form canonicalization: minhash blocking + connected components.

The reference canonicalizes nodes by exact BEL-term string (G1,
convert_to_cx2.py:74-111); the north-star extends this with clustering of
*variant surface forms* (case, punctuation, hyphenation) into one
canonical entity before id assignment.

Pipeline shape (all but the final union-find distributed):
1. normalize each name (casefold, strip non-alnum) — exact variants
   collapse immediately;
2. minhash signatures over char 3-grams of the normalized form, banded
   LSH → candidate pairs (groupby on (band, hash), shard-vectorized);
3. exact Jaccard verification of candidates;
4. connected components over the verified pair graph.  Components are run
   with union-find on the driver over the CANDIDATE PAIRS ONLY — the pair
   set is orders of magnitude smaller than the name set (provably bounded
   by LSH bucket sizes); a corpus whose pair set itself is huge would
   switch to the iterative min-label-propagation groupby loop, same
   outputs.

Output mapping: name → (cluster_id, canonical) where canonical is the
lexicographically smallest ORIGINAL form in the cluster (deterministic
across runs and partitionings).
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .dedup import MinHasher, _band_rows


def normalize_surface(s: str) -> str:
    return "".join(c for c in (s or "").casefold() if c.isalnum())


def _char_shingles(s: str, k: int = 3) -> List[str]:
    s = f"^{s}$"
    if len(s) <= k:
        return [s]
    return [s[i : i + k] for i in range(len(s) - k + 1)]


class _CharMinHasher(MinHasher):
    """MinHasher over char shingles of the normalized surface form."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [
            self.signature(t or "") for t in batch.column("name").to_pylist()
        ]
        return batch.append_column(
            "minhash",
            pa.array(
                [s.astype(np.int64).tolist() for s in sigs],
                pa.list_(pa.int64()),
            ),
        )

    def signature(self, text: str) -> np.ndarray:
        import zlib

        sh = _char_shingles(normalize_surface(text), self.k)
        h = np.array(
            [zlib.crc32(x.encode()) + (len(x) << 32) for x in sh],
            dtype=np.uint64,
        )
        with np.errstate(over="ignore"):
            m = (h[None, :] * self.a[:, None] + self.b[:, None]) % ((1 << 61) - 1)
        return m.min(axis=1)


def cluster_surface_forms(
    names: "ray.data.Dataset",
    threshold: float = 0.6,
    num_hashes: int = 64,
    bands: int = 32,
) -> pd.DataFrame:
    """names dataset with column ``name`` → DataFrame (name, cluster_id,
    canonical)."""
    rows = num_hashes // bands
    distinct = names.groupby("name").map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )

    sigs = distinct.map_batches(
        _CharMinHasher,
        batch_format="pyarrow",
        concurrency=(1, 4),
        fn_constructor_kwargs={"num_hashes": num_hashes, "shingle_k": 3},
    )

    # reuse the banded explode, keyed by name instead of doc_id
    def to_bands(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "doc_id": pa.array(
                    np.arange(batch.num_rows, dtype=np.int64)
                ),  # placeholder ordinal
                "minhash": batch.column("minhash"),
            }
        )
        b = _band_rows(t, bands, rows)
        return b.append_column(
            "name",
            pa.array(
                np.repeat(
                    np.asarray(batch.column("name").to_pylist(), dtype=object),
                    bands,
                ),
                pa.string(),
            ),
        )

    band_tbl = sigs.map_batches(to_bands, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ns = sorted(set(g["name"]))
        out_a, out_b = [], []
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                out_a.append(ns[i])
                out_b.append(ns[j])
        return pd.DataFrame({"name_a": out_a, "name_b": out_b})

    cand = (
        band_tbl.groupby(["band_id", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )

    # exact Jaccard verify on normalized char shingles
    def jac(a: str, b: str) -> float:
        sa = set(_char_shingles(normalize_surface(a)))
        sb = set(_char_shingles(normalize_surface(b)))
        u = len(sa | sb)
        return len(sa & sb) / u if u else 0.0

    verified: List[Tuple[str, str]] = [
        (r.name_a, r.name_b)
        for r in cand.itertuples()
        if normalize_surface(r.name_a) == normalize_surface(r.name_b)
        or jac(r.name_a, r.name_b) >= threshold
    ]

    all_names = distinct.to_pandas()["name"].tolist()
    # exact-normalization edges (always clustered, even if LSH missed them)
    by_norm: Dict[str, str] = {}
    for n in all_names:
        key = normalize_surface(n)
        if key in by_norm:
            verified.append((by_norm[key], n))
        else:
            by_norm[key] = n

    parent: Dict[str, str] = {n: n for n in all_names}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in verified:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    clusters: Dict[str, List[str]] = {}
    for n in all_names:
        clusters.setdefault(find(n), []).append(n)
    out_rows = []
    for members in clusters.values():
        canonical = min(members)
        for cid, m in enumerate(sorted(members)):
            out_rows.append({"name": m, "canonical": canonical})
    df = pd.DataFrame(out_rows).sort_values("name").reset_index(drop=True)
    canon_ids = {c: i for i, c in enumerate(sorted(df.canonical.unique()))}
    df["cluster_id"] = df.canonical.map(canon_ids).astype("int64")
    return df[["name", "cluster_id", "canonical"]]
