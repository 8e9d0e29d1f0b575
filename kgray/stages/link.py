"""Embedding-based entity linking with candidate blocking.

The reference links mentions with Gilda's in-memory terms index, top-1
match per mention (grounding_genes.py:32-44).  The north-star scales this
as an explicit stage: mentions → block key → candidate set → embedding
cosine scoring → best entity.  Shapes:

- the knowledge base (entities with surface forms) is dimension-sized:
  broadcast once via ``ray.put``; each actor builds its block index and
  embeds the candidate names once in ``__init__``;
- blocking keys keep candidate sets small (here: normalized first-2-chars
  plus a length band; production: minhash band or alias table) so scoring
  is a tiny matmul per mention, never a cross join;
- the embedder is deterministic (hashed character n-grams → unit vector),
  standing in for a text-embedding model with the same actor contract.

Output: (doc_id, span_seq, mention, db, id, entry_name, score) with score
= cosine in [0,1]; mentions under ``min_score`` are left unlinked (null
entity fields) rather than dropped — the quarantine-not-abort policy.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..vocab import ENTITIES, Entity

EMBED_DIM = 64


def _ngrams(s: str, n: int = 3) -> List[str]:
    s = f"^{s.lower()}$"
    if len(s) < n:
        return [s]
    return [s[i : i + n] for i in range(len(s) - n + 1)]


def embed_text(s: str, dim: int = EMBED_DIM) -> np.ndarray:
    """Deterministic hashed char-n-gram embedding, L2-normalized."""
    import zlib

    v = np.zeros(dim, dtype=np.float64)
    for g in _ngrams(s):
        h = zlib.crc32(g.encode())
        v[h % dim] += 1.0 if (h >> 16) & 1 else -1.0
    n = np.linalg.norm(v)
    return v / n if n else v


def _normalize(s: str) -> str:
    return "".join(c for c in s.lower() if c.isalnum())


def block_keys(s: str) -> List[str]:
    """Blocking keys for a surface form: normalized 2-char prefix, with a
    coarse length band to split giant prefixes."""
    n = _normalize(s)
    if not n:
        return ["_"]
    return [f"{n[:2]}|{min(len(n) // 4, 4)}"]


class EntityLinker:
    """Actor-pool stage: mention rows → linked entity rows."""

    def __init__(
        self,
        kb_ref=None,
        entities: Optional[Sequence[Entity]] = None,
        min_score: float = 0.6,
    ):
        if kb_ref is not None:
            entities = ray.get(kb_ref)
        if entities is None:
            entities = ENTITIES
        self.min_score = min_score
        # per-actor index build: block key → (matrix of candidate
        # embeddings, candidate entities)
        buckets: Dict[str, List[Entity]] = {}
        for e in entities:
            for k in block_keys(e.entry_name):
                buckets.setdefault(k, []).append(e)
        self._index: Dict[str, Tuple[np.ndarray, List[Entity]]] = {}
        for k, ents in buckets.items():
            m = np.stack([embed_text(e.entry_name) for e in ents])
            self._index[k] = (m, ents)

    def link_one(self, mention: str) -> Tuple[Optional[Entity], float]:
        best: Tuple[Optional[Entity], float] = (None, 0.0)
        v = embed_text(mention)
        for k in block_keys(mention):
            hit = self._index.get(k)
            if hit is None:
                continue
            m, ents = hit
            scores = m @ v
            i = int(np.argmax(scores))
            if scores[i] > best[1]:
                best = (ents[i], float(scores[i]))
        ent, score = best
        if ent is None or score < self.min_score:
            return None, score
        return ent, score

    def __call__(self, batch: pa.Table) -> pa.Table:
        mentions = batch.column("mention").to_pylist()
        dbs, ids, names, scores = [], [], [], []
        for m in mentions:
            ent, score = self.link_one(m or "")
            dbs.append(ent.db if ent else None)
            ids.append(ent.id if ent else None)
            names.append(ent.entry_name if ent else None)
            scores.append(round(score, 6))
        return (
            batch.append_column("db", pa.array(dbs, pa.string()))
            .append_column("id", pa.array(ids, pa.string()))
            .append_column("entry_name", pa.array(names, pa.string()))
            .append_column("score", pa.array(scores, pa.float64()))
        )


def link_mentions(
    mentions: "ray.data.Dataset",
    entities: Optional[Sequence[Entity]] = None,
    min_score: float = 0.6,
    concurrency=(1, 8),
) -> "ray.data.Dataset":
    """Distributed linking: the KB is put in the object store once; each
    actor fetches it and builds its block index in __init__."""
    ref = ray.put(list(entities if entities is not None else ENTITIES))
    return mentions.map_batches(
        EntityLinker,
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
        fn_constructor_kwargs={"kb_ref": ref, "min_score": min_score},
    )
