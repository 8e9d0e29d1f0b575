"""Mention-detection (grounding) actor stage.

Reference contract: grounding_genes.py:13-52 — per paragraph, run the Gilda
grounder over the text and keep the top-1 match ``(db, id, entry_name)`` per
detected mention, in order of appearance.  Gilda holds a large in-memory
terms index loaded once per process; here that maps to a **callable-class
actor pool**: the index (a compiled longest-first alternation over the
planted vocabulary — the sandbox stand-in; a real Gilda backend plugs in via
the same interface) is built once in ``__init__`` and reused per batch via
``map_batches(DictionaryAnnotator, concurrency=N)``.

Output schema: ANNOTATED_CHUNKS (chunks + annotations list<struct>).
Non-admitted spans get an empty annotation list and pass through untouched.
"""
from __future__ import annotations

from typing import List, Optional

import pyarrow as pa

from .. import schemas
from ..vocab import ENTITY_BY_NAME, MENTION_RE


class DictionaryAnnotator:
    """Deterministic dictionary grounder with Gilda-shaped output.

    ``vocab`` replaces the default biomedical vocabulary entirely (a dict of
    surface form → Entity); ``extra_vocab`` merges into it.  The alternation
    regex is rebuilt in ``__init__`` — once per actor, never per batch.
    """

    def __init__(self, extra_vocab: Optional[dict] = None,
                 vocab: Optional[dict] = None,
                 drop_dbs: Optional[set] = None):
        import re

        # drop_dbs: optional namespace filter, e.g. {"MESH", "MESHD"} — the
        # reference's eval variants drop MESH groundings
        # (llm_tests/test_pipeline.py:123); the production path keeps them,
        # so the default here is None.
        self._drop_dbs = set(drop_dbs) if drop_dbs else None
        # once per actor: "load the terms index"
        if vocab is not None:
            self._lookup = dict(vocab)
            names = sorted(self._lookup, key=len, reverse=True)
            self._re = re.compile(
                r"\b(" + "|".join(re.escape(n) for n in names) + r")\b"
            )
        else:
            self._re = MENTION_RE
            self._lookup = dict(ENTITY_BY_NAME)
        if extra_vocab:
            self._lookup.update(extra_vocab)

    def annotate_text(self, text: str) -> List[dict]:
        out = []
        for m in self._re.finditer(text):
            e = self._lookup[m.group(1)]
            if self._drop_dbs and e.db in self._drop_dbs:
                continue
            out.append({"db": e.db, "id": e.id, "entry_name": e.entry_name})
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        admitted = batch.column("admitted").to_pylist()
        anns = [
            self.annotate_text(t) if ok else []
            for t, ok in zip(texts, admitted)
        ]
        out = batch.append_column(
            "annotations", pa.array(anns, pa.list_(schemas.ANNOTATION_STRUCT))
        )
        return schemas.validate_schema(
            out, schemas.ANNOTATED_CHUNKS, "annotate"
        )
