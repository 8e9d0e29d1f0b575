"""The flagship KG-construction pipeline, end-to-end on Ray Data.

documents (doc_id, spans)                       # read_parquet / read_lance
  → map_batches(explode_spans)                  # all spans kept, admission flag
  → map_batches(DictionaryAnnotator, pool)      # + annotations   [stateful]
  → map_batches(BELExtractor, pool)             # + results       [stateful]
  → ├─ map_batches(extractions_to_edges)        # edges table
  │  ├─ map_batches(extractions_to_unary_nodes) # node-only records
  │  └─ map_batches(extractions_to_annotation_urls)
  → groupby(name) canonicalization (combiner-first shuffle) → nodes table

Mirrors reference lifecycle main.py:31-118 (§3.2 of SURVEY.md) as a
streaming DAG; per-stage checkpointing lives in pipelines/checkpoint.py.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

import ray
import ray.data

from ..stages import edges as edge_stage
from ..stages.annotate import DictionaryAnnotator
from ..stages.chunk import explode_spans
from ..stages.extract import BELExtractor
from ..stages.nodes import node_tables


class AnnotateExtract:
    """Fused grounding + extraction actor (one pool, one IPC hop)."""

    def __init__(self, annotator_kwargs=None, backend="stub",
                 backend_kwargs=None):
        self._annotate = DictionaryAnnotator(**(annotator_kwargs or {}))
        self._extract = BELExtractor(
            backend=backend, **(backend_kwargs or {})
        )

    def __call__(self, batch):
        return self._extract(self._annotate(batch))


@dataclass
class KGConfig:
    """Stage knobs; defaults sized for a 32-CPU node and scaled by Ray's
    streaming executor across nodes (pool sizes are per-job, not per-node —
    on a real cluster raise annotate/extract concurrency to ~0.8×total cores)."""

    # Pool minimums stay at 1: Ray creates min actors eagerly and RESERVES
    # their CPUs before upstream stages have scheduled; a min that adds up to
    # the whole cluster deadlocks small nodes (observed with an upstream
    # repartition's split tasks starving behind 2+2 pinned actors on 4 CPUs).
    batch_size: int = 256          # paragraphs per extractor call
    annotate_concurrency: tuple = (1, 8)
    extract_concurrency: tuple = (1, 12)
    backend: object = "stub"       # name, or a backend instance
    backend_kwargs: Dict = field(default_factory=dict)
    annotator_kwargs: Dict = field(default_factory=dict)
    # One fused annotate+extract pool instead of two: halves per-batch IPC
    # through the object store and stops the two pools fragmenting a small
    # CPU budget.  Keep False when the two stages need different resources
    # (e.g. GPU extraction vs CPU grounding).
    fuse_annotate_extract: bool = False


@dataclass
class KGResult:
    chunks: "ray.data.Dataset"
    extractions: "ray.data.Dataset"
    edges: "ray.data.Dataset"
    unary_nodes: "ray.data.Dataset"
    annotation_urls: "ray.data.Dataset"
    nodes: "ray.data.Dataset"
    url_map: Dict[str, str]


def run_extractions(
    documents: "ray.data.Dataset", cfg: Optional[KGConfig] = None
) -> "ray.data.Dataset":
    """documents → EXTRACTIONS dataset (the LLM-bearing prefix)."""
    cfg = cfg or KGConfig()
    chunks = documents.map_batches(explode_spans, batch_format="pyarrow")
    if cfg.fuse_annotate_extract:
        return chunks.map_batches(
            AnnotateExtract,
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            concurrency=cfg.extract_concurrency,
            num_cpus=1,
            fn_constructor_kwargs={
                "annotator_kwargs": cfg.annotator_kwargs,
                "backend": cfg.backend,
                "backend_kwargs": cfg.backend_kwargs,
            },
        )
    annotated = chunks.map_batches(
        DictionaryAnnotator,
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=cfg.annotate_concurrency,
        num_cpus=1,
        fn_constructor_kwargs=cfg.annotator_kwargs,
    )
    return annotated.map_batches(
        BELExtractor,
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=cfg.extract_concurrency,
        num_cpus=1,
        fn_constructor_kwargs={"backend": cfg.backend, **cfg.backend_kwargs},
    )


def run_graph_stages(
    extractions: "ray.data.Dataset", materialize: bool = True
) -> KGResult:
    """EXTRACTIONS → edges / unary / annotation_urls / canonical nodes.

    ``extractions`` fans out to four consumers; Ray Data re-executes a lazy
    lineage per consumer, which would re-invoke the (expensive) extraction
    actors 4×.  We pin the LLM output once (``materialize``) — it is orders
    of magnitude smaller than the input corpus, and in the checkpointed
    production path (pipelines/checkpoint.py) this is a parquet round-trip
    instead, so the LLM is never re-invoked either way.
    """
    if materialize:
        extractions = extractions.materialize()
    edges = extractions.map_batches(
        edge_stage.extractions_to_edges, batch_format="pyarrow"
    )
    unary = extractions.map_batches(
        edge_stage.extractions_to_unary_nodes, batch_format="pyarrow"
    )
    ann_urls = extractions.map_batches(
        edge_stage.extractions_to_annotation_urls, batch_format="pyarrow"
    )
    if materialize:
        # edges feeds ≥2 consumers (canonicalization + the user's sink);
        # pinning it avoids re-running the BEL parse per consumer.  unary /
        # ann_urls are each consumed exactly once downstream — they stream
        # (an extra materialize barrier each was pure overhead).
        edges = edges.materialize()
    nodes, url_map = node_tables(edges, unary, ann_urls)
    return KGResult(
        chunks=None,
        extractions=extractions,
        edges=edges,
        unary_nodes=unary,
        annotation_urls=ann_urls,
        nodes=nodes,
        url_map=url_map,
    )


def run_kg_pipeline(
    documents: "ray.data.Dataset", cfg: Optional[KGConfig] = None
) -> KGResult:
    extractions = run_extractions(documents, cfg)
    return run_graph_stages(extractions)
