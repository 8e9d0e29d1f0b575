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

import pyarrow as pa
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
    # first-seen (entry_name, url) aggregate — a DATASET: the production
    # node-URL attach is an entry_name-keyed join (stages/nodes.attach_urls),
    # never a driver-side dict (r3 verdict: the dict grew with the entity
    # vocabulary at web scale)
    annotation_url_agg: "ray.data.Dataset"

    # Hard bound on the export-only url_map collection: a grounded-entity
    # vocabulary past this is no longer a "small dict" and the caller
    # should consume annotation_url_agg as a Dataset instead.
    URL_MAP_MAX_ROWS = 1_000_000

    @property
    def url_map(self) -> Dict[str, str]:
        """Collected entry_name → URL dict, for EXPORT-path consumers only
        (tests, notebook-style inspection).  Deliberately lazy: nothing in
        the table-producing pipeline calls this.  GUARDED: raises
        ValueError when the vocabulary exceeds ``URL_MAP_MAX_ROWS`` so the
        one driver-side collection a production result object exposes can
        never silently scale with the corpus — consume
        ``annotation_url_agg`` (a Dataset) for anything bigger."""
        cached = getattr(self, "_url_map_cache", None)
        if cached is None:
            agg = self.annotation_url_agg.materialize()
            n = agg.count()
            if n > self.URL_MAP_MAX_ROWS:
                raise ValueError(
                    f"url_map would collect {n} rows (> "
                    f"{self.URL_MAP_MAX_ROWS}); use the "
                    "annotation_url_agg Dataset instead"
                )
            cached = {
                r["entry_name"]: r["url"] for r in agg.take_all()
            }
            object.__setattr__(self, "_url_map_cache", cached)
        return cached


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
    nodes, url_agg = node_tables(edges, unary, ann_urls)
    return KGResult(
        chunks=None,
        extractions=extractions,
        edges=edges,
        unary_nodes=unary,
        annotation_urls=ann_urls,
        nodes=nodes,
        annotation_url_agg=url_agg,
    )


def run_kg_pipeline(
    documents: "ray.data.Dataset", cfg: Optional[KGConfig] = None
) -> KGResult:
    extractions = run_extractions(documents, cfg)
    return run_graph_stages(extractions)


def incremental_update(
    existing_nodes: "ray.data.Dataset",
    new_docs: "ray.data.Dataset",
    cfg: Optional[KGConfig] = None,
) -> KGResult:
    """Merge a NEW document shard into an existing graph WITHOUT
    re-invoking the LLM on old documents and WITHOUT renumbering: every
    existing node keeps its node_id verbatim; only surface forms never
    seen before get fresh dense ids after the existing maximum — the
    id-stability contract that lets daily ingest append to node/edge
    tables other systems already reference.

    Plan: the new shard runs the normal extraction prefix; its canonical
    mention names ANTI-join the existing node names (utils.smart_join —
    the node table is the compact entity vocabulary, broadcast when
    small, shuffled when not), the survivors take ids
    ``max(existing)+1 …`` in first-seen order, and the returned
    ``nodes`` is existing ∪ new.  Edges/extractions in the result are
    the NEW shard's only — the caller appends them to its stores.
    """
    from ..stages.nodes import (
        attach_urls,
        build_url_agg,
        edge_node_mentions,
        unary_node_mentions,
    )
    from ..functions.bel import term_label, term_type
    from ..utils import coarse_grouped_map, smart_join, zip_with_index

    extractions = run_extractions(new_docs, cfg).materialize()
    edges = extractions.map_batches(
        edge_stage.extractions_to_edges, batch_format="pyarrow"
    ).materialize()
    unary = extractions.map_batches(
        edge_stage.extractions_to_unary_nodes, batch_format="pyarrow"
    )
    ann_urls = extractions.map_batches(
        edge_stage.extractions_to_annotation_urls, batch_format="pyarrow"
    )
    # materialize: vocabulary-sized; feeds the attach_urls join and the
    # result field without re-running the extraction prefix per consumer
    url_agg = build_url_agg(ann_urls).materialize()

    mentions = edges.map_batches(
        edge_node_mentions, batch_format="pyarrow"
    ).union(unary.map_batches(unary_node_mentions, batch_format="pyarrow"))
    canonical = coarse_grouped_map(
        mentions.repartition(8),
        "name",
        lambda df: df.groupby("name", as_index=False).agg(
            first_key=("first_key", "min")
        ),
        num_partitions=8,
        coalesce_blocks=None,
    )

    existing_nodes = existing_nodes.materialize()
    fresh = smart_join(
        canonical,
        existing_nodes.select_columns(["name"]),
        "name",
        "name",
        {"name": pa.string(), "first_key": pa.string()},
        {"name": pa.string()},
        how="anti",
    ).repartition(4).sort("first_key")

    n_existing = existing_nodes.count()
    next_id = (
        (existing_nodes.max("node_id") + 1) if n_existing else 0
    )
    with_ids = zip_with_index(fresh, "node_id", offset=int(next_id))

    def add_label_type(batch: pa.Table) -> pa.Table:
        names = batch.column("name").to_pylist()
        return pa.table(
            {
                "name": batch.column("name"),
                "label": pa.array(
                    [term_label(n) for n in names], pa.string()
                ),
                "type": pa.array(
                    [term_type(n) for n in names], pa.string()
                ),
                "node_id": batch.column("node_id"),
            }
        )

    from ..utils import schema_floor
    from .. import schemas

    new_nodes = schema_floor(
        attach_urls(
            with_ids.map_batches(add_label_type, batch_format="pyarrow"),
            url_agg,
        ),
        schemas.NODES,
    )
    merged = existing_nodes.union(new_nodes)

    return KGResult(
        chunks=None,
        extractions=extractions,
        edges=edges,
        unary_nodes=unary,
        annotation_urls=ann_urls,
        nodes=merged,
        annotation_url_agg=url_agg,
    )
