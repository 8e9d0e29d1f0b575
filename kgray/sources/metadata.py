"""Document metadata: validation, synthesized dimension table, batched id
lookup, and graph naming.

Reference surface being re-expressed:
- M1  ``validate_pmc_id`` (main.py:25-28): regex ^PMC\\d+$ — but instead of
  ``sys.exit`` on the first bad id, invalid rows are QUARANTINED to a
  side table and the pipeline continues (SURVEY §4 error-containment).
- S5  ``fetch_metadata_via_eutils`` (pub.py:69-211): an external HTTP
  lookup of (pmid, title, authors, abstract, doi, journal).  No network in
  this sandbox → a deterministic synthesized metadata dimension table with
  the same schema, broadcast-joined to documents.
- S9  ``get_pmcid_from_pmid`` (utilities/get_pmcid.py): batch-50 id
  mapping with rate limiting — here a batched broadcast-dimension lookup
  stage; throughput governance belongs to actor-pool sizing, not sleeps.
- M13 network naming (main.py:85-98, 165-183): "{FirstAuthor} et al.: "
  title/pmid, with custom-name and timestamp fallbacks.
"""
from __future__ import annotations

import re
from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

PMC_ID_RE = re.compile(r"^PMC\d+$")

_SURNAMES = ["Smith", "Chen", "Garcia", "Okafor", "Müller", "Tanaka",
             "Kumar", "Rossi", "Novak", "Silva"]
_JOURNALS = ["J Synth Biol", "Mol Pathways", "Cell Signals",
             "BioData Methods", "Proc Graph Biol"]


def split_valid_documents(documents: "ray.data.Dataset"):
    """(valid, quarantined) by the reference's ^PMC\\d+$ doc-id rule."""

    def valid(batch: pa.Table) -> pa.Table:
        mask = pc.match_substring_regex(batch.column("doc_id"), r"^PMC\d+$")
        return batch.filter(mask)

    def invalid(batch: pa.Table) -> pa.Table:
        mask = pc.match_substring_regex(batch.column("doc_id"), r"^PMC\d+$")
        bad = batch.filter(pc.invert(mask))
        return pa.table(
            {
                "doc_id": bad.column("doc_id"),
                "reason": pa.array(
                    ["invalid doc_id format"] * bad.num_rows, pa.string()
                ),
            }
        )

    return (
        documents.map_batches(valid, batch_format="pyarrow"),
        documents.map_batches(invalid, batch_format="pyarrow"),
    )


def synth_metadata(batch: pa.Table) -> pa.Table:
    """Deterministic metadata dimension rows for doc_ids (S5 schema)."""
    import zlib

    ids = batch.column("doc_id").to_pylist()
    rows = {
        "doc_id": [], "pmid": [], "title": [], "first_author": [],
        "abstract": [], "doi": [], "journal": [],
    }
    for d in ids:
        h = zlib.crc32(d.encode())
        rows["doc_id"].append(d)
        rows["pmid"].append(str(10_000_000 + h % 9_000_000))
        rows["title"].append(f"Pathway analysis study {h % 1000}")
        rows["first_author"].append(_SURNAMES[h % len(_SURNAMES)])
        rows["abstract"].append(f"Abstract of synthetic study {h % 1000}.")
        rows["doi"].append(f"10.5555/synth.{h % 100000}")
        rows["journal"].append(_JOURNALS[h % len(_JOURNALS)])
    return pa.table({k: pa.array(v, pa.string()) for k, v in rows.items()})


def network_name(
    first_author: Optional[str],
    pmid: Optional[str],
    custom_name: Optional[str] = None,
    fallback_timestamp: str = "00000000_0000",
) -> str:
    """main.py:85-98/165-183 naming rule: author et al.: pmid, then custom
    name, then a timestamp-shaped fallback (injected, not wall clock — the
    engine stays deterministic)."""
    if first_author and pmid:
        return f"{first_author} et al.: {pmid}"
    if custom_name:
        return custom_name
    return fallback_timestamp


def name_graphs(
    graph_summaries: "ray.data.Dataset",
    custom_name: Optional[str] = None,
    fallback_timestamp: str = "00000000_0000",
) -> "ray.data.Dataset":
    """Attach (pmid, journal, network_name) to per-document graph rows via
    the synthesized metadata (broadcast-shaped: metadata is computed
    per-batch from doc_id — a real external dimension table would be
    ``ray.put`` + per-batch join, same shape as revenue_by_nation)."""

    def add(batch: pa.Table) -> pa.Table:
        meta = synth_metadata(batch.select(["doc_id"]))
        names = [
            network_name(a, p, custom_name, fallback_timestamp)
            for a, p in zip(
                meta.column("first_author").to_pylist(),
                meta.column("pmid").to_pylist(),
            )
        ]
        return (
            batch.append_column("pmid", meta.column("pmid"))
            .append_column("journal", meta.column("journal"))
            .append_column("network_name", pa.array(names, pa.string()))
        )

    return graph_summaries.map_batches(add, batch_format="pyarrow")


class IdMapLookup:
    """Batched id-mapping stage (S9 shape): maps an id column through a
    broadcast dimension dict; unmapped ids → null (the reference records
    None for PMIDs without PMCIDs, get_pmcid.py:44-52)."""

    def __init__(self, mapping_ref, src_col: str, dst_col: str):
        self.mapping = ray.get(mapping_ref)
        self.src = src_col
        self.dst = dst_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = [self.mapping.get(v) for v in batch.column(self.src).to_pylist()]
        return batch.append_column(self.dst, pa.array(vals, pa.string()))


def map_ids(
    ds: "ray.data.Dataset",
    mapping: dict,
    src_col: str,
    dst_col: str,
    batch_size: int = 50,
) -> "ray.data.Dataset":
    ref = ray.put(mapping)
    return ds.map_batches(
        IdMapLookup,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 4),
        fn_constructor_args=(ref, src_col, dst_col),
    )
