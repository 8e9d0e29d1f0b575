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


# ---------------------------------------------------------------------------
# E-utilities metadata XML parsing (pub.py:69-211), both dialects.
# The HTTP fetch itself is out of scope (no network); these kernels parse
# recorded efetch responses so a reference user can point the metadata
# dimension at their own cached XML instead of the synthesized table.
# ---------------------------------------------------------------------------

def _empty_metadata() -> dict:
    return {
        "pmid": None,
        "title": None,
        "authors": [],
        "abstract": None,
        "doi": None,
        "journal": None,
    }


def parse_pubmed_metadata_xml(content: str) -> dict:
    """PubMed efetch dialect (pub.py:126-166): PubmedArticle records."""
    import xml.etree.ElementTree as ET

    md = _empty_metadata()
    tree = ET.fromstring(content)
    art = tree.find(".//PubmedArticle")
    if art is None:
        return md
    pmid = art.find(".//PMID")
    if pmid is not None and pmid.text:
        md["pmid"] = f"pmid{pmid.text.strip()}"
    title = art.find(".//ArticleTitle")
    if title is not None and title.text:
        md["title"] = title.text.strip()
    for author in art.findall(".//AuthorList/Author"):
        last = author.findtext("LastName")
        fore = author.findtext("ForeName")
        if last or fore:
            md["authors"].append(" ".join([fore or "", last or ""]).strip())
    abstracts = art.findall(".//Abstract/AbstractText")
    if abstracts:
        combined = " ".join(e.text for e in abstracts if e.text)
        md["abstract"] = combined.strip() if combined else None
    doi = art.find(".//ArticleId[@IdType='doi']")
    if doi is not None and doi.text:
        md["doi"] = doi.text.strip()
    journal = art.find(".//Journal/Title")
    if journal is not None and journal.text:
        md["journal"] = journal.text.strip()
    return md


def parse_pmc_metadata_xml(content: str) -> dict:
    """PMC efetch dialect (pub.py:167-211): JATS <article> records."""
    import xml.etree.ElementTree as ET

    md = _empty_metadata()
    tree = ET.fromstring(content)
    art = tree if tree.tag == "article" else tree.find(".//article")
    if art is None:
        return md
    for aid in art.findall(".//article-id"):
        id_type = aid.get("pub-id-type")
        if id_type == "pmid" and aid.text:
            md["pmid"] = f"pmid{aid.text.strip()}"
        elif id_type == "doi":
            md["doi"] = aid.text.strip() if aid.text else None
    title = art.find(".//title-group/article-title")
    if title is not None and title.text:
        md["title"] = title.text.strip()
    for contrib in art.findall(
        './/contrib-group/contrib[@contrib-type="author"]'
    ):
        surname = contrib.findtext("name/surname")
        given = contrib.findtext("name/given-names")
        if surname or given:
            md["authors"].append(" ".join([given or "", surname or ""]).strip())
    abstract = art.find(".//abstract")
    if abstract is not None:
        paras = abstract.findall(".//p")
        if paras:
            combined = " ".join(p.text for p in paras if p.text)
            md["abstract"] = combined.strip() if combined else None
        elif abstract.text:
            md["abstract"] = abstract.text.strip()
    journal = art.find(".//journal-title")
    if journal is not None and journal.text:
        md["journal"] = journal.text.strip()
    return md


def parse_eutils_metadata(article_id: str, content: str) -> dict:
    """Dispatch on id shape exactly like pub.py:85-102: ids starting with
    'PMC' use the PMC/JATS dialect, bare digits use the PubMed dialect."""
    if article_id.upper().startswith("PMC"):
        return parse_pmc_metadata_xml(content)
    return parse_pubmed_metadata_xml(content)


class EutilsMetadataParser:
    """map_batches stage: (doc_id, xml) → metadata dimension rows with the
    synthesized-table schema (doc_id, pmid, title, authors, abstract, doi,
    journal) — slot recorded efetch XML in place of synth_metadata."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = [str(x) for x in batch.column("doc_id").to_pylist()]
        xmls = batch.column("xml").to_pylist()
        rows = [parse_eutils_metadata(i, x or "") for i, x in zip(ids, xmls)]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.string()),
                "pmid": pa.array([r["pmid"] for r in rows], pa.string()),
                "title": pa.array([r["title"] for r in rows], pa.string()),
                "authors": pa.array(
                    [r["authors"] for r in rows], pa.list_(pa.string())
                ),
                "abstract": pa.array(
                    [r["abstract"] for r in rows], pa.string()
                ),
                "doi": pa.array([r["doi"] for r in rows], pa.string()),
                "journal": pa.array([r["journal"] for r in rows], pa.string()),
            }
        )
