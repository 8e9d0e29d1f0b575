"""End-to-end corpus curation: the composite a training-data pipeline
actually runs over raw documents before anything touches a model.

    documents (doc_id, text, lang)
      → admission filter     (declared language + token-count band,
                              vectorized Arrow kernels — map-side prune)
      → exact dedup          (keep min doc_id per identical text,
                              combiner + coarse keyed reduce)
      → near-dup keep-one    (MinHash-LSH pairs over the survivors,
                              connected components, keep component reps)
      → (doc_id, n_tokens)   per surviving document

Each constituent is its own first-class operator elsewhere
(stages/text_analysis, stages/dedup); this module is the composition, with
one extra property the pieces alone don't test: every stage consumes the
previous stage's SURVIVORS, so the near-dup graph is built over the
deduplicated, admitted corpus only — at 100 TB that ordering is the
difference between shingling the whole crawl and shingling the fraction
that passed admission.

Scale notes: admission is a pure map (prunes before any shuffle); exact
dedup and the LSH stages shuffle only survivor rows; the component map is
pair-bounded (stages/dedup.pair_components).  Filter thresholds mirror the
DuckDB oracle in __ray_entry__ expression-for-expression.
"""
from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..stages.dedup import (
    exact_dedup,
    jaccard_pairs_exact,
    minhash_lsh_pairs,
    pair_components,
)
from ..stages.text_analysis import _TOKEN_RE


SPLIT_MULT = 11400714819323198485  # odd 64-bit golden-ratio multiplier


def split_threshold(val_frac: float) -> int:
    """The uint64 cut point for ``val_frac`` (one shared constant so the
    engine and any SQL replica compare against the same integer)."""
    return min(int(val_frac * 2 ** 64), 2 ** 64 - 1)


def train_val_split(
    sf_dir: str, val_frac: float = 0.1
) -> "ray.data.Dataset":
    """Deterministic train/validation assignment per document: a pure
    map over hash(doc_id) — no shuffle, no randomness, no state.

    split = 'val' iff (doc_id * SPLIT_MULT mod 2^64) < val_frac·2^64.
    Multiplicative hashing makes the assignment (a) stable — a document
    keeps its split when the corpus grows, the property a training
    pipeline needs so checkpointed eval sets never leak into train —
    and (b) reproducible from the id alone on any engine (the identical
    arithmetic runs as HUGEINT math in the SQL oracle)."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )
    thr = np.uint64(split_threshold(val_frac))

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            h = ids.astype(np.uint64) * np.uint64(SPLIT_MULT)
        split = np.where(h < thr, "val", "train")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "split": pa.array(split, pa.string()),
            }
        )

    return docs.map_batches(assign, batch_format="pyarrow")


def curate_corpus(
    sf_dir: str,
    lang: str = "en",
    min_tokens: int = 25,
    max_tokens: int = 95,
    near_dup_threshold: float = 0.5,
    pair_method: str = "lsh",
) -> "ray.data.Dataset":
    """documents.parquet → (doc_id, n_tokens) of curated survivors.

    ``pair_method``: "lsh" (MinHash-LSH, the 100-TB path) or "exact"
    (inverted-index Jaccard join — recall 1.0, faster at small scale,
    quadratic-prone on stop-shingle-heavy corpora).  Both verify pairs
    with the same exact word-3-gram Jaccard, so on corpora where LSH
    recall is ~1 (high thresholds) the outputs coincide."""
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )

    def admit(batch: pa.Table) -> pa.Table:
        n_tok = pc.cast(
            pc.count_substring_regex(batch.column("text"), _TOKEN_RE),
            pa.int64(),
        )
        keep = pc.and_(
            pc.equal(batch.column("lang"), lang),
            pc.and_(
                pc.greater_equal(n_tok, min_tokens),
                pc.less_equal(n_tok, max_tokens),
            ),
        )
        return batch.append_column("n_tokens", n_tok).filter(keep)

    admitted = docs.map_batches(admit, batch_format="pyarrow")

    # exact dedup keeps (doc_id, text); survivors re-enter the LSH stage.
    # Pin the survivors ONCE: they feed three consumers (the signature
    # branch and the text branch inside minhash_lsh_pairs, plus the final
    # rep filter), and Ray re-executes a lazy lineage per consumer — that
    # re-runs the dedup shuffle 3× (measured 9× end-to-end slowdown).
    # The pinned set lives in the object store (spills to disk); the
    # checkpointed production path (pipelines/checkpoint.py) would make
    # this a parquet round-trip instead.
    deduped = exact_dedup(
        admitted.select_columns(["doc_id", "text"])
    ).materialize()
    if pair_method == "exact":
        pairs = jaccard_pairs_exact(deduped, threshold=near_dup_threshold)
    elif pair_method == "lsh":
        pairs = minhash_lsh_pairs(deduped, threshold=near_dup_threshold)
    else:
        raise ValueError(f"unknown pair_method: {pair_method!r}")
    rep = pair_components(pairs)
    rep_ref = ray.put(rep)

    def keep_reps(batch: pa.Table) -> pa.Table:
        m = ray.get(rep_ref)
        ids = batch.column("doc_id").to_pylist()
        keep = pa.array([m.get(i, i) == i for i in ids], pa.bool_())
        out = batch.filter(keep)
        n_tok = pc.cast(
            pc.count_substring_regex(out.column("text"), _TOKEN_RE),
            pa.int64(),
        )
        return pa.table(
            {"doc_id": out.column("doc_id"), "n_tokens": n_tok}
        )

    return deduped.map_batches(keep_reps, batch_format="pyarrow")


QUOTA_MULT = 2654435761  # Knuth multiplicative constant (fits int64 math)


def quota_sample(
    sf_dir: str, per_source: int = 5
) -> "ray.data.Dataset":
    """Deterministic per-source quota sampling: keep at most
    ``per_source`` documents of each source, chosen by the smallest
    (hash, doc_id) — the per-domain cap a crawl-curation pipeline applies
    so no single site dominates the training mix.

    The order key is pure integer arithmetic ((doc_id·QUOTA_MULT) mod
    2³²) so a SQL replica ranks identically — no RNG, rerun-stable.
    Combiner-first top-k: every block keeps its own best ``per_source``
    rows per source before the source-keyed shuffle, so the all-to-all
    moves ≤ per_source·sources rows per block regardless of corpus size;
    the final coarse pass ranks whole sources vectorized.  Output:
    (source, rnk, doc_id).
    """
    import pandas as pd

    from ..utils import coarse_grouped_map

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source"],
    )

    def add_hash_and_prune(batch: pa.Table) -> pa.Table:
        h = pc.subtract(
            pc.multiply(batch.column("doc_id"), QUOTA_MULT),
            pc.multiply(
                pc.divide(
                    pc.multiply(batch.column("doc_id"), QUOTA_MULT),
                    2 ** 32,
                ),
                2 ** 32,
            ),
        )
        df = batch.append_column("h", h).to_pandas()
        df = df.sort_values(["source", "h", "doc_id"]).groupby(
            "source", sort=False
        ).head(per_source)
        return pa.Table.from_pandas(df, preserve_index=False)

    def final_rank(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["source", "h", "doc_id"])
        df = df.groupby("source", sort=False).head(per_source).copy()
        df["rnk"] = df.groupby("source", sort=False).cumcount() + 1
        return df[["source", "rnk", "doc_id"]]

    return coarse_grouped_map(
        docs.map_batches(add_hash_and_prune, batch_format="pyarrow"),
        "source",
        final_rank,
        num_partitions=8,
    )


def quality_percentile_filter(
    sf_dir: str, pct: float = 0.9
) -> "ray.data.Dataset":
    """Keep the documents at or above the ``pct`` length percentile:
    threshold t = min n_chars whose cumulative count ≥ ceil(pct·N)
    (ties at t all kept — deterministic, no interpolation ambiguity).

    Two passes, both scale-shaped: (1) a value-counts aggregate —
    combiner-first count per distinct n_chars, tiny because the score's
    CARDINALITY (distinct lengths), not the corpus, bounds it — collected
    to the driver to pick t; (2) a broadcast threshold filter, pure map.
    For unbounded-cardinality scores substitute the mergeable histogram
    sketch (stages/corpus_stats) in pass 1; everything else is unchanged.
    Output: (doc_id, n_chars).
    """
    import math

    from ..utils import coarse_grouped_map

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "n_chars"],
    )

    def partial_counts(batch: pa.Table) -> pa.Table:
        return (
            pa.table({"n_chars": batch.column("n_chars")})
            .group_by("n_chars")
            .aggregate([([], "count_all")])
            .rename_columns(["n_chars", "c"])
        )

    counts = coarse_grouped_map(
        docs.map_batches(partial_counts, batch_format="pyarrow"),
        "n_chars",
        lambda df: df.groupby("n_chars", as_index=False).agg(c=("c", "sum")),
        num_partitions=8,
    ).to_pandas()
    counts = counts.sort_values("n_chars")
    n = int(counts.c.sum())
    need = math.ceil(pct * n)
    cum = counts.c.cumsum()
    t = int(counts.n_chars[cum >= need].iloc[0])

    return docs.filter(
        expr=f"n_chars >= {t}"
    )
