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
dedup and the LSH stages shuffle only survivor rows; components solve
through the auto-dispatched solver (stages/dedup.component_losers —
bounded driver union-find under COMPONENTS_DRIVER_MAX_PAIRS exact
pairs, distributed min-label propagation above it), and keep-one is an
anti repartition join against the pair-graph-bounded loser set.  Filter
thresholds mirror the DuckDB oracle in __ray_entry__
expression-for-expression.
"""
from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..stages.dedup import (
    component_losers,
    exact_dedup,
    jaccard_pairs_exact,
    minhash_lsh_pairs,
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

    # keep-one: drop the NON-representative component members via one
    # anti repartition join against the auto-dispatched component solve
    # (bounded union-find small / distributed LP large, r2 verdict #1)
    from ..utils import repartition_join

    survivors = repartition_join(
        deduped,
        component_losers(pairs),
        "doc_id",
        "doc_id",
        {"doc_id": pa.int64(), "text": pa.string()},
        {"doc_id": pa.int64()},
        num_partitions=8,
        how="anti",
    )

    def count_tokens(batch: pa.Table) -> pa.Table:
        if "doc_id" not in batch.schema.names or batch.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "n_tokens": pa.array([], pa.int64())}
            )
        n_tok = pc.cast(
            pc.count_substring_regex(
                batch.column("text").cast(pa.string()), _TOKEN_RE
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "n_tokens": n_tok,
            }
        )

    return survivors.map_batches(count_tokens, batch_format="pyarrow")


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


def pretrain_corpus(
    sf_dir: str,
    lang: str = "en",
    bench_mod: int = 97,
    near_dup_threshold: float = 0.5,
    min_words: int = 15,
    max_words: int = 90,
    min_mean_len: float = 3.0,
    max_mean_len: float = 4.5,
    min_distinct_frac: float = 0.35,
    min_stopword_hits: int = 1,
) -> "ray.data.Dataset":
    """The FULL pretraining-data curation chain in stage order, every
    stage consuming the previous stage's survivors:

        documents
          → Gopher-rule quality admission + language filter (pure map)
          → benchmark n-gram decontamination  (broadcast bench shingles,
            pure-map probe — eval suites are KBs against a 100 TB crawl)
          → exact dedup                        (min doc_id per text)
          → near-dup keep-one                  (MinHash-LSH pairs +
                                                components, keep reps)
          → (doc_id, n_tokens)

    vs ``curate_corpus``: adds the quality-signal admission and the
    decontamination pass — the two stages a real pretraining run cannot
    ship without — and keeps ONE exact recursive-CTE oracle over the
    whole composition, so the stage ORDERING (each filter shrinking the
    shuffle after it) is itself oracle-checked.  Gopher thresholds,
    shingle convention, and closure semantics mirror the standalone
    operators (stages/filters.quality_filter, corpus_stats.decontaminate,
    dedup) expression-for-expression.
    """
    import pandas as pd

    from ..stages.filters import STOPWORDS

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )
    stop = set(STOPWORDS)

    def admit(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().reset_index(drop=True)
        df = df[df.lang == lang]
        if df.empty:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "text": pa.array([], pa.string()),
                 "n_tokens": pa.array([], pa.int64())}
            )
        d = df.assign(token=df.text.str.split(" ")).explode("token")
        g = d.groupby("doc_id")
        n = g.token.size()
        nd = g.token.nunique()
        chars = d.assign(wl=d.token.str.len()).groupby("doc_id").wl.sum()
        hits = d[d.token.isin(stop)].groupby("doc_id").token.size()
        ids = df.doc_id
        n_ = n.reindex(ids, fill_value=0).to_numpy(np.int64)
        nd_ = nd.reindex(ids, fill_value=0).to_numpy(np.int64)
        ch_ = chars.reindex(ids, fill_value=0).to_numpy(np.int64)
        h_ = hits.reindex(ids, fill_value=0).to_numpy(np.int64)
        with np.errstate(invalid="ignore", divide="ignore"):
            mwl = np.where(n_ > 0, ch_ / n_, 0.0)
            dfrac = np.where(n_ > 0, nd_ / n_, 0.0)
        keep = (
            (n_ >= min_words) & (n_ <= max_words)
            & (mwl >= min_mean_len) & (mwl <= max_mean_len)
            & (dfrac >= min_distinct_frac)
            & (h_ >= min_stopword_hits)
        )
        out = df.loc[keep, ["doc_id", "text"]].copy()
        out["n_tokens"] = n_[keep]
        return pa.Table.from_pandas(out, preserve_index=False)

    admitted = docs.map_batches(admit, batch_format="pyarrow")

    # --- decontamination: bench shingles from the RAW corpus ------------
    def shingle_frame(df: "pd.DataFrame") -> "pd.DataFrame":
        d = df.assign(token=df.text.str.split(" ")).explode("token")
        nxt1 = d.groupby(level=0).token.shift(-1)
        nxt2 = d.groupby(level=0).token.shift(-2)
        ok = nxt2.notna()
        return pd.DataFrame(
            {
                "doc_id": d.doc_id[ok].to_numpy(np.int64),
                "shingle": d.token[ok] + " " + nxt1[ok] + " " + nxt2[ok],
            }
        )

    def bench_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().reset_index(drop=True)
        s = shingle_frame(df[df.doc_id % bench_mod == 0])
        return pa.table(
            {"shingle": pa.array(s.shingle.unique(), pa.string())}
        )

    bench_shingles = set(
        docs.map_batches(bench_partial, batch_format="pyarrow")
        .to_pandas()
        .shingle
    )
    bench_ref = ray.put(bench_shingles)

    def probe(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        df = batch.to_pandas().reset_index(drop=True)
        df = df[df.doc_id % bench_mod != 0]
        if df.empty:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "text": pa.array([], pa.string()),
                 "n_tokens": pa.array([], pa.int64())}
            )
        s = shingle_frame(df)
        hit = s.doc_id[s.shingle.isin(bench)].unique()
        out = df[~df.doc_id.isin(hit)]
        return pa.Table.from_pandas(out, preserve_index=False)

    clean = admitted.map_batches(probe, batch_format="pyarrow")

    # token counts survive on the side of the dedup (dedup keys on text,
    # and identical text ⇒ identical n_tokens, so re-counting after the
    # dedup would be redundant — carry the count through instead)
    deduped = exact_dedup(
        clean.select_columns(["doc_id", "text"])
    ).materialize()

    pairs = minhash_lsh_pairs(deduped, threshold=near_dup_threshold)

    # keep-one via the auto-dispatched component solve + anti join
    # (r2 verdict #1): bounded driver union-find on small pair graphs,
    # distributed LP above the constant bound; only the
    # pair-graph-bounded loser set crosses the join
    from ..utils import repartition_join

    survivors = repartition_join(
        deduped,
        component_losers(pairs),
        "doc_id",
        "doc_id",
        {"doc_id": pa.int64(), "text": pa.string()},
        {"doc_id": pa.int64()},
        num_partitions=8,
        how="anti",
    )

    def count_tokens(batch: "pd.DataFrame") -> pa.Table:
        if "doc_id" not in batch.columns or len(batch) == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "n_tokens": pa.array([], pa.int64())}
            )
        n_tok = batch.text.str.split(" ").str.len().to_numpy(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(batch.doc_id.to_numpy(np.int64)),
                "n_tokens": pa.array(n_tok),
            }
        )

    return survivors.map_batches(count_tokens, batch_format="pandas")
