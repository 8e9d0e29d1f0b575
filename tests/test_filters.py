"""Semantics tests for stages/filters (duplicated-n-gram statistics,
Gopher-style quality filter, deterministic importance sampling).

Exact end-to-end parity vs DuckDB is covered by the oracles in
__ray_entry__ (scripts/check_oracle.py); these pin the kernel contracts
on sf0.001 plus controlled synthetic corpora.
"""
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

SF = "/root/testdata/sf0.001"


def _handroll_ngram_stats(docs: pd.DataFrame, n: int = 5) -> pd.DataFrame:
    per_doc_grams = {}
    gram_docs = {}
    for _, r in docs.iterrows():
        toks = r.text.split(" ")
        grams = [
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        ]
        per_doc_grams[r.doc_id] = grams
        for g in set(grams):
            gram_docs.setdefault(g, set()).add(r.doc_id)
    rows = []
    for doc_id, grams in per_doc_grams.items():
        if not grams:
            continue
        dup = sum(1 for g in grams if len(gram_docs[g]) >= 2)
        rows.append(
            {
                "doc_id": doc_id,
                "n_ngrams": len(grams),
                "dup_ngrams": dup,
                "dup_frac": dup / len(grams),
            }
        )
    return pd.DataFrame(rows).sort_values("doc_id").reset_index(drop=True)


def test_duplicate_ngram_stats_matches_handrolled():
    from kgray.stages.filters import duplicate_ngram_stats

    out = (
        duplicate_ngram_stats(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    docs = pd.read_parquet(SF + "/documents.parquet",
                           columns=["doc_id", "text"])
    exp = _handroll_ngram_stats(docs)
    pd.testing.assert_frame_equal(
        out.astype(exp.dtypes.to_dict()), exp, check_like=True
    )


def test_duplicate_ngram_stats_planted_full_dup(tmp_path):
    from kgray.stages.filters import duplicate_ngram_stats

    # doc 1 and 2 are identical -> every position duplicated; doc 3 is
    # disjoint -> zero. Repeated gram inside doc 3 alone stays non-dup
    # (the rule is >=2 DISTINCT docs, with-multiplicity counting).
    texts = {
        1: "alpha beta gamma delta epsilon zeta eta",
        2: "alpha beta gamma delta epsilon zeta eta",
        3: "one two three four five one two three four five",
    }
    df = pd.DataFrame(
        {"doc_id": list(texts), "text": list(texts.values())}
    )
    p = tmp_path / "documents.parquet"
    pq.write_table(pa.Table.from_pandas(df), p)
    out = (
        duplicate_ngram_stats(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .set_index("doc_id")
    )
    assert out.loc[1, "dup_frac"] == 1.0 and out.loc[2, "dup_frac"] == 1.0
    assert out.loc[3, "dup_ngrams"] == 0
    assert out.loc[3, "n_ngrams"] == 6  # 10 tokens, n=5
    assert out.loc[1, "n_ngrams"] == 3


def test_quality_filter_flags_match_handrolled():
    from kgray.stages.filters import quality_filter

    out = (
        quality_filter(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    docs = pd.read_parquet(SF + "/documents.parquet",
                           columns=["doc_id", "text"])
    for _, r in docs.head(20).iterrows():
        toks = r.text.split(" ")
        n = len(toks)
        mwl = sum(len(t) for t in toks) / n
        dfrac = len(set(toks)) / n
        hits = sum(1 for t in toks if t in ("the", "a"))
        row = out[out.doc_id == r.doc_id].iloc[0]
        assert row.n_words == n
        assert row.mean_word_len == mwl
        assert row.distinct_frac == dfrac
        assert row.stopword_hits == hits
        assert row.keep == (
            15 <= n <= 90
            and 3.0 <= mwl <= 4.5
            and dfrac >= 0.35
            and hits >= 1
        )
    # the filter must be selective but not degenerate on real data
    assert 0.0 < out.keep.mean() < 1.0


def test_importance_sample_membership_and_stability():
    from kgray.stages.filters import SAMPLE_MULT, importance_sample

    out = importance_sample(SF).to_pandas()
    docs = pd.read_parquet(SF + "/documents.parquet",
                           columns=["doc_id", "text"])
    nd = {
        r.doc_id: len(set(r.text.split(" "))) for _, r in docs.iterrows()
    }
    kept = set(out.doc_id)
    for doc_id, d in nd.items():
        score = min(1.0, d / 48.0)
        h = float(
            (np.uint64(doc_id) * np.uint64(SAMPLE_MULT)).astype(np.uint64)
        )
        assert (doc_id in kept) == (h < score * 2.0 ** 64)
    # richer docs are kept at a higher rate than poorer docs
    scores = out.set_index("doc_id").score
    assert (scores > 0).all() and len(out) < len(docs)
