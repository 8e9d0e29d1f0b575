"""Semantics tests for sliding-window chunks, user set operations, and
per-source percent-rank normalization.  Exact cross-engine parity is
covered by the DuckDB oracles in __ray_entry__."""
import numpy as np
import pandas as pd
import ray
import ray.data

SF = "/root/testdata/sf0.001"


def test_sliding_chunks_overlap_and_coverage():
    from kgray.stages.chunk import sliding_chunks

    docs = pd.read_parquet(SF + "/documents.parquet",
                           columns=["doc_id", "text"])
    out = sliding_chunks(
        ray.data.from_pandas(docs), window=20, stride=10
    ).to_pandas()
    r = docs.iloc[0]
    toks = r.text.split(" ")
    mine = out[out.doc_id == r.doc_id].sort_values("chunk_seq")
    exp = [" ".join(toks[s : s + 20]) for s in range(0, len(toks), 10)]
    assert mine.chunk.tolist() == exp
    assert mine.chunk_seq.tolist() == list(range(len(exp)))
    assert mine.n_tokens.tolist() == [
        min(20, len(toks) - s) for s in range(0, len(toks), 10)
    ]
    # consecutive windows overlap by window - stride tokens
    if len(exp) > 1 and mine.n_tokens.iloc[1] == 20:
        first = mine.chunk.iloc[0].split(" ")
        second = mine.chunk.iloc[1].split(" ")
        assert first[10:20] == second[0:10]


def test_user_event_sets_intersect_and_except():
    from kgray.pipelines.analytics import user_event_sets

    ev = pd.read_parquet(SF + "/events.parquet")
    viewers = set(ev.loc[ev.event_type == "view", "user_id"])
    buyers = set(ev.loc[ev.event_type == "purchase", "user_id"])
    big_buyers = set(
        ev.loc[(ev.event_type == "purchase") & (ev.value > 50.0),
               "user_id"]
    )
    def ids(ds):
        # Ray 2.49's to_pandas drops ALL columns for a fully-empty
        # dataset (even a typed block — utils.schema_floor docs); the
        # dataset-level schema stays correct, so read it guardedly.
        df = ds.to_pandas()
        return set(df["user_id"]) if len(df) else set()

    i_ds = user_event_sets(SF, "view", "purchase", mode="intersect")
    assert ids(i_ds) == (viewers & buyers)
    e_ds = user_event_sets(
        SF, "view", "purchase", mode="except", b_min_value=50.0
    )
    assert ids(e_ds) == (viewers - big_buyers)
    # the schema survives even when the set difference is empty
    assert "user_id" in e_ds.schema().names


def test_source_percent_rank_bounds_and_ties():
    from kgray.stages.corpus_stats import source_percent_rank

    out = source_percent_rank(SF).to_pandas()
    docs = pd.read_parquet(SF + "/documents.parquet",
                           columns=["doc_id", "source", "n_chars"])
    assert len(out) == len(docs)
    assert (out.pr >= 0.0).all() and (out.pr <= 1.0).all()
    for s, g in out.groupby("source"):
        raw = docs[docs.source == s]
        n = len(raw)
        r = raw.n_chars.rank(method="min")
        exp = ((r - 1.0) / (n - 1.0)) if n > 1 else r * 0.0
        exp_map = dict(zip(raw.doc_id, exp))
        for _, row in g.iterrows():
            assert row.pr == exp_map[row.doc_id]
        # min is always rank 0; max is 1 unless everything ties
        assert g.pr.min() == 0.0


def test_levenshtein_batch_matches_reference():
    from kgray.stages.cluster import levenshtein_batch

    def ref(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            new = [i]
            for j, cb in enumerate(b, 1):
                new.append(min(dp[j] + 1, new[j - 1] + 1,
                               dp[j - 1] + (ca != cb)))
            dp = new
        return dp[len(b)]

    pairs = [
        ("kitten", "sitting"), ("", ""), ("", "abc"), ("abc", ""),
        ("same", "same"), ("a", "b"), ("red widget", "red midget"),
        ("blue bolt", "blue bolts"), ("x", "xyz"), ("flaw", "lawn"),
    ]
    got = levenshtein_batch([p[0] for p in pairs], [p[1] for p in pairs])
    assert got.tolist() == [ref(a, b) for a, b in pairs]


def test_fuzzy_name_pairs_blocked_and_bounded():
    from kgray.stages.cluster import fuzzy_name_pairs

    df = pd.DataFrame(
        {
            "blk": ["x", "x", "x", "x", "y", "y"],
            "nm": ["gear", "gears", "bolt", "gear", "bolt", "bolts"],
        }
    )
    out = (
        fuzzy_name_pairs(ray.data.from_pandas(df), "blk", "nm",
                         max_dist=2)
        .to_pandas()
        .sort_values(["blk", "name_a"])
        .reset_index(drop=True)
    )
    # within x: gear~gears (1); bolt vs gear* too far; duplicate 'gear'
    # collapses. within y: bolt~bolts (1). never across blocks.
    assert list(
        zip(out.blk, out.name_a, out.name_b, out.dist)
    ) == [("x", "gear", "gears", 1), ("y", "bolt", "bolts", 1)]


def test_cohort_retention_triangle():
    from kgray.pipelines.analytics import cohort_retention

    out = cohort_retention(SF).to_pandas()
    ev = pd.read_parquet(SF + "/events.parquet",
                         columns=["user_id", "ts"])
    ev["day"] = ev.ts.dt.floor("D")
    first = ev.groupby("user_id").day.min().rename("cohort_day")
    j = ev.merge(first, on="user_id")
    exp = (
        j.drop_duplicates(["cohort_day", "day", "user_id"])
        .groupby(["cohort_day", "day"])
        .user_id.nunique()
    )
    got = out.set_index(["cohort_day", "activity_day"]).n_users
    assert got.sort_index().to_dict() == exp.sort_index().to_dict()
    # no activity before a cohort's first day
    assert (out.activity_day >= out.cohort_day).all()
