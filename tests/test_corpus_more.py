"""Semantics tests for the round-2 corpus/event statistics additions
(zipf_slope, trigram_topk, source_lang_chi2, event_transitions,
session_stats).  Exact cross-engine parity is covered by the DuckDB
oracles in __ray_entry__; these pin the math on sf0.001 against
hand-rolled pandas/numpy."""
import collections

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _tokens(docs):
    return [t for txt in docs.text for t in txt.split(" ") if t]


def test_zipf_slope_matches_handrolled():
    from kgray.stages.corpus_stats import zipf_slope

    out = zipf_slope(SF).to_pandas()
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["text"])
    cnt = collections.Counter(_tokens(docs))
    assert out.vocab_size.iloc[0] == len(cnt)
    assert out.total_tokens.iloc[0] == sum(cnt.values())

    # rank()-with-ties over counts desc, then plain OLS of ln f on ln r
    freqs = np.array(sorted(cnt.values(), reverse=True), dtype=np.float64)
    rank = np.empty_like(freqs)
    i = 0
    while i < len(freqs):
        j = i
        while j < len(freqs) and freqs[j] == freqs[i]:
            j += 1
        rank[i:j] = i + 1
        i = j
    x, y = np.log(rank), np.log(freqs)
    slope = np.polyfit(x, y, 1)[0]
    assert abs(out.zipf_slope.iloc[0] - slope) < 1e-6
    assert out.zipf_slope.iloc[0] < 0  # frequency falls with rank


def test_trigram_topk_matches_counter():
    from kgray.stages.corpus_stats import trigram_topk

    out = trigram_topk(SF, k=10).to_pandas()
    docs = pd.read_parquet(SF + "/documents.parquet",
                           columns=["doc_id", "text"])
    c = collections.Counter()
    for txt in docs.text:
        w = [t for t in txt.split(" ") if t]
        c.update(" ".join(w[i:i + 3]) for i in range(len(w) - 2))
    exp = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(out.gram, out.n)) == exp
    assert out.rnk.tolist() == list(range(1, 11))


def test_source_lang_chi2_matches_closed_form():
    from kgray.stages.corpus_stats import source_lang_chi2

    out = source_lang_chi2(SF).to_pandas()
    docs = pd.read_parquet(SF + "/documents.parquet",
                           columns=["source", "lang"])
    obs = pd.crosstab(docs.source, docs.lang).astype(float)
    exp = np.outer(obs.sum(1), obs.sum(0)) / obs.to_numpy().sum()
    chi2 = ((obs.to_numpy() - exp) ** 2 / exp).sum()
    assert abs(out.chi2.iloc[0] - chi2) < 1e-6
    assert out.n_sources.iloc[0] == obs.shape[0]
    assert out.n_langs.iloc[0] == obs.shape[1]
    assert out.n_docs.iloc[0] == len(docs)


def test_event_transitions_matches_pandas():
    from kgray.pipelines.analytics import event_transitions

    out = event_transitions(SF).to_pandas()
    ev = pd.read_parquet(SF + "/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    prev = ev.groupby("user_id").event_type.shift()
    pairs = pd.DataFrame({"from_type": prev, "to_type": ev.event_type})
    exp = pairs.dropna().groupby(["from_type", "to_type"]).size()
    got = out.set_index(["from_type", "to_type"]).n
    assert got.sort_index().to_dict() == exp.sort_index().to_dict()
    # every event except each user's first contributes exactly one pair
    assert out.n.sum() == len(ev) - ev.user_id.nunique()


def test_session_stats_consistent_with_events_sessions():
    from kgray.pipelines.analytics import session_stats
    from kgray.pipelines.relational import events_sessions

    stats = session_stats(SF).to_pandas().set_index("user_id")
    sess = events_sessions(SF).to_pandas()
    per_user = sess.groupby("user_id").agg(
        n_sessions=("n_events", "size"),
        n_events=("n_events", "sum"),
        max_session_events=("n_events", "max"),
    )
    assert len(stats) == len(per_user)
    for c in per_user.columns:
        assert stats[c].sort_index().to_dict() == \
            per_user[c].sort_index().to_dict()
    dur = (sess.session_end - sess.session_start).dt.total_seconds()
    mean_dur = dur.groupby(sess.user_id).mean()
    assert np.allclose(
        stats.mean_session_seconds.sort_index(), mean_dur.sort_index(),
        atol=1e-6,
    )


def test_jsonl_and_csv_roundtrip(tmp_path):
    import pandas as pd
    import ray.data

    from kgray.sources.io import (
        read_csv_table,
        read_jsonl,
        write_csv_table,
        write_jsonl,
    )

    df = pd.DataFrame(
        {"doc_id": [3, 1, 2], "text": ["a b", "c", "d e f"],
         "n": [2, 1, 3]}
    )
    ds = ray.data.from_pandas(df)

    jdir = str(tmp_path / "j")
    write_jsonl(ds, jdir)
    back = read_jsonl(jdir).to_pandas().sort_values("doc_id")
    assert back.doc_id.tolist() == [1, 2, 3]
    assert back.text.tolist() == ["c", "d e f", "a b"]

    # column pruning drops the unselected column after parse
    pruned = read_jsonl(jdir, columns=["doc_id"]).to_pandas()
    assert list(pruned.columns) == ["doc_id"]

    cdir = str(tmp_path / "c")
    write_csv_table(ds, cdir)
    cback = read_csv_table(cdir).to_pandas().sort_values("doc_id")
    assert cback.n.tolist() == [1, 3, 2]
    cpruned = read_csv_table(cdir, columns=["doc_id", "n"]).to_pandas()
    assert sorted(cpruned.columns) == ["doc_id", "n"]


def test_bigram_nll_hand_computed(tmp_path):
    import numpy as np
    import pandas as pd

    from kgray.stages.corpus_stats import bigram_nll

    # doc1 bigrams: (a,b) (b,a) (a,b); doc2: (a,b); doc3: none (1 token)
    pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["a b a b", "a b", "a"]}
    ).to_parquet(tmp_path / "documents.parquet")
    out = (
        bigram_nll(str(tmp_path), k=0.5)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # model: c(a,b)=3  c(b,a)=1  ctx: c1(a)=3 c1(b)=1  V=2
    lab = np.log((3 + 0.5) / (3 + 0.5 * 2))
    lba = np.log((1 + 0.5) / (1 + 0.5 * 2))
    exp1 = np.floor(-((2 * lab + lba) / 3) * 1e6 + 0.5) / 1e6
    exp2 = np.floor(-lab * 1e6 + 0.5) / 1e6
    assert out.loc[1].tolist() == [3, exp1]
    assert out.loc[2].tolist() == [1, exp2]
    assert 3 not in out.index  # <2 tokens: no bigrams, no row


def test_excess_suppliers_dominance(tmp_path):
    import pandas as pd

    from kgray.pipelines.tpch_final import excess_suppliers

    # part 1 ('small x'): supp 7 ships 30 of 40 (>50% — dominates);
    # part 2 ('small y'): supp 7 and 8 ship 20 each (ties never pass);
    # part 3 ('red z'): prefix-excluded even though supp 9 owns it.
    pd.DataFrame(
        {
            "p_partkey": [1, 2, 3],
            "p_name": ["small x", "small y", "red z"],
        }
    ).to_parquet(tmp_path / "part.parquet")
    pd.DataFrame(
        {
            "s_suppkey": [7, 8, 9],
            "s_name": ["S7", "S8", "S9"],
            "s_nationkey": pd.array([0, 0, 1], dtype="int32"),
        }
    ).to_parquet(tmp_path / "supplier.parquet")
    pd.DataFrame(
        {
            "n_nationkey": pd.array([0, 1], dtype="int32"),
            "n_name": ["N0", "N1"],
        }
    ).to_parquet(tmp_path / "nation.parquet")
    ts = pd.Timestamp("1996-06-01")
    out_ts = pd.Timestamp("1999-06-01")  # outside the window
    pd.DataFrame(
        {
            "l_partkey": [1, 1, 1, 2, 2, 3, 1],
            "l_suppkey": [7, 7, 8, 7, 8, 9, 8],
            "l_quantity": [20.0, 10.0, 10.0, 20.0, 20.0, 50.0, 99.0],
            "l_shipdate": [ts, ts, ts, ts, ts, ts, out_ts],
        }
    ).to_parquet(tmp_path / "lineitem.parquet")
    out = excess_suppliers(str(tmp_path)).to_pandas()
    assert out.values.tolist() == [["S7", "N0"]]
