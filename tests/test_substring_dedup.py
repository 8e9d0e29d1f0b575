"""Exact substring (duplicated k-token window) detection vs a brute-force
oracle computed in-test.  Covers cross-doc duplication, within-doc
repetition, overlapping-window interval merge, short docs, and the
typed-empty no-duplicates path."""
import pyarrow as pa
import ray.data

from kgray.stages.dedup import duplicate_window_spans


def _brute(ids, texts, k):
    from collections import Counter

    cnt = Counter()
    wins = []
    for d, t in zip(ids, texts):
        w = t.split(" ") if t else []
        for p in range(1, len(w) - k + 2):
            g = " ".join(w[p - 1 : p - 1 + k])
            cnt[g] += 1
            wins.append((d, p, g))
    per_doc = {}
    for d, p, g in wins:
        if cnt[g] > 1:
            per_doc.setdefault(d, []).append(p)
    out = {}
    for d, ps in per_doc.items():
        ps.sort()
        cov, cur_end = 0, -(10**9)
        for p in ps:
            e = p + k
            if p >= cur_end:
                cov += k
            else:
                cov += max(0, e - cur_end)
            cur_end = max(cur_end, e)
        out[d] = (len(ps), cov)
    return out


def _run(ids, texts, k):
    ds = ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "text": texts}
        )
    )
    got = duplicate_window_spans(ds, k=k, num_partitions=4).to_pandas()
    if len(got) == 0:
        return {}
    return {
        int(r.doc_id): (int(r.dup_windows), int(r.dup_tokens))
        for r in got.itertuples()
    }


def test_matches_bruteforce_mixed_corpus():
    texts = [
        "a b c d e f g h i j",          # shares "c d e" run with doc 1
        "x y c d e f q r s t",
        "one two three four five six",   # unique
        "p q",                            # shorter than k: no windows
        "m n o m n o m n o",              # within-doc repetition
        "",                               # empty
        "x y c d e f q r s t",            # exact dup of doc 1
    ]
    ids = list(range(len(texts)))
    k = 3
    assert _run(ids, texts, k) == _brute(ids, texts, k)


def test_overlapping_windows_merge_coverage():
    # "w w w w w" with k=2: windows at 1..4, all the same gram, coverage
    # is one merged island of 5 tokens, not 4*2
    ids = [0]
    texts = ["w w w w w"]
    got = _run(ids, texts, 2)
    assert got == {0: (4, 5)}
    assert got == _brute(ids, texts, 2)


def test_no_duplicates_typed_empty():
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": ["alpha beta gamma delta", "one two three four"],
            }
        )
    )
    out = duplicate_window_spans(ds, k=3, num_partitions=4)
    assert out.count() == 0
    assert set(out.schema().names) == {
        "doc_id",
        "dup_windows",
        "dup_tokens",
    }


def test_cross_and_within_doc_combined():
    # the duplicated phrase spans docs AND repeats inside doc 0
    ids = [0, 1]
    texts = [
        "s t u v s t u v w",
        "q q q s t u v q q",
    ]
    k = 4
    assert _run(ids, texts, k) == _brute(ids, texts, k)
