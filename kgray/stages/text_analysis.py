"""Text-analysis operators over a generic documents table (doc_id, text).

Large-scale training-data pipeline primitives, all vectorized per batch:

- ``token_count``     — whitespace tokenisation (``\\S+`` matches)
- ``text_quality``    — length / word / punctuation / uppercase stats
- ``LangId``          — stopword-profile n-gram-free language heuristic
                        (actor pool: profiles compiled once per actor)
- ``fingerprint``     — 64-bit content fingerprint + Rabin-Karp rolling
                        window minimum (winnowing-style robust fingerprint)

Column names match the DuckDB oracle SQL in __ray_entry__ exactly.
"""
from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_RE = r"\S+"
_PUNCT_RE = r"[.,;:!?]"


def token_count(batch: pa.Table) -> pa.Table:
    """(doc_id, n_tokens) — count of non-whitespace runs."""
    n = pc.count_substring_regex(batch.column("text"), _TOKEN_RE)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pc.cast(n, pa.int64()),
        }
    )


# GPT-2-style pre-tokenizer pattern (contraction tails, letter runs,
# digit runs, punctuation runs, whitespace runs — the BPE-ish word-level
# segmentation a byte-pair tokenizer applies before merges), restricted
# to RE2 syntax (no lookahead) so the SAME pattern runs in Arrow's
# count_substring_regex AND the DuckDB oracle (both RE2) — bit-identical
# counts by construction.
_BPE_PAT = r"'[a-z]+| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def token_count_bpe(batch: pa.Table) -> pa.Table:
    """(doc_id, n_tokens_bpe) — BPE-ish pre-token count (vectorized RE2)."""
    n = pc.count_substring_regex(batch.column("text"), _BPE_PAT)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens_bpe": pc.cast(n, pa.int64()),
        }
    )


def text_quality(batch: pa.Table) -> pa.Table:
    """(doc_id, n_chars_m, n_words, n_punct, punct_ratio, mean_word_len).

    punct_ratio = n_punct / n_chars_m; mean_word_len = alpha-ish chars per
    word.  Pure double arithmetic in the same expression shape as the SQL
    oracle so values agree bit-for-bit.
    """
    text = batch.column("text")
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_words = pc.cast(pc.count_substring_regex(text, _TOKEN_RE), pa.int64())
    n_punct = pc.cast(pc.count_substring_regex(text, _PUNCT_RE), pa.int64())
    n_spaces = pc.cast(pc.count_substring_regex(text, r" "), pa.int64())
    punct_ratio = pc.divide(
        pc.cast(n_punct, pa.float64()), pc.cast(n_chars, pa.float64())
    )
    mean_word_len = pc.divide(
        pc.cast(pc.subtract(n_chars, n_spaces), pa.float64()),
        pc.cast(pc.max_element_wise(n_words, 1), pa.float64()),
    )
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_chars_m": n_chars,
            "n_words": n_words,
            "n_punct": n_punct,
            "punct_ratio": punct_ratio,
            "mean_word_len": mean_word_len,
        }
    )


# language stopword profiles (public common-word lists, trimmed)
_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu"},
    "fr": {"le", "la", "et", "les", "des", "est", "une", "dans", "que"},
    "es": {"el", "la", "de", "que", "los", "una", "es", "por", "con"},
    "zh": set(),  # no-latin-stopword fallback bucket
}


def lang_pool() -> tuple:
    """Autoscaling pool bounds for the LangId stage: min 1 actor (a
    fixed minimum that sums to the CPU budget deadlocks upstream
    repartition on small test sessions), max proportional to the
    cluster (~CPU/4 — the stage shares the node with the read and the
    downstream reduce) so the stage neither starves at 32+ CPUs nor
    over-spawns actors for a corpus smaller than its ramp-up."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return (1, max(4, cpus // 4))


class LangId:
    """Stopword-profile language guesser (actor pool stage).

    Deterministic: scores = fraction of tokens in each language's stopword
    set; ties and no-hit default to 'en' ('zh' wins only via the CJK check).
    """

    def __init__(self):
        import re

        self._tok = re.compile(r"[a-zA-Z]+")
        self._cjk = re.compile(r"[一-鿿]")
        self._profiles = {k: v for k, v in _PROFILES.items() if v}

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Vectorized: one flat token array per batch, one ``Series.isin``
        membership pass per language profile, reduceat sums per doc —
        same winner semantics as the scalar loop (strictly-greater beats,
        'en' default, CJK short-circuit)."""
        import pandas as pd

        texts = batch.column("text").to_pylist()
        n = len(texts)
        toks_per = [
            self._tok.findall(t or "") if t else [] for t in texts
        ]
        lens = np.fromiter((len(x) for x in toks_per), np.int64, count=n)
        flat = pd.Series(
            [w for ts in toks_per for w in ts], dtype=object
        ).str.lower()
        offs = np.concatenate(([0], np.cumsum(lens)))
        safe = np.maximum(lens, 1).astype(np.float64)
        best = np.full(n, "en", dtype=object)
        best_score = np.zeros(n, dtype=np.float64)
        for lang, stop in self._profiles.items():
            if len(flat):
                hits = flat.isin(stop).to_numpy().astype(np.int64)
                csum = np.concatenate(([0], np.cumsum(hits)))
                per_doc = (csum[offs[1:]] - csum[offs[:-1]]) / safe
            else:
                per_doc = np.zeros(n)
            wins = per_doc > best_score
            best[wins] = lang
            best_score[wins] = per_doc[wins]
        cjk = np.fromiter(
            (bool(self._cjk.search(t or "")) for t in texts), bool, count=n
        )
        best[cjk] = "zh"
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang_pred": pa.array(list(best), pa.string()),
            }
        )


_RK_BASE = np.uint64(1000003)
_RK_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _rolling_min_hash(data: bytes, k: int = 16) -> int:
    """Minimum Rabin-Karp hash over all k-byte windows (vectorized numpy).

    Content-defined: insensitive to document offset shifts, so two texts
    sharing any long run agree on the window minimum with high probability.
    """
    b = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    n = len(b)
    if n == 0:
        return 0
    if n <= k:
        h = np.uint64(0)
        for x in b:
            h = (h * _RK_BASE + x) & _RK_MASK
        return int(h)
    powers = np.empty(k, dtype=np.uint64)
    powers[k - 1] = np.uint64(1)
    for i in range(k - 2, -1, -1):
        powers[i] = (powers[i + 1] * _RK_BASE) & _RK_MASK
    # windowed dot product mod 2^64 via strided matmul in chunks
    windows = np.lib.stride_tricks.sliding_window_view(b, k)
    with np.errstate(over="ignore"):
        hashes = (windows * powers).sum(axis=1, dtype=np.uint64)
    return int(hashes.min())


def fingerprint(batch: pa.Table) -> pa.Table:
    """(doc_id, fp_crc, fp_rolling): exact content crc + rolling-min hash."""
    texts = batch.column("text").to_pylist()
    crcs = [zlib.crc32((t or "").encode("utf-8")) for t in texts]
    rolls = [_rolling_min_hash((t or "").encode("utf-8")) for t in texts]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "fp_crc": pa.array(crcs, pa.int64()),
            "fp_rolling": pa.array(
                [r & 0x7FFFFFFFFFFFFFFF for r in rolls], pa.int64()
            ),
        }
    )


# ---------------------------------------------------------------------------
# Keyword-in-context snippet extraction
# ---------------------------------------------------------------------------

def kwic_snippets(
    sf_dir: str, term: str = "window", width: int = 24
) -> "ray.data.Dataset":
    """(doc_id, pos, snippet): for every document containing ``term``,
    the 1-based character position of its FIRST occurrence and the
    surrounding context window of ``width`` characters on each side —
    keyword-in-context, the retrieval-debugging primitive behind every
    search-quality eval.

    Pure map, no shuffle: the search is one vectorized ``str.find`` per
    batch; the variable-bound window slice is a C-level string copy per
    MATCHED row (pandas has no vectorized variable-bound slice — this
    is the one place a comprehension beats building three aligned
    str.slice frames).  Character positions are byte positions
    on this ASCII corpus, so ``strpos``/``substr`` parity with the SQL
    oracle is exact; the slice is clipped at the text start exactly like
    substr's greatest(1, pos - width).
    """
    import os

    import pandas as pd
    import ray.data

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )
    L = len(term)

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        f = df.text.str.find(term)          # 0-based, -1 when absent
        hit = f >= 0
        d = df[hit]
        f = f[hit]
        start0 = (f - width).clip(lower=0)
        stop0 = f + L + width               # exclusive
        snippet = pd.Series(
            [t[a:b] for t, a, b in zip(d.text, start0, stop0)],
            index=d.index, dtype=object,
        )
        return pd.DataFrame({
            "doc_id": d.doc_id.to_numpy(np.int64),
            "pos": (f + 1).to_numpy(np.int64),
            "snippet": snippet.to_numpy(object),
        })

    return docs.map_batches(extract, batch_format="pandas")
