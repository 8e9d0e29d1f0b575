"""Semantics tests for embedding covariance / PCA spectrum and the
per-source token entropy.  Exact cross-engine parity for the covariance
and entropy is covered by the DuckDB oracles in __ray_entry__; these pin
the math on sf0.001 against numpy over the raw rows."""
import collections
import math

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _emb_matrix():
    df = pd.read_parquet(SF + "/embeddings.parquet", columns=["embedding"])
    return np.stack(df.embedding.to_numpy()).astype(np.float64)


def test_embedding_covariance_matches_numpy():
    from kgray.stages.similarity import embedding_covariance

    out = embedding_covariance(SF).to_pandas()
    m = _emb_matrix()
    d = m.shape[1]
    assert len(out) == d * d
    exp = np.cov(m, rowvar=False, bias=True)  # population covariance
    got = np.zeros((d, d))
    got[out.i.to_numpy() - 1, out.j.to_numpy() - 1] = out["cov"].to_numpy()
    assert np.allclose(got, exp, atol=1e-6)
    # symmetric by construction, positive diagonal
    assert np.allclose(got, got.T)
    assert (np.diag(got) > 0).all()


def test_pca_spectrum_matches_numpy_eigs():
    from kgray.stages.similarity import pca_spectrum

    out = pca_spectrum(SF, k=8).to_pandas()
    m = _emb_matrix()
    vals = np.linalg.eigvalsh(np.cov(m, rowvar=False, bias=True))[::-1]
    assert len(out) == 8
    # covariance cells are quantized to 1e-6 before the eigensolve, so
    # eigenvalues carry ~d*1e-6 slack vs the exact ones
    assert np.allclose(out.eigenvalue, vals[:8], atol=1e-4)
    assert (np.diff(out.eigenvalue) <= 1e-12).all()  # non-increasing
    assert (out.explained_ratio > 0).all()
    assert out.cum_explained_ratio.iloc[-1] <= 1.0 + 1e-9
    assert np.allclose(out.cum_explained_ratio,
                       out.explained_ratio.cumsum())


def test_source_token_entropy_matches_counter():
    from kgray.stages.corpus_stats import source_token_entropy

    out = source_token_entropy(SF).to_pandas().set_index("source")
    docs = pd.read_parquet(SF + "/documents.parquet",
                           columns=["source", "text"])
    for src, g in docs.groupby("source"):
        cnt = collections.Counter(
            t for txt in g.text for t in txt.split(" ") if t
        )
        n = sum(cnt.values())
        h = math.log(n) - sum(c * math.log(c) for c in cnt.values()) / n
        row = out.loc[src]
        assert row.n_tokens == n
        assert row.vocab_size == len(cnt)
        assert abs(row.entropy - h) < 1e-6
        # entropy bounded by ln(vocab)
        assert row.entropy <= math.log(len(cnt)) + 1e-9
