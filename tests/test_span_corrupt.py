"""T5-style span corruption: reconstruction, determinism, rate band."""
import re

import numpy as np
import pandas as pd
import ray.data

from kgray.stages.pack import span_corrupt

SF = "/root/testdata/sf0.001"

_SENT = re.compile(r"^<X(\d+)>$")


def _reconstruct(inputs: str, targets: str) -> str:
    """Splice each <Xk> span from targets back into inputs' slots."""
    spans = {}
    cur = None
    for t in targets.split(" ") if targets else []:
        m = _SENT.match(t)
        if m:
            cur = int(m.group(1))
            spans[cur] = []
        else:
            spans[cur].append(t)
    out = []
    for t in inputs.split(" ") if inputs else []:
        m = _SENT.match(t)
        if m:
            out.extend(spans[int(m.group(1))])
        else:
            out.append(t)
    return " ".join(out)


def _norm(text: str) -> str:
    return " ".join(t for t in text.split(" ") if t)


def test_reconstruction_is_byte_exact():
    out = span_corrupt(SF).to_pandas().set_index("doc_id")
    docs = pd.read_parquet(SF + "/documents.parquet",
                           columns=["doc_id", "text"])
    assert len(out) == len(docs)
    n_masked_total = 0
    for _, r in docs.iterrows():
        row = out.loc[r.doc_id]
        assert _reconstruct(row.inputs, row.targets) == _norm(r.text)
        n_masked_total += row.n_masked
    assert n_masked_total > 0


def test_mask_rate_and_span_stats():
    out = span_corrupt(SF, corrupt_rate=0.15, mean_span=3).to_pandas()
    rate = out.n_masked.sum() / out.n_tokens.sum()
    assert 0.08 < rate < 0.25  # ~0.15 within sampling noise
    # mean span length near mean_span
    mean_len = out.n_masked.sum() / max(1, out.n_spans.sum())
    assert 2.0 < mean_len < 4.5
    # sentinels numbered 0..n_spans-1 per doc
    row = out.iloc[out.n_spans.values.argmax()]
    ks = [int(m.group(1)) for m in
          (_SENT.match(t) for t in row.inputs.split(" ")) if m]
    assert ks == list(range(int(row.n_spans)))


def test_determinism_across_repartition():
    a = span_corrupt(SF).to_pandas().sort_values("doc_id")
    docs = ray.data.read_parquet(
        SF + "/documents.parquet", columns=["doc_id", "text"]
    ).repartition(13)
    # same op over a different physical layout via a tmp wrapper
    import kgray.stages.pack as pack

    orig = pack._read_docs
    try:
        pack._read_docs = lambda sf, cols: docs.select_columns(cols)
        b = span_corrupt(SF).to_pandas().sort_values("doc_id")
    finally:
        pack._read_docs = orig
    for c in ["inputs", "targets", "n_masked", "n_spans"]:
        assert (a[c].to_numpy() == b[c].to_numpy()).all()
