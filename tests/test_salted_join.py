"""Skew-salted repartition_join: output identity vs the unsalted plan
on a planted hot key, for every supported join type."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from kgray.utils import repartition_join


def _skewed_sides():
    rng = np.random.RandomState(5)
    # hot key 7 holds 60% of the left fact; right has 0-2 rows per key
    k = np.where(rng.rand(5000) < 0.6, 7, rng.randint(0, 40, 5000))
    left = pd.DataFrame({"k": k.astype(np.int64),
                         "lv": np.arange(5000, dtype=np.int64)})
    rk = np.concatenate([np.arange(0, 30), np.arange(0, 15)])
    right = pd.DataFrame({"rk": rk.astype(np.int64),
                          "rv": np.arange(len(rk), dtype=np.int64) * 10})
    return left, right


def _run(how: str, salt: int) -> pd.DataFrame:
    left, right = _skewed_sides()
    out = repartition_join(
        ray.data.from_pandas(left).repartition(6),
        ray.data.from_pandas(right).repartition(3),
        "k",
        "rk",
        {"k": pa.int64(), "lv": pa.int64()},
        {"rk": pa.int64(), "rv": pa.int64()},
        num_partitions=16,
        how=how,
        salt=salt,
    ).to_pandas()
    return out.sort_values(list(out.columns)).reset_index(drop=True)


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_salted_equals_unsalted(how):
    a = _run(how, 1)
    b = _run(how, 8)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_salted_inner_multiplicity():
    # the hot key 7 has 2 right rows (it is in both right ranges) ->
    # every left row with k=7 appears exactly twice, no matter which
    # salt sub-key it scattered to
    out = _run("inner", 4)
    left, right = _skewed_sides()
    assert int((out.k == 7).sum()) == 2 * int((left.k == 7).sum())
    # key 20 has exactly 1 right row -> multiplicity preserved
    assert int((out.k == 20).sum()) == int((left.k == 20).sum())


def test_salted_outer_rejected():
    left, right = _skewed_sides()
    with pytest.raises(ValueError):
        repartition_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            "k",
            "rk",
            {"k": pa.int64(), "lv": pa.int64()},
            {"rk": pa.int64(), "rv": pa.int64()},
            how="outer",
            salt=4,
        )


def test_post_fn_fusion_equals_join_then_reduce():
    """repartition_join(post_fn=...) must equal the unfused
    join -> coarse keyed reduce plan (every row of a key is in one
    partition when the reduce runs)."""
    from kgray.utils import coarse_grouped_map

    left, right = _skewed_sides()

    def reduce_fn(df):
        return df.groupby("k", as_index=False).agg(
            s=("lv", "sum"), m=("rv", "max"), n=("lv", "size")
        )

    def mk(post):
        l = ray.data.from_pandas(left).repartition(5)
        r = ray.data.from_pandas(right).repartition(2)
        j = repartition_join(
            l, r, "k", "rk",
            {"k": pa.int64(), "lv": pa.int64()},
            {"rk": pa.int64(), "rv": pa.int64()},
            num_partitions=8,
            post_fn=reduce_fn if post else None,
        )
        out = j if post else coarse_grouped_map(j, "k", reduce_fn)
        out = out.to_pandas()
        return out.sort_values("k").reset_index(drop=True)

    pd.testing.assert_frame_equal(mk(True), mk(False), check_dtype=False)


def test_post_fn_with_salt_rejected():
    left, right = _skewed_sides()
    with pytest.raises(ValueError):
        repartition_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            "k", "rk",
            {"k": pa.int64(), "lv": pa.int64()},
            {"rk": pa.int64(), "rv": pa.int64()},
            salt=4,
            post_fn=lambda d: d,
        )
