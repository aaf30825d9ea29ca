"""Library-level coverage of stages.join.equi_join: every supported join
type against the pandas-merge ground truth on a small synthetic pair
(keys present on one side, both sides, neither; duplicate keys on the
probe side)."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from nfl_feature_store_ray.stages.join import equi_join


def _mk():
    left = pd.DataFrame(
        {"k": [1, 1, 2, 3, 5], "lv": [10, 11, 20, 30, 50]}
    )
    right = pd.DataFrame({"k": [1, 2, 2, 4], "rv": [100, 200, 201, 400]})
    return left, right


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return (
        df[cols]
        .sort_values(cols, kind="mergesort")
        .reset_index(drop=True)
        .astype("float64")
    )


@pytest.mark.parametrize("how", ["inner", "left", "outer"])
def test_equi_join_matches_pandas(how):
    left, right = _mk()
    got = equi_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        on="k", how=how, num_partitions=4,
    ).to_pandas()
    want = left.merge(right, on="k", how=how)
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want))


def test_equi_join_semi_anti():
    left, right = _mk()
    semi = equi_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        on="k", how="semi", num_partitions=4,
    ).to_pandas()
    want_semi = left[left["k"].isin(right["k"])]
    pd.testing.assert_frame_equal(_sorted(semi), _sorted(want_semi))

    anti = equi_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        on="k", how="anti", num_partitions=4,
    ).to_pandas()
    want_anti = left[~left["k"].isin(right["k"])]
    pd.testing.assert_frame_equal(_sorted(anti), _sorted(want_anti))


def test_equi_join_different_key_names_and_unknown_how():
    left, right = _mk()
    right = right.rename(columns={"k": "rk"})
    got = equi_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        on="k", right_on="rk", how="inner", num_partitions=2,
    ).to_pandas()
    want = left.merge(right, left_on="k", right_on="rk", how="inner")
    assert len(got) == len(want)
    assert np.sort(got["lv"].to_numpy()).tolist() == np.sort(want["lv"].to_numpy()).tolist()
    with pytest.raises(ValueError):
        equi_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                  on="k", how="cross")


def test_equi_join_sparse_keys_many_partitions():
    """Regression: fewer distinct keys than partitions left some hash
    partitions empty, which crashed Ray 2.49's native Dataset.join
    (KeyError on the key column inside acero). The cogroup formulation
    must handle empty buckets, including on FULL OUTER."""
    left = pd.DataFrame({"k": [1, 2, 3, 4, 5], "lv": [1.0, 2.0, 3.0, 4.0, 5.0]})
    right = pd.DataFrame({"rk": [1, 1, 2, 9], "rv": [10, 11, 20, 90]})
    got = equi_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        on="k", right_on="rk", how="outer", num_partitions=16,
    ).to_pandas()
    want = left.merge(right, left_on="k", right_on="rk", how="outer")
    assert len(got) == len(want) == 7
    assert sorted(got["rv"].dropna()) == sorted(want["rv"].dropna())
    # both dangling sides survive
    assert got["k"].isna().sum() == 1 and got["rk"].isna().sum() == 3


def test_equi_join_null_keys_never_match():
    """SQL equi-join semantics (r03 ADVICE): NULL join keys never match —
    pandas merge would match NaN to NaN. Null-keyed rows must vanish from
    inner/semi, be kept by anti (NOT EXISTS finds nothing), and survive as
    dangling rows in the outer variants. Verified against DuckDB."""
    import duckdb

    left = pd.DataFrame({"k": [1.0, 2.0, np.nan, np.nan, 3.0],
                         "lv": [10, 20, 30, 40, 50]})
    right = pd.DataFrame({"k": [1.0, np.nan, 4.0], "rv": [100, 200, 400]})
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    for how, sql in [
        ("inner", "SELECT l.k, lv, rv FROM l JOIN r USING (k)"),
        ("left", "SELECT l.k, lv, rv FROM l LEFT JOIN r USING (k)"),
        ("semi", "SELECT k, lv FROM l WHERE EXISTS (SELECT 1 FROM r WHERE r.k = l.k)"),
        ("anti", "SELECT k, lv FROM l WHERE NOT EXISTS (SELECT 1 FROM r WHERE r.k = l.k)"),
    ]:
        got = equi_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            on="k", how=how, num_partitions=4,
        ).to_pandas()
        want = con.execute(sql).df()
        assert len(got) == len(want), f"{how}: rows {len(got)} != {len(want)}"
        assert sorted(got["lv"].tolist()) == sorted(want["lv"].tolist()), how
    # outer: every null-keyed row survives exactly once, unmatched
    got = equi_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        on="k", how="outer", num_partitions=4,
    ).to_pandas()
    want = con.execute(
        "SELECT COALESCE(l.k, r.k) AS k, lv, rv FROM l FULL JOIN r ON l.k = r.k"
    ).df()
    assert len(got) == len(want)
    assert sorted(got["lv"].dropna().tolist()) == sorted(want["lv"].dropna().tolist())
    assert sorted(got["rv"].dropna().tolist()) == sorted(want["rv"].dropna().tolist())
