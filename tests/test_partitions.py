"""Data-derived shuffle partition counts (pipelines/partitions.py): floors,
caps, and the join-vs-aggregate floor asymmetry the sf0.1 measurements pinned
(joins densest at 1 partition; sort-aggregate reduces need ≥8 parallel
merges)."""

import numpy as np

from crawler_ray.pipelines import partitions as P


def test_for_bytes_floor_and_growth():
    assert P.for_bytes(0, P.TARGET_JOIN_BYTES) == 1
    assert P.for_bytes(P.TARGET_JOIN_BYTES, P.TARGET_JOIN_BYTES) == 1
    assert P.for_bytes(P.TARGET_JOIN_BYTES + 1, P.TARGET_JOIN_BYTES) == 2
    # cap: never wider than the cluster
    assert P.for_bytes(1 << 60, P.TARGET_JOIN_BYTES) == P.cluster_cap()


def test_for_rows_ceil_division():
    assert P.for_rows(0, 1_000_000) == 1
    assert P.for_rows(1_000_000, 1_000_000) == 1
    assert P.for_rows(1_000_001, 1_000_000) == 2
    # the floor itself is bounded by the cluster cap (4 in the test session)
    assert P.for_rows(10, 1_000_000, floor=8) == min(8, P.cluster_cap())


def test_join_vs_agg_floors(tmp_path):
    # tiny table: joins collapse to ONE dense partition, aggregates keep the
    # parallel-merge floor
    f = tmp_path / "t.parquet"
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({"x": np.arange(100)}), str(f))
    assert P.join_partitions(str(tmp_path), "t") == 1
    assert P.agg_partitions(str(tmp_path), "t") == min(8, P.cluster_cap())


def test_monotone_in_bytes(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    small = tmp_path / "s.parquet"
    pq.write_table(pa.table({"x": np.arange(10)}), str(small))
    n_small = P.join_partitions(str(tmp_path), "s")
    assert 1 <= n_small <= P.cluster_cap()
    # formula is a ceil-divide: more bytes can never mean fewer partitions
    assert P.for_bytes(10 * P.TARGET_JOIN_BYTES, P.TARGET_JOIN_BYTES) >= n_small


def test_actor_pool_limits_derivation():
    """VERDICT r4 #2: stateful actor-pool caps scale with the cluster instead
    of a hard (2, 8). Floors keep small nodes on the proven shape."""
    from crawler_ray.config import actor_pool_limits

    assert actor_pool_limits(cores=4) == (2, 8)     # test session shape
    assert actor_pool_limits(cores=16) == (2, 8)    # old default preserved
    assert actor_pool_limits(cores=32) == (4, 16)
    assert actor_pool_limits(cores=512) == (64, 256)
    lo, hi = actor_pool_limits()  # cluster-derived path: sane and ordered
    assert 2 <= lo <= hi


def test_keyed_merge_equals_plain_groupby(ray_session):
    """keyed_merge (hash-bucketed partial merge) must equal a plain pandas
    groupby over the same partials, for single- and multi-key group keys,
    across a multi-block dataset — and the pkey assignment must be
    deterministic so every group's rows co-locate."""
    import pandas as pd
    import ray.data as rd

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "k1": rng.integers(0, 500, 4000),
            "k2": [f"s{i}" for i in rng.integers(0, 7, 4000)],
            "v": rng.integers(1, 100, 4000),
        }
    )
    ds = rd.from_pandas(df).repartition(13)  # force cross-block groups

    got = (
        P.keyed_merge(
            ds,
            ["k1", "k2"],
            lambda d: d.groupby(["k1", "k2"], as_index=False)["v"].sum(),
            5,
        )
        .to_pandas()
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    want = (
        df.groupby(["k1", "k2"], as_index=False)["v"]
        .sum()
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype(want.dtypes.to_dict()), want
    )

    got1 = (
        P.keyed_merge(
            ds,
            "k1",
            lambda d: d.groupby("k1", as_index=False)["v"].max(),
            5,
        )
        .to_pandas()
        .sort_values("k1")
        .reset_index(drop=True)
    )
    want1 = (
        df.groupby("k1", as_index=False)["v"].max().sort_values("k1").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got1.astype(want1.dtypes.to_dict()), want1)
