"""Distributed (combiner + tree-reduce top-k) vs driver-side selection
equivalence, incl. a hot-host skew case (SURVEY.md §4 skew row, T3/O1)."""

import numpy as np
import pyarrow as pa
import pytest

from crawler_ray import schemas
from crawler_ray.config import CrawlConfig
from crawler_ray.stages.select import quota_for, select_frontier, select_small
from crawler_ray.state.robots import RobotsPolicy


def _frontier(rows):
    urls, hosts, depths = zip(*rows)
    n = len(urls)
    return pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(hosts, pa.string()),
            pa.array(depths, pa.int32()),
            pa.array([float(d) for d in depths], pa.float64()),
            pa.array([""] * n, pa.string()),
            pa.array(["c"] * n, pa.string()),
            pa.array([0] * n, pa.int32()),
        ],
        schema=schemas.FRONTIER,
    )


def _mixed_frontier():
    rng = np.random.default_rng(7)
    rows = []
    # hot host: 500 rows, mixed depths
    for i in range(500):
        rows.append((f"https://hot.test/p{i:04d}", "hot.test", int(rng.integers(0, 4))))
    # normal hosts
    for h in range(5):
        for i in range(20):
            rows.append((f"https://h{h}.test/p{i:03d}", f"h{h}.test", int(rng.integers(0, 3))))
    rng.shuffle(rows)
    return _frontier(rows)


@pytest.mark.parametrize(
    "delay_ms,blocks", [(100, 1), (100, 8), (250, 4)]
)
def test_distributed_selection_equals_small(ray_session, delay_ms, blocks):
    """blocks=1 exercises the single-block shortcut; >1 the combiner + tree
    reduce — both must equal the driver-side kernel exactly."""
    import ray.data as rd

    cfg = CrawlConfig(delay_ms=delay_ms, round_ms=1000)
    policy = RobotsPolicy({"hot.test": ((), 400)})  # robots delay on the hot host
    tab = _mixed_frontier()

    sel_s, def_s = select_small(tab, cfg, policy)
    ds = rd.from_arrow(tab).repartition(blocks).materialize()
    sel_d, def_d = select_frontier(ds, cfg, policy)

    def key_set(x):
        if x is None:
            return set()
        if isinstance(x, pa.Table):
            return set(x.column("url").to_pylist())
        return set(x.to_pandas()["url"])

    assert key_set(sel_d) == key_set(sel_s)
    assert key_set(def_d) == key_set(def_s)
    # selected respects quotas exactly
    import pandas as pd

    sdf = sel_s.to_pandas()
    for host, grp in sdf.groupby("host"):
        q = quota_for(host, cfg, policy)
        assert q is None or len(grp) <= q


def test_quota_rule():
    cfg = CrawlConfig(delay_ms=300, round_ms=1000)
    pol = RobotsPolicy({"slow.test": ((), 2000)})
    assert quota_for("fast.test", cfg, pol) == 3
    assert quota_for("slow.test", cfg, pol) == 1  # max(1, 1000 // 2000)
    assert quota_for("any.test", CrawlConfig(delay_ms=0), RobotsPolicy({})) is None


def test_selection_prefers_lower_depth_then_url():
    cfg = CrawlConfig(delay_ms=500, round_ms=1000)  # quota 2
    tab = _frontier(
        [
            ("https://a.test/z", "a.test", 0),
            ("https://a.test/b", "a.test", 1),
            ("https://a.test/a", "a.test", 1),
            ("https://a.test/c", "a.test", 2),
        ]
    )
    sel, deferred = select_small(tab, cfg, RobotsPolicy({}))
    assert sorted(sel.column("url").to_pylist()) == [
        "https://a.test/a",
        "https://a.test/z",
    ]
    assert sorted(deferred.column("url").to_pylist()) == [
        "https://a.test/b",
        "https://a.test/c",
    ]
