"""Cuckoo filter + SeenShard unit tests (SURVEY.md §5.1, T1)."""

import numpy as np
import pytest

from crawler_ray.state.seen import CuckooFilter, SeenShard, stable_hash64


def _urls(n, prefix="https://h.test/p"):
    return [f"{prefix}{i:07d}" for i in range(n)]


def test_stable_hash_deterministic():
    a = stable_hash64(["x", "y", "z"])
    b = stable_hash64(["x", "y", "z"])
    assert (a == b).all()
    assert a.dtype == np.uint64
    assert len(set(a.tolist())) == 3


def test_cuckoo_membership_no_false_negatives():
    f = CuckooFilter(capacity=20_000)
    h = stable_hash64(_urls(10_000))
    f.add_hashes(h)
    assert f.contains_hashes(h).all()


def test_cuckoo_false_positive_rate():
    f = CuckooFilter(capacity=20_000)
    f.add_hashes(stable_hash64(_urls(10_000)))
    unseen = stable_hash64(_urls(10_000, prefix="https://other.test/q"))
    fp = f.contains_hashes(unseen).mean()
    assert fp < 0.01, fp


def test_cuckoo_state_roundtrip():
    f = CuckooFilter(capacity=4_096)
    h = stable_hash64(_urls(2_000))
    f.add_hashes(h)
    g = CuckooFilter.from_state(f.state())
    assert g.contains_hashes(h).all()
    assert g.count == f.count


def test_cuckoo_overflow_raises():
    f = CuckooFilter(capacity=64)
    with pytest.raises(RuntimeError):
        # far over capacity — must fail loudly, not silently degrade
        f.add_hashes(stable_hash64(_urls(10_000)))


def test_seen_shard_check_and_add():
    s = SeenShard(0, capacity=4_096)
    m1 = s.check_and_add(["a", "b", "c"])
    assert m1.tolist() == [True, True, True]
    m2 = s.check_and_add(["b", "d"])
    assert m2.tolist() == [False, True]
    assert s.size() == 4
    assert s.contains(["a", "zz"]).tolist() == [True, False]
    assert s.check_and_add([]).tolist() == []


def test_seen_shard_snapshot_restore_via_readd():
    s = SeenShard(3, capacity=4_096)
    s.check_and_add(_urls(500))
    snap = s.snapshot()
    assert snap["shard_id"] == 3 and len(snap["urls"]) == 500
    # resume path: fresh shard re-adds the checkpointed urls
    t = SeenShard(3, capacity=4_096)
    t.check_and_add(snap["urls"])
    assert t.check_and_add(_urls(500)).sum() == 0  # everything already seen
    assert t.size() == 500


def test_claim_order_invariance():
    """harvest output is independent of claim arrival order (the per-round
    argmin lives on the shard; message order must not matter)."""
    import numpy as np

    from crawler_ray.state.seen import SeenShard

    claims = [
        ("https://h.test/a", "0000000002|https://h.test/x"),
        ("https://h.test/a", "0000000001|https://h.test/y"),
        ("https://h.test/B", "0000000001|https://h.test/x"),
        ("https://h.test/b", "0000000001|https://h.test/a"),  # case variant of B
        ("https://h.test/c", "0000000003|https://h.test/z"),
    ]
    outs = []
    for seed in range(4):
        rng = np.random.default_rng(seed)
        s = SeenShard(0, capacity=1 << 10)
        order = rng.permutation(len(claims))
        for i in order:
            u, p = claims[i]
            s.claim([u], [p])
        outs.append(s.harvest("c", 1).to_pylist())
    assert all(o == outs[0] for o in outs[1:])
    # the case-variant pair collapsed to ONE row with the min (pack, url)
    urls = [r["url"] for r in outs[0]]
    assert len([u for u in urls if u.lower() == "https://h.test/b"]) == 1


def test_check_and_add_case_insensitive():
    from crawler_ray.state.seen import SeenShard

    s = SeenShard(0, capacity=1 << 10)
    first = s.check_and_add(["https://H.test/Page"])
    second = s.check_and_add(["https://h.test/page"])
    assert first.tolist() == [True]
    assert second.tolist() == [False]  # same folded key ⇒ already seen
    # output keeps the first-discovered casing verbatim (URL normalization —
    # host lowercasing — happens upstream in urlnorm, not in the shard)
    assert s.visited_table().column("url").to_pylist() == ["https://H.test/Page"]


def test_claim_and_harvest_matches_two_step():
    """VERDICT r4 #5: the fused single-round-trip claim_and_harvest must be
    byte-identical to claim-then-harvest, including interaction with earlier
    plain claims in the same round."""
    from crawler_ray.state.seen import SeenShard

    claims1 = [
        ("https://h.test/a", "0000000002|https://h.test/x"),
        ("https://h.test/b", "0000000001|https://h.test/y"),
    ]
    claims2 = [
        ("https://h.test/a", "0000000001|https://h.test/z"),  # better argmin
        ("https://h.test/c", "0000000003|https://h.test/w"),
    ]
    s1 = SeenShard(0, capacity=1 << 10)
    s1.claim(*zip(*claims1))
    s1.claim(*zip(*claims2))
    want = s1.harvest("c", 2).to_pylist()

    s2 = SeenShard(0, capacity=1 << 10)
    s2.claim(*zip(*claims1))
    got = s2.claim_and_harvest(*zip(*claims2), crawl_id="c", next_round=2).to_pylist()
    assert got == want and len(got) == 3
    # both shards committed identically: nothing is novel afterwards
    assert s2.check_and_add([u for u, _ in claims1 + claims2]).sum() == 0


def test_claim_harvest_small_router(ray_session):
    """Driver-path router: novel rows across shards equal the two-step
    protocol's union, untouched shards receive no call, and a second round
    claiming the same urls yields nothing."""
    import pyarrow as pa
    import ray

    from crawler_ray.stages.dedup import claim_harvest_small
    from crawler_ray.state.seen import SeenShard

    RSeen = ray.remote(SeenShard)
    shards = [RSeen.remote(i, capacity=1 << 10) for i in range(4)]
    urls = [f"https://h.test/p{i}" for i in range(50)]
    batch = pa.table(
        {"dst": urls, "pack": [f"0000000001|https://h.test/seed"] * len(urls)}
    )
    parts = claim_harvest_small(shards, 4, batch, "c", 1)
    got = sorted(r["url"] for t in parts for r in t.to_pylist())
    assert got == sorted(urls)
    # replay: everything already seen → no novel rows, empty batch → no calls
    assert claim_harvest_small(shards, 4, batch, "c", 2) == []
    assert claim_harvest_small(shards, 4, batch.slice(0, 0), "c", 3) == []
    for a in shards:
        ray.kill(a)
