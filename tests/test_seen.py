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
