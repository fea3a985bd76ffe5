"""Sharded URL-seen set — the rebuild of spider's visited `HashSet`
(SURVEY.md T1/J2/D1; reference call-site: `website.get_links()` iteration at
/root/reference/src/scanner/crawl.rs:42-44; hashbrown/ahash deps
Cargo.lock:2185,2178).

Design for the 10^10-URL design point:
  * N shards, shard = stable_hash64(url) % N — each shard is an actor holding a
    **cuckoo filter** (16-bit fingerprints, 4-way buckets ⇒ ~2.1 bytes/URL at
    95% load). 10^10 URLs / 256 shards ≈ 82 GB total filter memory cluster-wide,
    ~320 MB per shard — fits a worker heap. False-positive budget ≈ 2^-13 per
    probe ⇒ ~1e-4 end-to-end with 2 buckets probed.
  * At sandbox/test scale every shard ALSO keeps the exact URL set; tests assert
    the filter never false-negatives and measures its FP rate. The exact set is
    what ships in the `seen` checkpoint so resume is exact.
  * Membership-and-insert is one message per (batch, shard): stages/dedup.py
    partitions each Arrow batch by shard and fires `claim.remote` per shard —
    a hash-partitioned anti-join (J2) whose per-round unique+argmin lives on
    the shard (claim keeps min pack; harvest commits) so ordering of claims
    cannot change the outcome and no groupby shuffle is needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def fold_urls(urls) -> np.ndarray:
    """Case-folded seen-set membership keys. spider's visited set compares
    the WHOLE URL case-insensitively (`case_insensitive_string`,
    /root/reference/Cargo.lock:289); the rebuild matches by folding at every
    seen-set boundary — routing AND shard membership — while storing the
    originally-discovered casing for output."""
    return pd.Series(np.asarray(urls, dtype=object)).str.lower().to_numpy(dtype=object)


def route_hash(urls) -> np.ndarray:
    """Shard-routing hash over the folded membership key (must agree with the
    shard's internal fold or different casings would land on different
    shards)."""
    return stable_hash64(fold_urls(urls))


def stable_hash64(values, key: str | None = None) -> np.ndarray:
    """Deterministic 64-bit hash of a string sequence (same across processes,
    unlike builtin hash()). pandas' siphash — vectorized C, ~10M strings/s.
    ``key`` selects an independent hash family (16-byte siphash key derived
    from the string) — two keyed hashes give an effective 128-bit fingerprint."""
    arr = np.asarray(values, dtype=object)
    if key is None:
        return pd.util.hash_array(arr, categorize=False)
    hk = (key.encode() * 16)[:16].decode("latin1")
    return pd.util.hash_array(arr, hash_key=hk, categorize=False)


class CuckooFilter:
    """Partial-key cuckoo filter with numpy storage.

    16-bit fingerprints, ``bucket_size``-way buckets, power-of-two bucket
    count. Vectorized batched ``contains``; per-item insert with bounded
    eviction (the rare path). Serializable via ``state()`` / ``from_state``.
    """

    MAX_KICKS = 500

    def __init__(self, capacity: int, bucket_size: int = 4):
        n_buckets = 1
        while n_buckets * bucket_size < capacity:
            n_buckets *= 2
        self.n_buckets = n_buckets
        self.bucket_size = bucket_size
        self.mask = np.uint64(n_buckets - 1)
        self.table = np.zeros((n_buckets, bucket_size), dtype=np.uint16)
        self.count = 0
        self._rng = np.random.default_rng(0xC0FFEE)

    # -- hashing ----------------------------------------------------------
    def _fp_and_indices(self, h: np.ndarray):
        fp = ((h >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)  # 0 marks an empty slot
        # bucket index from a REMIXED hash, not the raw low bits: shard
        # routing uses `h % n_shards`, so every key reaching this shard has
        # fixed low bits — raw `h & mask` would concentrate all primary
        # buckets in 1/n_shards of the table (measured: over-capacity
        # failures at ~12% nominal load with 8 shards)
        mixed = (h * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(13)
        i1 = (mixed & self.mask).astype(np.int64)
        i2 = self._alt_index(i1, fp)
        return fp, i1, i2

    def _alt_index(self, i, fp):
        # standard partial-key alternate: i xor hash(fp)
        fph = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) & self.mask
        return (i.astype(np.uint64) ^ fph).astype(np.int64)

    # -- batched ops ------------------------------------------------------
    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        fp, i1, i2 = self._fp_and_indices(h)
        t = self.table
        hit1 = (t[i1] == fp[:, None]).any(axis=1)
        hit2 = (t[i2] == fp[:, None]).any(axis=1)
        return hit1 | hit2

    def add_hashes(self, h: np.ndarray) -> None:
        fp, i1, i2 = self._fp_and_indices(h)
        for k in range(len(h)):
            self._insert_one(int(fp[k]), int(i1[k]), int(i2[k]))

    def _insert_one(self, fp: int, i1: int, i2: int) -> None:
        for i in (i1, i2):
            row = self.table[i]
            empties = np.flatnonzero(row == 0)
            if len(empties):
                row[empties[0]] = fp
                self.count += 1
                return
        # evict
        i = i1
        for _ in range(self.MAX_KICKS):
            slot = int(self._rng.integers(0, self.bucket_size))
            fp, self.table[i, slot] = int(self.table[i, slot]), fp
            i = int(self._alt_index(np.array([i]), np.array([fp], np.uint16))[0])
            row = self.table[i]
            empties = np.flatnonzero(row == 0)
            if len(empties):
                row[empties[0]] = fp
                self.count += 1
                return
        raise RuntimeError("cuckoo filter over capacity — grow shards")

    # -- serialization ----------------------------------------------------
    def state(self) -> dict:
        return {
            "table": self.table.copy(),
            "count": self.count,
            "bucket_size": self.bucket_size,
        }

    @classmethod
    def from_state(cls, st: dict) -> "CuckooFilter":
        f = cls.__new__(cls)
        f.table = st["table"].copy()
        f.count = st["count"]
        f.bucket_size = st["bucket_size"]
        f.n_buckets = f.table.shape[0]
        f.mask = np.uint64(f.n_buckets - 1)
        f._rng = np.random.default_rng(0xC0FFEE)
        return f


class SeenShard:
    """One shard of the URL-seen set. Wrapped with ``ray.remote`` by the
    engine; also usable in-process (the oracle and unit tests do).

    ``exact`` mode keeps the authoritative Python set next to the filter
    (checkpointable, zero false positives). At the 10^10 design point exact
    would be dropped and the filter alone decides (documented FP budget)."""

    def __init__(self, shard_id: int, capacity: int = 1 << 16, exact: bool = True):
        self.shard_id = shard_id
        self.filter = CuckooFilter(capacity)
        # membership is keyed on the CASE-FOLDED url (spider parity, see
        # fold_urls); `originals` keeps the discovered casing for output
        self.exact = set() if exact else None
        self.originals: dict[str, str] = {}  # folded key -> original url
        self.pending: dict[str, tuple[str, str]] = {}  # key -> (min pack, url)

    def _maybe_grow(self, incoming: int) -> None:
        """Rebuild the filter at 2× when the next insert burst would push it
        past ~90% load (cuckoo insert failure territory). Only possible while
        the exact set is kept — at the 10^10 design point shards are pre-sized
        instead (SURVEY §7.4.7) and overflow raises."""
        cap = self.filter.n_buckets * self.filter.bucket_size
        if self.filter.count + incoming <= int(cap * 0.9):
            return
        if self.exact is None:
            return  # let the filter raise its explicit over-capacity error
        new = CuckooFilter(max(cap * 2, (self.filter.count + incoming) * 2))
        urls = sorted(self.exact)
        if urls:
            new.add_hashes(stable_hash64(urls))
        self.filter = new

    def check_and_add(self, urls: list[str], keys=None) -> np.ndarray:
        """Returns bool mask: True where the URL was NOT seen before (and is
        now marked seen). URLs must be unique (after case folding) within the
        call. ``keys``: pre-folded membership keys (routers already fold for
        the shard hash — passing them avoids a second fold pass). Accepts
        lists or numpy object arrays (routers send sliced arrays — no
        per-element list building on the hot path)."""
        if len(urls) == 0:
            return np.zeros(0, dtype=bool)
        if keys is None:
            keys = fold_urls(urls)
        keys = np.asarray(keys, dtype=object)
        h = stable_hash64(keys)
        maybe_seen = self.filter.contains_hashes(h)
        if self.exact is not None:
            novel = np.fromiter(
                (k not in self.exact for k in keys), dtype=bool, count=len(keys)
            )
            # cuckoo must never false-negative: anything exact-seen must probe seen
            fn = (~maybe_seen) & (~novel)
            if fn.any():
                raise AssertionError("cuckoo filter false negative")
            # grow BEFORE updating exact: the rebuild re-hashes the exact set,
            # so the new URLs must not be in it yet (they are added below)
            self._maybe_grow(int(novel.sum()))
            # bulk winners update — no per-row Python if-loop on the hot path
            nk = keys[novel]
            self.exact.update(nk.tolist())
            self.originals.update(zip(nk, np.asarray(urls, dtype=object)[novel]))
        else:
            novel = ~maybe_seen
            self._maybe_grow(int(novel.sum()))
        self.filter.add_hashes(h[novel])
        return novel

    def contains(self, urls: list[str]) -> np.ndarray:
        if len(urls) == 0:
            return np.zeros(0, dtype=bool)
        keys = fold_urls(urls)
        if self.exact is not None:
            return np.fromiter(
                (k in self.exact for k in keys), dtype=bool, count=len(keys)
            )
        return self.filter.contains_hashes(stable_hash64(keys))

    # -- per-round claim/harvest (removes the per-round groupby shuffle) ----
    def claim(self, urls: list[str], packs: list[str], keys=None) -> int:
        """Register candidate URLs discovered this round with their packed
        (depth|parent) keys. Duplicate claims (including case variants of one
        folded key) keep the lexicographic-min (pack, url) tuple, so the
        outcome is independent of task/message arrival order — this IS the
        per-round unique+argmin that a groupby('url').Min(pack) would
        compute, held where the seen state already lives."""
        pend = self.pending
        if keys is None:
            keys = fold_urls(urls)
        keys = np.asarray(keys, dtype=object)
        if self.exact is not None:
            seen_mask = np.fromiter(
                (k in self.exact for k in keys), dtype=bool, count=len(keys)
            )
        else:
            seen_mask = self.filter.contains_hashes(stable_hash64(keys))
        fresh = ~seen_mask
        if not fresh.any():
            return len(pend)
        ks = keys[fresh]
        ps = np.asarray(packs, dtype=object)[fresh]
        us = np.asarray(urls, dtype=object)[fresh]
        # batch-local argmin of (pack, url) per key: one lexsort + boundary
        # mask replaces the old per-ROW compare loop; the merge below runs
        # once per UNIQUE key in the batch, not per row
        order = np.lexsort((us, ps, ks))
        ks, ps, us = ks[order], ps[order], us[order]
        first = np.empty(len(ks), dtype=bool)
        first[0] = True
        first[1:] = ks[1:] != ks[:-1]
        for k, p, u in zip(ks[first], ps[first], us[first]):
            cur = pend.get(k)
            if cur is None or (p, u) < cur:
                pend[k] = (p, u)
        return len(pend)

    def harvest(self, crawl_id: str, next_round: int):
        """Commit this round's pending claims into the seen set and return
        them as FRONTIER-schema rows (sorted by membership key —
        deterministic)."""
        import pyarrow as pa

        from .. import schemas, urlnorm

        items = sorted(self.pending.items())
        self.pending = {}
        if not items:
            return schemas.FRONTIER.empty_table()
        keys = [k for k, _ in items]
        urls = [u for _, (_, u) in items]
        self._maybe_grow(len(keys))  # before exact.update (rebuild re-hashes exact)
        if self.exact is not None:
            self.exact.update(keys)
            self.originals.update(zip(keys, urls))
        self.filter.add_hashes(stable_hash64(keys))
        depth = np.fromiter(
            (int(p[:10]) for _, (p, _) in items), dtype=np.int32, count=len(items)
        )
        parent = [p[11:] for _, (p, _) in items]
        arr = pa.array(urls, pa.string())
        return pa.Table.from_arrays(
            [
                arr,
                urlnorm.host_of(arr),
                pa.array(depth),
                pa.array(depth.astype(np.float64)),
                pa.array(parent, pa.string()),
                pa.array([crawl_id] * len(items), pa.string()),
                pa.array(np.full(len(items), next_round, dtype=np.int32)),
            ],
            schema=schemas.FRONTIER,
        )

    def claim_and_harvest(
        self, urls, packs, crawl_id: str, next_round: int, keys=None
    ):
        """Fused claim + harvest — ONE actor round-trip for the coordinator
        path's final (or only) claim message to this shard (VERDICT r4 #5:
        claim then harvest as two sequential `ray.get` waves was ~55% of
        crawl wall). Safe whenever the caller knows this is the shard's last
        claim of the round — the coordinator path routes a single combined
        batch, so every shard gets exactly one message."""
        self.claim(urls, packs, keys)
        return self.harvest(crawl_id, next_round)

    def size(self) -> int:
        return len(self.exact) if self.exact is not None else self.filter.count

    # -- checkpoint -------------------------------------------------------
    def snapshot(self) -> dict:
        return {
            "shard_id": self.shard_id,
            "urls": sorted(self.originals.values()) if self.exact is not None else [],
            "filter": self.filter.state(),
        }

    def restore(self, snap: dict) -> None:
        self.shard_id = snap["shard_id"]
        self.filter = CuckooFilter.from_state(snap["filter"])
        if self.exact is not None:
            urls = snap["urls"]
            keys = fold_urls(urls) if urls else []
            self.exact = set(keys)
            self.originals = dict(zip(keys, urls))

    # -- actor-side persistence (the 10^10 path: the driver never holds the
    # seen set — shards write/read their own partitions, the driver moves
    # only file paths and object refs) ------------------------------------
    def visited_table(self):
        """This shard's visited URLs (sorted) as one Arrow table. Returned by
        ref from the actor — callers compose shards with
        ``ray.data.from_arrow_refs`` instead of concatenating on the driver."""
        import pyarrow as pa

        from .. import schemas

        urls = sorted(self.originals.values()) if self.exact is not None else []
        return pa.Table.from_arrays(
            [
                pa.array([self.shard_id] * len(urls), pa.int32()),
                pa.array(urls, pa.string()),
            ],
            schema=schemas.SEEN,
        )

    def write_snapshot(self, dir_path: str) -> str:
        """Checkpoint this shard as its own parquet partition (actor-side
        write; the driver collects only the returned path)."""
        import os

        import pyarrow.parquet as pq

        path = os.path.join(dir_path, f"shard={self.shard_id}.parquet")
        pq.write_table(self.visited_table(), path)
        return path

    def restore_from_parquet(self, path: str) -> int:
        """Rebuild this shard (exact set + cuckoo filter) from its checkpoint
        partition — actor-side read, no driver routing."""
        import pyarrow.parquet as pq

        urls = pq.read_table(path, columns=["url"]).column("url").to_pylist()
        if urls:
            self.check_and_add(urls)
        return len(urls)
