"""Seen-set dedup routing — the hash-partitioned anti-join of candidate URLs
against the sharded seen set (SURVEY.md T1/J2/D1; reference: visited
`HashSet::contains` inside spider, surfaced at
/root/reference/src/scanner/crawl.rs:42-44).

``make_claim_fn`` is a stateless map_batches fn closed over the SeenShard
actor handles: it partitions each batch of per-batch-combined candidates
(dst, pack) by ``stable_hash64(fold_urls(url)) % n_shards`` (the case-folded
membership key is computed once here and passed to the shard — spider's
visited set is case-insensitive on the whole URL) and registers them via
``SeenShard.claim`` — the shard keeps the lexicographic-min pack per URL, so
the per-round unique+argmin lives with the seen state instead of costing a
separate groupby shuffle. After the claim stage is fully consumed, the engine
calls ``SeenShard.harvest`` on every shard to commit the round and collect
the novel FRONTIER rows (deterministic regardless of claim arrival order).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..state.seen import fold_urls, stable_hash64

_MAX_MSG = 262_144  # cap rows per actor message (bounds serialization spikes)


def claim_harvest_small(
    handles: list, n_shards: int, batch: pa.Table, crawl_id: str, next_round: int
) -> list:
    """Coordinator-path fused claim+harvest: route ONE combined candidate
    batch to its owning shards and get each shard's novel FRONTIER rows back
    in the SAME actor call (VERDICT r4 #5 — halves the per-round actor
    round-trips vs claim-wave + harvest-wave, and shards with no candidates
    this round are never called at all: their pending set is necessarily
    empty). Oversized shard slices send plain ``claim`` for all but the last
    chunk — actor tasks from one caller execute in submission order, so the
    fused final chunk still harvests after every claim. Returns the novel
    frontier tables (driver-side list; one bounded table per touched
    shard)."""
    import ray

    if len(batch) == 0:
        return []
    urls = batch.column("dst").combine_chunks().to_numpy(zero_copy_only=False)
    packs = batch.column("pack").combine_chunks().to_numpy(zero_copy_only=False)
    keys = fold_urls(urls)
    shard = (stable_hash64(keys) % n_shards).astype(np.int64)
    refs = []
    for s in np.unique(shard):
        pos = np.flatnonzero(shard == s)
        h = handles[int(s)]
        for i in range(0, len(pos), _MAX_MSG):
            chunk = pos[i : i + _MAX_MSG]
            if i + _MAX_MSG >= len(pos):
                refs.append(
                    h.claim_and_harvest.remote(
                        urls[chunk], packs[chunk], crawl_id, next_round, keys[chunk]
                    )
                )
            else:
                refs.append(h.claim.remote(urls[chunk], packs[chunk], keys[chunk]))
    out = ray.get(refs)
    return [t for t in out if isinstance(t, pa.Table) and t.num_rows]


def make_claim_fn(handles: list, n_shards: int):
    import ray

    def claim_batch(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return pa.table({"shard": pa.array([], pa.int64())})
        urls = batch.column("dst").combine_chunks().to_numpy(zero_copy_only=False)
        packs = batch.column("pack").combine_chunks().to_numpy(zero_copy_only=False)
        keys = fold_urls(urls)  # fold ONCE: routing hash + shard membership
        shard = (stable_hash64(keys) % n_shards).astype(np.int64)
        refs = []
        touched = np.unique(shard)
        for s in touched:
            pos = np.flatnonzero(shard == s)
            for i in range(0, len(pos), _MAX_MSG):
                chunk = pos[i : i + _MAX_MSG]
                # sliced numpy object arrays, not per-element list builds —
                # the actor consumes them directly
                refs.append(
                    handles[int(s)].claim.remote(urls[chunk], packs[chunk], keys[chunk])
                )
        ray.get(refs)
        # emit the shard ids this batch claimed into: the engine harvests
        # only the union of touched shards (sparse late rounds skip the rest)
        return pa.table({"shard": pa.array(touched, pa.int64())})

    return claim_batch
