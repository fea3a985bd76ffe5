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


def make_claim_fn(handles: list, n_shards: int):
    import ray

    def claim_batch(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return pa.table({"claimed": pa.array([0], pa.int64())})
        urls = batch.column("dst").combine_chunks().to_numpy(zero_copy_only=False)
        packs = batch.column("pack").combine_chunks().to_numpy(zero_copy_only=False)
        keys = fold_urls(urls)  # fold ONCE: routing hash + shard membership
        shard = (stable_hash64(keys) % n_shards).astype(np.int64)
        refs = []
        for s in np.unique(shard):
            pos = np.flatnonzero(shard == s)
            for i in range(0, len(pos), _MAX_MSG):
                chunk = pos[i : i + _MAX_MSG]
                # sliced numpy object arrays, not per-element list builds —
                # the actor consumes them directly
                refs.append(
                    handles[int(s)].claim.remote(urls[chunk], packs[chunk], keys[chunk])
                )
        ray.get(refs)
        return pa.table({"claimed": pa.array([n], pa.int64())})

    return claim_batch
