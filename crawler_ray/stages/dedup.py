"""Seen-set dedup routing — the hash-partitioned anti-join of candidate URLs
against the sharded seen set (SURVEY.md T1/J2/D1; reference: visited
`HashSet::contains` inside spider, surfaced at
/root/reference/src/scanner/crawl.rs:42-44).

``make_dedup_fn`` is a stateless map_batches fn closed over the SeenShard
actor handles: it partitions each batch of unique candidate URLs by
``stable_hash64(url) % n_shards`` and calls ``check_and_add`` on each shard —
returning only the novel rows, already shaped as FRONTIER rows for the next
round. Callers guarantee per-round uniqueness of candidates (see
candidates.py), which makes the outcome independent of message ordering.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import schemas
from ..state.seen import stable_hash64


def make_dedup_fn(handles: list, n_shards: int, crawl_id: str, next_round: int):
    import ray

    def dedup_batch(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return schemas.FRONTIER.empty_table()
        urls = batch.column("url").combine_chunks().to_numpy(zero_copy_only=False)
        shard = (stable_hash64(urls) % n_shards).astype(np.int64)
        novel = np.zeros(n, dtype=bool)
        refs, poss = [], []
        for s in np.unique(shard):
            pos = np.flatnonzero(shard == s)
            refs.append(handles[int(s)].check_and_add.remote([urls[i] for i in pos]))
            poss.append(pos)
        for pos, mask in zip(poss, ray.get(refs)):
            novel[pos] = mask
        sub = batch.filter(pa.array(novel))
        m = len(sub)
        depth = sub.column("depth").combine_chunks().cast(pa.int32())
        return pa.Table.from_arrays(
            [
                sub.column("url").combine_chunks(),
                sub.column("host").combine_chunks(),
                depth,
                depth.cast(pa.float64()),  # priority = depth (O1)
                sub.column("parent").combine_chunks(),
                pa.array([crawl_id] * m, pa.string()),
                pa.array(np.full(m, next_round, dtype=np.int32)),
            ],
            schema=schemas.FRONTIER,
        )

    return dedup_batch
