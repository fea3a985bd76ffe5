"""Fetch = point-lookup join of frontier URLs against the corpus
(SURVEY.md S3/J1/T4; reference: network GET inside ``website.crawl()``,
/root/reference/src/scanner/scan.rs:74-76 via reqwest — Cargo.lock:1843).

The corpus plays the role of "the web": fetching a URL is a key lookup of
``doc_id``. The lookup side is a pool of ``CorpusShard`` actors, each holding
one hash-shard of the corpus (loaded once in ``__init__`` — the T4 "corpus
handle opened once per worker"). The frontier side is a stateless
``map_batches`` fn that partitions each Arrow batch by shard and gathers
``fetch.remote`` results — a hash-partitioned lookup join that ships only the
URLs and the hit rows, never the corpus.

Scale note: at 100 TB the shard actors hold a Lance/Parquet *handle* plus a
key→(file, row-group) index instead of in-memory tables; the routing layer is
unchanged. Misses (dangling links) return status 404 with empty spans,
mirroring the reference's skipped fetch errors (scan.rs:45-46).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import schemas
from ..state.seen import stable_hash64

_EMPTY_SPANS_ROW = pa.array([[]], schemas.SPANS)


class CorpusShard:
    """One hash-shard of the corpus, resident in an actor.

    Loads only its own rows (hash(doc_id) % n_shards == shard_id) in
    ``__init__`` — once per actor, never per batch. When handed a
    pre-partitioned directory (``sources.corpus.ensure_sharded``) it reads
    ONLY its ``shard=K`` subdirectory — ~1/N of the corpus bytes; the
    single-file fallback reads everything and filters (fine for small
    corpora, N× read amplification at scale — the engine pre-shards above
    the size threshold)."""

    def __init__(self, parquet_path: str, shard_id: int, n_shards: int):
        import pyarrow.parquet as pq

        from ..sources.corpus import read_corpus_table

        if os.path.isdir(parquet_path):
            sub = os.path.join(parquet_path, f"shard={shard_id}")
            if os.path.isdir(sub):
                table = pq.read_table(sub, columns=["doc_id", "spans"])
            else:  # no doc hashed here — empty shard
                table = pa.Table.from_arrays(
                    [pa.array([], pa.string()), pa.array([], schemas.SPANS)],
                    names=["doc_id", "spans"],
                )
            self.table = table.combine_chunks()
        else:
            table = read_corpus_table(parquet_path, columns=["doc_id", "spans"])
            ids = table.column("doc_id").combine_chunks()
            mine = stable_hash64(ids.to_numpy(zero_copy_only=False)) % n_shards == shard_id
            self.table = table.filter(pa.array(mine)).combine_chunks()
        import pandas as pd

        keys = self.table.column("doc_id").to_pylist()
        # pd.Index gives a vectorized batch lookup (get_indexer) — the one
        # dict-per-URL loop left on the fetch hot path (VERDICT r3 minor #4).
        # get_indexer requires a unique index; an externally-supplied corpus
        # may repeat doc_ids, so mirror the old dict semantics (last wins)
        # by keeping only the final occurrence of each key.
        idx = pd.Index(keys)
        if not idx.is_unique:
            keep = ~pd.Series(keys).duplicated(keep="last").to_numpy()
            self.table = self.table.filter(pa.array(keep)).combine_chunks()
            idx = pd.Index(self.table.column("doc_id").to_pylist())
        self.index = idx
        self.spans = self.table.column("spans").combine_chunks()

    def fetch(self, urls: list[str]) -> pa.Table:
        """URLs → (status, spans) in input order; 404 + empty spans on miss."""
        idx = self.index.get_indexer(urls)
        hits = idx >= 0
        sub = self.spans.take(pa.array(idx[hits]))
        if isinstance(sub, pa.ChunkedArray):
            sub = sub.combine_chunks()
        # append one empty-spans row; misses index it
        pool = pa.concat_arrays([sub, _EMPTY_SPANS_ROW])
        pos = np.full(len(urls), len(sub), dtype=np.int64)
        pos[hits] = np.arange(int(hits.sum()))
        spans = pool.take(pa.array(pos))
        status = np.where(hits, 200, 404).astype(np.int32)
        return pa.Table.from_arrays(
            [pa.array(list(urls), pa.string()), pa.array(status), spans],
            names=["url", "status", "spans"],
        )

    def num_docs(self) -> int:
        return len(self.index)

    def hosts(self) -> list[str]:
        """Distinct hosts present in this shard (used to pre-resolve the
        in-scope host set for robots.txt learning, S5/T2)."""
        from .. import urlnorm

        if len(self.index) == 0:
            return []
        arr = pa.array(self.index.to_list(), pa.string())
        return pc.unique(urlnorm.host_of(arr)).to_pylist()


def make_fetch_fn(
    handles: list,
    n_shards: int,
    crawl_id: str,
    fetch_round: int,
    agent: str = "",
    stop_flag_path: str = "",
):
    """Stateless map_batches fn: frontier batch → FETCHED-schema batch.

    Partitions the batch's URLs by corpus shard, fires one ``fetch.remote``
    per shard, and reassembles rows in frontier order. ``agent`` is stamped
    into every row (M6 — reference: UA override at scan.rs:34-36).

    ``stop_flag_path``: mid-round cooperative shutdown — the reference's
    "shutdown" control aborts a crawl at ANY time (spider::utils::shutdown,
    /root/reference/src/rpc/client.rs:88-99); checking the flag per fetch
    batch makes a long distributed round abort within one batch instead of
    only at the round boundary. Skipped batches are safe: pages are recorded
    in the seen set at discovery, not at fetch, and resume re-runs from the
    last committed round."""
    import ray

    def fetch_batch(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").combine_chunks()
        n = len(urls)
        if n == 0 or (stop_flag_path and os.path.exists(stop_flag_path)):
            return schemas.FETCHED.empty_table()
        url_np = urls.to_numpy(zero_copy_only=False)
        shard = (stable_hash64(url_np) % n_shards).astype(np.int64)
        refs, positions = [], []
        for s in np.unique(shard):
            pos = np.flatnonzero(shard == s)
            refs.append(handles[int(s)].fetch.remote(url_np[pos]))
            positions.append(pos)
        parts = ray.get(refs)
        status = np.empty(n, dtype=np.int32)
        span_parts, order = [], []
        for pos, part in zip(positions, parts):
            status[pos] = part.column("status").to_numpy()
            span_parts.append(part.column("spans").combine_chunks())
            order.append(pos)
        # reassemble spans in original order
        pool = pa.concat_arrays(span_parts)
        back = np.empty(n, dtype=np.int64)
        back[np.concatenate(order)] = np.arange(n)
        spans = pool.take(pa.array(back))
        return pa.Table.from_arrays(
            [
                urls,
                batch.column("host").combine_chunks(),
                batch.column("depth").combine_chunks().cast(pa.int32()),
                pa.array(status),
                spans,
                pa.array(np.full(n, fetch_round, dtype=np.int32)),
                pa.array([crawl_id] * n, pa.string()),
                pa.array([agent] * n, pa.string()),
            ],
            schema=schemas.FETCHED,
        )

    return fetch_batch
