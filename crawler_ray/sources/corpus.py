"""Corpus source facade (SURVEY.md §7.1 step 0).

The north rule's corpus lives in **Lance** tables; this sandbox has no
``lance``/``pylance`` wheel, so the facade selects the backend at import time:
``read_corpus`` uses ``ray.data.read_lance`` for ``*.lance`` URIs when the
package is importable and falls back to Parquet otherwise — both yield the
same `(doc_id, spans)` Arrow schema, so every downstream stage is
backend-agnostic. ``CorpusShard`` (stages/fetch.py) reads through the same
helper for its shard load.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

try:  # pragma: no cover - not installed in this sandbox
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def is_lance_uri(uri: str) -> bool:
    return uri.rstrip("/").endswith(".lance")


def read_corpus(uri: str, columns=None):
    """→ ray.data.Dataset of corpus rows (lazy, column-pruned at the read)."""
    import ray.data as rd

    if is_lance_uri(uri):
        if not HAVE_LANCE:
            raise ImportError(
                "corpus URI is a Lance dataset but the 'lance' package is not "
                "installed; install pylance or convert to parquet"
            )
        return rd.read_lance(uri, columns=columns)
    return rd.read_parquet(uri, columns=columns)


def read_corpus_table(uri: str, columns=None) -> pa.Table:
    """Eager single-table read (shard loads, oracle fixtures)."""
    if is_lance_uri(uri):
        if not HAVE_LANCE:
            raise ImportError("lance not installed")
        import lance

        return lance.dataset(uri).to_table(columns=columns)
    return pq.read_table(uri, columns=columns)


import threading as _threading

_BUILD_LOCK = _threading.Lock()
_SHARD_CACHE_ROOT = "/tmp/crawler_ray_shards"
# overridable so tests can drive the engine through the pre-sharded path on
# tiny corpora
_PRESHARD_MIN_BYTES = int(
    __import__("os").environ.get("CRAWLER_RAY_PRESHARD_MIN_BYTES", 32 << 20)
)


def ensure_sharded(uri: str, n_shards: int, min_bytes: int | None = None) -> str:
    """Pre-partition the corpus by ``hash(doc_id) % n_shards`` ONCE (a
    distributed Ray Data job, cached by (path, mtime, size, n_shards)) so
    each ``CorpusShard`` actor reads only its ``shard=K`` directory — ~1/N
    of the bytes — instead of the whole corpus (VERDICT r2 #5: N actors ×
    full-corpus reads made startup I/O N× the corpus). Returns the
    partitioned directory, or the original uri untouched when pre-sharding
    doesn't pay (small corpus) or doesn't apply (Lance handles carry their
    own row-group pruning path).

    Concurrency-safe on both axes: same-process threads (run_jobs builds
    engines in parallel) serialize on a module lock; separate processes
    build under pid+thread-suffixed temp dirs and commit with an atomic
    rename — a lost race discards the duplicate and reuses the winner's
    directory."""
    import hashlib
    import os
    import shutil
    import threading

    if min_bytes is None:
        min_bytes = int(os.environ.get("CRAWLER_RAY_PRESHARD_MIN_BYTES", _PRESHARD_MIN_BYTES))
    if is_lance_uri(uri) or not os.path.isfile(uri):
        return uri
    st = os.stat(uri)
    if st.st_size < min_bytes:
        return uri
    key = hashlib.md5(
        f"{os.path.abspath(uri)}|{st.st_mtime_ns}|{st.st_size}|{n_shards}".encode()
    ).hexdigest()[:16]
    final = os.path.join(_SHARD_CACHE_ROOT, key)
    if os.path.isdir(final):
        return final

    import numpy as np
    import ray.data as rd

    from ..state.seen import stable_hash64

    def add_shard(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
        sh = (stable_hash64(ids) % n_shards).astype(np.int64)
        return t.append_column("shard", pa.array(sh))

    with _BUILD_LOCK:
        if os.path.isdir(final):  # another thread won while we waited
            return final
        os.makedirs(_SHARD_CACHE_ROOT, exist_ok=True)
        tmp = f"{final}.tmp.{os.getpid()}.{threading.get_ident()}"
        shutil.rmtree(tmp, ignore_errors=True)
        rd.read_parquet(uri).map_batches(
            add_shard, batch_format="pyarrow"
        ).write_parquet(tmp, partition_cols=["shard"])
        try:
            os.rename(tmp, final)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
            # only a lost cross-process race leaves the winner's directory in
            # place; any other rename failure (permissions, EXDEV) must not
            # silently hand callers a nonexistent path
            if not os.path.isdir(final):
                raise
    return final


def write_table(table: pa.Table, uri: str) -> None:
    """Write one table to the backend matching the URI suffix."""
    if is_lance_uri(uri):
        if not HAVE_LANCE:
            raise ImportError("lance not installed")
        import lance

        lance.write_dataset(table, uri)
        return
    pq.write_table(table, uri)
