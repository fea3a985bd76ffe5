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


def write_table(table: pa.Table, uri: str) -> None:
    """Write one table to the backend matching the URI suffix."""
    if is_lance_uri(uri):
        if not HAVE_LANCE:
            raise ImportError("lance not installed")
        import lance

        lance.write_dataset(table, uri)
        return
    pq.write_table(table, uri)
