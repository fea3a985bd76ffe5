"""User-extension surface (SURVEY.md §2.10): a registry of NAMED result
stages composed into the crawl's sink path.

The reference's plugin boundary is its gRPC contract — any server
implementing `proto/website.proto` receives the crawl results
(/root/reference/README.md:119-123); what a user plugs in is the processing
of result pages, not the crawl internals. The rebuild mirrors that: a stage
is a named batch transform `(pa.Table) -> pa.Table` (or a callable class,
instantiated once — actor-style state) applied to every round's FETCHED
batches on their way to the per-round sink (S6). The crawl pipeline itself
(extraction, dedup, scheduling) is untouched, so registered stages can never
change crawl semantics — exactly like a downstream gRPC consumer.

Select stages per job with ``CrawlConfig.post_fetch_stages = ("name", ...)``.
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa

_REGISTRY: dict[str, Callable | type] = {}


def register_stage(name: str, fn_or_cls: Callable | type) -> None:
    """Register a batch transform (or callable class) under ``name``.
    Re-registering a name overwrites it (latest wins — test convenience)."""
    _REGISTRY[name] = fn_or_cls


def get_stage(name: str) -> Callable:
    """Resolve a registered stage to a callable (classes are instantiated
    once per call site — per actor/worker in a map_batches pipeline)."""
    try:
        obj = _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown stage {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None
    return obj() if isinstance(obj, type) else obj


def apply_stages_table(tab: pa.Table, names: tuple[str, ...]) -> pa.Table:
    """Driver-side composition (the coordinator fast path)."""
    for n in names:
        tab = get_stage(n)(tab)
    return tab


def apply_stages_dataset(ds, names: tuple[str, ...]):
    """Distributed composition: one fused map_batches per stage."""
    for n in names:
        ds = ds.map_batches(get_stage(n), batch_format="pyarrow")
    return ds
