"""Fixed pyarrow schemas for every table the engine produces or consumes.

The reference's schema system is fixed protobuf messages compiled at build time
(reference: proto/crawler.proto:17-27, proto/website.proto:14-26, build.rs:5-7);
the rebuild equivalently declares fixed Arrow schemas once, here. No inference.

Table roles (SURVEY.md §1.2):
  corpus     — the "web": one row per page, interleaved text/link/media spans.
  frontier   — URLs scheduled for fetching (spider's in-memory frontier).
  fetched    — fetch results (reference `Page`, scan.rs:54-57); spans generalize
               `get_html()` to interleaved payloads.
  links      — extracted link edges (spider link extraction call-site scan.rs:76).
  seen       — checkpointed URL-seen state per shard (crawl.rs:42-44 visited set).
  host_state — robots + politeness state per host (scan.rs:25-26).
  lineage    — per-round/per-stage metrics + checkpoint pointers (north rule).
  results    — ScanParams analogue (proto/website.proto:14-20).
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),        # 'text' | 'link' | 'media'
        ("text", pa.string()),        # prose, or ABSOLUTE target URL when kind='link'
        ("media_ref", pa.string()),   # media object key when kind='media', else ''
        ("offset", pa.int32()),       # strictly increasing document order
    ]
)

SPANS = pa.list_(SPAN_STRUCT)

CORPUS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", SPANS),
    ]
)

FRONTIER = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("priority", pa.float64()),
        ("parent", pa.string()),
        ("crawl_id", pa.string()),
        ("discovered_round", pa.int32()),
    ]
)

FETCHED = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("status", pa.int32()),       # 200 = hit, 404 = dangling link (doc not in corpus)
        ("spans", SPANS),
        ("fetch_round", pa.int32()),
        ("crawl_id", pa.string()),
        ("agent", pa.string()),       # UA the fetch was issued under (M6)
    ]
)

LINKS = pa.schema(
    [
        ("src", pa.string()),
        ("dst", pa.string()),
        ("dst_host", pa.string()),
        ("depth", pa.int32()),        # depth of dst = depth(src) + 1
        ("crawl_id", pa.string()),
    ]
)

SEEN = pa.schema(
    [
        ("shard", pa.int32()),
        ("url", pa.string()),
    ]
)

HOST_STATE = pa.schema(
    [
        ("host", pa.string()),
        ("robots_disallow", pa.list_(pa.string())),
        ("crawl_delay_ms", pa.int64()),
        ("robots_allow", pa.list_(pa.string())),
        ("last_fetch_round", pa.int32()),
        ("fetched_total", pa.int64()),
    ]
)

LINEAGE = pa.schema(
    [
        ("crawl_id", pa.string()),
        ("round", pa.int32()),
        ("stage", pa.string()),
        ("rows_in", pa.int64()),
        ("rows_out", pa.int64()),
        ("wall_ms", pa.int64()),
        ("checkpoint_uri", pa.string()),
    ]
)

RESULTS = pa.schema(
    [
        ("crawl_id", pa.string()),
        ("url", pa.string()),
        ("full", pa.bool_()),         # ScanParams.full analogue (crawl.rs:50)
    ]
)

ROBOTS = pa.schema(
    [
        ("host", pa.string()),
        ("disallow", pa.list_(pa.string())),
        ("crawl_delay_ms", pa.int64()),
    ]
)


def empty(schema: pa.Schema) -> pa.Table:
    """An empty Arrow table with the given fixed schema."""
    return schema.empty_table()
