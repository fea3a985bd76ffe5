"""Link extraction over interleaved spans — the rebuild of the reference's
HTML link extractor (SURVEY.md M2; reference call-site: spider's parse inside
``website.crawl()``, /root/reference/src/scanner/scan.rs:76, via fast_html5ever
+ selectors — Cargo.lock:644,2026).

Here a "page" is a corpus row of interleaved spans; links are the spans with
``kind='link'`` whose ``text`` is the absolute target URL. The explode is pure
zero-copy Arrow: ``list_flatten`` + ``list_parent_indices`` + a boolean filter —
no Python per-row loop.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .. import schemas, urlnorm


def extract_links(batch: pa.Table) -> pa.Table:
    """fetched-batch (url, depth, crawl_id, spans) → links rows
    (src, dst, dst_host, depth=src_depth+1, crawl_id).

    Targets are normalized (lowercased host, stripped fragment/default port);
    non-absolute or unparsable targets are resolved against the source URL.
    """
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = pc.list_flatten(spans)
    parents = pc.list_parent_indices(spans)

    kinds = pc.struct_field(flat, "kind")
    is_link = pc.equal(kinds, "link")
    link_idx = pc.indices_nonzero(is_link)

    targets = pc.take(pc.struct_field(flat, "text"), link_idx)
    src_rows = pc.take(parents, link_idx)

    src = pc.take(batch.column("url"), src_rows)
    depth = pc.take(batch.column("depth"), src_rows)
    crawl_id = pc.take(batch.column("crawl_id"), src_rows)

    dst, dst_host = urlnorm.normalize_and_host(targets)
    # relative / unparsable targets: resolve against src then re-normalize
    if pc.any(pc.is_null(dst)).as_py():
        resolved = urlnorm.resolve(targets, src)
        dst, dst_host = urlnorm.normalize_and_host(resolved)

    out = pa.Table.from_arrays(
        [
            _as_array(src),
            dst,
            dst_host,
            pc.add(_as_array(depth), pa.scalar(1, pa.int32())).cast(pa.int32()),
            _as_array(crawl_id),
        ],
        schema=schemas.LINKS,
    )
    # drop rows whose target could not be made absolute at all
    return out.filter(pc.is_valid(out.column("dst")))


def span_kind_counts(batch: pa.Table) -> pa.Table:
    """Per-document span mix (n_text/n_link/n_media) — a cheap vectorized
    profile stage used by tests and the entry smoke pipeline."""
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = pc.list_flatten(spans)
    parents = pc.list_parent_indices(spans)
    kinds = pc.struct_field(flat, "kind")
    n = len(batch)
    import numpy as np

    par = parents.to_numpy(zero_copy_only=False)
    out = {}
    for kind in ("text", "link", "media"):
        mask = pc.equal(kinds, kind).to_numpy(zero_copy_only=False)
        out[f"n_{kind}"] = np.bincount(par[mask], minlength=n).astype("int64")
    return pa.Table.from_arrays(
        [batch.column("doc_id"), pa.array(out["n_text"]), pa.array(out["n_link"]), pa.array(out["n_media"])],
        names=["doc_id", "n_text", "n_link", "n_media"],
    )


def _as_array(col):
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col
