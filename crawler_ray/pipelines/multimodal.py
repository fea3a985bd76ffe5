"""Multimodal column handling: media spans are opaque references with typed
metadata; decode/feature-extract runs as an actor-pool ``map_batches`` stage.

The actual byte decode is a STUB (no image/audio libraries in this container):
``MediaDecodeStub`` raises ``NotImplementedError`` when asked for real decode
and otherwise produces a deterministic fake feature vector derived from the
media_ref hash — so the Ray-side plumbing (schema, batch sizing, actor
signature, output layout) is real and tested, and a real decoder drops in by
replacing one method.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..state.seen import stable_hash64
from .crawlq import corpus_for_sf  # noqa: E402  (corpus path helper)

_FEAT_DIM = 8


def media_manifest(sf_dir: str):
    """Explode ``kind='media'`` spans into a manifest table
    (doc_id, media_ref, offset) — zero-copy Arrow list ops."""
    import ray.data as rd

    path = corpus_for_sf(sf_dir)

    def explode(t: pa.Table) -> pa.Table:
        spans = t["spans"].combine_chunks()
        flat = pc.list_flatten(spans)
        parents = pc.list_parent_indices(spans)
        is_media = pc.equal(pc.struct_field(flat, "kind"), "media")
        idx = pc.indices_nonzero(is_media)
        return pa.table(
            {
                "doc_id": pc.take(t["doc_id"].combine_chunks(), pc.take(parents, idx)),
                "media_ref": pc.take(pc.struct_field(flat, "media_ref"), idx),
                "offset": pc.take(pc.struct_field(flat, "offset"), idx),
            }
        )

    return rd.read_parquet(path).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )


class MediaDecodeStub:
    """Actor-pool decode stage. ``real=False`` (the only mode available in
    this sandbox) emits deterministic pseudo-features; ``real=True`` raises
    NotImplementedError where PIL/ffmpeg decoding would go."""

    def __init__(self, real: bool = False, feat_dim: int = _FEAT_DIM):
        self.real = real
        self.feat_dim = feat_dim

    def _decode_real(self, refs):
        raise NotImplementedError(
            "media byte decode needs image/audio libraries not present in this "
            "environment; swap this method for a PIL/torchvision/ffmpeg decoder"
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        refs = t["media_ref"].combine_chunks().to_numpy(zero_copy_only=False)
        if self.real:
            self._decode_real(refs)
        h = stable_hash64(refs)
        # deterministic fake: 8 floats in [0,1) per ref, derived from its hash
        mults = (np.arange(1, self.feat_dim + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))
        feats = ((h[:, None] * mults[None, :]) >> np.uint64(11)).astype(np.float64) / float(1 << 53)
        return pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks(),
                "media_ref": t["media_ref"].combine_chunks(),
                "features": pa.array(list(np.round(feats, 6)), pa.list_(pa.float64(), self.feat_dim)),
                "is_stub": pa.array(np.ones(len(t), dtype=bool)),
            }
        )


def media_features(sf_dir: str):
    """Manifest → actor-pool decode/feature stage. Small batches (media rows
    are payload-heavy in real corpora), pool sized explicitly."""
    return media_manifest(sf_dir).map_batches(
        MediaDecodeStub,
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=2,
        num_cpus=1,
    )
