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
import pandas as pd
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


class MediaResizeStub:
    """Actor-pool resize stage (image path of the multimodal family). Real
    mode would decode → resize → re-encode via PIL; the sandbox stub derives
    deterministic source dimensions from the ref hash and emits the
    post-resize metadata the downstream schema needs — the Ray plumbing
    (actor signature, batch size, output layout) is the real contract."""

    def __init__(self, target: int = 256, real: bool = False):
        self.target = target
        self.real = real

    def __call__(self, t: pa.Table) -> pa.Table:
        refs = t["media_ref"].combine_chunks().to_numpy(zero_copy_only=False)
        if self.real:
            raise NotImplementedError(
                "image resize needs PIL/torchvision, absent in this environment"
            )
        h = stable_hash64(refs)
        src_w = (h % np.uint64(3840) + np.uint64(64)).astype(np.int64)
        src_h = ((h >> np.uint64(17)) % np.uint64(2160) + np.uint64(64)).astype(np.int64)
        scale = self.target / np.maximum(src_w, src_h)
        scale = np.minimum(scale, 1.0)  # never upscale
        out_w = np.maximum((src_w * scale).astype(np.int64), 1)
        out_h = np.maximum((src_h * scale).astype(np.int64), 1)
        return pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks(),
                "media_ref": t["media_ref"].combine_chunks(),
                "src_w": pa.array(src_w),
                "src_h": pa.array(src_h),
                "out_w": pa.array(out_w),
                "out_h": pa.array(out_h),
                "is_stub": pa.array(np.ones(len(t), dtype=bool)),
            }
        )


def media_resize(sf_dir: str, target: int = 256):
    """Manifest → actor-pool resize metadata stage."""
    return media_manifest(sf_dir).map_batches(
        MediaResizeStub,
        fn_constructor_kwargs={"target": target},
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=2,
        num_cpus=1,
    )


class MediaFrameSampleStub:
    """Actor-pool frame-sampling stage (video path): each media ref expands
    to ``n_frames`` evenly-spaced frame references with timestamps over a
    deterministic stub duration (real mode = ffmpeg keyframe extraction).
    One input row → n output rows, the flat_map-shaped transform a video
    pipeline needs."""

    def __init__(self, n_frames: int = 4, real: bool = False):
        self.n_frames = n_frames
        self.real = real

    def __call__(self, t: pa.Table) -> pa.Table:
        refs = t["media_ref"].combine_chunks().to_numpy(zero_copy_only=False)
        if self.real:
            raise NotImplementedError(
                "frame extraction needs ffmpeg, absent in this environment"
            )
        k = self.n_frames
        n = len(refs)
        h = stable_hash64(refs)
        duration_ms = (h % np.uint64(600_000) + np.uint64(1_000)).astype(np.int64)
        frame_idx = np.tile(np.arange(k, dtype=np.int64), n)
        ts_ms = (np.repeat(duration_ms, k) * (frame_idx * 2 + 1)) // (2 * k)
        rep = np.repeat(np.arange(n), k)
        frame_ref = pd.Series(np.repeat(refs, k)).str.cat(
            pd.Series(frame_idx.astype(str)), sep="#frame-"
        )
        return pa.table(
            {
                "doc_id": pc.take(t["doc_id"].combine_chunks(), pa.array(rep)),
                "media_ref": pa.array(np.repeat(refs, k), pa.string()),
                "frame_ref": pa.array(frame_ref.to_numpy(dtype=object), pa.string()),
                "frame_idx": pa.array(frame_idx),
                "ts_ms": pa.array(ts_ms),
            }
        )


def media_frames(sf_dir: str, n_frames: int = 4):
    """Manifest → actor-pool frame-sample stage (1 row → n_frames rows)."""
    return media_manifest(sf_dir).map_batches(
        MediaFrameSampleStub,
        fn_constructor_kwargs={"n_frames": n_frames},
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=2,
        num_cpus=1,
    )
