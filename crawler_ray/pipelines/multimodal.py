"""Multimodal column handling: media spans reference opaque binary payloads
(here: real uncompressed P6 PPM images, synth.ppm_bytes) stored in a payload
table keyed by media_ref; decode / feature-extract / resize / frame-sample run
as actor-pool ``map_batches`` stages over a manifest ⋈ payload hash join.

The decode itself is REAL pure-numpy parsing of the image bytes (header +
``np.frombuffer`` pixel grid) — no image libraries needed for the
uncompressed format. A compressed-format decoder (JPEG/PNG via PIL,
video via ffmpeg) would drop in by replacing :func:`decode_ppm`; the stage
signatures, batch sizing, join plumbing and output schemas are the contract
and do not change. Per-image work is a Python loop over the batch (decoders
are inherently per-image), with all pixel math vectorized inside each image.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..synth import PPM_HEADER_LEN
from . import partitions
from .rounding import round_np
from .crawlq import corpus_for_sf, spec_for_sf  # noqa: E402  (corpus helpers)

from ..config import actor_pool_limits

_FEAT_DIM = 8


def decode_ppm(payload) -> np.ndarray:
    """Parse one P6 PPM payload → (H, W, 3) uint8 array. Pure numpy."""
    buf = bytes(payload)
    magic, w, h, maxval = buf[:PPM_HEADER_LEN].split()
    if magic != b"P6" or maxval != b"255":
        raise ValueError("not a synth P6 PPM payload")
    w, h = int(w), int(h)
    px = np.frombuffer(buf, dtype=np.uint8, offset=PPM_HEADER_LEN, count=h * w * 3)
    return px.reshape(h, w, 3)


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


def media_blob_path(sf_dir: str) -> str:
    """Payload parquet (media_ref, payload) for this sf tier's corpus."""
    from ..synth import media_path

    return media_path(spec_for_sf(sf_dir))


def manifest_with_payload(sf_dir: str):
    """manifest ⋈ payload blobs on media_ref — the standard large-side hash
    join (payloads are data-sized, never a driver broadcast; partition count
    derives from the blob table's file bytes)."""
    import os

    import ray.data as rd

    blobs = media_blob_path(sf_dir)
    np_ = partitions.for_bytes(os.path.getsize(blobs), partitions.TARGET_JOIN_BYTES)
    return media_manifest(sf_dir).join(
        rd.read_parquet(blobs),
        join_type="inner",
        on=("media_ref",),
        num_partitions=np_,
    )


def media_meta(sf_dir: str):
    """Per-manifest-row image metadata decoded from the REAL payload bytes:
    (doc_id, media_ref, width, height, n_bytes). Oracle:
    ``media_meta_sql`` parses the same dims out of the fixed-width PPM
    header with SQL byte functions."""

    def meta(t: pa.Table) -> pa.Table:
        dims = np.array(
            [decode_ppm(p).shape for p in t["payload"].to_pylist()], dtype=np.int64
        ).reshape(-1, 3)
        return pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks(),
                "media_ref": t["media_ref"].combine_chunks(),
                "width": pa.array(dims[:, 1].astype(np.int32)),
                "height": pa.array(dims[:, 0].astype(np.int32)),
                "n_bytes": pa.array(
                    pc.binary_length(t["payload"].combine_chunks()).cast(pa.int64())
                ),
            }
        )

    return manifest_with_payload(sf_dir).map_batches(meta, batch_format="pyarrow")


def media_meta_sql(sf_dir: str) -> str:
    """DuckDB oracle for :func:`media_meta` — byte-parse the fixed 13-byte
    PPM header (b'P6\\nWW HH\\n255\\n') of every joined payload."""
    corpus = corpus_for_sf(sf_dir)
    blobs = media_blob_path(sf_dir)
    return f"""
    WITH manifest AS (
        SELECT t.doc_id, u.s['media_ref'] AS media_ref
        FROM read_parquet('{corpus}') t, UNNEST(t.spans) AS u(s)
        WHERE u.s['kind'] = 'media'
    )
    SELECT m.doc_id, m.media_ref,
           -- bytes 4-5 / 7-8 of the header are the 2-digit ASCII dims;
           -- DuckDB has no BLOB substring, so slice the hex dump instead
           CAST(decode(unhex(substring(hex(b.payload),  7, 4))) AS INTEGER) AS width,
           CAST(decode(unhex(substring(hex(b.payload), 13, 4))) AS INTEGER) AS height,
           CAST(OCTET_LENGTH(b.payload) AS BIGINT)  AS n_bytes
    FROM manifest m JOIN read_parquet('{blobs}') b USING (media_ref)
    """


class MediaDecode:
    """Actor-pool decode + feature stage over real payload bytes.

    Output stats (flat named columns so a DuckDB oracle can hash-check every
    value): width, height, n_px, mean_r/g/b, gray_mean, gray_std — all
    derived from the decoded pixel grid via EXACT integer channel sums
    (Σc, Σc², Σc·c') so the float expressions below are reproduced
    bit-for-bit by :func:`media_features_sql` (same IEEE ops in the same
    order). A downstream embedding consumer packs them into a vector with
    one ``map_batches`` (the list-vector shape is exercised by the ANN
    family). Batches missing a ``payload`` column (an external corpus
    without blobs) fall back to deterministic hash features with
    ``is_stub=True`` so the pipeline shape still runs end-to-end."""

    STAT_COLS = ("mean_r", "mean_g", "mean_b", "gray_mean", "gray_std")

    def _features(self, payloads) -> dict:
        n_imgs = len(payloads)
        out = {
            "width": np.empty(n_imgs, dtype=np.int32),
            "height": np.empty(n_imgs, dtype=np.int32),
            "n_px": np.empty(n_imgs, dtype=np.int64),
        }
        for k in self.STAT_COLS:
            out[k] = np.empty(n_imgs, dtype=np.float64)
        for i, p in enumerate(payloads):
            img = decode_ppm(p)
            h, w, _ = img.shape
            n = float(h * w)
            px = img.reshape(-1, 3).astype(np.int64)
            sr, sg, sb = (float(x) for x in px.sum(axis=0))
            # exact integer cross-products (< 2^53, so the float casts and
            # the arithmetic below match the SQL oracle bit-for-bit)
            rr, gg, bb = (float(x) for x in (px * px).sum(axis=0))
            rg = float((px[:, 0] * px[:, 1]).sum())
            rb = float((px[:, 0] * px[:, 2]).sum())
            gb = float((px[:, 1] * px[:, 2]).sum())
            gray_mean = (0.299 * sr + 0.587 * sg + 0.114 * sb) / n
            e2 = (
                0.299 * 0.299 * rr
                + 0.587 * 0.587 * gg
                + 0.114 * 0.114 * bb
                + 2.0 * 0.299 * 0.587 * rg
                + 2.0 * 0.299 * 0.114 * rb
                + 2.0 * 0.587 * 0.114 * gb
            ) / n
            out["width"][i], out["height"][i], out["n_px"][i] = w, h, h * w
            out["mean_r"][i], out["mean_g"][i], out["mean_b"][i] = (
                sr / n,
                sg / n,
                sb / n,
            )
            out["gray_mean"][i] = gray_mean
            out["gray_std"][i] = np.sqrt(max(e2 - gray_mean * gray_mean, 0.0))
        return out

    def _stub_features(self, refs) -> dict:
        from ..state.seen import stable_hash64

        h = stable_hash64(np.asarray(refs, dtype=object))
        mults = (
            np.arange(1, len(self.STAT_COLS) + 1, dtype=np.uint64)
            * np.uint64(0x9E3779B97F4A7C15)
        )
        feats = ((h[:, None] * mults[None, :]) >> np.uint64(11)).astype(
            np.float64
        ) / float(1 << 53)
        out = {
            "width": np.zeros(len(refs), dtype=np.int32),
            "height": np.zeros(len(refs), dtype=np.int32),
            "n_px": np.zeros(len(refs), dtype=np.int64),
        }
        for j, k in enumerate(self.STAT_COLS):
            out[k] = feats[:, j]
        return out

    def __call__(self, t: pa.Table) -> pa.Table:
        is_stub = "payload" not in t.column_names
        if is_stub:
            refs = t["media_ref"].combine_chunks().to_numpy(zero_copy_only=False)
            stats = self._stub_features(refs)
        else:
            stats = self._features(t["payload"].to_pylist())
        cols = {
            "doc_id": t["doc_id"].combine_chunks(),
            "media_ref": t["media_ref"].combine_chunks(),
            "width": pa.array(stats["width"]),
            "height": pa.array(stats["height"]),
            "n_px": pa.array(stats["n_px"]),
        }
        for k in self.STAT_COLS:
            cols[k] = pa.array(round_np(stats[k], 6))
        cols["is_stub"] = pa.array(np.full(len(t), is_stub))
        return pa.table(cols)


def media_features(sf_dir: str):
    """manifest ⋈ payloads → actor-pool decode/feature stage. Small batches
    (media rows are payload-heavy), pool sized explicitly."""
    return manifest_with_payload(sf_dir).map_batches(
        MediaDecode,
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=actor_pool_limits(),
        num_cpus=1,
    )


# byte j (0-based) of a blob, via its hex dump — DuckDB 1.0 has no direct
# blob indexing (shared by the three pixel-math oracles below)
_SQL_BYTE = (
    "(16 * (strpos('0123456789ABCDEF', substring(hx, 2*j + 1, 1)) - 1)"
    " + strpos('0123456789ABCDEF', substring(hx, 2*j + 2, 1)) - 1)"
)


def _sql_pixels(blobs: str) -> str:
    """CTE fragment: one row per (media_ref, pixel byte) with its channel and
    pixel coordinates, parsed straight out of the PPM payload bytes."""
    return f"""
    blobs AS (
        SELECT media_ref, hex(payload) AS hx,
               CAST(OCTET_LENGTH(payload) AS BIGINT) AS len,
               CAST(decode(unhex(substring(hex(payload),  7, 4))) AS BIGINT) AS w,
               CAST(decode(unhex(substring(hex(payload), 13, 4))) AS BIGINT) AS h
        FROM read_parquet('{blobs}')
    ),
    pixels AS (
        SELECT media_ref, w, h, j - {PPM_HEADER_LEN} AS pj,
               (j - {PPM_HEADER_LEN}) % 3 AS chan,
               ((j - {PPM_HEADER_LEN}) // 3) // w AS y,
               ((j - {PPM_HEADER_LEN}) // 3) % w AS x,
               {_SQL_BYTE} AS b
        FROM blobs, UNNEST(generate_series({PPM_HEADER_LEN}, len - 1)) AS g(j)
    )"""


def _media_stats_cte(blobs: str) -> str:
    """CTE chain ending in ``stats`` — per-media_ref rounded decode stats
    recomputed from raw payload bytes. Shared by the media_features and
    media_ann oracles; the float expressions mirror ``MediaDecode``
    token-for-token (``0.299e0`` literals force DOUBLE arithmetic)."""
    return f"""
    {_sql_pixels(blobs)},
    sums AS (
        SELECT media_ref, MAX(w) AS w, MAX(h) AS h,
               CAST(MAX(w) * MAX(h) AS DOUBLE) AS n,
               CAST(SUM(CASE WHEN chan = 0 THEN b ELSE 0 END) AS DOUBLE) AS sr,
               CAST(SUM(CASE WHEN chan = 1 THEN b ELSE 0 END) AS DOUBLE) AS sg,
               CAST(SUM(CASE WHEN chan = 2 THEN b ELSE 0 END) AS DOUBLE) AS sb,
               CAST(SUM(CASE WHEN chan = 0 THEN b * b ELSE 0 END) AS DOUBLE) AS rr,
               CAST(SUM(CASE WHEN chan = 1 THEN b * b ELSE 0 END) AS DOUBLE) AS gg,
               CAST(SUM(CASE WHEN chan = 2 THEN b * b ELSE 0 END) AS DOUBLE) AS bb
        FROM pixels GROUP BY media_ref
    ),
    cross_sums AS (
        SELECT media_ref,
               CAST(SUM(r * g) AS DOUBLE) AS rg,
               CAST(SUM(r * bl) AS DOUBLE) AS rb,
               CAST(SUM(g * bl) AS DOUBLE) AS gb
        FROM (
            SELECT media_ref, pj // 3 AS px,
                   SUM(CASE WHEN chan = 0 THEN b ELSE 0 END) AS r,
                   SUM(CASE WHEN chan = 1 THEN b ELSE 0 END) AS g,
                   SUM(CASE WHEN chan = 2 THEN b ELSE 0 END) AS bl
            FROM pixels GROUP BY media_ref, pj // 3
        ) GROUP BY media_ref
    ),
    stats AS (
        SELECT s.media_ref,
               CAST(s.w AS INTEGER) AS width, CAST(s.h AS INTEGER) AS height,
               CAST(s.w * s.h AS BIGINT) AS n_px,
               ROUND(sr / n, 6) AS mean_r,
               ROUND(sg / n, 6) AS mean_g,
               ROUND(sb / n, 6) AS mean_b,
               ROUND((0.299e0 * sr + 0.587e0 * sg + 0.114e0 * sb) / n, 6)
                   AS gray_mean,
               ROUND(SQRT(GREATEST(
                   (0.299e0 * 0.299e0 * rr + 0.587e0 * 0.587e0 * gg
                    + 0.114e0 * 0.114e0 * bb + 2e0 * 0.299e0 * 0.587e0 * c.rg
                    + 2e0 * 0.299e0 * 0.114e0 * c.rb
                    + 2e0 * 0.587e0 * 0.114e0 * c.gb) / n
                   - ((0.299e0 * sr + 0.587e0 * sg + 0.114e0 * sb) / n)
                     * ((0.299e0 * sr + 0.587e0 * sg + 0.114e0 * sb) / n),
                   0e0)), 6) AS gray_std
        FROM sums s JOIN cross_sums c USING (media_ref)
    )"""


def media_features_sql(sf_dir: str) -> str:
    """DuckDB oracle for :func:`media_features`: recompute every stat from
    the raw payload bytes (see :func:`_media_stats_cte`), matching the
    engine's round_np(·, 6) (half-away, the repo-wide DuckDB parity mode)
    exactly."""
    corpus = corpus_for_sf(sf_dir)
    blobs = media_blob_path(sf_dir)
    return f"""
    WITH manifest AS (
        SELECT t.doc_id, u.s['media_ref'] AS media_ref
        FROM read_parquet('{corpus}') t, UNNEST(t.spans) AS u(s)
        WHERE u.s['kind'] = 'media'
    ),
    {_media_stats_cte(blobs)}
    SELECT m.doc_id, m.media_ref, st.width, st.height, st.n_px,
           st.mean_r, st.mean_g, st.mean_b, st.gray_mean, st.gray_std,
           FALSE AS is_stub
    FROM manifest m JOIN stats st USING (media_ref)
    """


def media_resize_sql(sf_dir: str, target: int = 256) -> str:
    """DuckDB oracle for :func:`media_resize`: recompute the box-filter from
    raw payload bytes. Pixel (y, x) belongs to output bucket
    ``ceil((y+1)·out_h / h) − 1`` (the inverse of the integer bucket edges
    ``ys[i] = (i·h) // out_h`` in :func:`box_resize`); per-bucket value is
    the floor-divided channel sum, identical to the engine's integral-image
    path, and ``out_mean`` is the exact integer average of those values."""
    corpus = corpus_for_sf(sf_dir)
    blobs = media_blob_path(sf_dir)
    t = int(target)
    return f"""
    WITH manifest AS (
        SELECT t.doc_id, u.s['media_ref'] AS media_ref
        FROM read_parquet('{corpus}') t, UNNEST(t.spans) AS u(s)
        WHERE u.s['kind'] = 'media'
    ),
    {_sql_pixels(blobs)},
    dims AS (
        SELECT media_ref, w, h,
               GREATEST(CAST(FLOOR(w * LEAST({t}e0 / GREATEST(w, h), 1e0))
                        AS BIGINT), 1) AS ow,
               GREATEST(CAST(FLOOR(h * LEAST({t}e0 / GREATEST(w, h), 1e0))
                        AS BIGINT), 1) AS oh
        FROM blobs
    ),
    bucket_sums AS (
        SELECT p.media_ref,
               ((p.y + 1) * d.oh + d.h - 1) // d.h - 1 AS by,
               ((p.x + 1) * d.ow + d.w - 1) // d.w - 1 AS bx,
               p.chan, SUM(p.b) AS s
        FROM pixels p JOIN dims d USING (media_ref)
        GROUP BY ALL
    ),
    vals AS (
        SELECT b.media_ref,
               b.s // ((((b.by + 1) * d.h) // d.oh - (b.by * d.h) // d.oh)
                       * (((b.bx + 1) * d.w) // d.ow - (b.bx * d.w) // d.ow))
                   AS v
        FROM bucket_sums b JOIN dims d USING (media_ref)
    ),
    means AS (
        SELECT media_ref, ROUND(AVG(CAST(v AS DOUBLE)), 6) AS out_mean
        FROM vals GROUP BY media_ref
    )
    SELECT m.doc_id, m.media_ref,
           CAST(d.w AS BIGINT) AS src_w, CAST(d.h AS BIGINT) AS src_h,
           d.ow AS out_w, d.oh AS out_h, mn.out_mean, FALSE AS is_stub
    FROM manifest m JOIN dims d USING (media_ref)
                    JOIN means mn USING (media_ref)
    """


def media_frames_sql(sf_dir: str, n_frames: int = 4) -> str:
    """DuckDB oracle for :func:`media_frames`: payload-derived duration and
    midpoint timestamps, all integer math."""
    corpus = corpus_for_sf(sf_dir)
    blobs = media_blob_path(sf_dir)
    k = int(n_frames)
    return f"""
    WITH manifest AS (
        SELECT t.doc_id, u.s['media_ref'] AS media_ref
        FROM read_parquet('{corpus}') t, UNNEST(t.spans) AS u(s)
        WHERE u.s['kind'] = 'media'
    ),
    blobs AS (
        SELECT media_ref,
               1000 + (CAST(OCTET_LENGTH(payload) AS BIGINT)
                       - {PPM_HEADER_LEN}) // 3 AS duration_ms
        FROM read_parquet('{blobs}')
    )
    SELECT m.doc_id, m.media_ref,
           m.media_ref || '#frame-' || CAST(f AS VARCHAR) AS frame_ref,
           CAST(f AS BIGINT) AS frame_idx,
           (b.duration_ms * (2 * f + 1)) // (2 * {k}) AS ts_ms
    FROM manifest m
         JOIN blobs b USING (media_ref),
         UNNEST(generate_series(0, {k - 1})) AS g(f)
    """


# ---------------- media similarity (multimodal × ANN composition) ---------- #

_VEC_COLS = (
    "width",
    "height",
    "n_px",
    "mean_r",
    "mean_g",
    "mean_b",
    "gray_mean",
    "gray_std",
)


class MediaVec(MediaDecode):
    """Actor-pool stage: payload blobs → per-media_ref stat vectors (the
    rounded :class:`MediaDecode` stats as 8 flat float components). Input is
    the blob table itself (media_ref, payload) — one row per DISTINCT media
    object, no manifest join needed."""

    def __call__(self, t: pa.Table) -> pa.Table:  # type: ignore[override]
        out = super().__call__(t.append_column("doc_id", t["media_ref"]))
        return out.drop_columns(["doc_id", "is_stub"])


def media_vectors(sf_dir: str):
    """Distributed decode pass: one stat vector per distinct media object.
    The embedding consumer the :class:`MediaDecode` docstring promises —
    feeds :func:`media_ann` (and could feed the embedding-dup family)."""
    import ray.data as rd

    return rd.read_parquet(media_blob_path(sf_dir)).map_batches(
        MediaVec,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=actor_pool_limits(),
        num_cpus=1,
    )


def _seq_dot(q: np.ndarray, d: np.ndarray) -> np.ndarray:
    """Left-associative accumulation of Σ q_i·D[:,i] — the same IEEE op
    order as the SQL oracle's written-out ``+`` chain (numpy's pairwise-sum
    dot would round differently)."""
    acc = q[0] * d[:, 0]
    for i in range(1, len(q)):
        acc = acc + q[i] * d[:, i]
    return acc


def media_ann(sf_dir: str, n_queries: int = 3, k: int = 5):
    """Cosine top-k over the pixel-derived media vectors — the multimodal ×
    similarity composition (decode actor pool → broadcast query matrix →
    per-batch partial top-k → per-query merge, the :func:`ann_bruteforce`
    skeleton over media payloads instead of the embeddings table). Query
    set = the ``n_queries`` lexicographically-lowest media_refs. All float
    arithmetic is left-associative over the ROUNDED decode stats so the
    DuckDB oracle (:func:`media_ann_sql`) reproduces every score bit-for-bit."""
    import duckdb
    import ray

    # query vectors: decode the n lowest media_refs driver-side (tiny)
    qt = duckdb.sql(
        f"SELECT media_ref, payload FROM read_parquet('{media_blob_path(sf_dir)}') "
        f"ORDER BY media_ref LIMIT {int(n_queries)}"
    ).arrow()
    qstats = MediaVec()(qt.select(["media_ref", "payload"]))
    qrefs = qstats["media_ref"].to_pylist()
    qm = np.column_stack(
        [np.asarray(qstats[c], dtype=np.float64) for c in _VEC_COLS]
    )
    ref = ray.put((qrefs, qm))

    def score_batch(t: pa.Table) -> pa.Table:
        qrefs_, qm_ = ray.get(ref)
        d = np.column_stack(
            [
                t[c].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
                for c in _VEC_COLS
            ]
        )
        refs = t["media_ref"].combine_chunks().to_numpy(zero_copy_only=False)
        nd = np.sqrt(_seq_sq(d))
        rows = {"qref": [], "media_ref": [], "score": []}
        for qi, qv in enumerate(qm_):
            nq = float(np.sqrt(_seq_sq(qv[None, :])[0]))
            sc = round_np(_seq_dot(qv, d) / (nq * nd), 6)
            kk = min(k, len(sc))
            # tie-aware partial top-k: duplicate media produce EQUAL scores,
            # so the batch-local cut must use the same (score desc,
            # media_ref asc) total order as the final merge — a plain
            # argpartition on score would drop an arbitrary tied candidate
            top = np.lexsort((refs, -sc))[:kk]
            rows["qref"].extend([qrefs_[qi]] * len(top))
            rows["media_ref"].extend(refs[top])
            rows["score"].extend(sc[top])
        return pa.table(
            {
                "qref": pa.array(rows["qref"], pa.string()),
                "media_ref": pa.array(rows["media_ref"], pa.string()),
                "score": pa.array(rows["score"], pa.float64()),
            }
        )

    cands = media_vectors(sf_dir).map_batches(
        score_batch, batch_format="pyarrow", batch_size=4096
    )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "media_ref"], ascending=[False, True]).head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))
        return g[["qref", "media_ref", "rank", "score"]]

    return cands.groupby("qref").map_groups(final_topk, batch_format="pandas")


def _seq_sq(m: np.ndarray) -> np.ndarray:
    """Left-associative Σ m[:,i]² (see :func:`_seq_dot`)."""
    acc = m[:, 0] * m[:, 0]
    for i in range(1, m.shape[1]):
        acc = acc + m[:, i] * m[:, i]
    return acc


def _sql_vec_expr(a: str, b: str) -> str:
    """Σ a.c·b.c over the vector components, written out left-associative."""
    return " + ".join(
        f"CAST({a}.{c} AS DOUBLE) * CAST({b}.{c} AS DOUBLE)" for c in _VEC_COLS
    )


def media_ann_sql(sf_dir: str, n_queries: int = 3, k: int = 5) -> str:
    """DuckDB oracle for :func:`media_ann`: per-media stats recomputed from
    raw payload bytes (shared :func:`_media_stats_cte`), cosine written out
    component-by-component in the engine's exact op order, deterministic
    (score DESC, media_ref) ranking."""
    blobs = media_blob_path(sf_dir)
    return f"""
    WITH {_media_stats_cte(blobs).lstrip()},
    q AS (SELECT * FROM stats ORDER BY media_ref LIMIT {int(n_queries)}),
    scored AS (
        SELECT q.media_ref AS qref, d.media_ref AS media_ref,
               ROUND(({_sql_vec_expr('q', 'd')})
                     / (SQRT({_sql_vec_expr('q', 'q')})
                        * SQRT({_sql_vec_expr('d', 'd')})), 6) AS score
        FROM q CROSS JOIN stats d
    )
    SELECT qref, media_ref,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY qref ORDER BY score DESC, media_ref
           ) AS BIGINT) AS rank,
           score
    FROM scored
    QUALIFY rank <= {int(k)}
    """


def media_dedup(sf_dir: str, blobs: str | None = None):
    """Exact media dedup by content hash — the binary-column analogue of
    ``exact_dedup``: one row per media object with its content key, the
    cluster representative (min media_ref sharing the exact payload bytes)
    and an ``is_dup`` flag. The 100 TB image-dedup primitive: per-batch
    hashing, ONE hash shuffle on the content key, vectorized per-partition
    representative assignment (lexsort + segment boundaries) — payload
    bytes never move past the hashing stage, only (ref, 32-byte key) rows
    shuffle. Content key = md5 of the uppercase hex dump, byte-identical
    to DuckDB's ``md5(hex(payload))`` (:func:`media_dedup_sql`)."""
    import hashlib
    import os

    import ray.data as rd

    from ..state.seen import stable_hash64

    blobs = blobs or media_blob_path(sf_dir)
    n_parts = partitions.for_bytes(
        os.path.getsize(blobs), partitions.TARGET_AGG_BYTES
    )

    def keys_batch(t: pa.Table) -> pa.Table:
        ck = np.array(
            [
                hashlib.md5(bytes(p).hex().upper().encode()).hexdigest()
                for p in t["payload"].to_pylist()
            ],
            dtype=object,
        )
        pkey = (stable_hash64(ck) % np.uint64(n_parts)).astype(np.int64)
        return pa.table(
            {
                "media_ref": t["media_ref"].combine_chunks(),
                "content_key": pa.array(ck, pa.string()),
                "pkey": pa.array(pkey),
            }
        )

    _DEDUP_SCHEMA = pa.schema(
        [
            ("media_ref", pa.string()),
            ("content_key", pa.string()),
            ("representative", pa.string()),
            ("is_dup", pa.bool_()),
        ]
    )

    def assign_rep(t: pa.Table) -> pa.Table:
        if len(t) == 0:  # empty hash partition (Ray may emit one)
            return _DEDUP_SCHEMA.empty_table()
        refs = t["media_ref"].combine_chunks().to_numpy(zero_copy_only=False)
        keys = t["content_key"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((refs, keys))
        refs, keys = refs[order], keys[order]
        first = np.empty(len(refs), dtype=bool)
        first[0] = True
        first[1:] = keys[1:] != keys[:-1]
        rep = refs[first][np.cumsum(first) - 1]  # group min → every member
        return pa.table(
            {
                "media_ref": pa.array(refs, pa.string()),
                "content_key": pa.array(keys, pa.string()),
                "representative": pa.array(rep, pa.string()),
                "is_dup": pa.array(refs != rep),
            }
        )

    return (
        rd.read_parquet(blobs)
        .map_batches(keys_batch, batch_format="pyarrow", batch_size=1024)
        .groupby("pkey")
        .map_groups(
            lambda t: assign_rep(t.drop_columns(["pkey"])),
            batch_format="pyarrow",
        )
    )


def media_dedup_sql(sf_dir: str) -> str:
    """DuckDB oracle for :func:`media_dedup` — same content hash
    (md5 over the uppercase hex dump), representative via a window min."""
    blobs = media_blob_path(sf_dir)
    return f"""
    WITH keys AS (
        SELECT media_ref, md5(hex(payload)) AS content_key
        FROM read_parquet('{blobs}')
    )
    SELECT media_ref, content_key,
           MIN(media_ref) OVER (PARTITION BY content_key) AS representative,
           media_ref <> MIN(media_ref) OVER (PARTITION BY content_key)
               AS is_dup
    FROM keys
    """


def box_resize(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Box-filter downscale via a 2-D integral image — each output pixel is
    the mean of its source bucket. Pure numpy, exact integer bucket edges."""
    h, w, _ = img.shape
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    ii = np.zeros((h + 1, w + 1, 3), dtype=np.int64)
    ii[1:, 1:] = img.astype(np.int64).cumsum(axis=0).cumsum(axis=1)
    y0, y1 = ys[:-1], ys[1:]
    x0, x1 = xs[:-1], xs[1:]
    sums = ii[y1][:, x1] - ii[y0][:, x1] - ii[y1][:, x0] + ii[y0][:, x0]
    areas = ((y1 - y0)[:, None] * (x1 - x0)[None, :])[..., None]
    return (sums // np.maximum(areas, 1)).astype(np.uint8)


class MediaResize:
    """Actor-pool resize stage: decode real bytes, box-filter into the
    target box (never upscales), emit post-resize metadata plus the resized
    image's mean intensity (proof the pixel pass really ran)."""

    def __init__(self, target: int = 256):
        self.target = target

    def __call__(self, t: pa.Table) -> pa.Table:
        n = len(t)
        src_w = np.empty(n, dtype=np.int64)
        src_h = np.empty(n, dtype=np.int64)
        out_w = np.empty(n, dtype=np.int64)
        out_h = np.empty(n, dtype=np.int64)
        out_mean = np.empty(n, dtype=np.float64)
        for i, p in enumerate(t["payload"].to_pylist()):
            img = decode_ppm(p)
            h, w, _ = img.shape
            scale = min(self.target / max(w, h), 1.0)  # never upscale
            ow = max(int(w * scale), 1)
            oh = max(int(h * scale), 1)
            small = box_resize(img, ow, oh)
            src_w[i], src_h[i], out_w[i], out_h[i] = w, h, ow, oh
            out_mean[i] = small.mean()
        return pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks(),
                "media_ref": t["media_ref"].combine_chunks(),
                "src_w": pa.array(src_w),
                "src_h": pa.array(src_h),
                "out_w": pa.array(out_w),
                "out_h": pa.array(out_h),
                "out_mean": pa.array(round_np(out_mean, 6)),
                "is_stub": pa.array(np.zeros(n, dtype=bool)),
            }
        )


def media_resize(sf_dir: str, target: int = 256):
    """manifest ⋈ payloads → actor-pool real resize stage."""
    return manifest_with_payload(sf_dir).map_batches(
        MediaResize,
        fn_constructor_kwargs={"target": target},
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=actor_pool_limits(),
        num_cpus=1,
    )


class MediaFrameSample:
    """Actor-pool frame-sampling stage (video path): each media ref expands
    to ``n_frames`` evenly-spaced frame references with timestamps over a
    payload-derived duration (a real video decoder would read the container
    duration; the still-image corpus stands in bytes-for-bytes). One input
    row → n output rows, the flat_map-shaped transform a video pipeline
    needs."""

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def __call__(self, t: pa.Table) -> pa.Table:
        refs = t["media_ref"].combine_chunks().to_numpy(zero_copy_only=False)
        n_bytes = (
            pc.binary_length(t["payload"].combine_chunks())
            .cast(pa.int64())
            .to_numpy()
        )
        k = self.n_frames
        n = len(refs)
        # duration ∝ payload size: 1 s floor + 1 ms per 3-byte pixel
        duration_ms = 1_000 + (n_bytes - PPM_HEADER_LEN) // 3
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
    """manifest ⋈ payloads → actor-pool frame-sample stage (1 row → n rows)."""
    return manifest_with_payload(sf_dir).map_batches(
        MediaFrameSample,
        fn_constructor_kwargs={"n_frames": n_frames},
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=actor_pool_limits(),
        num_cpus=1,
    )
