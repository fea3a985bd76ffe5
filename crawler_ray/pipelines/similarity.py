"""Similarity search over the embedding column (SURVEY 'beyond the
reference'): brute-force cosine top-k as the exact baseline — numpy matmul per
batch against a broadcast query matrix — and a hyperplane-LSH bucketed variant
as the scale path (probes only matching buckets; recall measured in tests).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from .rounding import round_np


def _read_emb(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )


def _as_matrix(t: pa.Table) -> np.ndarray:
    m = np.asarray(t["embedding"].combine_chunks().values, dtype=np.float64)
    return m.reshape(len(t), -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.clip(np.linalg.norm(m, axis=1, keepdims=True), 1e-12, None)


def _query_matrix(sf_dir: str, n_queries: int):
    """Deterministic query set: the n lowest vec_ids."""
    import duckdb

    q = duckdb.sql(
        f"SELECT vec_id, embedding FROM read_parquet('{os.path.join(sf_dir, 'embeddings.parquet')}') "
        f"ORDER BY vec_id LIMIT {n_queries}"
    ).arrow()
    qids = q["vec_id"].to_numpy()
    qm = _normalize(np.asarray(q["embedding"].combine_chunks().values, dtype=np.float64).reshape(len(qids), -1))
    return qids, qm


def ann_bruteforce(sf_dir: str, n_queries: int = 5, k: int = 10):
    """Exact cosine top-k: per-batch matmul + per-batch partial top-k
    (emitting k candidates per query per batch), then a final per-query
    selection — the classic distributed top-k combiner."""
    import ray

    qids, qm = _query_matrix(sf_dir, n_queries)
    ref = ray.put((qids, qm))

    def score_batch(t: pa.Table) -> pa.Table:
        qids_, qm_ = ray.get(ref)
        x = _normalize(_as_matrix(t))
        ids = t["vec_id"].combine_chunks().to_numpy(zero_copy_only=False)
        scores = qm_ @ x.T  # (nq, batch)
        nq, nb = scores.shape
        kk = min(k, nb)
        top = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
        rows = {
            "qid": np.repeat(qids_, kk),
            "vec_id": ids[top.reshape(-1)],
            "score": round_np(np.take_along_axis(scores, top, axis=1).reshape(-1), 6),
        }
        return pa.table(rows)

    cands = _read_emb(sf_dir).map_batches(score_batch, batch_format="pyarrow", batch_size=8192)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))
        return g[["qid", "vec_id", "rank", "score"]]

    return cands.groupby("qid").map_groups(final_topk, batch_format="pandas")


def ann_bruteforce_sql(n_queries: int = 5, k: int = 10) -> str:
    return f"""
    WITH q AS (
        SELECT vec_id AS qid, embedding AS qe
        FROM embeddings ORDER BY vec_id LIMIT {n_queries}
    ),
    scored AS (
        SELECT q.qid, e.vec_id,
               ROUND(LIST_COSINE_SIMILARITY(CAST(q.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) AS score
        FROM q CROSS JOIN embeddings e
    )
    SELECT qid, vec_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS BIGINT) AS rank,
           score
    FROM scored
    QUALIFY rank <= {k}
    """


def ann_filtered(sf_dir: str, n_queries: int = 5, k: int = 10):
    """Metadata-FILTERED exact cosine top-k: each query retrieves only among
    vectors sharing its ``label`` — the filtered-vector-search primitive a
    curation pipeline needs ("nearest neighbours within this source /
    license / language slice"). Filtering happens INSIDE the scoring batch
    (one boolean mask per (query-label, batch) group before the matmul), so
    the pruned rows never enter the O(nq × batch) score matrix; at 100 TB
    pair this with a label-partitioned store (the ``ensure_ivf_index``
    pattern) so the filter also prunes I/O, not just compute.

    Scale shape: identical to :func:`ann_bruteforce` — broadcast query
    matrix via ``ray.put``, per-batch partial top-k (≤ k rows per query per
    batch cross the wire), final exact per-query selection."""
    import duckdb
    import ray

    q = duckdb.sql(
        f"SELECT vec_id, embedding, label FROM "
        f"read_parquet('{os.path.join(sf_dir, 'embeddings.parquet')}') "
        f"ORDER BY vec_id LIMIT {n_queries}"
    ).arrow()
    qids = q["vec_id"].to_numpy()
    qlabels = q["label"].to_numpy()
    qm = _normalize(
        np.asarray(q["embedding"].combine_chunks().values, dtype=np.float64).reshape(
            len(qids), -1
        )
    )
    ref = ray.put((qids, qlabels, qm))

    def score_batch(t: pa.Table) -> pa.Table:
        qids_, qlabels_, qm_ = ray.get(ref)
        x = _normalize(_as_matrix(t))
        ids = t["vec_id"].combine_chunks().to_numpy(zero_copy_only=False)
        labels = t["label"].combine_chunks().to_numpy(zero_copy_only=False)
        out_q, out_v, out_s, out_l = [], [], [], []
        # group queries by label: one masked matmul per DISTINCT query label
        # present (labels are low-cardinality metadata, so this is a handful
        # of dense matmuls, not a per-query loop over rows)
        for lab in np.unique(qlabels_):
            sub = labels == lab
            if not sub.any():
                continue
            qsel = np.flatnonzero(qlabels_ == lab)
            scores = qm_[qsel] @ x[sub].T  # (nq_lab, n_sub)
            sub_ids = ids[sub]
            kk = min(k, scores.shape[1])
            top = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
            out_q.append(np.repeat(qids_[qsel], kk))
            out_l.append(np.repeat(qlabels_[qsel], kk))
            out_v.append(sub_ids[top.reshape(-1)])
            out_s.append(
                round_np(np.take_along_axis(scores, top, axis=1).reshape(-1), 6)
            )
        if not out_q:
            return pa.table(
                {
                    "qid": pa.array([], pa.int64()),
                    "label": pa.array([], pa.int32()),
                    "vec_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "qid": np.concatenate(out_q),
                "label": np.concatenate(out_l),
                "vec_id": np.concatenate(out_v),
                "score": np.concatenate(out_s),
            }
        )

    import ray.data as rd  # noqa: F401  (parallel read below)

    cands = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding", "label"],
    ).map_batches(score_batch, batch_format="pyarrow", batch_size=8192)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))
        return g[["qid", "label", "vec_id", "rank", "score"]]

    return cands.groupby("qid").map_groups(final_topk, batch_format="pandas")


def ann_filtered_sql(n_queries: int = 5, k: int = 10) -> str:
    return f"""
    WITH q AS (
        SELECT vec_id AS qid, embedding AS qe, label
        FROM embeddings ORDER BY vec_id LIMIT {n_queries}
    ),
    scored AS (
        SELECT q.qid, q.label, e.vec_id,
               ROUND(LIST_COSINE_SIMILARITY(CAST(q.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) AS score
        FROM q JOIN embeddings e ON e.label = q.label
    )
    SELECT qid, label, vec_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS BIGINT) AS rank,
           score
    FROM scored
    QUALIFY rank <= {k}
    """


def _lsh_planes(dim: int, n_planes: int) -> np.ndarray:
    """Fixed-seed hyperplanes — deterministic for a (dim, n_planes) pair, so
    the build pass, the query path and the recall tests all agree without
    persisting the planes alongside the index."""
    return np.random.default_rng(1234).standard_normal((dim, n_planes))


def _lsh_bucket_of(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes) > 0
    out = np.zeros(m.shape[0], dtype=np.int64)
    for i in range(planes.shape[1]):
        out |= bits[:, i].astype(np.int64) << i
    return out


_LSH_ROOT = "/tmp/crawler_ray_lsh"


def ensure_lsh_index(sf_dir: str, n_planes: int = 8) -> tuple[str, np.ndarray]:
    """Build the LSH bucket store ONCE: one distributed pass signs every
    vector against the fixed hyperplanes and writes the table partitioned by
    its bucket (``bucket=K/`` Hive directories; the bucket also rides inside
    the files as ``bucket_id``, since partition_cols strips the partition
    column). Cached by (path, mtime, size, n_planes) with an atomic rename —
    the same build-once contract as :func:`ensure_ivf_index` and
    ``sources/corpus.ensure_sharded``. Returns (index_dir, planes).

    This is what makes LSH prune I/O, not just compute (VERDICT r3 #2,
    'optionally ann_lsh'): a query's multi-probe set touches only its
    ``n_planes + 1`` bucket directories out of ``2**n_planes``, so bytes
    read per query scale with the probe fraction instead of the full
    table."""
    import hashlib
    import shutil

    import ray.data as rd

    emb = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(emb)
    key = hashlib.md5(
        f"{os.path.abspath(emb)}|{st.st_mtime_ns}|{st.st_size}|{n_planes}".encode()
    ).hexdigest()[:12]
    final = os.path.join(_LSH_ROOT, key)
    dim = _emb_dim(sf_dir)
    planes = _lsh_planes(dim, n_planes)
    if os.path.isdir(final):
        return final, planes
    pref = __import__("ray").put(planes)

    def assign(t: pa.Table) -> pa.Table:
        p = __import__("ray").get(pref)
        b = _lsh_bucket_of(_normalize(_as_matrix(t)), p)
        return (
            t.append_column("bucket", pa.array(b))
            .append_column("bucket_id", pa.array(b))
        )

    os.makedirs(_LSH_ROOT, exist_ok=True)
    tmp = f"{final}.tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    rd.read_parquet(emb).map_batches(assign, batch_format="pyarrow").write_parquet(
        tmp, partition_cols=["bucket"]
    )
    try:
        os.rename(tmp, final)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
        if not os.path.isdir(final):
            raise
    return final, planes


def _emb_dim(sf_dir: str) -> int:
    import pyarrow.parquet as pq

    sch = pq.read_schema(os.path.join(sf_dir, "embeddings.parquet"))
    t = sch.field("embedding").type
    if pa.types.is_fixed_size_list(t):
        return t.list_size
    # variable list: peek one row
    head = pq.ParquetFile(os.path.join(sf_dir, "embeddings.parquet")).read_row_group(
        0, columns=["embedding"]
    )
    return len(head["embedding"][0])


def _hive_probe_paths(index_dir: str, col: str, values) -> list[str]:
    """The parquet files a probe set actually reads (only the probed
    ``col=K`` directories' contents) — exposed so tests and bench can
    evidence the I/O pruning (bytes under these paths vs the whole index).
    File-level expansion because ``ray.data.read_parquet`` treats each
    entry of a path LIST as a file."""
    paths = []
    for c in sorted(set(int(v) for v in values)):
        d = os.path.join(index_dir, f"{col}={c}")
        if os.path.isdir(d):
            paths.extend(
                os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")
            )
    return paths


def lsh_probe_paths(index_dir: str, buckets) -> list[str]:
    return _hive_probe_paths(index_dir, "bucket", buckets)


def ann_lsh(
    sf_dir: str,
    n_queries: int = 5,
    k: int = 10,
    n_planes: int = 8,
    dump_artifacts: bool = False,
):
    """Approximate top-k over the bucket-partitioned store built by
    :func:`ensure_lsh_index`: each query scores only rows in its multi-probe
    bucket set (query bucket ± one flipped bit), and the read itself touches
    ONLY those bucket directories — I/O ∝ (n_planes+1)/2**n_planes. Output
    is identical to the pre-index full-scan formulation (same planes, same
    sign bits, same scoring kernel).

    ``dump_artifacts``: per-vector bucket assignments + per-query probe sets
    to the oracle artifact store, so DuckDB recomputes the exact cosine
    top-k over the same candidate set (hard oracle for the scoring/top-k
    math; the bucket assignment itself is numpy-RNG-derived and taken as
    given)."""
    import ray
    import ray.data as rd

    index_dir, planes = ensure_lsh_index(sf_dir, n_planes)
    qids, qm = _query_matrix(sf_dir, n_queries)
    qb = _lsh_bucket_of(qm, planes)
    # multi-probe: query bucket ± one flipped bit
    probe_sets = []
    for b in qb:
        s = {int(b)}
        for i in range(n_planes):
            s.add(int(b) ^ (1 << i))
        probe_sets.append(s)
    if dump_artifacts:
        from . import artifacts

        all_files = lsh_probe_paths(index_dir, range(1 << n_planes))
        artifacts.write_dataset(
            sf_dir,
            "lsh_assign",
            rd.read_parquet(all_files, columns=["vec_id", "bucket_id"]).map_batches(
                lambda t: t.rename_columns(["vec_id", "bucket"]),
                batch_format="pyarrow",
            ),
        )
        pq_rows = [
            (int(qids[qi]), b) for qi in range(len(qids)) for b in sorted(probe_sets[qi])
        ]
        artifacts.write(
            sf_dir,
            "lsh_probes",
            pa.table(
                {
                    "qid": pa.array([r[0] for r in pq_rows], pa.int64()),
                    "bucket": pa.array([r[1] for r in pq_rows], pa.int64()),
                }
            ),
        )
    paths = lsh_probe_paths(
        index_dir, (b for s in probe_sets for b in s)
    )
    ref = ray.put((qids, qm, probe_sets))

    def score_batch(t: pa.Table) -> pa.Table:
        qids_, qm_, probes = ray.get(ref)
        x = _normalize(_as_matrix(t))
        ids = t["vec_id"].combine_chunks().to_numpy(zero_copy_only=False)
        xb = t["bucket_id"].combine_chunks().to_numpy(zero_copy_only=False)
        rows = {"qid": [], "vec_id": [], "score": []}
        for qi in range(len(qids_)):
            mask = np.isin(xb, list(probes[qi]))
            if not mask.any():
                continue
            sc = qm_[qi] @ x[mask].T
            kk = min(k, sc.shape[0])
            top = np.argpartition(-sc, kk - 1)[:kk]
            rows["qid"].extend([qids_[qi]] * kk)
            rows["vec_id"].extend(ids[mask][top])
            rows["score"].extend(round_np(sc[top], 6))
        return pa.table(
            {
                "qid": pa.array(rows["qid"], pa.int64()),
                "vec_id": pa.array(rows["vec_id"], pa.int64()),
                "score": pa.array(rows["score"], pa.float64()),
            }
        )

    cands = rd.read_parquet(
        paths, columns=["vec_id", "embedding", "bucket_id"]
    ).map_batches(score_batch, batch_format="pyarrow", batch_size=8192)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))
        return g[["qid", "vec_id", "rank", "score"]]

    return cands.groupby("qid").map_groups(final_topk, batch_format="pandas")


def _kmeans(sample: np.ndarray, n_centroids: int, iters: int = 8, seed: int = 7) -> np.ndarray:
    """Tiny deterministic Lloyd's k-means on a normalized sample (the coarse
    quantizer trainer — runs on the driver over a bounded sample, as IVF
    training does at any scale)."""
    rng = np.random.default_rng(seed)
    cents = sample[rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ cents.T, axis=1)  # cosine on unit vectors
        for c in range(len(cents)):
            m = assign == c
            if m.any():
                v = sample[m].mean(axis=0)
                cents[c] = v / max(np.linalg.norm(v), 1e-12)
    return cents


_IVF_ROOT = "/tmp/crawler_ray_ivf"


def _train_centroids(sf_dir: str, n_centroids: int, train_sample: int) -> np.ndarray:
    """Deterministic coarse quantizer: k-means over the lowest-vec_id sample
    (bounded driver-side training, as IVF training is at any scale)."""
    import duckdb

    s = duckdb.sql(
        f"SELECT embedding FROM read_parquet('{os.path.join(sf_dir, 'embeddings.parquet')}') "
        f"ORDER BY vec_id LIMIT {train_sample}"
    ).arrow()
    sample = _normalize(
        np.asarray(s["embedding"].combine_chunks().values, dtype=np.float64).reshape(len(s), -1)
    )
    return _kmeans(sample, n_centroids)


def ensure_ivf_index(
    sf_dir: str, n_centroids: int = 16, train_sample: int = 4096
) -> tuple[str, np.ndarray]:
    """Build the IVF inverted file ONCE: one distributed pass assigns every
    vector to its nearest centroid and writes the table partitioned by the
    assignment (``cell=K/`` directories, Hive layout; the cell rides inside
    the files as ``cell_id`` too, since partition_cols strips the partition
    column from the data files). Cached by (path, mtime, size, params) with
    an atomic rename — the same build-once contract as
    ``sources/corpus.ensure_sharded``. Returns (index_dir, centroids).

    This is what makes IVF prune I/O, not just compute: queries read ONLY
    their ``n_probe`` cell directories, so bytes touched per query scale
    with n_probe/n_centroids of the store instead of the full table
    (VERDICT r3 #2 — the earlier version streamed every embedding byte
    past each query batch)."""
    import hashlib
    import shutil

    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    emb = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(emb)
    key = hashlib.md5(
        f"{os.path.abspath(emb)}|{st.st_mtime_ns}|{st.st_size}|{n_centroids}|{train_sample}".encode()
    ).hexdigest()[:12]
    final = os.path.join(_IVF_ROOT, key)
    cent_path = final + ".centroids.parquet"
    if os.path.isdir(final) and os.path.exists(cent_path):
        col = pq.read_table(cent_path)["centroid"].combine_chunks()
        cents = np.asarray(col.values, dtype=np.float64).reshape(len(col), -1)
        return final, cents

    cents = _train_centroids(sf_dir, n_centroids, train_sample)
    cref = ray.put(cents)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        x = _normalize(_as_matrix(t))
        cell = np.argmax(x @ c.T, axis=1).astype(np.int64)
        return (
            t.append_column("cell", pa.array(cell))
            .append_column("cell_id", pa.array(cell))
        )

    os.makedirs(_IVF_ROOT, exist_ok=True)
    tmp = f"{final}.tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    rd.read_parquet(emb).map_batches(assign, batch_format="pyarrow").write_parquet(
        tmp, partition_cols=["cell"]
    )
    cent_tmp = f"{cent_path}.tmp.{os.getpid()}"
    pq.write_table(
        pa.table(
            {
                "cell": pa.array(np.arange(len(cents), dtype=np.int64)),
                "centroid": pa.FixedSizeListArray.from_arrays(
                    pa.array(cents.reshape(-1)), cents.shape[1]
                ),
            }
        ),
        cent_tmp,
    )
    try:
        os.rename(tmp, final)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
        if not os.path.isdir(final):
            os.remove(cent_tmp)
            raise
    os.replace(cent_tmp, cent_path)
    return final, cents


def ivf_probe_paths(index_dir: str, cells) -> list[str]:
    """Parquet files for the probed ``cell=K`` directories (see
    :func:`_hive_probe_paths`)."""
    return _hive_probe_paths(index_dir, "cell", cells)


def ann_ivf(
    sf_dir: str,
    n_queries: int = 5,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    train_sample: int = 4096,
    dump_artifacts: bool = False,
):
    """IVF approximate top-k over the partitioned inverted file built by
    :func:`ensure_ivf_index`: each query scores only rows stored in its
    ``n_probe`` nearest cells, and the read itself touches ONLY those cell
    directories — I/O ∝ n_probe/n_centroids. Output is identical to the
    previous full-scan formulation (same centroids, same argmax assignment,
    same scoring kernel). ``dump_artifacts`` writes the per-query probe
    sets so DuckDB can recompute the exact top-k over the same candidates
    (reading the index with hive_partitioning for the per-row cell)."""
    import ray

    index_dir, cents = ensure_ivf_index(sf_dir, n_centroids, train_sample)
    qids, qm = _query_matrix(sf_dir, n_queries)
    # per query: the n_probe nearest centroid ids
    probe = np.argsort(-(qm @ cents.T), axis=1)[:, :n_probe]
    if dump_artifacts:
        from . import artifacts

        artifacts.write(
            sf_dir,
            "ivf_probes",
            pa.table(
                {
                    "qid": pa.array(np.repeat(qids, n_probe).astype(np.int64)),
                    "cell": pa.array(probe.reshape(-1).astype(np.int64)),
                }
            ),
        )
    paths = ivf_probe_paths(index_dir, probe.reshape(-1))
    ref = ray.put((qids, qm, probe))

    def score_batch(t: pa.Table) -> pa.Table:
        qids_, qm_, probe_ = ray.get(ref)
        x = _normalize(_as_matrix(t))
        ids = t["vec_id"].combine_chunks().to_numpy(zero_copy_only=False)
        assign = t["cell_id"].combine_chunks().to_numpy(zero_copy_only=False)
        rows = {"qid": [], "vec_id": [], "score": []}
        for qi in range(len(qids_)):
            mask = np.isin(assign, probe_[qi])
            if not mask.any():
                continue
            sc = qm_[qi] @ x[mask].T
            kk = min(k, sc.shape[0])
            top = np.argpartition(-sc, kk - 1)[:kk]
            rows["qid"].extend([qids_[qi]] * kk)
            rows["vec_id"].extend(ids[mask][top])
            rows["score"].extend(round_np(sc[top], 6))
        return pa.table(
            {
                "qid": pa.array(rows["qid"], pa.int64()),
                "vec_id": pa.array(rows["vec_id"], pa.int64()),
                "score": pa.array(rows["score"], pa.float64()),
            }
        )

    import ray.data as rd

    cands = rd.read_parquet(paths, columns=["vec_id", "embedding", "cell_id"]).map_batches(
        score_batch, batch_format="pyarrow", batch_size=8192
    )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))
        return g[["qid", "vec_id", "rank", "score"]]

    return cands.groupby("qid").map_groups(final_topk, batch_format="pandas")

def _ann_rank_sql(k: int) -> str:
    """Shared oracle tail: exact cosine + deterministic rank over a
    candidate CTE (qid, vec_id)."""
    return f"""
    , scored AS (
        SELECT c.qid, c.vec_id,
               ROUND(LIST_COSINE_SIMILARITY(CAST(q.embedding AS DOUBLE[]),
                                            CAST(e.embedding AS DOUBLE[])), 6) AS score
        FROM cand c
        JOIN embeddings e ON e.vec_id = c.vec_id
        JOIN embeddings q ON q.vec_id = c.qid
    )
    SELECT qid, vec_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS BIGINT) AS rank,
           score
    FROM scored
    QUALIFY rank <= {k}
    """


def ann_lsh_sql(sf_dir: str, k: int = 10) -> str:
    """Artifact oracle for :func:`ann_lsh`: the bucket assignment + probe
    sets are taken from the dumped artifacts (numpy-RNG hyperplanes are not
    SQL-reproducible); the candidate join, exact cosine scoring and the
    top-k rank are recomputed independently."""
    from .artifacts import artifact_path

    assign = artifact_path(sf_dir, "lsh_assign")
    probes = artifact_path(sf_dir, "lsh_probes")
    return (
        f"""
    WITH cand AS (
        SELECT DISTINCT p.qid, a.vec_id
        FROM read_parquet('{probes}') p
        JOIN read_parquet('{assign}') a ON a.bucket = p.bucket
    )"""
        + _ann_rank_sql(k)
    )


def ann_ivf_sql(sf_dir: str, n_centroids: int = 16, train_sample: int = 4096, k: int = 10) -> str:
    """Artifact oracle for :func:`ann_ivf`: reads the partitioned inverted
    file itself (hive_partitioning exposes each row's cell) + the dumped
    probe sets, recomputing the candidate join, exact cosine and rank."""
    from .artifacts import artifact_path

    index_dir, _ = ensure_ivf_index(sf_dir, n_centroids, train_sample)
    probes = artifact_path(sf_dir, "ivf_probes")
    return (
        f"""
    WITH cand AS (
        SELECT DISTINCT p.qid, a.vec_id
        FROM read_parquet('{probes}') p
        JOIN (SELECT vec_id, CAST(cell AS BIGINT) AS cell
              FROM read_parquet('{index_dir}/cell=*/*.parquet', hive_partitioning = 1)) a
          ON a.cell = p.cell
    )"""
        + _ann_rank_sql(k)
    )


# --------------------------------------------------------------------------- #
# Lexical retrieval: BM25 top-k over the documents table — the query-relevance
# scorer a training-data pipeline uses for targeted mining / quality weighting.

_BM25_QUERY = "table scan hash join"


def bm25_topk(sf_dir: str, query: str = _BM25_QUERY, k: int = 10, k1: float = 1.2, b: float = 0.75):
    """Okapi BM25 over whitespace tokens, two passes, both distributed:

    1. corpus stats — one combiner batch per block collapses to (n_docs,
       sum_dl, df per query term), reduced with ``Dataset.sum`` (query terms
       are FEW, so per-term document frequencies ride the same combiner; no
       global vocabulary is built);
    2. scoring — stats broadcast in the closure, per-batch vectorized tf +
       score, per-batch partial top-k, one final merge (top-k per batch ⊇
       global top-k).

    Deterministic output (rank by rounded score desc, doc_id asc); the
    DuckDB oracle recomputes everything from the table with the identical
    floating-point expression ordering."""
    import ray.data as rd

    seen: set = set()
    terms = [t for t in query.lower().split() if not (t in seen or seen.add(t))]
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    term_pos = {t: i for i, t in enumerate(terms)}

    def stats_batch(df: pd.DataFrame) -> pd.DataFrame:
        # ONE pass over the exploded tokens (isin + drop_duplicates), not one
        # rescan per query term — O(tokens + hits) instead of O(terms×tokens)
        df = df.reset_index(drop=True)
        toks = df["text"].fillna("").str.lower().str.split()
        dl = toks.str.len().to_numpy(dtype=np.int64)
        ex = toks.explode()
        ex = ex[ex.notna()]
        out = {"n_docs": [len(df)], "sum_dl": [int(dl.sum())]}
        dfs = np.zeros(len(terms), dtype=np.int64)
        if len(ex):
            hits = ex[ex.isin(term_pos)]
            if len(hits):
                uniq = pd.DataFrame(
                    {"doc": hits.index.to_numpy(), "t": hits.to_numpy()}
                ).drop_duplicates()
                vc = uniq["t"].value_counts()
                for t, c in vc.items():
                    dfs[term_pos[t]] = int(c)
        for i in range(len(terms)):
            out[f"df_{i}"] = [int(dfs[i])]
        return pd.DataFrame(out)

    agg = docs.map_batches(stats_batch, batch_format="pandas", batch_size=16384).sum(
        ["n_docs", "sum_dl"] + [f"df_{i}" for i in range(len(terms))]
    )
    n = agg["sum(n_docs)"]
    avgdl = agg["sum(sum_dl)"] / n
    idf = np.array(
        [
            np.log(1 + (n - agg[f"sum(df_{i})"] + 0.5) / (agg[f"sum(df_{i})"] + 0.5))
            for i in range(len(terms))
        ]
    )

    def score_batch(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        toks = df["text"].fillna("").str.lower().str.split()
        dl = toks.str.len().to_numpy(dtype=np.float64)
        ex = toks.explode()
        ex = ex[ex.notna()]
        # one isin pass → per-(term, doc) counts; the per-term loop below
        # only scatters precomputed counts (no token rescans)
        tf_mat = np.zeros((len(terms), len(df)))
        if len(ex):
            hits = ex[ex.isin(term_pos)]
            if len(hits):
                cnt = (
                    pd.DataFrame({"doc": hits.index.to_numpy(), "t": hits.to_numpy()})
                    .groupby(["t", "doc"])
                    .size()
                )
                ti = np.fromiter(
                    (term_pos[t] for t in cnt.index.get_level_values(0)),
                    dtype=np.int64,
                    count=len(cnt),
                )
                di = cnt.index.get_level_values(1).to_numpy()
                tf_mat[ti, di] = cnt.to_numpy()
        score = np.zeros(len(df))
        for i in range(len(terms)):
            tf = tf_mat[i]
            # expression order mirrors the SQL oracle exactly
            score = score + idf[i] * (tf * (k1 + 1)) / (
                tf + k1 * (1 - b + (b * dl) / avgdl)
            )
        out = pd.DataFrame({"doc_id": df["doc_id"], "score": round_np(score, 6)})
        return out.sort_values(["score", "doc_id"], ascending=[False, True]).head(k)

    cands = docs.map_batches(score_batch, batch_format="pandas", batch_size=16384)

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(["score", "doc_id"], ascending=[False, True]).head(k)
        return g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))[
            ["doc_id", "rank", "score"]
        ]

    return cands.repartition(1).map_batches(
        final_topk, batch_format="pandas", batch_size=None
    )


def bm25_topk_sql(query: str = _BM25_QUERY, k: int = 10, k1: float = 1.2, b: float = 0.75) -> str:
    seen: set = set()
    terms = [t for t in query.lower().split() if not (t in seen or seen.add(t))]
    tf_cols = ",\n               ".join(
        f"LEN(LIST_FILTER(toks, x -> x = '{t}')) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ",\n               ".join(
        f"(SELECT COUNT(*) FROM base WHERE LEN(LIST_FILTER(toks, x -> x = '{t}')) > 0) AS df_{i}"
        for i, t in enumerate(terms)
    )
    score_expr = "\n               + ".join(
        f"LN(1 + ((SELECT n FROM stats) - (SELECT df_{i} FROM dfs) + 0.5)"
        f" / ((SELECT df_{i} FROM dfs) + 0.5))"
        f" * (tf_{i} * ({k1} + 1))"
        f" / (tf_{i} + {k1} * (1 - {b} + ({b} * dl) / (SELECT avgdl FROM stats)))"
        for i in range(len(terms))
    )
    return f"""
    WITH base AS (
        SELECT doc_id,
               LIST_FILTER(STRING_SPLIT_REGEX(LOWER(COALESCE(text, '')), '\\s+'),
                           x -> x <> '') AS toks
        FROM documents
    ), stats AS (
        SELECT COUNT(*)::DOUBLE AS n,
               SUM(LEN(toks))::DOUBLE / COUNT(*) AS avgdl
        FROM base
    ), dfs AS (
        SELECT {df_cols}
    ), per_doc AS (
        SELECT doc_id, LEN(toks)::DOUBLE AS dl,
               {tf_cols}
        FROM base
    ), scored AS (
        SELECT doc_id,
               ROUND({score_expr}, 6) AS score
        FROM per_doc
    )
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
           score
    FROM scored
    QUALIFY rank <= {k}
    """


# --------------------------------------------------------------------------- #
# Embedding clustering: the k-means assignment as a first-class query — the
# topic-bucketing / data-mixing primitive (cluster-then-sample pipelines).


def embed_clusters(sf_dir: str, n_centroids: int = 16, train_sample: int = 4096):
    """K-means cluster assignment over the embedding table: (vec_id, cell,
    sim) where ``cell`` is the nearest trained centroid (cosine) and ``sim``
    the similarity to it.

    Reads the build-once IVF store (`ensure_ivf_index`) — the assignment is
    already materialized as the store's partition column, so this query costs
    one streaming pass that recomputes only the per-row similarity (a small
    einsum against the broadcast centroid matrix). The oracle re-derives the
    ARGMAX assignment itself from the raw embeddings × the dumped centroid
    table, so the clustering decision — not just the similarity math — is
    value-checked."""
    import ray
    import ray.data as rd

    index_dir, cents = ensure_ivf_index(sf_dir, n_centroids, train_sample)
    cref = ray.put(cents)

    def sim_batch(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        x = _normalize(_as_matrix(t))
        cell = t["cell_id"].combine_chunks().to_numpy(zero_copy_only=False)
        sims = np.einsum("ij,ij->i", x, c[cell])
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "cell": pa.array(cell.astype(np.int64)),
                "sim": pa.array(round_np(sims, 6)),
            }
        )

    return rd.read_parquet(
        index_dir, columns=["vec_id", "embedding", "cell_id"]
    ).map_batches(sim_batch, batch_format="pyarrow", batch_size=8192)


def embed_clusters_sql(sf_dir: str, n_centroids: int = 16, train_sample: int = 4096) -> str:
    """Oracle for :func:`embed_clusters`: nearest centroid recomputed from
    scratch — raw embeddings × dumped centroid table, full-precision cosine
    argmax (first-max tie-break on cell, matching np.argmax), similarity
    rounded like every float that leaves the engine. Caveat: the oracle's
    full-precision cosine differs from the store's numpy argmax by ~1 ulp,
    so a vector EXACTLY equidistant between two centroids could flip cells
    between engines — deterministic on these fixtures, and any such flip is
    an equally-correct assignment."""
    index_dir, _ = ensure_ivf_index(sf_dir, n_centroids, train_sample)
    cent_path = index_dir + ".centroids.parquet"
    return f"""
    WITH c AS (
        SELECT cell, CAST(centroid AS DOUBLE[]) AS ce
        FROM read_parquet('{cent_path}')
    ), scored AS (
        SELECT e.vec_id, c.cell,
               LIST_COSINE_SIMILARITY(CAST(e.embedding AS DOUBLE[]), c.ce) AS s
        FROM embeddings e CROSS JOIN c
    )
    SELECT vec_id, cell, ROUND(s, 6) AS sim
    FROM (
        SELECT vec_id, cell, s,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, cell) AS rk
        FROM scored
    ) WHERE rk = 1
    """


# --------------------------------------------------------------------------- #
# SemDeDup-style semantic deduplication (Abbas et al. 2023, arXiv:2303.09540):
# cluster the embedding space, then drop any vector whose cosine similarity to
# an EARLIER vector (lower vec_id) in the same cluster clears a threshold.


def semdedup(sf_dir: str, threshold: float = 0.4, n_centroids: int = 16, train_sample: int = 4096):
    """Semantic dedup over the embedding table: every vector is labeled
    ``dropped`` iff some earlier (lower ``vec_id``) vector in its k-means
    cluster has rounded cosine similarity ≥ ``threshold``; ``dup_of`` is the
    smallest such earlier vec_id (-1 when kept). The drop rule is the
    deterministic "similar to ANY earlier doc" variant of SemDeDup's
    within-cluster pruning, chosen because it is order-free and exactly
    re-checkable in SQL (the paper's greedy keep-set variant depends on scan
    order).

    Scale shape: rides the build-once IVF store, so assignment costs
    nothing here; the only exchange hash-buckets whole clusters into coarse
    partitions (`keyed_merge` — Python dispatch = partition count even at
    10^6 clusters), and each cluster pays one c×c gram matrix. At 100 TB
    the cluster count grows with the data (SemDeDup uses ~100k clusters for
    LAION-scale), keeping c bounded — the quadratic term never sees the
    whole table. Default threshold matches `embedding_dup_pairs`: the
    synthetic fixtures top out at cosine ≈ 0.51."""
    import ray.data as rd

    from .partitions import agg_partitions, keyed_merge

    index_dir, _ = ensure_ivf_index(sf_dir, n_centroids, train_sample)
    ds = rd.read_parquet(index_dir, columns=["vec_id", "embedding", "cell_id"])

    def per_cluster(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for cell, g in df.groupby("cell_id", sort=False):
            g = g.sort_values("vec_id")
            ids = g["vec_id"].to_numpy()
            m = _normalize(np.stack(g["embedding"].to_numpy()).astype(np.float64))
            # strictly-lower triangle == "earlier vec_id" after the sort;
            # rounded before the compare so the SQL oracle's ROUND(...) >= t
            # sees the identical decision boundary
            hit = np.tril(round_np(m @ m.T, 6) >= threshold, k=-1)
            dropped = hit.any(axis=1)
            # argmax on a boolean row = first True = smallest earlier vec_id
            dup_of = np.where(dropped, ids[np.argmax(hit, axis=1)], -1)
            outs.append(
                pd.DataFrame(
                    {
                        "vec_id": ids,
                        "cell": np.int64(cell),
                        "dropped": dropped,
                        "dup_of": dup_of.astype(np.int64),
                    }
                )
            )
        return pd.concat(outs, ignore_index=True)

    return keyed_merge(ds, "cell_id", per_cluster, agg_partitions(sf_dir, "embeddings"))


def semdedup_sql(sf_dir: str, threshold: float = 0.4, n_centroids: int = 16, train_sample: int = 4096) -> str:
    """Artifact oracle for :func:`semdedup`: cluster assignment is read from
    the IVF store's hive partition column; the within-cluster pair scan, the
    cosine math, the threshold decision and the MIN(earlier) pick are all
    recomputed independently in SQL. Same ~1-ulp caveat as the other cosine
    oracles: LIST_COSINE_SIMILARITY vs the engine's normalized float64
    matmul could disagree for a pair EXACTLY on the rounded boundary —
    deterministic on these fixtures."""
    index_dir, _ = ensure_ivf_index(sf_dir, n_centroids, train_sample)
    return f"""
    WITH a AS (
        SELECT vec_id, CAST(cell AS BIGINT) AS cell,
               CAST(embedding AS DOUBLE[]) AS emb
        FROM read_parquet('{index_dir}/cell=*/*.parquet', hive_partitioning = 1)
    ), hits AS (
        SELECT r.vec_id, MIN(l.vec_id) AS dup_of
        FROM a l JOIN a r ON l.cell = r.cell AND l.vec_id < r.vec_id
        WHERE ROUND(LIST_COSINE_SIMILARITY(l.emb, r.emb), 6) >= {threshold!r}
        GROUP BY r.vec_id
    )
    SELECT a.vec_id, a.cell,
           h.vec_id IS NOT NULL AS dropped,
           COALESCE(h.dup_of, CAST(-1 AS BIGINT)) AS dup_of
    FROM a LEFT JOIN hits h ON h.vec_id = a.vec_id
    """


# --------------------------------------------------------------------------- #
def embedding_stats(sf_dir: str):
    """Per-dimension normalization statistics (mean + population variance)
    over the embedding table — the standardization pass vector pipelines
    run before IVF/PQ training or whitening.

    Scale shape: each batch reshapes its list column into one (rows × dim)
    float64 matrix and emits ONE (dim, Σx, Σx², n) partial row per
    dimension — the exchange is O(dim × blocks) regardless of vector
    count; the grouped sum is dimension-bounded so the plain aggregate is
    safe. The finalize computes Σx²/n − (Σx/n)² — written EXACTLY like the
    oracle expression so the two sides differ only by summation order,
    absorbed by the rounding convention."""
    from ray.data.aggregate import Sum

    from .rounding import round_np

    ds = _read_emb(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        m = _as_matrix(t)
        return pa.table(
            {
                "dim": pa.array(np.arange(m.shape[1], dtype="int64")),
                "s1": pa.array(m.sum(axis=0)),
                "s2": pa.array((m * m).sum(axis=0)),
                "n": pa.array(np.full(m.shape[1], m.shape[0], dtype="int64")),
            }
        )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(dtype=float)
        s1 = df["s1"].to_numpy()
        s2 = df["s2"].to_numpy()
        mean = s1 / n
        return pd.DataFrame(
            {
                "dim": df["dim"].astype("int64"),
                "n": df["n"].astype("int64"),
                "mean": round_np(mean, 6),
                "var_pop": round_np(s2 / n - mean * mean, 6),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("dim")
        .aggregate(Sum("s1", alias_name="s1"), Sum("s2", alias_name="s2"), Sum("n", alias_name="n"))
        .map_batches(finish, batch_format="pandas")
    )


def embedding_stats_sql() -> str:
    """Same Σx²/n − (Σx/n)² expression over CAST-to-double elements (float32
    → float64 casts are exact on both sides)."""
    return """
    WITH e AS (
        SELECT CAST(UNNEST(embedding) AS DOUBLE) AS x,
               GENERATE_SUBSCRIPTS(embedding, 1) - 1 AS dim
        FROM embeddings
    )
    SELECT CAST(dim AS BIGINT) AS dim,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(x) / COUNT(*), 6) AS mean,
           ROUND(SUM(x * x) / COUNT(*) - (SUM(x) / COUNT(*)) * (SUM(x) / COUNT(*)), 6) AS var_pop
    FROM e
    GROUP BY dim
    """


# --------------------------------------------------------------------------- #
# Distributed k-means FIT (Lloyd iterations) — unlike `embed_clusters`, which
# only ASSIGNS to sample-trained centroids, this trains the centroids
# themselves over the full table, the canonical broadcast→partial-sum→tiny-
# reduce iterative-ML pattern (each iteration is one streaming pass, no
# shuffle; only (cells × blocks) partial rows ever leave the workers).
_KMEANS_ROOT = "/tmp/crawler_ray_kmeans"


def ensure_kmeans_fit(sf_dir: str, n_centroids: int = 16, iters: int = 3) -> str:
    """Run the distributed Lloyd fit ONCE and persist every iteration's
    centroid table (``cent_t0.parquet`` … ``cent_t{iters}.parquet``) under a
    content-keyed /tmp dir with an atomic rename — the same build-once
    contract as `ensure_ivf_index`. Returns the artifact dir.

    Per iteration: centroids broadcast ONCE via ``ray.put``; each batch
    assigns its vectors (vectorized argmax over the dot-product matrix) and
    emits per-cell INTEGER partial sums of the 1e-9-quantized normalized
    vectors plus counts — ≤ n_centroids rows per block, so the reduce is a
    driver-side fold of a tiny frame and the update (sum/1e9/cnt, then L2
    normalize) is exact and order-independent given the assignment. Cells
    that captured no vectors keep their previous centroid. Init is the
    n_centroids lowest-vec_id vectors (deterministic, bounded read)."""
    import hashlib
    import shutil

    import duckdb
    import pyarrow.parquet as pq
    import ray

    emb = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(emb)
    key = hashlib.md5(
        f"{os.path.abspath(emb)}|{st.st_mtime_ns}|{st.st_size}|{n_centroids}|{iters}|kmfit".encode()
    ).hexdigest()[:12]
    final = os.path.join(_KMEANS_ROOT, key)
    if os.path.isdir(final) and os.path.exists(
        os.path.join(final, f"cent_t{iters}.parquet")
    ):
        return final

    def write_cents(dirname: str, t: int, cents: np.ndarray) -> None:
        pq.write_table(
            pa.table(
                {
                    "cell": pa.array(np.arange(len(cents), dtype=np.int64)),
                    "centroid": pa.FixedSizeListArray.from_arrays(
                        pa.array(cents.reshape(-1)), cents.shape[1]
                    ),
                }
            ),
            os.path.join(dirname, f"cent_t{t}.parquet"),
        )

    init = duckdb.sql(
        f"SELECT embedding FROM read_parquet('{emb}') ORDER BY vec_id LIMIT {n_centroids}"
    ).arrow()
    cents = _normalize(
        np.asarray(init["embedding"].combine_chunks().values, dtype=np.float64).reshape(
            len(init), -1
        )
    )
    dim = cents.shape[1]

    os.makedirs(_KMEANS_ROOT, exist_ok=True)
    tmp = f"{final}.tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    write_cents(tmp, 0, cents)

    ds = _read_emb(sf_dir)
    k = n_centroids
    for t in range(1, iters + 1):
        cref = ray.put(cents)

        def partial(tbl: pa.Table) -> pa.Table:
            c = ray.get(cref)
            x = _normalize(_as_matrix(tbl))
            cell = np.argmax(x @ c.T, axis=1)
            q = round_np(x * 1e9, 0).astype(np.int64)
            sums = np.zeros((k, dim), dtype=np.int64)
            np.add.at(sums, cell, q)
            cnt = np.bincount(cell, minlength=k).astype(np.int64)
            nz = cnt > 0
            return pa.table(
                {
                    "cell": pa.array(np.arange(k, dtype=np.int64)[nz]),
                    "cnt": pa.array(cnt[nz]),
                    "sums": pa.FixedSizeListArray.from_arrays(
                        pa.array(sums[nz].reshape(-1)), dim
                    ),
                }
            )

        parts = ds.map_batches(
            partial, batch_format="pyarrow", batch_size=8192
        ).to_pandas()  # ≤ n_centroids rows per block — bounded partials
        S = np.zeros((k, dim), dtype=np.int64)
        cnt = np.zeros(k, dtype=np.int64)
        if len(parts):
            cells = parts["cell"].to_numpy()
            np.add.at(S, cells, np.stack(parts["sums"].to_numpy()))
            np.add.at(cnt, cells, parts["cnt"].to_numpy())
        new = cents.copy()  # empty cells keep their previous centroid
        nz = cnt > 0
        # EXACT oracle arithmetic order: (CAST(s AS DOUBLE)/1e9)/cnt, then /L2
        u = (S[nz].astype(np.float64) / 1e9) / cnt[nz, None]
        new[nz] = u / np.linalg.norm(u, axis=1, keepdims=True)
        cents = new
        write_cents(tmp, t, cents)

    try:
        os.rename(tmp, final)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
        if not os.path.isdir(final):
            raise
    return final


def kmeans_fit(sf_dir: str, n_centroids: int = 16, iters: int = 3):
    """Final trained centroids of the distributed Lloyd fit, exploded to
    (cell, dim, val) rows. Oracle: :func:`kmeans_fit_sql` re-derives the
    ENTIRE final iteration — assignment under the persisted t−1 centroids,
    integer-quantized per-cell means, L2 normalization — from the raw
    embeddings in SQL, so the clustering decision AND the update math are
    value-checked (the same artifact-backed pattern as `minhash_pairs`).
    Float caveat (shared with `embed_clusters`): the oracle's dot product
    differs from numpy's by ~1 ulp, so an exactly-equidistant vector could
    flip cells — deterministic on these fixtures."""
    import pyarrow.parquet as pq

    d = ensure_kmeans_fit(sf_dir, n_centroids, iters)
    col = pq.read_table(os.path.join(d, f"cent_t{iters}.parquet"))
    cents = np.asarray(
        col["centroid"].combine_chunks().values, dtype=np.float64
    ).reshape(len(col), -1)
    k, dim = cents.shape
    return pd.DataFrame(
        {
            "cell": np.repeat(np.arange(k, dtype=np.int64), dim),
            "dim": np.tile(np.arange(1, dim + 1, dtype=np.int64), k),
            "val": round_np(cents.reshape(-1), 6),
        }
    )


def kmeans_fit_sql(sf_dir: str, n_centroids: int = 16, iters: int = 3) -> str:
    prev = os.path.join(
        ensure_kmeans_fit(sf_dir, n_centroids, iters), f"cent_t{iters - 1}.parquet"
    )
    return f"""
    WITH prev AS (
        SELECT cell, CAST(centroid AS DOUBLE[]) AS ce FROM read_parquet('{prev}')
    ),
    xs AS (
        SELECT vec_id,
               LIST_TRANSFORM(CAST(embedding AS DOUBLE[]),
                   v -> v / SQRT(LIST_SUM(LIST_TRANSFORM(CAST(embedding AS DOUBLE[]),
                                                         u -> u * u)))) AS x
        FROM embeddings
    ),
    assign AS (
        SELECT vec_id, x, cell FROM (
            SELECT vec_id, x, cell,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY LIST_DOT_PRODUCT(x, ce) DESC, cell) AS rk
            FROM xs CROSS JOIN prev
        ) WHERE rk = 1
    ),
    q AS (
        SELECT cell, UNNEST(x) AS v, GENERATE_SUBSCRIPTS(x, 1) AS dim FROM assign
    ),
    qq AS (SELECT cell, dim, CAST(ROUND(v * 1000000000) AS BIGINT) AS qv FROM q),
    sums AS (SELECT cell, dim, SUM(qv) AS s, COUNT(*) AS cnt FROM qq GROUP BY 1, 2),
    raw AS (
        SELECT cell, dim, (CAST(s AS DOUBLE) / 1000000000.0) / cnt AS uval FROM sums
    ),
    nrm AS (SELECT cell, SQRT(SUM(uval * uval)) AS nv FROM raw GROUP BY 1),
    kept AS (
        SELECT cell, GENERATE_SUBSCRIPTS(ce, 1) AS dim, UNNEST(ce) AS val
        FROM prev WHERE cell NOT IN (SELECT DISTINCT cell FROM sums)
    )
    SELECT r.cell, CAST(r.dim AS BIGINT) AS dim, ROUND(r.uval / n.nv, 6) AS val
    FROM raw r JOIN nrm n USING (cell)
    UNION ALL
    SELECT cell, CAST(dim AS BIGINT) AS dim, ROUND(val, 6) AS val FROM kept
    """
