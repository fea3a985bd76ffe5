"""Deduplication operators — exact, MinHash+LSH, SimHash, embedding-cosine —
the dedup family a 100 TB training-data pipeline needs (SURVEY 'beyond the
reference'; reference itself only has exact URL dedup, D1).

Scale shape shared by the near-dup pipelines:
  shingle/sign per batch (vectorized, no per-row Python in the hot loop:
  pandas explode + numpy reduceat) → explode to (bucket, doc) rows →
  groupby(bucket) → candidate pairs → verify. Buckets are capped (128 docs) so
  a degenerate bucket can't go quadratic; at real scale the verification side
  re-joins signatures via a hash-partitioned join — in-sandbox it broadcasts
  the signature matrix (documented small-side shortcut).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..state.seen import stable_hash64

_BUCKET_CAP = 128  # max docs considered per LSH bucket (skew guard)


def _read_docs(sf_dir: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


# --------------------------------------------------------------------------- #
def exact_dedup(sf_dir: str):
    """Exact dedup: first (min doc_id) per identical text. Hash-partitioned:
    per-batch combiner → groupby(text hash) Min. 64-bit content hash stands in
    for the full text on the shuffle (collision odds ~1e-11 at 6e4 docs;
    at 10^10 scale use 128-bit)."""
    from ray.data.aggregate import Min

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        h = stable_hash64(df["text"].fillna("").to_numpy(dtype=object))
        part = pd.DataFrame({"h": h.astype("uint64"), "doc_id": df["doc_id"]})
        return part.groupby("h", sort=False)["doc_id"].min().reset_index()

    ds = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        prep, batch_format="pandas", batch_size=16384
    )
    # repartition pins the shuffle partition count: Ray's sort-aggregate sizes
    # partitions from the pre-combiner plan (e.g. 64 read blocks → 64² tiny
    # shuffle tasks, ~14s for 5k rows); post-combiner the data is small
    out = ds.repartition(8).groupby("h").aggregate(Min("doc_id", alias_name="doc_id"))
    return out.select_columns(["doc_id"])


def exact_dedup_sql() -> str:
    return "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text"


# --------------------------------------------------------------------------- #
# MinHash signatures — vectorized shingling (explode + reduceat)

_N_HASH = 64
_N_BANDS = 32  # 32 bands × 2 rows — recall-oriented: P(candidate | J) =
# 1-(1-J²)³² ⇒ ~0.99996 at J=0.5, ~0.96 at J=0.3; verification prunes the rest
_rng = np.random.default_rng(0x5EED)
_A = (_rng.integers(1, 1 << 62, size=_N_HASH, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
_B = _rng.integers(0, 1 << 62, size=_N_HASH, dtype=np.uint64)
_P1, _P2, _P3 = np.uint64(0x9E3779B97F4A7C15), np.uint64(0xC2B2AE3D27D4EB4F), np.uint64(0x165667B19E3779F9)


def _doc_shingle_hashes(texts: pd.Series):
    """→ (shingle_hashes uint64[], doc_index int64[] nondecreasing).
    Word 3-gram rolling hashes + one whole-doc hash per doc (so even tiny docs
    get a signature)."""
    toks = texts.fillna("").str.lower().str.split()
    ex = toks.explode()
    ex = ex[ex.notna()]
    n_docs = len(texts)
    if len(ex):
        tok_doc = ex.index.to_numpy(dtype=np.int64)
        th = stable_hash64(ex.to_numpy(dtype=object))
    else:
        tok_doc = np.zeros(0, dtype=np.int64)
        th = np.zeros(0, dtype=np.uint64)
    if len(th) >= 3:
        valid = tok_doc[:-2] == tok_doc[2:]
        sh = (th[:-2] * _P1) ^ (th[1:-1] * _P2) ^ (th[2:] * _P3)
        sh = sh[valid]
        sdoc = tok_doc[:-2][valid]
    else:
        sh = np.zeros(0, dtype=np.uint64)
        sdoc = np.zeros(0, dtype=np.int64)
    whole = stable_hash64(texts.fillna("").to_numpy(dtype=object))
    sh = np.concatenate([sh, whole])
    sdoc = np.concatenate([sdoc, np.arange(n_docs, dtype=np.int64)])
    order = np.argsort(sdoc, kind="stable")
    return sh[order], sdoc[order]


def minhash_signatures_batch(df: pd.DataFrame) -> pa.Table:
    """(doc_id, text) batch → (doc_id, sig list<uint64>[64])."""
    sh, sdoc = _doc_shingle_hashes(df["text"])
    n = len(df)
    starts = np.searchsorted(sdoc, np.arange(n))
    sig = np.empty((n, _N_HASH), dtype=np.uint64)
    for i in range(_N_HASH):
        sig[:, i] = np.minimum.reduceat(_A[i] * sh + _B[i], starts)
    return pa.table(
        {
            "doc_id": pa.array(df["doc_id"].to_numpy()),
            "sig": pa.array(list(sig), pa.list_(pa.uint64(), _N_HASH)),
        }
    )


def _band_hashes(sig: np.ndarray) -> np.ndarray:
    """(n, 64) signatures → (n, bands) band-bucket hashes."""
    n = sig.shape[0]
    rows = _N_HASH // _N_BANDS
    out = np.empty((n, _N_BANDS), dtype=np.uint64)
    for b in range(_N_BANDS):
        acc = np.full(n, np.uint64(1469598103934665603))
        for r in range(rows):
            acc = (acc ^ sig[:, b * rows + r]) * np.uint64(1099511628211)
        out[:, b] = acc
    return out


def _bucket_pairs_by_join(bands, cap: int = _BUCKET_CAP, num_partitions: int = 8):
    """(bucket-key..., doc_id) rows → distinct candidate pairs (a < b), fully
    vectorized: bucket sizes via grouped Count, size-gate (2..cap — oversized
    buckets are degenerate and skipped; their members still pair via other
    bands), then a hash-partitioned SELF-JOIN on the bucket key. Replaces
    per-group Python (map_groups over ~1e5 tiny groups was ~100× slower)."""
    from ray.data.aggregate import Count

    key = ["band", "bh"]
    bands = bands.repartition(num_partitions).materialize()
    # skew gate: oversized buckets are rare degenerate clusters — collect just
    # their keys to the driver and broadcast-filter them out (a join against
    # the full size table hits Ray's empty-hash-partition schema loss)
    sizes = bands.groupby(key).aggregate(Count(alias_name="n"))
    big = sizes.map_batches(
        lambda t: t.filter(pc.greater(t["n"], cap)).drop_columns(["n"]),
        batch_format="pyarrow",
    ).to_pandas()
    if len(big):
        with np.errstate(over="ignore"):
            bad = (big["bh"].to_numpy(dtype=np.int64) << 3) | (
                big["band"].to_numpy(dtype=np.int64) & 7
            )

        def drop_big(t: pa.Table) -> pa.Table:
            with np.errstate(over="ignore"):
                k = (
                    t["bh"].combine_chunks().to_numpy(zero_copy_only=False) << 3
                ) | (t["band"].combine_chunks().to_numpy(zero_copy_only=False) & 7)
            keep = ~np.isin(k, bad)
            return t.filter(pa.array(keep))

        bands = bands.map_batches(drop_big, batch_format="pyarrow").materialize()
    pairs_raw = bands.join(
        bands,
        join_type="inner",
        num_partitions=num_partitions,
        on=tuple(key),
        left_suffix="_l",
        right_suffix="_r",
    )

    def ordered(t: pa.Table) -> pa.Table:
        keep = pc.less(t["doc_id_l"], t["doc_id_r"])
        t = t.filter(keep)
        return pa.table({"a": t["doc_id_l"].combine_chunks(), "b": t["doc_id_r"].combine_chunks()})

    pairs = pairs_raw.map_batches(ordered, batch_format="pyarrow")
    return (
        pairs.repartition(num_partitions)
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="n"))
        .select_columns(["a", "b"])
    )


def minhash_pairs(sf_dir: str, threshold: float = 0.5):
    """MinHash-LSH near-dup candidate pairs with signature verification.

    Returns (a, b, est_jaccard) with a < b and est_jaccard ≥ threshold."""
    import ray

    sigs = (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(minhash_signatures_batch, batch_format="pandas", batch_size=8192)
        .materialize()
    )

    def explode_bands(t: pa.Table) -> pa.Table:
        sig = np.asarray(t["sig"].combine_chunks().values).reshape(-1, _N_HASH)
        bh = _band_hashes(sig)
        n = sig.shape[0]
        doc = t["doc_id"].combine_chunks()
        return pa.table(
            {
                "band": pa.array(np.tile(np.arange(_N_BANDS, dtype=np.int64), n)),
                # int64 join key: uint64 ≥ 2^63 falls back to pickled-object
                # columns inside Dataset.join and breaks the hash aggregator
                "bh": pa.array(bh.reshape(-1).astype(np.int64)),
                "doc_id": pa.array(np.repeat(doc.to_numpy(zero_copy_only=False), _N_BANDS)),
            }
        )

    bands = sigs.map_batches(explode_bands, batch_format="pyarrow")
    pairs = _bucket_pairs_by_join(bands)

    # verification: signature-estimated Jaccard. Small-side broadcast of the
    # signature matrix; at 10^10 docs this becomes two hash-partitioned joins
    # of pairs×signatures instead.
    sig_pdf = sigs.to_pandas()
    sig_map = {
        d: np.asarray(s, dtype=np.uint64) for d, s in zip(sig_pdf["doc_id"], sig_pdf["sig"])
    }
    ref = ray.put(sig_map)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        if not len(df):
            return pd.DataFrame({"a": [], "b": [], "est_jaccard": []})
        est = np.array(
            [(m[a] == m[b]).mean() for a, b in zip(df["a"], df["b"])]
        ).round(6)
        out = df.assign(est_jaccard=est)
        return out[out["est_jaccard"] >= threshold]

    return pairs.map_batches(verify, batch_format="pandas")


# --------------------------------------------------------------------------- #
def simhash_signatures_batch(df: pd.DataFrame) -> pa.Table:
    """(doc_id, text) → (doc_id, simhash uint64): sign-sum of token-hash bits."""
    toks = df["text"].fillna("").str.lower().str.split()
    ex = toks.explode()
    ex = ex[ex.notna()]
    n = len(df)
    if len(ex):
        tok_doc = ex.index.to_numpy(dtype=np.int64)
        th = stable_hash64(ex.to_numpy(dtype=object))
    else:
        tok_doc = np.zeros(0, dtype=np.int64)
        th = np.zeros(0, dtype=np.uint64)
    order = np.argsort(tok_doc, kind="stable")
    tok_doc, th = tok_doc[order], th[order]
    starts = np.searchsorted(tok_doc, np.arange(n))
    counts = np.diff(np.append(starts, len(th))).astype(np.int64)
    # trailing zero-token docs make starts[i] == len(th), which reduceat
    # rejects — clamp for the reduction; counts==0 masking fixes the values
    clamped = np.minimum(starts, max(len(th) - 1, 0))
    sim = np.zeros(n, dtype=np.uint64)
    for k in range(64):
        bit = ((th >> np.uint64(k)) & np.uint64(1)).astype(np.int64)
        ones = (
            np.add.reduceat(bit, clamped)
            if len(th)
            else np.zeros(n, dtype=np.int64)
        )
        ones[counts == 0] = 0
        maj = (2 * ones > counts) & (counts > 0)
        sim |= maj.astype(np.uint64) << np.uint64(k)
    return pa.table({"doc_id": pa.array(df["doc_id"].to_numpy()), "simhash": pa.array(sim)})


def simhash(sf_dir: str):
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        simhash_signatures_batch, batch_format="pandas", batch_size=8192
    )


def simhash_pairs(sf_dir: str, max_hamming: int = 3):
    """Near-dup pairs by SimHash: bucket on each of four 16-bit chunks (any
    pair within hamming ≤ 3 of 64 bits shares at least one exact chunk when
    differences spread; standard pigeonhole banding for ≤3 flips over 4
    chunks), then verify exact hamming distance."""
    import ray

    sigs = simhash(sf_dir).materialize()

    def explode_chunks(t: pa.Table) -> pa.Table:
        sim = t["simhash"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.uint64)
        doc = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        chunks = [(sim >> np.uint64(16 * c)) & np.uint64(0xFFFF) for c in range(4)]
        return pa.table(
            {
                "band": pa.array(np.repeat(np.arange(4, dtype=np.int64), len(doc))),
                "bh": pa.array(np.concatenate(chunks).astype(np.int64)),
                "doc_id": pa.array(np.tile(doc, 4)),
            }
        )

    pairs = _bucket_pairs_by_join(sigs.map_batches(explode_chunks, batch_format="pyarrow"))
    pdf = sigs.to_pandas()
    sim_map = dict(zip(pdf["doc_id"], pdf["simhash"].astype(np.uint64)))
    ref = ray.put(sim_map)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        if not len(df):
            return pd.DataFrame({"a": [], "b": [], "hamming": []})
        x = np.array([int(m[a]) ^ int(m[b]) for a, b in zip(df["a"], df["b"])], dtype=np.uint64)
        ham = np.array([bin(v).count("1") for v in x], dtype=np.int64)
        out = df.assign(hamming=ham)
        return out[out["hamming"] <= max_hamming]

    return pairs.map_batches(verify, batch_format="pandas")


# --------------------------------------------------------------------------- #
def embedding_dup_pairs(sf_dir: str, threshold: float = 0.95, n_planes: int = 12):
    """Embedding-cosine near-dup: seeded random-hyperplane LSH buckets, then
    exact cosine verification inside each bucket (numpy matmul per group)."""
    import ray.data as rd

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
    planes = np.random.default_rng(42).standard_normal((64, n_planes))

    def bucketize(t: pa.Table) -> pa.Table:
        emb = np.asarray(t["embedding"].combine_chunks().values, dtype=np.float64).reshape(
            len(t), -1
        )
        norm = np.linalg.norm(emb, axis=1, keepdims=True)
        emb = emb / np.clip(norm, 1e-12, None)
        bits = (emb @ planes) > 0
        bucket = np.zeros(len(t), dtype=np.int64)
        for k in range(n_planes):
            bucket |= bits[:, k].astype(np.int64) << k
        return pa.table(
            {
                "bucket": pa.array(bucket),
                "vec_id": t["vec_id"].combine_chunks(),
                "embedding": t["embedding"].combine_chunks(),
            }
        )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "cosine": []})
        g = g.sort_values("vec_id").head(_BUCKET_CAP)
        emb = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        emb = emb / np.clip(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12, None)
        cos = emb @ emb.T
        ia, ib = np.triu_indices(len(g), k=1)
        keep = cos[ia, ib] >= threshold
        ids = g["vec_id"].to_numpy()
        return pd.DataFrame(
            {
                "a": ids[ia[keep]],
                "b": ids[ib[keep]],
                "cosine": np.round(cos[ia, ib][keep], 6),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
    )


# --------------------------------------------------------------------------- #
def ngram_jaccard_pairs(sf_dir: str, candidates=None, n: int = 3, threshold: float = 0.4):
    """Exact word-n-gram Jaccard over candidate pairs (default: MinHash
    candidates) — the verification-grade near-dup measure."""
    import ray

    cands = candidates if candidates is not None else minhash_pairs(sf_dir, threshold=0.2)
    docs = _read_docs(sf_dir, ["doc_id", "text"]).to_pandas()

    def shingles(text: str) -> set:
        ts = (text or "").lower().split()
        if len(ts) < n:
            return {tuple(ts)} if ts else set()
        return {tuple(ts[i : i + n]) for i in range(len(ts) - n + 1)}

    sets = {d: shingles(t) for d, t in zip(docs["doc_id"], docs["text"])}
    ref = ray.put(sets)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        rows = {"a": [], "b": [], "jaccard": []}
        for a, b in zip(df["a"], df["b"]):
            sa, sb = m.get(a, set()), m.get(b, set())
            u = len(sa | sb)
            j = (len(sa & sb) / u) if u else 0.0
            if j >= threshold:
                rows["a"].append(a)
                rows["b"].append(b)
                rows["jaccard"].append(round(j, 6))
        return pd.DataFrame(rows)

    return cands.select_columns(["a", "b"]).map_batches(verify, batch_format="pandas")
