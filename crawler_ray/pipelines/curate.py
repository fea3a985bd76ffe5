"""End-to-end training-data curation over the documents table — the
composition a 100 TB pipeline actually runs:

    documents → quality gate → exact dedup (keep min doc_id per text)
              → near-dup clustering (MinHash pairs → connected components)
              → keep one representative per cluster → kept corpus

Connected components run as driver-side union-find over the verified pair
list — pairs are the OUTPUT of LSH verification and are orders of magnitude
smaller than the corpus (at 10^10 docs you'd iterate distributed min-label
propagation over the pair edges instead; same contract, documented here).
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa

from .dedup import exact_dedup, minhash_pairs
from .text import QualityScore


def dup_clusters(sf_dir: str, threshold: float = 0.5):
    """Near-dup clusters: (doc_id, cluster_id) for every doc that appears in
    at least one verified MinHash pair; cluster_id = min doc_id in the
    component (deterministic)."""
    pairs = minhash_pairs(sf_dir, threshold=threshold).to_pandas()
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            # lower id wins the root → deterministic cluster ids
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    for a, b in zip(pairs["a"], pairs["b"]):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        union(a, b)
    rows = sorted((d, find(d)) for d in parent)
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows]),
            "cluster_id": pa.array([r[1] for r in rows]),
        }
    )


def curate(sf_dir: str, min_tokens: int = 5, min_quality: float = 0.3, near_dup_threshold: float = 0.5):
    """The kept-document list after the full gate chain. Returns
    (doc_id, n_tokens, quality) for every kept doc, sorted by doc_id."""
    import ray.data as rd

    # 1. quality gate (actor-pool scoring stage)
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    scored = docs.map_batches(QualityScore, batch_format="pandas", batch_size=4096, concurrency=2)

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        keep = (df["n_tokens"] >= min_tokens) & (df["quality"] > min_quality)
        return df.loc[keep, ["doc_id", "n_tokens", "quality"]]

    kept_q = scored.map_batches(gate, batch_format="pandas").to_pandas()

    # 2. exact dedup survivors (min doc_id per identical text)
    exact_keep = set(exact_dedup(sf_dir).to_pandas()["doc_id"])

    # 3. near-dup clusters: keep only the representative (== cluster_id)
    clusters = dup_clusters(sf_dir, threshold=near_dup_threshold).to_pandas()
    drop_near = set(clusters.loc[clusters["doc_id"] != clusters["cluster_id"], "doc_id"])

    keep = kept_q[
        kept_q["doc_id"].isin(exact_keep) & ~kept_q["doc_id"].isin(drop_near)
    ].sort_values("doc_id")
    return pa.Table.from_pandas(keep.reset_index(drop=True), preserve_index=False).replace_schema_metadata(None)
