"""Pipeline correctness: every SQL-expressible query vs its DuckDB oracle at
sf0.001 (fast tier), plus behavioral tests for the rows-only operators
(near-dup detection on planted duplicates, ANN-LSH recall, decode stub)."""

import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod
from util_compare import assert_equivalent, to_df

SF = "/root/testdata/sf0.001"


def _sql_for(name: str) -> str:
    return entrymod.oracle_sql()[name]


SQL_CHECKED = [
    "q1_pricing_summary",
    "filter_project",
    "segment_revenue",
    "nation_revenue",
    "top_orders",
    "q5_region_revenue",
    "brand_volume",
    "distinct_nation_keys",
    "events_hourly",
    "events_hopping",
    "events_funnel",
    "customers_without_big_orders",
    "token_stats",
    "fingerprints",
    "exact_dedup",
    "ann_bruteforce",
    "events_lag",
    "events_running_sum",
    "events_sessions",
    "events_last_error",
    "props_k_sum",
    "sample_docs",
    "normalize_text",
    "pii_scrub",
    "top_docs_per_source",
    "token_quantiles",
    "token_quantiles_by_lang",
    "vocab_stats",
    "stratified_sample",
    "events_retention",
    "order_rank_in_customer",
    "bloom_semi_join",
    "revenue_rollup",
    "bigram_pmi",
    "events_paths",
    "embedding_stats",
    "promo_revenue",
    "top_supplier",
    "events_anomaly",
    "customer_order_counts",
    "late_ship_priority",
    "tfidf_topk",
    "lang_sample_weights",
    "events_distinct_daily",
    "nation_market_share",
    "events_attribution",
]


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_duckdb(name, ray_session):
    q = entrymod.queries()[name]
    assert_equivalent(q(SF), _sql_for(name), SF)


@pytest.mark.parametrize(
    "name",
    [
        "corpus_links",
        "span_profile",
        "media_manifest",
        "media_meta",
        "media_features",
        "media_resize",
        "media_frames",
        "media_ann",
        "media_dedup",
        "crawl_bfs",
        "pagerank",
        "host_graph",
        "reciprocal_links",
        "link_triangles",
    ],
)
def test_corpus_query_matches_duckdb(name, ray_session):
    """Corpus-backed queries: oracle SQL embeds the sf0.01 corpus path, so
    compare at sf0.01 (generation is cached)."""
    sf = "/root/testdata/sf0.01"
    q = entrymod.queries()[name]
    assert_equivalent(q(sf), _sql_for(name), sf)


def test_entry_smoke(ray_session):
    out = to_df(entrymod.entry())
    assert len(out) > 0
    assert list(out.columns) == ["url", "depth"]


def test_crawl_bfs_matches_oracle(ray_session):
    from crawler_ray.config import CrawlConfig
    from crawler_ray.oracle import corpus_as_dict, crawl, robots_as_dict
    from crawler_ray.pipelines.crawlq import spec_for_sf
    from crawler_ray.synth import gen_corpus, gen_robots

    spec = spec_for_sf(SF)
    got = to_df(entrymod.queries()["crawl_bfs"](SF))
    cfg = CrawlConfig(url=f"https://{spec.host(0)}/", sitemap=True)
    o = crawl(corpus_as_dict(gen_corpus(spec)), cfg, robots_as_dict(gen_robots(spec)))
    assert dict(zip(got["url"], got["depth"])) == o.waves


# ------------------------- near-dup behavioral tests ----------------------- #

def _planted_docs(tmp_path):
    """A corpus with two exact-near-duplicate clusters + unrelated docs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = (
        "the quick brown fox jumps over the lazy dog while the rain in spain "
        "falls mainly on the plain and every good boy deserves fudge today"
    )
    rows = {
        "doc_id": list(range(8)),
        "text": [
            base,
            base + " extra",                       # near-dup of 0
            base.replace("fox", "cat"),            # near-dup of 0
            "completely different words about databases and query engines",
            "completely different words about databases and query planners",  # near-dup of 3
            "unrelated short text one",
            "unrelated совершенно другой text two",
            "numbers 1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18",
        ],
        "lang": ["en"] * 8,
        "source": ["t"] * 8,
        "n_chars": [0] * 8,
    }
    d = tmp_path / "planted"
    d.mkdir()
    pq.write_table(pa.table(rows), str(d / "documents.parquet"))
    return str(d)


def test_emit_bucket_pairs_matches_bruteforce():
    """The size-class pair-emit kernel must produce exactly the within-bucket
    (a < b) pairs a brute-force enumeration gives, skipping buckets > cap."""
    import itertools

    import numpy as np
    import pyarrow as pa

    from crawler_ray.pipelines.dedup import _emit_bucket_pairs

    rng = np.random.default_rng(7)
    band = rng.integers(0, 3, 400)
    bh = rng.integers(0, 12, 400)
    doc = rng.integers(0, 40, 400)  # small id space: forces in-bucket repeats
    cap = 6
    got = _emit_bucket_pairs(
        pa.table({"band": band, "bh": bh, "doc_id": doc}), cap
    )
    got_set = set(zip(got["a"].to_pylist(), got["b"].to_pylist()))
    want = set()
    buckets: dict = {}
    for b, h, d in zip(band, bh, doc):
        buckets.setdefault((b, h), []).append(int(d))
    for members in buckets.values():
        distinct = sorted(set(members))  # a member counts once per bucket
        if len(distinct) > cap:
            continue
        for x, y in itertools.combinations(distinct, 2):
            want.add((x, y))
    assert got_set == want and len(want) > 0


def test_minhash_finds_planted_dups(ray_session, tmp_path):
    from crawler_ray.pipelines.dedup import minhash_pairs

    sf = _planted_docs(tmp_path)
    pairs = to_df(minhash_pairs(sf, threshold=0.4))
    found = {tuple(sorted(p)) for p in zip(pairs["a"], pairs["b"])}
    assert (0, 1) in found
    assert (0, 2) in found
    assert (3, 4) in found
    assert all({a, b} & {5, 6, 7} == set() for a, b in found)


def test_ngram_jaccard_verifies(ray_session, tmp_path):
    from crawler_ray.pipelines.dedup import minhash_pairs, ngram_jaccard_pairs

    sf = _planted_docs(tmp_path)
    pairs = to_df(ngram_jaccard_pairs(sf, candidates=minhash_pairs(sf, threshold=0.2)))
    found = {tuple(sorted(p)): j for *p, j in zip(pairs["a"], pairs["b"], pairs["jaccard"])}
    assert found[(0, 1)] > 0.8
    assert 0.5 < found[(0, 2)] <= 1.0


def test_simhash_finds_planted_dups(ray_session, tmp_path):
    from crawler_ray.pipelines.dedup import simhash_pairs

    sf = _planted_docs(tmp_path)
    pairs = to_df(simhash_pairs(sf, max_hamming=8))
    found = {tuple(sorted(p)) for p in zip(pairs["a"], pairs["b"])}
    assert (0, 1) in found or (0, 2) in found


def test_embedding_dup_pairs_finds_planted(ray_session, tmp_path):
    """Exact-duplicate embeddings share every LSH table's bucket, so they are
    found deterministically; near-random vectors above threshold are found
    with high probability (multi-table OR-construction)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.pipelines.dedup import embedding_dup_pairs

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((40, 64)).astype(np.float32)
    vecs[1] = vecs[0]                      # exact dup
    vecs[3] = vecs[2] + 0.05 * rng.standard_normal(64).astype(np.float32)  # near dup
    d = tmp_path / "emb"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": list(range(40)),
                "embedding": [list(map(float, v)) for v in vecs],
                "label": [0] * 40,
            }
        ),
        str(d / "embeddings.parquet"),
    )
    pairs = to_df(embedding_dup_pairs(str(d), threshold=0.9))
    found = {tuple(sorted(p)) for p in zip(pairs["a"], pairs["b"])}
    assert (0, 1) in found
    assert (2, 3) in found
    assert pairs.loc[(pairs["a"] == 0) & (pairs["b"] == 1), "cosine"].iloc[0] == 1.0


@pytest.mark.parametrize("variant", ["lsh", "ivf"])
def test_ann_approx_recall(ray_session, variant):
    from crawler_ray.pipelines.similarity import ann_bruteforce, ann_ivf, ann_lsh

    exact = to_df(ann_bruteforce(SF, n_queries=3, k=5))
    fn = ann_lsh if variant == "lsh" else ann_ivf
    approx = to_df(fn(SF, n_queries=3, k=5))
    recall = []
    for qid in exact["qid"].unique():
        e = set(exact.loc[exact["qid"] == qid, "vec_id"])
        a = set(approx.loc[approx["qid"] == qid, "vec_id"])
        recall.append(len(e & a) / len(e))
    assert np.mean(recall) >= 0.2  # approximate by design; must be nonzero
    # self-match must always be found (it lands in the query's own
    # bucket/centroid cell, which is always probed)
    for qid in exact["qid"].unique():
        assert qid in set(approx.loc[approx["qid"] == qid, "vec_id"])


def _independent_ppm_decode(payload: bytes):
    """Plain-Python PPM parser, deliberately independent of the engine's
    numpy frombuffer path: header via text split, pixels via int() over a
    memoryview loop."""
    nl1 = payload.index(b"\n")
    nl2 = payload.index(b"\n", nl1 + 1)
    nl3 = payload.index(b"\n", nl2 + 1)
    assert payload[:nl1] == b"P6" and payload[nl2 + 1 : nl3] == b"255"
    w, h = (int(x) for x in payload[nl1 + 1 : nl2].split())
    px = [int(b) for b in memoryview(payload)[nl3 + 1 :]]
    assert len(px) == w * h * 3
    return w, h, px


def test_media_decode_real(ray_session):
    """media_features derives features from REAL decoded pixel bytes: check
    a sample of rows against an independent pure-Python PPM parser."""
    import pyarrow.parquet as pq

    from crawler_ray.pipelines.multimodal import MediaDecode, media_blob_path, media_features

    stat_cols = ["mean_r", "mean_g", "mean_b", "gray_mean", "gray_std"]
    out = to_df(media_features(SF))
    assert len(out) > 0
    assert (~out["is_stub"]).all()
    assert {"width", "height", "n_px", *stat_cols} <= set(out.columns)
    # determinism: same ref → same stats
    dup = out.groupby("media_ref")[stat_cols].nunique()
    assert (dup == 1).all().all()

    blobs = pq.read_table(media_blob_path(SF)).to_pylist()
    by_ref = {r["media_ref"]: r["payload"] for r in blobs}
    for _, row in out.drop_duplicates("media_ref").head(5).iterrows():
        w, h, px = _independent_ppm_decode(bytes(by_ref[row["media_ref"]]))
        assert (row["width"], row["height"], row["n_px"]) == (w, h, w * h)
        mean_r = sum(px[0::3]) / (w * h)
        mean_g = sum(px[1::3]) / (w * h)
        mean_b = sum(px[2::3]) / (w * h)
        assert np.allclose(
            [row["mean_r"], row["mean_g"], row["mean_b"]],
            [mean_r, mean_g, mean_b],
            atol=1e-5,
        )
        gray = [
            0.299 * px[i] + 0.587 * px[i + 1] + 0.114 * px[i + 2]
            for i in range(0, len(px), 3)
        ]
        gm = sum(gray) / len(gray)
        gs = (sum((g - gm) ** 2 for g in gray) / len(gray)) ** 0.5
        assert np.allclose(
            [row["gray_mean"], row["gray_std"]], [gm, gs], atol=1e-4
        )

    # payload-less batches (external corpus without blobs) fall back to the
    # deterministic hash-feature stub
    import pyarrow as pa

    stub_out = MediaDecode()(pa.table({"doc_id": ["d"], "media_ref": ["m"]}))
    assert stub_out["is_stub"].to_pylist() == [True]


def test_quality_and_langid_shapes(ray_session):
    q = to_df(entrymod.queries()["quality"](SF))
    assert ((q["quality"] >= 0) & (q["quality"] <= 1)).all()
    l = to_df(entrymod.queries()["lang_id"](SF))
    assert set(l.columns) == {"doc_id", "pred_lang", "lang_score"}
    assert len(l) == len(q)


def test_dup_clusters_distributed_matches_inmemory(ray_session, tmp_path):
    """The Dataset-level min-label propagation (the 10^10-edge path, no
    driver state) must produce byte-identical clusters to the in-memory
    numpy kernel."""
    from crawler_ray.pipelines.curate import dup_clusters

    sf = _planted_docs(tmp_path)
    mem = dup_clusters(sf, threshold=0.4).to_pandas().reset_index(drop=True)
    dist = dup_clusters(sf, threshold=0.4, distributed=True)
    dist = (dist.to_pandas() if hasattr(dist, "to_pandas") else dist).reset_index(drop=True)
    assert len(mem) > 0 and mem.equals(dist)

    # curate() consumes the Dataset-typed distributed return identically
    from crawler_ray.pipelines.curate import curate

    k_mem = curate(sf, min_tokens=4, min_quality=0.0, near_dup_threshold=0.4).to_pandas()
    k_dist = curate(
        sf, min_tokens=4, min_quality=0.0, near_dup_threshold=0.4, dup_distributed=True
    ).to_pandas()
    assert k_mem.reset_index(drop=True).equals(k_dist.reset_index(drop=True))


def test_media_resize_and_frames(ray_session):
    """Multimodal actor-pool stages: resize box-filters REAL pixels (never
    upscales, respects the target box, mean is pixel-derived); frame
    sampling expands every media row to n_frames ordered frame refs with
    payload-derived durations; both deterministic across runs."""
    from crawler_ray.pipelines.multimodal import (
        box_resize,
        decode_ppm,
        media_frames,
        media_manifest,
        media_resize,
    )
    from crawler_ray.synth import ppm_bytes

    sf = "/root/testdata/sf0.001"
    n_media = media_manifest(sf).count()
    r = media_resize(sf, target=16).to_pandas()
    assert len(r) == n_media
    assert (~r["is_stub"]).all()
    assert (r[["out_w", "out_h"]].max(axis=1) <= 16).all()
    assert ((r["out_w"] <= r["src_w"]) & (r["out_h"] <= r["src_h"])).all()
    assert ((r["out_mean"] >= 0) & (r["out_mean"] <= 255)).all()
    # box-filter preserves the global mean to within quantization error
    ref = r.iloc[0]["media_ref"]
    img = decode_ppm(ppm_bytes(ref))
    row = r[r["media_ref"] == ref].iloc[0]
    small = box_resize(img, int(row["out_w"]), int(row["out_h"]))
    assert row["out_mean"] == round(float(small.mean()), 6)
    assert abs(small.mean() - img.mean()) < 8  # floor-division bias only
    r2 = media_resize(sf, target=16).to_pandas()
    assert r.sort_values(["doc_id", "media_ref"]).reset_index(drop=True).equals(
        r2.sort_values(["doc_id", "media_ref"]).reset_index(drop=True)
    )

    f = media_frames(sf, n_frames=3).to_pandas()
    assert len(f) == 3 * n_media
    one = f[f["media_ref"] == f["media_ref"].iloc[0]].sort_values("frame_idx")
    assert list(one["frame_idx"])[:3] == [0, 1, 2]
    assert one["ts_ms"].is_monotonic_increasing
    # duration is payload-derived: 1s + 1ms per pixel
    h_, w_, _ = decode_ppm(ppm_bytes(one.iloc[0]["media_ref"])).shape
    dur = 1_000 + w_ * h_
    assert one.iloc[-1]["ts_ms"] == (dur * 5) // 6  # midpoint of last third


def test_curation_composition(ray_session, tmp_path):
    """curate(): planted near-dups collapse to one representative; low-quality
    and short docs are gated out."""
    from crawler_ray.pipelines.curate import curate, dup_clusters

    sf = _planted_docs(tmp_path)
    clusters = dup_clusters(sf, threshold=0.4).to_pandas()
    by_cluster = clusters.groupby("cluster_id")["doc_id"].apply(set).to_dict()
    assert {0, 1, 2} <= by_cluster.get(0, set())

    kept = curate(sf, min_tokens=4, min_quality=0.0, near_dup_threshold=0.4).to_pandas()
    kept_ids = set(kept["doc_id"])
    assert 0 in kept_ids and 1 not in kept_ids and 2 not in kept_ids
    assert 3 in kept_ids and 4 not in kept_ids
    # unrelated docs with enough tokens survive
    assert 7 in kept_ids


def test_signature_batches_handle_empty_docs():
    """Trailing zero-token docs must not break the reduceat-based signatures
    (regression: IndexError at batch boundaries in heavy corpora)."""
    import pandas as pd

    from crawler_ray.pipelines.dedup import (
        minhash_signatures_batch,
        simhash_signatures_batch,
    )

    df = pd.DataFrame({"doc_id": [1, 2, 3, 4], "text": ["hello world x", "", None, ""]})
    s = simhash_signatures_batch(df)
    assert s.num_rows == 4
    assert [v == 0 for v in s.column("simhash").to_pylist()] == [False, True, True, True]
    assert minhash_signatures_batch(df).num_rows == 4


def test_export_curated_resumable(ray_session, tmp_path):
    """Partitioned training-set export: shard dirs commit data-then-marker;
    a re-run skips finished shards and rebuilds only missing ones."""
    import os
    import shutil

    import pyarrow.parquet as pq

    from crawler_ray.pipelines.curate import export_curated

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "export")
    m1 = export_curated(sf, out_dir=out, n_shards=4).to_pandas()
    assert len(m1) == 4 and not m1["skipped"].any()
    total = int(m1["n_docs"].sum())
    assert total > 0

    # kill one shard: its marker and data vanish → only it is rebuilt
    shutil.rmtree(os.path.join(out, "shard=2"))
    m2 = export_curated(sf, out_dir=out, n_shards=4).to_pandas().set_index("shard")
    assert m2.loc[[0, 1, 3], "skipped"].all()
    assert not m2.loc[2, "skipped"]
    assert int(m2["n_docs"].sum()) == total

    # kill mid-write: marker gone but stale data files remain → the retry
    # must wipe them first, not append next to them (which would double the
    # shard — ADVICE r2)
    os.remove(os.path.join(out, "shard=3", "_SUCCESS"))
    m3 = export_curated(sf, out_dir=out, n_shards=4).to_pandas().set_index("shard")
    assert not m3.loc[3, "skipped"]
    assert int(m3["n_docs"].sum()) == total

    # a marker from a different shard-hash generation is NOT a commit: the
    # shard must be rewritten, never resumed across hash versions (review
    # r4 #7 — old-hash placement + new-hash todo filter would drop docs)
    with open(os.path.join(out, "shard=1", "_SUCCESS"), "w") as f:
        f.write("shard-hash-v1")
    m4 = export_curated(sf, out_dir=out, n_shards=4).to_pandas().set_index("shard")
    assert not m4.loc[1, "skipped"]
    assert m4.loc[[0, 2, 3], "skipped"].all()
    assert int(m4["n_docs"].sum()) == total

    # exported rows are exactly the curated keep-list, disjointly sharded
    got = []
    for k in range(4):
        d = os.path.join(out, f"shard={k}")
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                got.extend(pq.read_table(d + "/" + f)["doc_id"].to_pylist())
    from crawler_ray.pipelines.curate import curate

    want = curate(sf).to_pandas()["doc_id"].tolist()
    assert sorted(got) == sorted(want)


def test_run_jobs_parallel_matches_sequential(ray_session, tmp_path):
    from crawler_ray.config import CrawlConfig
    from crawler_ray.engine import run_jobs
    from crawler_ray.synth import CorpusSpec, corpus_path, robots_path
    import pyarrow.parquet as pq

    spec = CorpusSpec(n_hosts=3, pages_per_host=10)
    cp = corpus_path(spec)
    robots = pq.read_table(robots_path(spec))
    jobs = [
        CrawlConfig(url=f"https://{spec.host(0)}/", crawl_id="a"),
        CrawlConfig(url=f"https://{spec.host(2)}/", crawl_id="b"),
    ]
    seq = run_jobs(cp, jobs, robots)
    par = run_jobs(cp, jobs, robots, parallel=True)
    assert [set(r.visited) for r in seq] == [set(r.visited) for r in par]
    assert [r.pages_fetched for r in seq] == [r.pages_fetched for r in par]


def test_winnowing_shared_passage(ray_session, tmp_path):
    """Winnowing guarantee: documents sharing a passage of ≥ k+window-1
    tokens share at least one fingerprint; disjoint docs share none."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.pipelines.text import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = {
        "doc_id": [0, 1, 2],
        "text": [
            "intro words here " + shared + " tail one",
            "completely other opening " + shared + " different ending",
            "nothing in common with those documents at all whatsoever",
        ],
    }
    d = tmp_path / "win"
    d.mkdir()
    pq.write_table(pa.table(rows), str(d / "documents.parquet"))
    fp = to_df(winnow_fingerprints(str(d), k=5, window=4))
    by_doc = fp.groupby("doc_id")["fingerprint"].apply(set)
    assert by_doc[0] & by_doc[1], "shared passage must share a fingerprint"
    assert not (by_doc[0] & by_doc[2])
    assert not (by_doc[1] & by_doc[2])


def test_bm25_ranks_planted_relevant_doc_first(ray_session, tmp_path):
    """BM25: the doc containing every query term (twice) outranks docs with
    partial or no overlap; ranks are 1-based and deterministic."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.pipelines.similarity import bm25_topk

    rows = {
        "doc_id": [0, 1, 2, 3],
        "text": [
            "alpha beta alpha beta filler words here",   # all terms, high tf
            "alpha filler words with one term only now",  # partial
            "no relevant words at all in this one",
            "beta appears once in this other document",
        ],
    }
    d = tmp_path / "bm25"
    d.mkdir()
    pq.write_table(pa.table(rows), str(d / "documents.parquet"))
    top = to_df(bm25_topk(str(d), query="alpha beta", k=3))
    assert list(top["rank"]) == [1, 2, 3]
    assert top.iloc[0]["doc_id"] == 0
    assert top.iloc[0]["score"] > top.iloc[1]["score"]


def test_winnow_overlap_and_decontaminate(ray_session, tmp_path):
    """Contamination detection on planted overlap: docs sharing a long
    passage surface as an overlap pair; decontaminate() flags exactly the
    corpus docs overlapping the 'benchmark' texts."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.pipelines.text import decontaminate, winnow_overlap_pairs

    shared = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lamda mu nu xi omicron pi rho sigma tau upsilon"
    )
    rows = {
        "doc_id": [0, 1, 2, 3],
        "text": [
            "intro words here " + shared + " tail one two three",
            "completely other opening " + shared + " different closing words",
            "nothing in common with those documents at all whatsoever truly",
            "fully disjoint content again with its own private tokens only",
        ],
    }
    d = tmp_path / "contam"
    d.mkdir()
    pq.write_table(pa.table(rows), str(d / "documents.parquet"))

    pairs = to_df(winnow_overlap_pairs(str(d), min_shared=2))
    assert set(zip(pairs["a"], pairs["b"])) == {(0, 1)}
    assert (pairs["shared"] >= 2).all()

    # benchmark set = one text containing the shared passage
    flagged = to_df(decontaminate(str(d), ["prefix " + shared + " suffix"], min_shared=2))
    assert set(flagged["doc_id"]) == {0, 1}


def test_repetition_stats_planted(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.pipelines.text import repetition_stats

    rows = {
        "doc_id": [0, 1, 2],
        "text": [
            "spam spam spam spam spam spam",          # one token repeated
            "buy now " * 10,                          # duplicated 2-grams
            "all tokens here are fully distinct ok",  # clean
        ],
    }
    d = tmp_path / "rep"
    d.mkdir()
    pq.write_table(pa.table(rows), str(d / "documents.parquet"))
    r = to_df(repetition_stats(str(d))).set_index("doc_id")
    assert r.loc[0, "top_token_frac"] == 1.0
    assert r.loc[1, "dup_2gram_frac"] > 0.8
    assert r.loc[2, "dup_2gram_frac"] == 0.0
    assert r.loc[2, "top_token_frac"] < 0.25


# ------------------ artifact oracles (round-4 hardening) ------------------- #

# sketch pipelines whose oracle reads the dumped intermediates (signatures,
# candidate pairs, fingerprints, probe sets); oracle SQL embeds sf0.01
# artifact paths, so compare at sf0.01 like the corpus-backed queries
ARTIFACT_SQL_CHECKED = [
    "minhash_pairs",
    "simhash_pairs",
    "ngram_jaccard_pairs",
    "embedding_dup_pairs",
    "dup_clusters",
    "curate",
    "export_curated",
    "winnow_overlap_pairs",
    "winnow_fingerprints",
    "decontaminate",
    "ann_lsh",
    "ann_ivf",
    "embed_clusters",
    "semdedup",
    "kmeans_fit",
    "containment_pairs",
]


@pytest.mark.parametrize("name", ARTIFACT_SQL_CHECKED)
def test_artifact_oracle_matches_duckdb(name, ray_session):
    sf = "/root/testdata/sf0.01"
    assert_equivalent(entrymod.queries()[name](sf), _sql_for(name), sf)


def test_whitespace_padded_tokenization_parity(ray_session, tmp_path):
    """ADVICE r3: text padded with \\t/\\n must tokenize identically in the
    engine (pandas str.split) and the DuckDB oracles (LIST_FILTER over the
    regex split) — the sf fixtures are space-only, so pin it here."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.pipelines import text as T

    d = tmp_path / "pad"
    d.mkdir()
    texts = [
        "\n\thello world\t\n",
        "  spaced  out  tokens  here  now  ",
        "tab\tsep\ttokens and the usual words",
        "",
        "\n \t\r\n",
        "one",
    ]
    pq.write_table(
        pa.table({"doc_id": list(range(len(texts))), "text": texts}),
        str(d / "documents.parquet"),
    )
    assert_equivalent(T.token_stats(str(d)), T.token_stats_sql(), str(d))
    assert_equivalent(T.quality(str(d)), T.quality_sql(), str(d))
    assert_equivalent(T.lang_id(str(d)), T.lang_id_sql(), str(d))
    # normalize_text on messy text: lowercase + collapse + strip is
    # non-trivial here (the sf fixtures are already normalized)
    assert_equivalent(T.normalize_text(str(d)), T.normalize_text_sql(), str(d))
    nt = to_df(T.normalize_text(str(d))).sort_values("doc_id")
    assert nt["norm_text"].tolist()[0] == "hello world"
    assert nt["changed"].tolist() == [1, 1, 1, 0, 1, 0]


def test_pii_scrub_planted(ray_session, tmp_path):
    """The sf fixtures contain no PII, so the sf-level pii_scrub oracle only
    proves the passthrough; plant real emails/phones/IPs here and check both
    the counts and the redacted text against the DuckDB oracle, plus pinned
    expected redactions (non-vacuous semantics check)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.pipelines import text as T

    d = tmp_path / "pii"
    d.mkdir()
    texts = [
        "contact joe.doe+spam@ex-ample.co.uk or call 555-867-5309 today",
        "server at 10.0.255.1 and backup 192.168.0.254; not-an-ip 1.2.3.4.5",
        "two mails a@b.io c@d.org one phone 123-456-7890",
        "clean document with no sensitive content at all",
        "",
    ]
    pq.write_table(
        pa.table({"doc_id": list(range(len(texts))), "text": texts}),
        str(d / "documents.parquet"),
    )
    assert_equivalent(T.pii_scrub(str(d)), T.pii_scrub_sql(), str(d))
    got = to_df(T.pii_scrub(str(d))).sort_values("doc_id").reset_index(drop=True)
    assert got["n_email"].tolist() == [1, 0, 2, 0, 0]
    assert got["n_phone"].tolist() == [1, 0, 1, 0, 0]
    # '1.2.3.4.5' still contains the '1.2.3.4' prefix match — counted, same
    # in both engines
    assert got["n_ip"].tolist() == [0, 3, 0, 0, 0]
    assert got["redacted"][0] == "contact <EMAIL> or call <PHONE> today"
    assert got["redacted"][2] == "two mails <EMAIL> <EMAIL> one phone <PHONE>"


def test_stratified_sample_stable_across_partitionings(ray_session, tmp_path):
    """The docstring's core claim: selection is a pure function of doc_id,
    so the kept set is identical however the input is partitioned/ordered
    (a resumed or re-planned 100 TB mix keeps exactly the same documents)."""
    import pyarrow.parquet as pq

    from crawler_ray.pipelines.curate import stratified_sample

    sf = "/root/testdata/sf0.001"
    base = to_df(stratified_sample(sf)).sort_values("doc_id").reset_index(drop=True)

    # same table, shuffled row order and a different row-group layout
    t = pq.read_table(f"{sf}/documents.parquet")
    rng = np.random.default_rng(3)
    d = tmp_path / "shuffled"
    d.mkdir()
    pq.write_table(
        t.take(rng.permutation(len(t))), str(d / "documents.parquet"), row_group_size=37
    )
    got = to_df(stratified_sample(str(d))).sort_values("doc_id").reset_index(drop=True)
    assert got.equals(base)


def test_pagerank_paths_bit_identical(ray_session):
    """The in-memory numpy kernel and the Dataset iterative path must agree
    BIT-EXACTLY (the whole point of the integer fixed-point formulation)."""
    from crawler_ray.pipelines import crawlq as C

    sf = "/root/testdata/sf0.001"
    a = to_df(C.pagerank(sf)).sort_values("url").reset_index(drop=True)
    b = to_df(C.pagerank(sf, distributed=True)).sort_values("url").reset_index(drop=True)
    assert a.equals(b)


def test_link_triangles_numpy_distributed_parity(ray_session):
    """The in-memory kernel and the full distributed pipeline (degree joins
    + wedge generation + pair-keyed closure) must count identically."""
    from crawler_ray.pipelines import crawlq as C

    sf = "/root/testdata/sf0.001"
    a = to_df(C.link_triangles(sf))
    b = to_df(C.link_triangles(sf, distributed=True))
    assert a["n_triangles"].tolist() == b["n_triangles"].tolist()
    assert a["n_triangles"].iloc[0] > 0  # fixture actually has triangles


def test_anti_join_empty_probe_side(ray_session):
    """min_total above every order price: the probe side is all-empty (its
    schema can drop through the hash shuffle) — the anti-join must return
    EVERY customer rather than KeyError on the missing marker column."""
    from crawler_ray.pipelines import relational as R

    sf = "/root/testdata/sf0.001"
    got = to_df(R.customers_without_big_orders(sf, min_total=10**9))
    assert len(got) == 150
    assert sorted(got.columns) == ["c_acctbal", "c_custkey", "c_name"]


def test_events_funnel_planted(ray_session, tmp_path):
    """The sf fixtures are dense enough that every user completes the funnel;
    plant users stalling at each stage (incl. out-of-order events that must
    NOT count) and check stage indices + sentinel timestamps vs the oracle."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.pipelines import relational as R

    d = tmp_path / "funnel"
    d.mkdir()
    TS = lambda m: pd.Timestamp("2026-01-01") + pd.Timedelta(minutes=m)
    rows = [
        # u1 completes in order
        (1, TS(0), "signup"), (1, TS(5), "click"), (1, TS(9), "purchase"),
        # u2: purchase BEFORE click -> stalls at click (stage 2)
        (2, TS(0), "signup"), (2, TS(8), "click"), (2, TS(3), "purchase"),
        # u3: click before signup only -> stage 1
        (3, TS(4), "signup"), (3, TS(2), "click"),
        # u4: no signup at all -> stage 0
        (4, TS(1), "click"), (4, TS(2), "purchase"),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows]),
                "value": pa.array([1.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        str(d / "events.parquet"),
    )
    assert_equivalent(R.events_funnel(str(d)), R.events_funnel_sql(), str(d))
    got = to_df(R.events_funnel(str(d))).set_index("user_id")
    assert got["stage"].to_dict() == {1: 3, 2: 2, 3: 1, 4: 0}
    assert got.loc[2, "t_purchase"] == -1
    assert got.loc[4, "t_signup"] == -1


def test_token_quantiles_rule_matches_duckdb(ray_session, tmp_path):
    """token_quantiles re-implements QUANTILE_DISC's ceil(q*n)-th-smallest
    rule driver-side over the merged histogram; pin the rule itself on a
    small skewed fixture (duplicates + gaps) across many q values."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.pipelines import text as T

    d = tmp_path / "tq"
    d.mkdir()
    texts = (
        ["one"] * 3
        + ["two words"] * 5
        + ["three brown words here now"] * 1
        + ["a b c d e f g"] * 2
    )
    pq.write_table(
        pa.table({"doc_id": list(range(len(texts))), "text": texts}),
        str(d / "documents.parquet"),
    )
    qs = (0.0, 0.05, 0.1, 0.3, 0.5, 0.7, 0.9, 0.95, 1.0)
    assert_equivalent(T.token_quantiles(str(d), qs=qs), T.token_quantiles_sql(qs=qs), str(d))


def test_export_shard_hash_sql_parity():
    """The engine's uint64 wraparound multiply and the oracle's HUGEINT
    emulation must agree on every shard assignment."""
    import duckdb

    from crawler_ray.pipelines.curate import _SHARD_MIX, shard_of

    ids = np.array([0, 1, 2, 7, 12345, 10**12, 2**62, 2**63 - 1], dtype=np.int64)
    want = shard_of(ids, 8)
    got = duckdb.sql(
        f"SELECT CAST(((CAST(x AS HUGEINT) * {int(_SHARD_MIX)}) % 18446744073709551616)"
        f" // 131072 % 8 AS BIGINT) AS s FROM (SELECT UNNEST({[int(i) for i in ids]}) AS x)"
    ).fetchnumpy()["s"]
    assert (want == got).all()


def test_ann_ivf_reads_only_probed_cells(ray_session):
    """The IVF inverted file prunes I/O, not just compute: a small probe set
    touches strictly fewer bytes than the whole index (VERDICT r3 #2)."""
    import os

    from crawler_ray.pipelines.similarity import (
        _query_matrix,
        ensure_ivf_index,
        ivf_probe_paths,
    )

    sf = "/root/testdata/sf0.01"
    idx, cents = ensure_ivf_index(sf)
    qids, qm = _query_matrix(sf, 2)
    probe = np.argsort(-(qm @ cents.T), axis=1)[:, :2]
    paths = ivf_probe_paths(idx, probe.reshape(-1))
    all_files = [
        os.path.join(r, f)
        for r, _, fs in os.walk(idx)
        for f in fs
        if f.endswith(".parquet")
    ]
    probed_bytes = sum(os.path.getsize(p) for p in paths)
    total_bytes = sum(os.path.getsize(p) for p in all_files)
    assert probed_bytes < total_bytes
    assert len(paths) < len(all_files)
    # and the pruned-read query still answers: 2 queries × k rows
    from crawler_ray.pipelines.similarity import ann_ivf

    out = to_df(ann_ivf(sf, n_queries=2, n_probe=2))
    assert set(out["qid"]) == set(int(q) for q in qids)
    assert len(out) == 2 * 10


def test_ann_lsh_reads_only_probed_buckets(ray_session):
    """The bucket-partitioned LSH store prunes I/O like the IVF inverted
    file: a query's multi-probe set (bucket ± 1 bit = n_planes+1 of
    2**n_planes buckets) touches strictly fewer bytes than the whole
    index."""
    import os

    from crawler_ray.pipelines.similarity import (
        _lsh_bucket_of,
        _query_matrix,
        ann_lsh,
        ensure_lsh_index,
        lsh_probe_paths,
    )

    sf = "/root/testdata/sf0.01"
    idx, planes = ensure_lsh_index(sf)
    qids, qm = _query_matrix(sf, 2)
    probes = set()
    for b in _lsh_bucket_of(qm, planes):
        probes.add(int(b))
        for i in range(planes.shape[1]):
            probes.add(int(b) ^ (1 << i))
    paths = lsh_probe_paths(idx, probes)
    all_files = [
        os.path.join(r, f)
        for r, _, fs in os.walk(idx)
        for f in fs
        if f.endswith(".parquet")
    ]
    probed_bytes = sum(os.path.getsize(p) for p in paths)
    total_bytes = sum(os.path.getsize(p) for p in all_files)
    assert probed_bytes < total_bytes
    assert len(paths) < len(all_files)
    # and the pruned-read query still answers: 2 queries × k rows
    out = to_df(ann_lsh(sf, n_queries=2))
    assert set(out["qid"]) == set(int(q) for q in qids)
    assert len(out) == 2 * 10


def test_artifact_write_dataset_empty(ray_session, tmp_path, monkeypatch):
    """A zero-candidate sketch run must still write a schema-complete empty
    artifact — ray.data's Schema wrapper has no empty_table() (review r4 #1)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from crawler_ray.pipelines import artifacts

    monkeypatch.setattr(artifacts, "_ROOT", str(tmp_path / "artifacts"))
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    pq.write_table(
        pa.table({"doc_id": pa.array([], pa.int64())}),
        os.path.join(sf, "documents.parquet"),
    )
    empty = rd.from_arrow(
        pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.string())})
    )
    path = artifacts.write_dataset(sf, "empty_test", empty)
    back = pq.read_table(path)
    assert back.num_rows == 0
    assert back.schema.names == ["a", "b"]


def test_media_ann_self_match(ray_session):
    """Every query medium must rank itself first with cosine exactly 1.0
    (identical rounded stat vectors), and each query returns exactly k rows."""
    from crawler_ray.pipelines.multimodal import media_ann

    out = to_df(media_ann(SF, n_queries=3, k=5)).sort_values(["qref", "rank"])
    assert out.groupby("qref").size().eq(5).all()
    firsts = out[out["rank"] == 1]
    # rank 1 is always a perfect score; with duplicate payloads the
    # lexicographically-smallest tied ref wins, which may be the query
    # itself or an identical twin
    assert (firsts["score"] == 1.0).all()
    for qref, grp in out.groupby("qref"):
        assert qref in set(grp.loc[grp["score"] == 1.0, "media_ref"])


def test_media_dedup_planted_duplicates(ray_session, tmp_path):
    """Exact binary dedup groups identical payload bytes: planted duplicate
    blobs share a content key and resolve to the lexicographically-smallest
    representative; unique blobs are not flagged."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.pipelines.multimodal import media_dedup

    a = b"P6\n10 10\n255\n" + bytes(range(256)) * 2
    b = b"P6\n10 10\n255\n" + bytes(reversed(range(256)))
    tab = pa.table(
        {
            "media_ref": ["m3", "m1", "m2", "m4"],
            "payload": pa.array([a, b, a, a], pa.binary()),
        }
    )
    p = str(tmp_path / "blobs.parquet")
    pq.write_table(tab, p)
    out = (
        to_df(media_dedup(SF, blobs=p)).set_index("media_ref").sort_index()
    )
    assert out.loc["m1", "is_dup"] == False  # noqa: E712
    assert out.loc["m2", "is_dup"] == False  # smallest ref of the a-cluster
    assert list(out.loc[["m3", "m4"], "representative"]) == ["m2", "m2"]
    assert out.loc[["m3", "m4"], "is_dup"].all()
    assert out.loc["m1", "content_key"] != out.loc["m2", "content_key"]


def test_text_oracles_null_text_parity(ray_session, tmp_path):
    """ADVICE r4: the engine kernels fillna('') but the SQL oracles used raw
    text — a NULL text row made the SQL side emit NULL norm_text/changed and
    drop the row from quantile/vocab bases. Plant NULL rows and assert full
    engine≡oracle parity for every text oracle that touches `text`."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.pipelines import text as T

    d = tmp_path / "nulls"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": [0, 1, 2, 3],
                "text": ["Hello  World", None, "a b c", None],
                "lang": ["en", "en", "fr", "fr"],
                "source": ["s"] * 4,
                "n_chars": [12, 0, 5, 0],
            }
        ),
        str(d / "documents.parquet"),
    )
    sf = str(d)
    assert_equivalent(T.normalize_text(sf), T.normalize_text_sql(), sf)
    assert_equivalent(T.pii_scrub(sf), T.pii_scrub_sql(), sf)
    assert_equivalent(T.token_quantiles(sf), T.token_quantiles_sql(), sf)
    assert_equivalent(
        T.token_quantiles_by_lang(sf), T.token_quantiles_by_lang_sql(), sf
    )
    assert_equivalent(T.vocab_stats(sf), T.vocab_stats_sql(), sf)
    # the older text oracles share the same fillna('') kernel convention
    assert_equivalent(T.token_stats(sf), T.token_stats_sql(), sf)
    assert_equivalent(T.fingerprints(sf), T.fingerprints_sql(), sf)
    assert_equivalent(T.lang_id(sf), T.lang_id_sql(), sf)
    assert_equivalent(T.quality(sf), T.quality_sql(), sf)
    assert_equivalent(T.repetition_stats(sf), T.repetition_stats_sql(), sf)
    # NULL text must normalize to '' with changed=0 (not NULL) on both sides
    nt = to_df(T.normalize_text(sf)).sort_values("doc_id")
    assert nt["norm_text"].tolist() == ["hello world", "", "a b c", ""]
    assert nt["changed"].tolist() == [1, 0, 0, 0]


def test_pagerank_empty_graph(ray_session, monkeypatch):
    """ADVICE r4: an empty link graph used to divide by node count 0 in both
    the distributed path and the numpy kernel; both must return the empty
    (url, rank) frame instead."""
    import pyarrow as pa
    import ray

    from crawler_ray.pipelines import crawlq as C

    empty = ray.data.from_arrow(
        pa.table({"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())})
    )
    monkeypatch.setattr(C, "corpus_links", lambda sf: empty)
    for distributed in (None, True, False):
        out = to_df(C.pagerank("ignored", distributed=distributed))
        assert len(out) == 0
        assert list(out.columns) == ["url", "rank"]
    kern = C._pagerank_numpy(pd.DataFrame({"src": [], "dst": []}), 5, 10**12)
    assert len(kern) == 0 and list(kern.columns) == ["url", "rank"]


def test_embedding_dim_probe(tmp_path):
    """VERDICT r4 #3: dim comes from a one-batch parquet probe (or
    fixed_size_list metadata), never a full-table materialize."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.pipelines.dedup import _embedding_dim

    p1 = str(tmp_path / "var.parquet")
    pq.write_table(
        pa.table({"vec_id": [0, 1], "embedding": [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]}),
        p1,
    )
    assert _embedding_dim(p1) == 3
    p2 = str(tmp_path / "fixed.parquet")
    arr = pa.FixedSizeListArray.from_arrays(pa.array([1.0] * 8, pa.float32()), 4)
    pq.write_table(pa.table({"vec_id": [0, 1], "embedding": arr}), p2)
    assert _embedding_dim(p2) == 4


def test_stratified_mix_oracle_and_precedence(ray_session):
    """source×lang weighted mixing (VERDICT r4 #8): oracle parity on the sf
    fixture, plus pinned precedence exact > source/* > */lang > keep-all."""
    from crawler_ray.pipelines.curate import (
        _MIX_BUCKETS,
        _mix_thresholds,
        stratified_mix,
        stratified_mix_sql,
    )

    sf = "/root/testdata/sf0.001"
    assert_equivalent(stratified_mix(sf), stratified_mix_sql(), sf)

    exact, by_source, by_lang = _mix_thresholds(
        {"s/en": 0.1, "s/*": 0.5, "*/en": 0.9}
    )
    assert exact == {"s/en": int(0.1 * _MIX_BUCKETS)}
    assert by_source == {"s": int(0.5 * _MIX_BUCKETS)}
    assert by_lang == {"en": int(0.9 * _MIX_BUCKETS)}

    # precedence on real data: a source/lang stratum with an exact 0.0 rate
    # drops fully even when broader wildcards would keep it
    got = to_df(
        stratified_mix(sf, rates={"src0/en": 0.0, "src0/*": 1.0, "*/en": 1.0})
    )
    assert not len(got[(got["source"] == "src0") & (got["lang"] == "en")])
    assert len(got[(got["source"] == "src0") & (got["lang"] != "en")])
    assert len(got[(got["source"] != "src0") & (got["lang"] == "en")])


def test_stratified_mix_stable_across_partitionings(ray_session, tmp_path):
    """Same run-invariance claim as stratified_sample: membership is a pure
    function of doc_id and the stratum rate."""
    import pyarrow.parquet as pq

    from crawler_ray.pipelines.curate import stratified_mix

    sf = "/root/testdata/sf0.001"
    base = to_df(stratified_mix(sf)).sort_values("doc_id").reset_index(drop=True)
    t = pq.read_table(f"{sf}/documents.parquet")
    rng = np.random.default_rng(5)
    d = tmp_path / "shuffled_mix"
    d.mkdir()
    pq.write_table(
        t.take(rng.permutation(len(t))), str(d / "documents.parquet"), row_group_size=41
    )
    got = to_df(stratified_mix(str(d))).sort_values("doc_id").reset_index(drop=True)
    assert got.equals(base)


def test_ann_filtered_oracle_and_semantics(ray_session):
    """Filtered vector search: per-query top-k restricted to the query's
    label slice — oracle parity plus the slice-purity invariant."""
    import pyarrow.parquet as pq

    from crawler_ray.pipelines.similarity import ann_filtered, ann_filtered_sql

    sf = "/root/testdata/sf0.001"
    assert_equivalent(ann_filtered(sf), ann_filtered_sql(), sf)
    got = to_df(ann_filtered(sf))
    emb = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "label"]).to_pandas()
    lab = dict(zip(emb["vec_id"], emb["label"]))
    # every hit shares its query's label, and the query itself (cos=1) ranks first
    assert all(lab[v] == l for v, l in zip(got["vec_id"], got["label"]))
    firsts = got[got["rank"] == 1]
    assert (firsts["vec_id"].to_numpy() == firsts["qid"].to_numpy()).all()


def test_unigram_logprob_oracle_and_semantics(ray_session, tmp_path):
    """Perplexity-style LM scoring: oracle parity on the sf fixture AND a
    planted check — a document of corpus-common tokens must out-score one
    of rare/garbled tokens; empty and NULL docs score 0.0 with 0 tokens."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.pipelines.text import unigram_logprob, unigram_logprob_sql

    sf = "/root/testdata/sf0.001"
    assert_equivalent(unigram_logprob(sf), unigram_logprob_sql(), sf)

    d = tmp_path / "lm"
    d.mkdir()
    texts = [
        "the cat sat on the mat",
        "the cat sat on the mat",
        "the cat sat on the mat again",
        "zqxj vvkw pplm qrrt",  # garbled: every token unique
        "",
        None,
    ]
    pq.write_table(
        pa.table({"doc_id": list(range(len(texts))), "text": texts}),
        str(d / "documents.parquet"),
    )
    assert_equivalent(unigram_logprob(str(d)), unigram_logprob_sql(), str(d))
    got = to_df(unigram_logprob(str(d))).sort_values("doc_id").reset_index(drop=True)
    assert got.loc[0, "logprob"] > got.loc[3, "logprob"]  # fluent ≫ garbled
    assert got.loc[4, "n_tokens"] == 0 and got.loc[4, "logprob"] == 0.0
    assert got.loc[5, "n_tokens"] == 0 and got.loc[5, "logprob"] == 0.0


def test_pack_sequences_oracle_and_layout_invariance(ray_session, tmp_path):
    """Sequence packing (distributed prefix sum): oracle parity, bin
    monotonicity in stream order, and invariance to input block layout —
    the two-pass offset computation must give identical bins however the
    parquet is row-grouped or ordered."""
    import pyarrow.parquet as pq

    from crawler_ray.pipelines.curate import pack_sequences, pack_sequences_sql

    sf = "/root/testdata/sf0.001"
    assert_equivalent(pack_sequences(sf), pack_sequences_sql(), sf)
    got = to_df(pack_sequences(sf)).sort_values("doc_id").reset_index(drop=True)
    # bins are non-decreasing along the stream and recompute from scratch
    assert (np.diff(got["bin"].to_numpy()) >= 0).all()
    start = np.cumsum(got["n_chars"].to_numpy()) - got["n_chars"].to_numpy()
    assert (got["bin"].to_numpy() == start // 4096).all()

    t = pq.read_table(f"{sf}/documents.parquet")
    rng = np.random.default_rng(9)
    d = tmp_path / "repacked"
    d.mkdir()
    pq.write_table(
        t.take(rng.permutation(len(t))), str(d / "documents.parquet"), row_group_size=29
    )
    again = to_df(pack_sequences(str(d))).sort_values("doc_id").reset_index(drop=True)
    assert again.equals(got)


def test_bigram_logprob_oracle_and_semantics(ray_session, tmp_path):
    """Conditional bigram LM: oracle parity + planted semantics — a doc of
    corpus-frequent bigrams out-scores one of unique bigrams; docs with
    fewer than two tokens score 0.0 with 0 bigrams."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.pipelines.text import bigram_logprob, bigram_logprob_sql

    sf = "/root/testdata/sf0.001"
    assert_equivalent(bigram_logprob(sf), bigram_logprob_sql(), sf)

    d = tmp_path / "lm2"
    d.mkdir()
    texts = [
        "the cat sat on the mat",
        "the cat sat on the mat",
        "the cat sat on the mat",
        "mat the on sat cat the",  # same unigrams, unseen bigram order
        "one",
        "",
        None,
    ]
    pq.write_table(
        pa.table({"doc_id": list(range(len(texts))), "text": texts}),
        str(d / "documents.parquet"),
    )
    assert_equivalent(bigram_logprob(str(d)), bigram_logprob_sql(), str(d))
    got = to_df(bigram_logprob(str(d))).sort_values("doc_id").reset_index(drop=True)
    assert got.loc[0, "logprob2"] > got.loc[3, "logprob2"]
    for i in (4, 5, 6):
        assert got.loc[i, "n_bigrams"] == 0 and got.loc[i, "logprob2"] == 0.0


def test_orders_by_quarter_range_join(ray_session):
    """Broadcast range join: every order lands in exactly one quarter
    interval (totals reconcile with the raw table) and matches the DuckDB
    interval-join oracle."""
    import pyarrow.parquet as pq

    from crawler_ray.pipelines.relational import (
        orders_by_quarter,
        orders_by_quarter_sql,
    )

    sf = "/root/testdata/sf0.001"
    assert_equivalent(orders_by_quarter(sf), orders_by_quarter_sql(), sf)
    got = to_df(orders_by_quarter(sf))
    n = pq.read_metadata(f"{sf}/orders.parquet").num_rows
    assert got["n_orders"].sum() == n  # partition of the fact table


def test_dup_stats_by_source(ray_session, tmp_path):
    """Per-source dup audit: oracle parity on the sf fixture plus planted
    duplicate rates."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.pipelines.dedup import (
        dup_stats_by_source,
        dup_stats_by_source_sql,
    )

    sf = "/root/testdata/sf0.001"
    assert_equivalent(dup_stats_by_source(sf), dup_stats_by_source_sql(), sf)

    d = tmp_path / "dupsrc"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(6)),
                "source": ["a", "a", "a", "a", "b", "b"],
                "text": ["x", "x", "x", "y", "p", "q"],
            }
        ),
        str(d / "documents.parquet"),
    )
    assert_equivalent(dup_stats_by_source(str(d)), dup_stats_by_source_sql(), str(d))
    got = to_df(dup_stats_by_source(str(d))).set_index("source")
    assert got.loc["a", "n_docs"] == 4 and got.loc["a", "n_unique"] == 2
    assert got.loc["a", "dup_rate"] == 0.5
    assert got.loc["b", "dup_rate"] == 0.0


def test_dedup_oracles_null_text_parity(ray_session, tmp_path):
    """Same ADVICE-r4 class as the text oracles: the engines fillna('') so a
    NULL text doc must group WITH the empty-string doc in exact dedup (and
    tokenize to nothing in the n-gram oracles), not form its own group."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.pipelines.dedup import (
        dup_stats_by_source,
        dup_stats_by_source_sql,
        exact_dedup,
        exact_dedup_sql,
        jaccard_adjacent,
        jaccard_adjacent_sql,
    )

    d = tmp_path / "dednull"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [None, "", "a b c d e f g", "a b c d e f g"],
                "lang": ["en"] * 4,
                "source": ["s"] * 4,
                "n_chars": [0, 0, 13, 13],
            }
        ),
        str(d / "documents.parquet"),
    )
    sf = str(d)
    assert_equivalent(exact_dedup(sf), exact_dedup_sql(), sf)
    assert_equivalent(dup_stats_by_source(sf), dup_stats_by_source_sql(), sf)
    assert_equivalent(jaccard_adjacent(sf), jaccard_adjacent_sql(), sf)
    # NULL and '' collapsed to one survivor (doc 0), dups to doc 2
    kept = sorted(to_df(exact_dedup(sf))["doc_id"])
    assert kept == [0, 2]


def test_hll_distinct_registers_and_estimate(ray_session):
    """HLL frontier-cardinality sketch: register table matches the SQL-side
    recomputation bit-for-bit, and the estimator (with linear-counting
    correction) lands within ±5% of the exact distinct link-target count."""
    import duckdb

    from crawler_ray.pipelines.crawlq import (
        corpus_for_sf,
        hll_distinct,
        hll_distinct_sql,
        hll_estimate,
    )

    sf = "/root/testdata/sf0.001"
    regs = to_df(hll_distinct(sf))
    assert_equivalent(regs, hll_distinct_sql(sf), sf)
    assert len(regs) <= 4096 and regs["max_rank"].min() >= 1
    assert regs["bucket"].is_unique

    exact = duckdb.sql(
        f"""SELECT COUNT(DISTINCT u.s['text'])
            FROM read_parquet('{corpus_for_sf(sf)}') t, UNNEST(t.spans) AS u(s)
            WHERE u.s['kind'] = 'link'"""
    ).fetchone()[0]
    est = hll_estimate(regs)
    assert abs(est - exact) / exact < 0.05, (est, exact)


def test_chunk_documents_planted_and_oracle(ray_session, tmp_path):
    """Token-window chunking: oracle parity on the sf fixture and on planted
    docs (short/empty/NULL text, non-default size/stride), plus hand-checked
    window boundaries and content hashes."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.pipelines.text import chunk_documents, chunk_documents_sql

    sf = "/root/testdata/sf0.001"
    assert_equivalent(chunk_documents(sf), chunk_documents_sql(), sf)

    d = tmp_path / "chunks"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": ["d1", "d2", "d3", "d4"],
                "text": ["a b c d e f g", "only two", "", None],
            }
        ),
        str(d / "documents.parquet"),
    )
    assert_equivalent(
        chunk_documents(str(d), size=4, stride=3),
        chunk_documents_sql(size=4, stride=3),
        str(d),
    )
    got = (
        to_df(chunk_documents(str(d), size=4, stride=3))
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    # d1: windows [a b c d], [d e f g], [g]; d2: [only two]; d3/d4: none
    assert list(got["doc_id"]) == ["d1", "d1", "d1", "d2"]
    assert list(got["chunk_id"]) == [0, 1, 2, 0]
    assert list(got["n_tokens"]) == [4, 4, 1, 2]
    assert got.loc[0, "chunk_md5"] == hashlib.md5(b"a b c d").hexdigest()
    assert got.loc[2, "chunk_md5"] == hashlib.md5(b"g").hexdigest()


def test_events_hll_hourly_registers_and_estimate(ray_session):
    """Windowed HLL: per-hour register table matches the SQL recomputation,
    and each window's estimate lands within ±5% of the exact per-window
    distinct-user count."""
    from crawler_ray.pipelines.crawlq import hll_estimate
    from crawler_ray.pipelines.relational import (
        events_hll_hourly,
        events_hll_hourly_sql,
    )
    from tests.util_compare import run_oracle

    sf = "/root/testdata/sf0.001"
    regs = to_df(events_hll_hourly(sf))
    assert_equivalent(regs, events_hll_hourly_sql(), sf)

    exact = run_oracle(
        """SELECT CAST(FLOOR(EPOCH(ts) / 3600) * 3600 AS BIGINT) AS window_start,
                  COUNT(DISTINCT user_id) AS n
           FROM events GROUP BY 1""",
        sf,
    ).set_index("window_start")["n"]
    assert len(exact) > 1  # fixture spans multiple windows
    for win, grp in regs.groupby("window_start"):
        est = hll_estimate(grp)
        assert abs(est - exact.loc[win]) / exact.loc[win] < 0.05, (
            win,
            est,
            exact.loc[win],
        )


def test_chunk_documents_vectorized_matches_naive(ray_session, tmp_path):
    """Property: the masked-explode chunking kernel equals a per-document
    reference implementation (list slicing) across random token counts and
    (size, stride) shapes, including stride > size (gaps) and stride = 1."""
    import hashlib
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.pipelines.text import chunk_documents

    rng = random.Random(7)
    for size, stride in [(4, 3), (5, 5), (3, 7), (6, 1)]:
        d = tmp_path / f"c{size}_{stride}"
        d.mkdir()
        texts = [
            " ".join(f"t{rng.randrange(50)}" for _ in range(rng.randrange(0, 23)))
            for _ in range(40)
        ]
        pq.write_table(
            pa.table({"doc_id": [f"d{i}" for i in range(40)], "text": texts}),
            str(d / "documents.parquet"),
        )
        got = (
            to_df(chunk_documents(str(d), size=size, stride=stride))
            .sort_values(["doc_id", "chunk_id"])
            .reset_index(drop=True)
        )
        want = []
        for i, text in enumerate(texts):
            toks = text.split()
            for start in range(0, len(toks), stride):
                chunk = toks[start : start + size]
                want.append(
                    (
                        f"d{i}",
                        start // stride,
                        len(chunk),
                        hashlib.md5(" ".join(chunk).encode()).hexdigest(),
                    )
                )
        want.sort()
        assert list(map(tuple, got.to_numpy())) == want, (size, stride)


def test_bloom_semi_join_exact_under_false_positives(ray_session):
    """A 256-bit filter over ~240 build keys saturates (FP rate ≈ 1), so
    nearly every lineitem row survives the probe — the verification join
    must scrub all of them back to the exact semi-join answer."""
    import duckdb

    from crawler_ray.pipelines.relational import bloom_semi_join, bloom_semi_join_sql

    cols = ["l_orderkey", "l_linenumber", "l_quantity"]  # keys alone are not
    # unique in the synthetic lineitem — sort on every column
    got = to_df(bloom_semi_join(SF, m_bits=256, n_hashes=2)).sort_values(
        cols
    ).reset_index(drop=True)
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    want = (
        con.sql(bloom_semi_join_sql())
        .df()[got.columns]
        .sort_values(cols)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_dedup_increment(ray_session, tmp_path):
    """Delta-ingest dedup: oracle parity on the sf fixture plus a planted
    delta (doc_id % 4 == 0) exercising base-hit drop, in-delta first-wins,
    and NULL→'' parity against an empty-string base doc."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.pipelines.dedup import dedup_increment, dedup_increment_sql

    sf = "/root/testdata/sf0.001"
    assert_equivalent(dedup_increment(sf), dedup_increment_sql(), sf)

    d = tmp_path / "dinc"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                # delta = 0, 4, 8, 12, 16; base = the rest
                "doc_id": [0, 1, 2, 3, 4, 8, 12, 16, 17],
                "text": ["x", "x", "y", "q", "z", "z", "w", None, ""],
            }
        ),
        str(d / "documents.parquet"),
    )
    assert_equivalent(dedup_increment(str(d)), dedup_increment_sql(), str(d))
    kept = sorted(to_df(dedup_increment(str(d)))["doc_id"])
    # 0 drops (text "x" in base), 8 drops (in-delta dup of 4),
    # 16 drops (NULL ≡ '' which base doc 17 holds), 4 and 12 survive
    assert kept == [4, 12]


def test_perplexity_buckets(ray_session, tmp_path):
    """CCNet tiles: oracle parity on the sf fixture; planted corpus checks
    the NTILE sizing (7 docs -> 3/2/2) and that fluent docs land in head."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.pipelines.text import perplexity_buckets, perplexity_buckets_sql

    sf = "/root/testdata/sf0.001"
    assert_equivalent(perplexity_buckets(sf), perplexity_buckets_sql(), sf)

    d = tmp_path / "ppl"
    d.mkdir()
    common = "the cat sat on the mat"
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(7)),
                "text": [common, common, common, common + " zzz",
                         "qq ww ee rr tt yy", "uu ii oo pp aa ss", None],
            }
        ),
        str(d / "documents.parquet"),
    )
    assert_equivalent(perplexity_buckets(str(d)), perplexity_buckets_sql(), str(d))
    got = to_df(perplexity_buckets(str(d)))
    sizes = got["bucket"].value_counts()
    assert sizes["head"] == 3 and sizes["middle"] == 2 and sizes["tail"] == 2
    # empty doc scores 0.0 (top), then the repeated fluent docs in doc_id
    # order; the all-singleton-token docs land in tail
    assert set(got[got["bucket"] == "head"]["doc_id"]) == {6, 0, 1}
    assert set(got[got["bucket"] == "tail"]["doc_id"]) == {4, 5}


def test_shuffle_export(ray_session):
    """Seeded global shuffle: oracle parity, balanced round-robin shards,
    and a different seed yields a different permutation (same shard sizes)."""
    from crawler_ray.pipelines.curate import shuffle_export, shuffle_export_sql

    sf = "/root/testdata/sf0.001"
    assert_equivalent(shuffle_export(sf), shuffle_export_sql(), sf)

    got = to_df(shuffle_export(sf))
    sizes = got.groupby("shard").size()
    assert sizes.max() - sizes.min() <= 1  # balanced by construction
    # positions within each shard are 0..size-1
    for s, grp in got.groupby("shard"):
        assert sorted(grp["pos"]) == list(range(len(grp)))
    other = to_df(shuffle_export(sf, seed=7))
    merged = got.merge(other, on="doc_id", suffixes=("_a", "_b"))
    assert (merged["shard_a"] != merged["shard_b"]).any()
    # determinism: same seed, same assignment
    again = to_df(shuffle_export(sf))
    assert got.sort_values("doc_id").reset_index(drop=True).equals(
        again.sort_values("doc_id").reset_index(drop=True)
    )


def test_heavy_tokens(ray_session, tmp_path):
    """Misra-Gries exact heavy hitters: oracle parity on the sf fixture and
    on a planted corpus where the heavy set is known; exactness holds even
    when a token is heavy globally but light in some blocks."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.pipelines.text import heavy_tokens, heavy_tokens_sql

    sf = "/root/testdata/sf0.001"
    assert_equivalent(heavy_tokens(sf), heavy_tokens_sql(), sf)

    # planted: 'hot' appears 40/100 tokens, 'warm' 20, the rest singletons
    # spread across many docs so no single doc dominates a block
    d = tmp_path / "hh"
    d.mkdir()
    docs = []
    for i in range(20):
        docs.append("hot hot warm " + f"u{i}a u{i}b")
    pq.write_table(
        pa.table({"doc_id": list(range(len(docs))), "text": docs}),
        str(d / "documents.parquet"),
    )
    k = 9  # threshold N/(k+1) = 100/10 = 10: hot(40) and warm(20) qualify
    got = to_df(heavy_tokens(str(d), k=k)).sort_values("token")
    assert list(got["token"]) == ["hot", "warm"]
    assert list(got["cnt"]) == [40, 20]
    assert_equivalent(heavy_tokens(str(d), k=k), heavy_tokens_sql(k=k), str(d))


def test_containment_finds_planted_subset(ray_session, tmp_path):
    """A short doc that is a contiguous slice of a long doc must surface with
    containment ≈ 1.0 in the short→long direction even though its JACCARD
    with the long doc is low — the asymmetric case the symmetric near-dup
    family cannot flag."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.pipelines.dedup import containment_pairs

    long_words = [f"w{i}" for i in range(120)]
    short = " ".join(long_words[40:60])  # 20-token contiguous slice
    rows = {
        "doc_id": [0, 1, 2],
        "text": [" ".join(long_words), short, "totally unrelated filler text"],
        "lang": ["en"] * 3,
        "source": ["t"] * 3,
        "n_chars": [0] * 3,
    }
    d = tmp_path / "subset"
    d.mkdir()
    pq.write_table(pa.table(rows), str(d / "documents.parquet"))

    out = to_df(containment_pairs(str(d), threshold=0.5))
    pair = out[(out["a"] == 0) & (out["b"] == 1)]
    assert len(pair) == 1
    # every 3-gram of the short doc is in the long doc
    assert pair["containment_ba"].iloc[0] == 1.0
    # ...but the Jaccard-style symmetric overlap is small (18 of 118 grams)
    assert pair["containment_ab"].iloc[0] < 0.2
