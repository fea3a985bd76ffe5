"""Benchmark harness (driver contract).

Default: runs the headline suite over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(num_cpus=$RAY_GRAFT_CPUS, default 32) and
prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...},
   "sf": ..., "num_cpus": N, "crawl_pages_per_sec": ..., "dedup_ops_per_sec": ...}

--scaling: runs the scaling job (one distributed frontier wave + document
processing over the ~480k-doc bench corpus — the crawl's inner job) in FRESH
processes at num_cpus=8 and 32 on the same input and prints both throughputs
+ efficiency (eff = (t_8/t_32)/4; 1.0 = linear). Each level executes the job
twice in its process and reports the warm (min) time — the first run pays
worker-process spin-up, which a standing cluster would not.

--job-only: internal mode used by --scaling (single job, one JSON line).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# bench-scale synthetic corpora (cached under /tmp by spec hash)
BENCH_HOSTS = 8
BENCH_PAGES = int(os.environ.get("GRAFT_BENCH_PAGES", "12500"))  # ~100k docs; crawl e2e
SCALING_PAGES = int(os.environ.get("GRAFT_SCALING_PAGES", "60000"))  # ~480k docs


def _bench_spec():
    from crawler_ray.synth import CorpusSpec

    return CorpusSpec(n_hosts=BENCH_HOSTS, pages_per_host=BENCH_PAGES)


def _scaling_spec():
    # realistic page weight: ~25 spans/page, 24-word text spans (~2 KB text)
    from crawler_ray.synth import CorpusSpec

    return CorpusSpec(
        n_hosts=BENCH_HOSTS,
        pages_per_host=SCALING_PAGES,
        min_spans=10,
        max_spans=40,
        words_per_text=24,
    )


_PROC_STATE: dict = {}


def process_docs(t):
    """Fused per-batch document processing on fetched pages: per-doc text
    assembly from spans + quality scoring + language ID + MinHash signatures —
    the training-data half of a crawl+process pipeline. Heavy bits are
    initialised once per worker process (actor-style amortization)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from crawler_ray.pipelines.dedup import minhash_signatures_batch
    from crawler_ray.pipelines.text import LangId, QualityScore

    if "langid" not in _PROC_STATE:
        _PROC_STATE["langid"] = LangId()
        _PROC_STATE["quality"] = QualityScore()
    spans = t["spans"].combine_chunks()
    flat = pc.list_flatten(spans)
    parents = pc.list_parent_indices(spans)
    idx = pc.indices_nonzero(pc.equal(pc.struct_field(flat, "kind"), "text"))
    texts = pc.take(pc.struct_field(flat, "text"), idx).to_pandas()
    par = pc.take(parents, idx).to_numpy()
    joined = texts.groupby(par).agg(" ".join)
    full = np.full(len(t), "", dtype=object)
    full[joined.index.to_numpy()] = joined.to_numpy()
    df = pd.DataFrame({"doc_id": np.arange(len(t)), "text": full})
    from crawler_ray.pipelines.dedup import simhash_signatures_batch

    q = _PROC_STATE["quality"](df)
    l = _PROC_STATE["langid"](df)
    minhash_signatures_batch(df)
    simhash_signatures_batch(df)
    return pa.table(
        {
            "url": t["url"].combine_chunks(),
            "quality": pa.array(q["quality"].to_numpy()),
            "pred_lang": pa.array(l["pred_lang"].to_numpy(), pa.string()),
        }
    )


def _init_ray():
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    return ray


def _warm_cache(paths):
    for p in paths:
        if os.path.exists(p):
            with open(p, "rb") as f:
                while f.read(1 << 24):
                    pass


def _warm_workers():
    """Spin up the Ray Data worker pool before any timed region — the first
    dataset execution in a fresh session pays 1-2 s of worker-process spawn
    that a standing cluster never sees. Every timed number in this file is
    'standing cluster' semantics (BASELINE.md documents the protocol)."""
    import ray.data as rd

    rd.range(10_000, override_num_blocks=64).map_batches(lambda b: b).count()


def scaling_job(spec=None) -> dict:
    """One distributed frontier wave over the scaling corpus (~480k docs):
    select → fetch lookup join → extract links → candidate unique (groupby) →
    seen anti-join. Compute-dominated, shuffle-bearing — the unit of work the
    crawl repeats; throughput = pages/sec. Actors are warmed (corpus shards
    loaded) before the clock starts: the measured job is wave processing on a
    standing cluster, not cold data loading."""
    import ray
    import pyarrow.parquet as pq

    from crawler_ray.config import CrawlConfig
    from crawler_ray.engine import CrawlEngine
    from crawler_ray.synth import corpus_path

    import pyarrow as pa
    import ray.data as rd

    from crawler_ray import schemas, urlnorm

    spec = spec or _scaling_spec()
    cp = corpus_path(spec)
    _warm_cache([cp])
    # stateful-shard counts scale with the cluster (config.py: shards are
    # O(cluster cores) at scale) — pinning them at 8 made the actor-bound
    # fetch/claim stages a fixed-size bottleneck that can't scale past 8 cpus
    n_shards = max(4, NUM_CPUS // 2)
    cfg = CrawlConfig(
        url=f"https://{spec.host(0)}/",
        small_round_threshold=0,
        n_corpus_shards=n_shards,
        n_seen_shards=n_shards,
        seen_capacity=1 << 20,
        respect_robots_txt=False,
    )
    eng = CrawlEngine(cp, cfg, None)

    def to_frontier(t: pa.Table) -> pa.Table:
        n = len(t)
        arr = t["doc_id"].combine_chunks()
        import numpy as np

        return pa.Table.from_arrays(
            [
                arr,
                urlnorm.host_of(arr),
                pa.array(np.zeros(n, dtype="int32")),
                pa.array(np.zeros(n, dtype="float64")),
                pa.array([""] * n, pa.string()),
                pa.array([cfg.crawl_id] * n, pa.string()),
                pa.array(np.zeros(n, dtype="int32")),
            ],
            schema=schemas.FRONTIER,
        )

    try:
        frontier = (
            rd.read_parquet(cp, columns=["doc_id"])
            .map_batches(to_frontier, batch_format="pyarrow")
            .materialize()
        )
        ray.get([s.num_docs.remote() for s in eng.corpus])  # warm shards
        t0 = time.time()
        n_pages, n_novel, fetched = eng.run_wave(frontier)
        # training-data processing half: quality + langid + minhash over pages
        # (repartition: enough blocks to keep every core busy)
        processed = fetched.repartition(NUM_CPUS * 3).map_batches(
            process_docs, batch_format="pyarrow", zero_copy_batch=True
        )
        n_processed = processed.count()
        wall = time.time() - t0
    finally:
        eng.close()
    return {
        "pages": n_pages,
        "novel": n_novel,
        "processed": n_processed,
        "sec": round(wall, 3),
        "pages_per_sec": round(n_pages / wall, 1),
    }


def crawl_e2e(repeats: int = 3) -> dict:
    """Full BFS crawl of the seed host on the bench corpus (adaptive
    coordinator/distributed rounds). Standing-cluster protocol: the engine's
    actors (seen shards, corpus shards) are created and the corpus loaded
    BEFORE the clock starts — the timed region is the crawl itself, matching
    how a long-lived cluster amortizes actor spin-up. Runs ``repeats`` times
    and reports the min (run-to-run variance on this box is ±20-40% with up
    to ~7% CPU steal — min-of-3, same discipline as the scaling legs)."""
    import ray
    import pyarrow.parquet as pq

    from crawler_ray.config import CrawlConfig
    from crawler_ray.engine import CrawlEngine
    from crawler_ray.synth import corpus_path, robots_path

    spec = _bench_spec()
    cp = corpus_path(spec)
    _warm_cache([cp])
    robots = pq.read_table(robots_path(spec))
    cfg = CrawlConfig(
        url=f"https://{spec.host(0)}/",
        sitemap=True,
        n_corpus_shards=8,
        n_seen_shards=8,
        seen_capacity=1 << 19,
    )
    best = None
    for _ in range(repeats):
        eng = CrawlEngine(cp, cfg, robots)
        try:
            ray.get([c.num_docs.remote() for c in eng.corpus])  # load corpus
            t0 = time.time()
            res = eng.run(mode="crawl")
            wall = time.time() - t0
        finally:
            eng.close()
        run = {
            "pages": res.pages_fetched,
            "rounds": res.rounds,
            "sec": round(wall, 3),
            "pages_per_sec": round(res.pages_fetched / wall, 1),
        }
        if best is None or run["sec"] < best["sec"]:
            best = run
    return best


def dedup_microbench(n: int = 4_000_000, shards: int | None = None) -> dict:
    """Frontier-dedup ops/sec: N unique URLs routed and membership-checked
    against sharded SeenShard actors from INSIDE map tasks (the production
    claim path). The URL strings are generated and MATERIALIZED before the
    clock — the timed region is fold + route + shard insert/check, not
    synthetic string formatting. Shard calls ship sliced numpy object
    arrays (no per-element list builds); route-task count is shards/2 so
    tasks + actors fill the cores without starving the shards (32 blocked
    tasks + 16 actors on 32 cores measured ~40% slower)."""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    from crawler_ray.state.seen import SeenShard, fold_urls, stable_hash64

    shards = shards or max(8, (NUM_CPUS * 7) // 8)
    RSeen = ray.remote(SeenShard)
    actors = [
        RSeen.remote(i, capacity=1 << 19, exact=True) for i in range(shards)
    ]
    ray.get([a.size.remote() for a in actors])  # actors ready

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].combine_chunks().to_numpy()
        urls = np.char.add("https://bench.test/p", ids.astype("U9")).astype(object)
        return pa.table({"url": pa.array(urls, pa.string())})

    def route(batch: pa.Table) -> pa.Table:
        urls = batch["url"].combine_chunks().to_numpy(zero_copy_only=False)
        keys = fold_urls(urls)  # fold once; shard + membership share it
        shard = (stable_hash64(keys) % shards).astype(np.int64)
        refs = []
        for s in np.unique(shard):
            pos = np.flatnonzero(shard == s)
            refs.append(actors[int(s)].check_and_add.remote(urls[pos], keys[pos]))
        novel = sum(int(m.sum()) for m in ray.get(refs))
        return pa.table({"novel": pa.array([novel], pa.int64())})

    ds = (
        rd.range(n, override_num_blocks=max(4, shards // 2))
        .map_batches(gen, batch_format="pyarrow")
        .materialize()
    )
    t0 = time.time()
    novel = sum(
        r["novel"] for r in ds.map_batches(route, batch_size=131072, batch_format="pyarrow").take_all()
    )
    wall = time.time() - t0
    for a in actors:
        ray.kill(a)
    assert novel == n, novel
    return {"ops": n, "sec": round(wall, 3), "ops_per_sec": round(n / wall, 1)}


def query_suite() -> dict:
    from crawler_ray.pipelines import dedup as D
    from crawler_ray.pipelines import relational as R
    from crawler_ray.pipelines import similarity as S
    from crawler_ray.pipelines import crawlq as C
    from crawler_ray.pipelines import text as T

    def consume(x):
        # materialize fully (Datasets are lazy)
        if hasattr(x, "to_pandas"):
            return len(x.to_pandas())
        return len(x)

    out = {}
    for name, fn in [
        ("q1_pricing_summary", R.q1_pricing_summary),
        ("filter_project", R.filter_project),
        ("nation_revenue", R.nation_revenue),
        ("q5_region_revenue", R.q5_region_revenue),
        ("events_hourly", R.events_hourly),
        ("events_sessions", R.events_sessions),
        ("top_orders", R.top_orders),
        ("token_stats", T.token_stats),
        ("winnow_fingerprints", T.winnow_fingerprints),
        ("exact_dedup", D.exact_dedup),
        ("minhash_pairs", D.minhash_pairs),
        ("ann_bruteforce", S.ann_bruteforce),
        ("bm25_topk", S.bm25_topk),
        ("corpus_links", C.corpus_links),
    ]:
        t0 = time.time()
        consume(fn(SF_DIR))
        out[name] = round(time.time() - t0, 3)
    return out


def extra_query_suite(warm: bool = True) -> tuple[dict, float]:
    """Timings for the wider training-data family (near-dup variants,
    curation, partitioned-store ANN, text scoring, media decode). Runs
    AFTER the headline total is closed so `value` stays comparable to the
    BASELINE ranges folded from the original 14-query suite.

    VERDICT r4 #4: a first call pays one-time session costs (ANN store
    builds, artifact dumps, media blob synthesis, module imports) that a
    standing cluster amortizes — so the suite runs one UNTIMED warmup pass
    first and reports steady-state per-op timings from the second pass.
    Returns (timings, warmup_sec)."""
    from crawler_ray.pipelines import crawlq as C
    from crawler_ray.pipelines import curate as Cu
    from crawler_ray.pipelines import dedup as D
    from crawler_ray.pipelines import multimodal as M
    from crawler_ray.pipelines import relational as R
    from crawler_ray.pipelines import similarity as S
    from crawler_ray.pipelines import text as T

    import __ray_entry__ as entry

    decontaminate = entry.queries()["decontaminate"]

    def consume(x):
        if hasattr(x, "to_pandas"):
            return len(x.to_pandas())
        return len(x)

    ops = [
        ("quality", T.quality),
        ("lang_id", T.lang_id),
        ("repetition_stats", T.repetition_stats),
        ("simhash_pairs", D.simhash_pairs),
        ("dup_clusters", Cu.dup_clusters),
        ("curate", Cu.curate),
        ("ann_lsh", S.ann_lsh),
        ("ann_ivf", S.ann_ivf),
        ("media_features", M.media_features),
        ("media_ann", M.media_ann),
        ("media_dedup", M.media_dedup),
        ("decontaminate", decontaminate),
        ("embed_clusters", S.embed_clusters),
        ("pii_scrub", T.pii_scrub),
        ("top_docs_per_source", T.top_docs_per_source),
        ("token_quantiles", T.token_quantiles),
        ("vocab_stats", T.vocab_stats),
        ("normalize_text", T.normalize_text),
        ("stratified_sample", Cu.stratified_sample),
        ("stratified_mix", Cu.stratified_mix),
        ("ann_filtered", S.ann_filtered),
        ("unigram_logprob", T.unigram_logprob),
        ("bigram_logprob", T.bigram_logprob),
        ("pack_sequences", Cu.pack_sequences),
        ("orders_by_quarter", R.orders_by_quarter),
        ("dup_stats_by_source", D.dup_stats_by_source),
        ("dedup_increment", D.dedup_increment),
        ("perplexity_buckets", T.perplexity_buckets),
        ("events_funnel", R.events_funnel),
        ("pagerank", C.pagerank),
        ("hll_distinct", C.hll_distinct),
        ("chunk_documents", T.chunk_documents),
        ("events_hll_hourly", R.events_hll_hourly),
        ("semdedup", S.semdedup),
        ("events_retention", R.events_retention),
        ("order_rank_in_customer", R.order_rank_in_customer),
        ("bloom_semi_join", R.bloom_semi_join),
        ("revenue_rollup", R.revenue_rollup),
        ("host_graph", C.host_graph),
        ("bigram_pmi", T.bigram_pmi),
        ("events_paths", R.events_paths),
        ("embedding_stats", S.embedding_stats),
        ("shuffle_export", Cu.shuffle_export),
        ("heavy_tokens", T.heavy_tokens),
        ("promo_revenue", R.promo_revenue),
        ("top_supplier", R.top_supplier),
        ("events_anomaly", R.events_anomaly),
        ("customer_order_counts", R.customer_order_counts),
        ("late_ship_priority", R.late_ship_priority),
        ("reciprocal_links", C.reciprocal_links),
        ("tfidf_topk", T.tfidf_topk),
        ("kmeans_fit", S.kmeans_fit),
        ("lang_sample_weights", Cu.lang_sample_weights),
        ("events_distinct_daily", R.events_distinct_daily),
        ("link_triangles", C.link_triangles),
        ("containment_pairs", D.containment_pairs),
        ("nation_market_share", R.nation_market_share),
        ("events_attribution", R.events_attribution),
    ]
    warm_sec = 0.0
    if warm:
        t0 = time.time()
        for _, fn in ops:
            consume(fn(SF_DIR))
        warm_sec = round(time.time() - t0, 3)
    # min-of-2 timed passes: same discipline as crawl_e2e's min-of-3 — this
    # box's background load swings sub-second ops by ±2×; the min is the
    # steady-state reading
    out: dict = {}
    for _ in range(2):
        for name, fn in ops:
            t0 = time.time()
            consume(fn(SF_DIR))
            dt = round(time.time() - t0, 3)
            if name not in out or dt < out[name]:
                out[name] = dt
    return out, warm_sec


def main_full():
    ray = _init_ray()
    _warm_workers()
    _warm_cache(
        [os.path.join(SF_DIR, f) for f in sorted(os.listdir(SF_DIR))]
        if os.path.isdir(SF_DIR)
        else []
    )
    t_all = time.time()
    crawl = crawl_e2e()
    wave = min((scaling_job(_bench_spec()) for _ in range(2)), key=lambda r: r["sec"])
    dedup = dedup_microbench()
    queries = query_suite()
    total = round(time.time() - t_all, 3)
    # non-headline extras: timed outside `value` (BASELINE range
    # comparability); warmup pass separated per VERDICT r4 #4
    extras, extra_warmup_sec = extra_query_suite()
    extra_sec = round(sum(extras.values()), 3)
    print(
        json.dumps(
            {
                "metric": "crawl pages/sec + frontier-dedup ops/sec + query suite sec",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "extra_queries": extras,
                "extra_sec": extra_sec,
                "extra_warmup_sec": extra_warmup_sec,
                "sf": SF_DIR,
                "num_cpus": NUM_CPUS,
                "crawl_pages_per_sec": crawl["pages_per_sec"],
                "crawl_e2e": crawl,
                "wave_pages_per_sec": wave["pages_per_sec"],
                "wave": wave,
                "dedup_ops_per_sec": dedup["ops_per_sec"],
            }
        )
    )
    ray.shutdown()


def main_job_only():
    ray = _init_ray()
    _warm_workers()
    # first run warms worker processes; min-of-3 bounds the host-noise
    # asymmetry between the two scaling legs (this box's background load
    # swings ±20-40% — BASELINE.md quantifies it with same-day controls)
    runs = [scaling_job(), scaling_job(), scaling_job()]
    wave = min(runs, key=lambda r: r["sec"])
    print(
        json.dumps(
            {
                "value": wave["sec"],
                "unit": "sec",
                **wave,
                "runs_sec": [r["sec"] for r in runs],
                "num_cpus": NUM_CPUS,
            }
        )
    )
    ray.shutdown()


def main_stats():
    """Print Ray Data per-stage execution stats for two headline pipelines
    (`ds.stats()` — where wall time actually goes: useful compute vs
    scheduling/shuffle). Tuning loop companion, not a driver surface."""
    ray = _init_ray()
    _warm_workers()
    from crawler_ray.pipelines import dedup as D
    from crawler_ray.pipelines import relational as R

    for name, fn in [("nation_revenue", R.nation_revenue), ("minhash_pairs", D.minhash_pairs)]:
        ds = fn(SF_DIR).materialize()
        print(f"===== {name} =====")
        print(ds.stats())
    ray.shutdown()


def main_scaling():
    # pre-generate the corpus so both runs measure compute, not generation
    from crawler_ray.synth import corpus_path

    corpus_path(_scaling_spec())

    def cpu_stat() -> tuple[int, int]:
        # (steal, total) jiffies across all cpus — this sandbox is a shared
        # VM; per-leg steal% makes each efficiency number carry its own
        # noise evidence (a slow leg under high steal is host contention,
        # not code)
        with open("/proc/stat") as f:
            parts = f.readline().split()[1:]
        vals = [int(x) for x in parts]
        return (vals[7] if len(vals) > 7 else 0), sum(vals)

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        s0, t0 = cpu_stat()
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--job-only"],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        s1, t1 = cpu_stat()
        res = json.loads(out.strip().splitlines()[-1])
        res["host_steal_pct"] = round(100.0 * (s1 - s0) / max(t1 - t0, 1), 2)
        return res

    lo, hi = run(8), run(32)
    eff = (lo["value"] / hi["value"]) / (32 / 8)
    print(
        json.dumps(
            {
                "job": "distributed frontier wave (fetch join + extract + unique + anti-join)",
                "pages": lo["pages"],
                "sec_8": lo["value"],
                "sec_32": hi["value"],
                "pages_per_sec_8": lo["pages_per_sec"],
                "pages_per_sec_32": hi["pages_per_sec"],
                "scaling_efficiency": round(eff, 3),
                "host_steal_pct_8": lo["host_steal_pct"],
                "host_steal_pct_32": hi["host_steal_pct"],
                "runs_sec_8": lo.get("runs_sec"),
                "runs_sec_32": hi.get("runs_sec"),
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        main_scaling()
    elif "--job-only" in sys.argv:
        main_job_only()
    elif "--stats" in sys.argv:
        main_stats()
    else:
        main_full()
