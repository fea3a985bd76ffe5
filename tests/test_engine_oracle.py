"""Engine ↔ oracle equality (SURVEY.md §5.2): visited-set equality, BFS wave
(depth) equality, fetch-round equality under politeness quotas, and per-row
span-sequence equality on (kind, text, media_ref, order)."""

import glob
import shutil

import pyarrow.parquet as pq
import pytest

from crawler_ray.config import CrawlConfig
from crawler_ray.oracle import corpus_as_dict, crawl as oracle_crawl, robots_as_dict
from crawler_ray.synth import corpus_path, gen_robots, robots_path


@pytest.fixture(scope="module")
def fixtures(small_spec, small_corpus):
    return {
        "cp": corpus_path(small_spec),
        "robots": pq.read_table(robots_path(small_spec)),
        "cd": corpus_as_dict(small_corpus),
        "rd": robots_as_dict(gen_robots(small_spec)),
    }


CONFIGS = [
    dict(url="https://site-0000.test/"),
    dict(url="https://site-0000.test/", sitemap=True),
    dict(url="https://site-0001.test/"),  # robots disallow-all → empty crawl
    dict(url="https://site-0002.test/"),  # robots subtree disallow
    dict(url="https://site-0000.test/", subdomains=True),
    dict(url="https://site-0000.test/", tld=True),
    dict(url="https://site-0000.test/", max_depth=2),
    dict(url="https://site-0000.test/", max_pages=20),
    dict(url="https://site-0000.test/", delay_ms=300, round_ms=1000),  # quotas
    dict(url="https://site-0003.test/", delay_ms=500, round_ms=5000),  # robots delay
    dict(url="https://site-0000.test/", blacklist=("/page-001",)),
    dict(url="https://site-0000.test/", respect_robots_txt=False, sitemap=True),
    dict(url="https://site-0004.test/"),  # robots wildcard rules (* and $)
    dict(url="https://site-0004.test/", sitemap=True),  # wildcards × sitemap seeds
]


def _run_and_compare(kw, fixtures, tmp_path, **extra):
    from crawler_ray.engine import run_crawl

    cfg = CrawlConfig(**kw, **extra)
    out = str(tmp_path / "out")
    shutil.rmtree(out, ignore_errors=True)
    res = run_crawl(fixtures["cp"], cfg, fixtures["robots"], out_dir=out)
    o = oracle_crawl(fixtures["cd"], cfg, fixtures["rd"])

    # 1. visited-set equality
    assert set(res.visited) == o.visited
    assert res.pages_fetched == len(o.fetched)

    # 2-4. per-fetched-row: depth (BFS wave), round (politeness schedule),
    #      status, span sequence
    eng = {}
    for f in glob.glob(out + "/fetched/**/*.parquet", recursive=True):
        rnd = int(f.split("round=")[1].split("/")[0])
        for row in pq.read_table(f).to_pylist():
            eng[row["url"]] = (row["depth"], rnd, row["status"], row["spans"])
    ow = {u: (d, r, s, sp) for (u, d, r, s, sp) in o.fetched}
    assert set(eng) == set(ow)
    for u in ow:
        ed, er, es, esp = eng[u]
        od, orr, os_, osp = ow[u]
        assert (ed, er, es) == (od, orr, os_), u
        assert [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in esp
        ] == [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in osp], u
    return res


@pytest.mark.parametrize("kw", CONFIGS, ids=lambda kw: "-".join(
    f"{k}={v}" for k, v in kw.items() if k != "url") or "plain")
def test_small_path_matches_oracle(kw, fixtures, ray_session, tmp_path):
    _run_and_compare(kw, fixtures, tmp_path)


@pytest.mark.parametrize(
    "kw",
    [
        dict(url="https://site-0000.test/"),
        dict(url="https://site-0000.test/", max_depth=3, sitemap=True),
        dict(url="https://site-0000.test/", max_pages=20),
        # quota 16/round → ~4 politeness rounds: same selection code path,
        # bounded latency (each distributed round costs fixed Ray op latency)
        dict(url="https://site-0000.test/", delay_ms=300, round_ms=5000),
    ],
    ids=["plain", "depth-sitemap", "budget", "politeness"],
)
def test_distributed_path_matches_oracle(kw, fixtures, ray_session, tmp_path):
    """Force every round through the distributed Ray Data pipeline."""
    _run_and_compare(kw, fixtures, tmp_path, small_round_threshold=0)


def test_presharded_corpus_matches_oracle(fixtures, ray_session, tmp_path, monkeypatch):
    """Drive the ENGINE through the pre-partitioned corpus path (threshold
    forced to 0) — CorpusShard actors read shard=K directories and the crawl
    must still be oracle-equal."""
    monkeypatch.setenv("CRAWLER_RAY_PRESHARD_MIN_BYTES", "0")
    _run_and_compare(
        dict(url="https://site-0000.test/", sitemap=True), fixtures, tmp_path
    )


def test_scan_mode_stop_callback(fixtures, ray_session, tmp_path):
    """Reference 'shutdown' control semantics (client.rs:88-100): a False
    callback return aborts the crawl between rounds."""
    from crawler_ray.engine import run_scan

    seen_rounds = []

    def cb(rnd, fetched):
        seen_rounds.append(rnd)
        return rnd < 1  # stop after round 1

    cfg = CrawlConfig(url="https://site-0000.test/")
    res = run_scan(
        fixtures["cp"], cfg, fixtures["robots"], out_dir=str(tmp_path / "scan"), per_round_callback=cb
    )
    assert res.stopped
    assert seen_rounds == [0, 1]
    o = oracle_crawl(fixtures["cd"], cfg, fixtures["rd"])
    # partial crawl: engine visited ⊆ oracle visited, fetched < full
    assert set(res.visited) <= o.visited
    assert res.pages_fetched < len(o.fetched)


def test_wallclock_politeness(fixtures, ray_session):
    """Opt-in wallclock mode: identical schedule to the modeled-politeness
    oracle, but each round REALLY lasts ≥ max_h(n_h × delay_h) wall ms
    (reference sleeps `delay` between requests, proto/crawler.proto:26)."""
    import time as _t

    from crawler_ray.engine import run_crawl
    from crawler_ray.oracle import host_of

    cfg = CrawlConfig(
        url="https://site-0000.test/",
        delay_ms=100,
        round_ms=300,
        max_pages=12,
        wallclock_politeness=True,
    )
    t0 = _t.time()
    res = run_crawl(fixtures["cp"], cfg, fixtures["robots"])
    elapsed = _t.time() - t0
    o = oracle_crawl(fixtures["cd"], cfg, fixtures["rd"])
    assert set(res.visited) == o.visited          # schedule unchanged
    assert res.pages_fetched == len(o.fetched)
    # wall floor from the oracle's per-round per-host fetch counts
    per_round: dict = {}
    for (u, d, rnd, s, sp) in o.fetched:
        hosts = per_round.setdefault(rnd, {})
        hosts[host_of(u)] = hosts.get(host_of(u), 0) + 1
    need = sum(max(hosts.values()) * cfg.delay_ms for hosts in per_round.values())
    assert need >= 400  # the config must actually exercise the floor
    assert elapsed >= need / 1000 * 0.95
    waits = res.lineage.to_pandas()
    assert (waits["stage"] == "politeness_wait").any()


@pytest.mark.parametrize(
    "kw",
    [
        dict(url="https://site-0000.test/"),
        dict(url="https://site-0001.test/"),  # robots.txt disallow-all, learned
        dict(url="https://site-0002.test/"),  # subtree disallow, learned
        dict(url="https://site-0003.test/", delay_ms=500, round_ms=5000),  # learned delay
    ],
    ids=["plain", "disallow-all", "subtree", "delay"],
)
def test_robots_learned_from_corpus(kw, fixtures, ray_session, tmp_path):
    """S5/T2: with no rules table the engine fetches + parses the per-host
    robots.txt corpus docs; behavior must equal the oracle fed the fixtures
    dict (the docs encode the same rules)."""
    from crawler_ray.engine import run_crawl

    cfg = CrawlConfig(**kw)
    res = run_crawl(fixtures["cp"], cfg, None)  # robots_table=None → learn
    o = oracle_crawl(fixtures["cd"], cfg, fixtures["rd"])
    assert set(res.visited) == o.visited
    assert res.pages_fetched == len(o.fetched)


@pytest.mark.parametrize("seed,hot", [(43, 1), (44, 3), (1234, 2)])
def test_randomized_corpus_equality(seed, hot, ray_session, tmp_path):
    """Engine ≡ oracle on corpora with different seeds, skew factors and
    higher dangling/dup rates — guards against fixture overfitting."""
    from crawler_ray.engine import run_crawl
    from crawler_ray.oracle import corpus_as_dict, robots_as_dict
    from crawler_ray.synth import CorpusSpec, gen_corpus, gen_robots, corpus_path

    spec = CorpusSpec(
        seed=seed,
        n_hosts=5,
        pages_per_host=30,
        hot_host_factor=hot,
        p_dangling=0.12,
        p_dup_link=0.3,
    )
    cp = corpus_path(spec)
    cd = corpus_as_dict(gen_corpus(spec))
    rd_ = robots_as_dict(gen_robots(spec))
    for kw in [
        dict(url=f"https://{spec.host(0)}/", sitemap=True, subdomains=True),
        dict(url=f"https://{spec.host(0)}/", delay_ms=400, round_ms=2000),
    ]:
        cfg = CrawlConfig(**kw)
        res = run_crawl(cp, cfg, None)  # learned robots
        o = oracle_crawl(cd, cfg, rd_)
        assert set(res.visited) == o.visited, kw
        assert res.pages_fetched == len(o.fetched), kw


def test_case_insensitive_visited(ray_session, tmp_path):
    """spider's visited set compares whole URLs case-insensitively
    (case_insensitive_string, Cargo.lock:289): two casings of one URL yield
    ONE visit, keeping the deterministic-min casing; engine ≡ oracle."""
    import pyarrow as pa

    from crawler_ray import schemas
    from crawler_ray.engine import run_crawl
    from crawler_ray.oracle import corpus_as_dict

    def doc(doc_id, links):
        spans = [
            {"kind": "link", "text": l, "media_ref": "", "offset": i}
            for i, l in enumerate(links)
        ]
        return {"doc_id": doc_id, "spans": spans}

    rows = [
        doc("https://h.test/", ["https://h.test/About", "https://h.test/about"]),
        doc("https://h.test/about", []),
    ]
    corpus = pa.Table.from_pylist(rows, schema=schemas.CORPUS)
    cp = str(tmp_path / "c.parquet")
    import pyarrow.parquet as pq

    pq.write_table(corpus, cp)
    cfg = CrawlConfig(url="https://h.test/", respect_robots_txt=False)
    res = run_crawl(cp, cfg, None)
    o = oracle_crawl(corpus_as_dict(corpus), cfg, {})
    # one casing visited, the lexicographic-min one; both sides agree
    assert set(res.visited) == o.visited == {"https://h.test/", "https://h.test/About"}
    assert res.pages_fetched == len(o.fetched) == 2


def test_mid_round_stop_flag(ray_session, tmp_path, fixtures):
    """A stop flag raised while a distributed round is in flight aborts the
    round's remaining fetch batches (reference parity: "shutdown" aborts at
    any time, client.rs:88-99)."""
    import ray.data as rd

    from crawler_ray.engine import CrawlEngine

    flag = str(tmp_path / "stop")
    cfg = CrawlConfig(
        url="https://site-0000.test/",
        stop_flag_path=flag,
        small_round_threshold=0,  # force the distributed path
    )
    eng = CrawlEngine(fixtures["cp"], cfg, fixtures["robots"])
    try:
        frontier = eng._seed_frontier()
        open(flag, "w").close()  # shutdown arrives mid-round
        fetched, _, _ = eng._round_distributed(
            rd.from_arrow(frontier).materialize(), ""
        )
        assert fetched.count() == 0  # every batch saw the flag and skipped
    finally:
        eng.close()


def test_post_fetch_stage_registry(ray_session, tmp_path, fixtures):
    """§2.10 extension surface: a registered result stage transforms the sink
    output without touching crawl semantics — on BOTH physical paths."""
    import glob

    import pyarrow as pa
    import pyarrow.compute as pc

    from crawler_ray.engine import run_crawl
    from crawler_ray.stages.registry import register_stage

    def add_n_spans(t: pa.Table) -> pa.Table:
        return t.append_column("n_spans", pc.list_value_length(t["spans"]).cast("int32"))

    register_stage("n_spans", add_n_spans)

    for thresh, tag in [(20_000, "small"), (0, "dist")]:
        out = str(tmp_path / tag)
        cfg = CrawlConfig(
            url="https://site-0000.test/",
            post_fetch_stages=("n_spans",),
            small_round_threshold=thresh,
        )
        res = run_crawl(fixtures["cp"], cfg, fixtures["robots"], out_dir=out)
        o = oracle_crawl(fixtures["cd"], cfg, fixtures["rd"])
        assert set(res.visited) == o.visited  # crawl semantics unchanged
        files = glob.glob(out + "/fetched/**/*.parquet", recursive=True)
        assert files
        for f in files:
            t = pq.read_table(f)
            assert "n_spans" in t.column_names
            assert t["n_spans"].to_pylist() == [len(s) for s in t["spans"].to_pylist()]


def test_nested_sitemap_index(ray_session, tmp_path):
    """S4: a sitemap INDEX (sitemap.xml linking sub-sitemaps linking pages)
    resolves through the normal BFS — nested indexes reach every page;
    engine ≡ oracle on visited set and depths."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray import schemas
    from crawler_ray.engine import run_crawl
    from crawler_ray.oracle import corpus_as_dict

    h = "n.test"

    def doc(doc_id, links):
        return {
            "doc_id": doc_id,
            "spans": [
                {"kind": "link", "text": l, "media_ref": "", "offset": i}
                for i, l in enumerate(links)
            ],
        }

    rows = [
        doc(f"https://{h}/", []),  # landing page links nothing: only the
        # sitemap index reaches the content pages
        doc(f"https://{h}/sitemap.xml", [f"https://{h}/sitemap-0.xml", f"https://{h}/sitemap-1.xml"]),
        doc(f"https://{h}/sitemap-0.xml", [f"https://{h}/a", f"https://{h}/b"]),
        doc(f"https://{h}/sitemap-1.xml", [f"https://{h}/c"]),
        doc(f"https://{h}/a", [f"https://{h}/d"]),
        doc(f"https://{h}/b", []),
        doc(f"https://{h}/c", []),
        doc(f"https://{h}/d", []),
    ]
    corpus = pa.Table.from_pylist(rows, schema=schemas.CORPUS)
    cp = str(tmp_path / "c.parquet")
    pq.write_table(corpus, cp)
    cfg = CrawlConfig(url=f"https://{h}/", sitemap=True, respect_robots_txt=False)
    res = run_crawl(cp, cfg, None)
    o = oracle_crawl(corpus_as_dict(corpus), cfg, {})
    assert set(res.visited) == o.visited
    assert f"https://{h}/d" in o.visited  # reached only via the nested index
    got = {u: d for u, d in o.waves.items()}
    assert got[f"https://{h}/sitemap-0.xml"] == 1
    assert got[f"https://{h}/a"] == 2 and got[f"https://{h}/d"] == 3


def test_iter_rounds_streaming(ray_session, tmp_path, fixtures):
    """iter_rounds streams each wave's fetched rows as it completes and
    matches the batch-mode crawl; closing the generator stops the crawl
    early (ScanStream + shutdown-control parity)."""
    from crawler_ray.engine import CrawlEngine, run_crawl

    cfg = CrawlConfig(url="https://site-0000.test/", sitemap=True)
    full = run_crawl(fixtures["cp"], cfg, fixtures["robots"])

    eng = CrawlEngine(fixtures["cp"], cfg, fixtures["robots"])
    try:
        seen_rounds, urls = [], []
        for rnd, fetched in eng.iter_rounds():
            seen_rounds.append(rnd)
            tab = fetched if hasattr(fetched, "column_names") else None
            urls.extend(
                tab.column("url").to_pylist()
                if tab is not None
                else fetched.to_pandas()["url"].tolist()
            )
        assert seen_rounds == list(range(full.rounds))
        assert sorted(urls) == full.visited  # every visited page streamed once
    finally:
        eng.close()

    # early stop: consume exactly one round, generator close stops the crawl
    eng2 = CrawlEngine(fixtures["cp"], cfg, fixtures["robots"])
    try:
        it = eng2.iter_rounds()
        next(it)
        it.close()
        assert eng2.round == 1
        assert eng2.pages_fetched < full.pages_fetched
    finally:
        eng2.close()
