"""Checkpoint/resume e2e (SURVEY.md §5.3, §7.4.3): kill after round k →
resume → final state equals an uninterrupted run; no page fetched twice."""

import glob
import os

import pyarrow.parquet as pq
import pytest

from crawler_ray.config import CrawlConfig
from crawler_ray.synth import corpus_path, robots_path


@pytest.fixture(scope="module")
def fx(small_spec):
    return corpus_path(small_spec), pq.read_table(robots_path(small_spec))


def _fetched_urls_by_round(out):
    got = {}
    for f in glob.glob(out + "/fetched/**/*.parquet", recursive=True):
        rnd = int(f.split("round=")[1].split("/")[0])
        for u in pq.read_table(f, columns=["url"]).column("url").to_pylist():
            got.setdefault(u, []).append(rnd)
    return got


def test_kill_and_resume_equals_uninterrupted(fx, ray_session, tmp_path):
    from crawler_ray.engine import CrawlEngine, run_crawl

    cp, robots = fx
    base = dict(url="https://site-0000.test/", delay_ms=300, round_ms=2000)

    # ground truth: uninterrupted run
    out_full = str(tmp_path / "full")
    full = run_crawl(cp, CrawlConfig(**base), robots, out_dir=out_full)

    # interrupted run: stop after 3 rounds ("kill"), then resume
    ck = str(tmp_path / "ck")
    out_int = str(tmp_path / "interrupted")
    cfg = CrawlConfig(**base, checkpoint_dir=ck)
    eng = CrawlEngine(cp, cfg, robots)
    eng.run(out_dir=out_int, max_rounds=3)
    eng.close()
    assert os.path.exists(os.path.join(ck, "round=3", "MANIFEST.json"))

    eng2 = CrawlEngine.resume(cp, cfg, robots, out_dir=out_int)
    assert eng2.round == 3
    res = eng2.run(out_dir=out_int)
    eng2.close()

    # final state equality
    assert set(res.visited) == set(full.visited)
    assert res.pages_fetched == full.pages_fetched

    # per-round fetched files identical, and no URL fetched twice
    got_full = _fetched_urls_by_round(out_full)
    got_int = _fetched_urls_by_round(out_int)
    assert all(len(v) == 1 for v in got_int.values()), "a page was fetched twice"
    assert {u: v[0] for u, v in got_full.items()} == {
        u: v[0] for u, v in got_int.items()
    }

    # lineage covers all rounds contiguously
    stages = res.lineage.to_pylist()
    rounds = sorted({r["round"] for r in stages if r["stage"] == "fetch"})
    assert rounds == list(range(res.rounds))


def test_resume_discards_uncommitted_results(fx, ray_session, tmp_path):
    """Results written after the last committed checkpoint are dropped on
    resume (write-order contract: results before manifest commit)."""
    from crawler_ray.engine import CrawlEngine

    cp, robots = fx
    ck = str(tmp_path / "ck2")
    out = str(tmp_path / "out2")
    cfg = CrawlConfig(
        url="https://site-0000.test/", delay_ms=300, round_ms=2000, checkpoint_dir=ck
    )
    eng = CrawlEngine(cp, cfg, robots)
    eng.run(out_dir=out, max_rounds=2)
    eng.close()
    # simulate a crash AFTER round-2 results were written but BEFORE the
    # round-3 checkpoint committed: fabricate an orphan results dir
    orphan = os.path.join(out, "fetched", "round=7")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "junk.parquet"), "w") as f:
        f.write("junk")
    eng2 = CrawlEngine.resume(cp, cfg, robots, out_dir=out)
    assert not os.path.exists(orphan)
    res = eng2.run(out_dir=out)
    eng2.close()
    got = _fetched_urls_by_round(out)
    assert all(len(v) == 1 for v in got.values())


def test_corpus_shard_restart_mid_crawl(ray_session, tmp_path):
    """CorpusShard actors are restartable (read-only state reloaded in
    __init__): killing one mid-crawl must not change the crawl result
    (SURVEY §4 retries row)."""
    import ray

    import pyarrow.parquet as pq

    from crawler_ray.config import CrawlConfig
    from crawler_ray.engine import CrawlEngine, run_crawl
    from crawler_ray.synth import CorpusSpec, corpus_path, robots_path

    spec = CorpusSpec(n_hosts=3, pages_per_host=20)
    cp = corpus_path(spec)
    robots = pq.read_table(robots_path(spec))
    cfg = CrawlConfig(url=f"https://{spec.host(0)}/", sitemap=True)

    want = run_crawl(cp, cfg, robots)

    eng = CrawlEngine(cp, cfg, robots)
    try:
        ray.get([c.num_docs.remote() for c in eng.corpus])
        ray.kill(eng.corpus[0], no_restart=False)  # crash one shard
        res = eng.run(mode="crawl")
        assert set(res.visited) == set(want.visited)
        assert res.pages_fetched == want.pages_fetched
    finally:
        eng.close()


def test_partition_lineage_emitted(ray_session, tmp_path):
    """Distributed rounds record one lineage row per fetched partition
    (north rule: per-partition lineage + metrics)."""
    import pyarrow.parquet as pq

    from crawler_ray.config import CrawlConfig
    from crawler_ray.engine import run_crawl
    from crawler_ray.synth import CorpusSpec, corpus_path, robots_path

    spec = CorpusSpec(n_hosts=2, pages_per_host=30)
    cp = corpus_path(spec)
    robots = pq.read_table(robots_path(spec))
    cfg = CrawlConfig(
        url=f"https://{spec.host(0)}/", sitemap=True, small_round_threshold=0
    )
    res = run_crawl(cp, cfg, robots)
    stages = res.lineage.column("stage").to_pylist()
    rows_out = res.lineage.column("rows_out").to_pylist()
    part_rows = [
        r for s, r in zip(stages, rows_out) if s.startswith("fetch/partition=")
    ]
    assert part_rows, stages
    # per-partition rows sum to the per-round fetch totals (rounds are
    # disambiguated by the lineage `round` column)
    fetch_total = sum(r for s, r in zip(stages, rows_out) if s == "fetch")
    assert sum(part_rows) == fetch_total == res.pages_fetched
