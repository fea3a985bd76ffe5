"""CLI entry point e2e (the `ray job submit` surface) — runs in a subprocess
with its own Ray session."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(*args):
    out = subprocess.run(
        [sys.executable, "-m", "crawler_ray.cli", *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=300,
        env={**os.environ, "RAY_DEDUP_LOGS": "0"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_cli_crawl_and_resume(tmp_path):
    ck = str(tmp_path / "ck")
    outdir = str(tmp_path / "out")
    r1 = _run_cli(
        "crawl",
        "--url",
        "https://site-0000.test/",
        "--sitemap",
        "--num-cpus",
        "4",
        "--out",
        outdir,
        "--checkpoint",
        ck,
    )
    assert r1["pages_fetched"] > 0 and not r1["stopped"]
    assert os.path.exists(os.path.join(outdir, "results.parquet"))
    # resume on a finished crawl: picks up the final checkpoint, empty
    # frontier → no extra fetches, same visited count
    r2 = _run_cli(
        "crawl",
        "--url",
        "https://site-0000.test/",
        "--sitemap",
        "--num-cpus",
        "4",
        "--out",
        outdir,
        "--checkpoint",
        ck,
        "--resume",
    )
    assert r2["visited"] == r1["visited"]
    assert r2["pages_fetched"] == r1["pages_fetched"]


@pytest.mark.slow
def test_bench_smoke(tmp_path):
    """bench.py must always print one valid JSON line (the driver's per-round
    contract) — exercised at toy scale via env overrides."""
    env = {
        **os.environ,
        "GRAFT_SF_DIR": "/root/testdata/sf0.001",
        "RAY_GRAFT_CPUS": "4",
        "GRAFT_BENCH_PAGES": "120",
        "GRAFT_SCALING_PAGES": "120",
    }
    out = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=420,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["unit"] == "sec" and rec["value"] > 0
    assert set(rec["queries"]) and rec["num_cpus"] == 4
    assert rec["crawl_e2e"]["pages"] > 0 and rec["wave"]["pages"] > 0


def test_agent_stamped_into_fetched(ray_session, tmp_path):
    """M6: the effective user agent appears on every fetched row; 'random'
    resolves deterministically per crawl_id."""
    import glob

    import pyarrow.parquet as pq

    from crawler_ray.config import CrawlConfig, resolve_agent
    from crawler_ray.engine import run_crawl
    from crawler_ray.synth import CorpusSpec, corpus_path, robots_path

    spec = CorpusSpec(n_hosts=2, pages_per_host=10)
    cp = corpus_path(spec)
    robots = pq.read_table(robots_path(spec))
    out = str(tmp_path / "out")
    cfg = CrawlConfig(url=f"https://{spec.host(0)}/", agent="random", crawl_id="7")
    run_crawl(cp, cfg, robots, out_dir=out)
    agents = set()
    for f in glob.glob(out + "/fetched/**/*.parquet", recursive=True):
        agents |= set(pq.read_table(f, columns=["agent"])["agent"].to_pylist())
    assert agents == {resolve_agent(cfg)}
    assert resolve_agent(cfg) != "random"
    assert resolve_agent(CrawlConfig(agent="custom/1.0")) == "custom/1.0"


def test_proxy_passthrough_config():
    """M7: the ScanRequest proxy field survives every projection surface
    (CLI args → CrawlConfig, HTTP request → CrawlConfig) even though the
    corpus model never opens a socket — reference parity is the field
    mapping (proto/crawler.proto:24, server.rs:19-29)."""
    from crawler_ray.config import CrawlConfig
    from crawler_ray.rpc import config_from_request

    cfg = config_from_request(
        {"url": "https://h.test/", "proxy": "socks5://10.0.0.1:1080"}
    )
    assert cfg.proxy == "socks5://10.0.0.1:1080"
    assert CrawlConfig(url="https://h.test/").proxy == ""
