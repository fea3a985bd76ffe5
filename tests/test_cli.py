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
