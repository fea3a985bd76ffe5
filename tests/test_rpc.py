"""Network job-intake surface (crawler_ray/rpc.py) — HTTP analogue of the
reference's gRPC two-server topology (proto/crawler.proto:7-10,
src/rpc/server.rs:18-88, examples/client.rs:29-117): submit ScanRequests over
the wire, receive pages via the client-side callback server, verify against
the in-process oracle crawler, and exercise the monitor-driven shutdown."""

from __future__ import annotations

import json
import threading
import time
import urllib.request

import pyarrow.parquet as pq
import pytest

from crawler_ray.config import CrawlConfig
from crawler_ray.oracle import corpus_as_dict, crawl as oracle_crawl, robots_as_dict
from crawler_ray.synth import corpus_path, gen_robots, robots_path


@pytest.fixture(scope="module")
def server(small_spec, small_corpus, ray_session):
    from crawler_ray.rpc import serve

    httpd, svc = serve(
        corpus_path(small_spec), pq.read_table(robots_path(small_spec))
    )
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    h, p = httpd.server_address
    yield {
        "base": f"http://{h}:{p}",
        "svc": svc,
        "cd": corpus_as_dict(small_corpus),
        "rd": robots_as_dict(gen_robots(small_spec)),
    }
    httpd.shutdown()
    httpd.server_close()


def _wait_job(svc, jid: int, timeout: float = 120.0) -> dict:
    t0 = time.time()
    while time.time() - t0 < timeout:
        j = svc.job(jid)
        if j and j["status"] != "running":
            return j
        time.sleep(0.05)
    raise TimeoutError(f"job {jid} still running after {timeout}s: {svc.job(jid)}")


def test_health_endpoint(server):
    """S9 health probe."""
    with urllib.request.urlopen(server["base"] + "/health", timeout=10) as r:
        assert json.loads(r.read()) == {"status": "ok", "service": "crawler_ray"}


def test_scan_streams_pages_to_callback(server):
    """Scan semantics (server.rs:18-52): reply immediately, pages flow to the
    client's website-service receiver per wave, bracketed by scan/start and
    scan/end events; the full page set matches the oracle crawler."""
    from crawler_ray.rpc import WebsiteCallbackServer, submit

    cb = WebsiteCallbackServer()
    try:
        req = {"url": "https://site-0000.test/", "id": 7, "callback": cb.url}
        reply = submit(server["base"], "scan", req)
        assert reply["message"].startswith("scanning - ")
        job = _wait_job(server["svc"], reply["job_id"])
        assert cb.done.wait(10)
        assert job["status"] == "done" and not job["stopped"]

        o = oracle_crawl(
            server["cd"], CrawlConfig(url=req["url"], crawl_id="7"), server["rd"]
        )
        got = {p["url"] for p in cb.pages}
        assert got == {u for (u, d, r, s, sp) in o.fetched}
        assert job["pages_fetched"] == len(o.fetched)
        # per-page metadata rides along (depth = BFS wave, round = schedule)
        by_url = {p["url"]: p for p in cb.pages}
        for (u, d, r, s, sp) in o.fetched:
            assert by_url[u]["depth"] == d
            assert by_url[u]["round"] == r
            assert by_url[u]["status"] == s
        # topology bracket: start before any pages, end after all
        paths = [e["path"] for e in cb.events]
        assert paths == ["/scan/start", "/scan/end"]
        assert cb.events[0]["domain"] == req["url"]
        assert cb.events[0]["user_id"] == "7"
    finally:
        cb.close()


def test_scan_include_content(server):
    """monitor() ships page content (client.rs:70-75): with include_content
    the callback rows carry the concatenated text spans."""
    from crawler_ray.rpc import WebsiteCallbackServer, submit

    cb = WebsiteCallbackServer()
    try:
        reply = submit(
            server["base"],
            "scan",
            {
                "url": "https://site-0000.test/",
                "callback": cb.url,
                "include_content": True,
                "max_pages": 8,
            },
        )
        _wait_job(server["svc"], reply["job_id"])
        assert cb.pages and all("content" in p for p in cb.pages)
        seed = next(p for p in cb.pages if p["url"] == "https://site-0000.test/")
        spans = server["cd"]["https://site-0000.test/"]
        want = " ".join(s["text"] for s in spans if s["kind"] == "text")
        assert seed["content"] == want
    finally:
        cb.close()


def test_monitor_shutdown_stops_scan(server):
    """The reference monitor returns a bool that shuts the crawl down
    (client.rs:88-99): a callback that trips after the first wave must stop
    the job before the full crawl completes."""
    from crawler_ray.rpc import WebsiteCallbackServer, submit

    cb = WebsiteCallbackServer(monitor=lambda page: True)  # trip immediately
    try:
        req = {"url": "https://site-0000.test/", "callback": cb.url}
        reply = submit(server["base"], "scan", req)
        job = _wait_job(server["svc"], reply["job_id"])
        assert job["status"] == "done" and job["stopped"]

        o = oracle_crawl(server["cd"], CrawlConfig(url=req["url"]), server["rd"])
        assert 0 < job["pages_fetched"] < len(o.fetched)
        # end event still delivered on early shutdown
        assert [e["path"] for e in cb.events] == ["/scan/start", "/scan/end"]
    finally:
        cb.close()


def test_crawl_sends_links_when_complete(server):
    """Crawl semantics (server.rs:53-88): one link-list delivery after the
    crawl completes; equals the oracle's visited set."""
    from crawler_ray.rpc import WebsiteCallbackServer, submit

    cb = WebsiteCallbackServer()
    try:
        req = {"url": "https://site-0002.test/", "callback": cb.url}
        reply = submit(server["base"], "crawl", req)
        job = _wait_job(server["svc"], reply["job_id"])
        assert job["status"] == "done"
        o = oracle_crawl(server["cd"], CrawlConfig(url=req["url"]), server["rd"])
        assert {p["url"] for p in cb.pages} == o.visited
        assert job["visited"] == len(o.visited)
    finally:
        cb.close()


def test_scan_stream_pull_mode(server):
    """Pull-mode ndjson stream (scan_stream analogue, client.rs:66-88):
    page lines arrive over one HTTP response and match the oracle."""
    from crawler_ray.rpc import scan_stream

    req = {"url": "https://site-0000.test/", "max_depth": 2}
    pages = list(scan_stream(server["base"], req))
    o = oracle_crawl(
        server["cd"], CrawlConfig(url=req["url"], max_depth=2), server["rd"]
    )
    assert {p["url"] for p in pages} == {u for (u, d, r, s, sp) in o.fetched}
    assert all(p["depth"] <= 2 for p in pages)


def test_job_status_and_errors(server):
    """Job registry: status endpoint tracks running→done; bad requests 4xx."""
    import urllib.error

    from crawler_ray.rpc import submit

    reply = submit(server["base"], "crawl", {"url": "https://site-0001.test/"})
    job = _wait_job(server["svc"], reply["job_id"])
    assert job["status"] == "done" and job["mode"] == "crawl"

    with urllib.request.urlopen(
        server["base"] + f"/jobs/{reply['job_id']}", timeout=10
    ) as r:
        assert json.loads(r.read())["status"] == "done"

    with pytest.raises(urllib.error.HTTPError) as ei:
        submit(server["base"], "scan", {})  # no url
    assert ei.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(server["base"] + "/jobs/999", timeout=10)
    assert ei.value.code == 404
    # malformed field types are a 400 response, not an aborted socket
    # (review r4 #3) — on both the submit and the stream endpoints
    bad = {"url": "https://site-0001.test/", "delay": "fast"}
    with pytest.raises(urllib.error.HTTPError) as ei:
        submit(server["base"], "scan", bad)
    assert ei.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(
            urllib.request.Request(
                server["base"] + "/scan_stream",
                data=json.dumps(bad).encode(),
                headers={"Content-Type": "application/json"},
                method="POST",
            ),
            timeout=10,
        )
    assert ei.value.code == 400


def test_scan_budget_reports_stopped(server):
    """A scan job truncated by the engine's own page budget must report
    stopped=true, matching what run() reports for the same config
    (review r4 #5)."""
    from crawler_ray.rpc import submit

    reply = submit(
        server["base"], "scan", {"url": "https://site-0000.test/", "max_pages": 3}
    )
    job = _wait_job(server["svc"], reply["job_id"])
    assert job["status"] == "done"
    assert job["pages_fetched"] <= 3
    assert job["stopped"] is True


def test_parallel_job_isolation(server):
    """One engine per request (reference: detached task per RPC,
    server.rs:35,71): two concurrent jobs with different ids both complete
    with their own correct results."""
    from crawler_ray.rpc import submit

    r1 = submit(server["base"], "crawl", {"url": "https://site-0000.test/", "id": 1, "max_depth": 1})
    r2 = submit(server["base"], "crawl", {"url": "https://site-0002.test/", "id": 2})
    j1 = _wait_job(server["svc"], r1["job_id"])
    j2 = _wait_job(server["svc"], r2["job_id"])
    o1 = oracle_crawl(
        server["cd"], CrawlConfig(url="https://site-0000.test/", max_depth=1), server["rd"]
    )
    o2 = oracle_crawl(
        server["cd"], CrawlConfig(url="https://site-0002.test/"), server["rd"]
    )
    assert (j1["visited"], j2["visited"]) == (len(o1.visited), len(o2.visited))
