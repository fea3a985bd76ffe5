"""Network job-intake surface — the HTTP/JSON analogue of the reference's
gRPC two-server topology (proto/crawler.proto:7-10, src/rpc/server.rs:18-88,
examples/client.rs:29-117): a crawler server accepting ``ScanRequest`` jobs,
and a client-side website-service receiver the crawler calls back as pages
are found.

No gRPC stack exists in this sandbox (and a Ray-native deployment is usually
fronted by ``ray job submit`` anyway — see cli.py), so the wire format is
HTTP/1.1 + JSON / ndjson over the standard library; the *surface semantics*
mirror the reference endpoint-for-endpoint:

==========================================  =====================================
reference (gRPC)                            here (HTTP)
==========================================  =====================================
``Crawler.Scan(ScanRequest) -> ScanReply``  ``POST /scan`` → ``{"message":
(replies immediately, crawl spawned         "scanning - <url>", "job_id": n}``;
async, server.rs:18-52)                     crawl runs on a daemon thread
  crawler → client ``scan_start``             ``POST {callback}/scan/start``
  (scan.rs:44-47)
  crawler → client per-page ``monitor(url,    ``POST {callback}/pages`` — ndjson,
  html)`` → shutdown bool (scan.rs:50-68)     one line per fetched page, sent per
                                              completed wave; response
                                              ``{"shutdown": true}`` aborts the
                                              crawl (client.rs:88-99 parity)
  crawler → client ``scan_end``               ``POST {callback}/scan/end``
``Crawler.Crawl(ScanRequest)`` (all links   ``POST /crawl`` — one ``/pages``
sent when completed, server.rs:54-88)       callback with every page at the end
``WebsiteService.scan_stream`` (pull        ``POST /scan_stream`` — chunked
stream, examples/client.rs:66-88)           ndjson response, one line per page,
                                            flushed per wave
health probe (S9)                           ``GET /health``
(no reference analogue)                     ``GET /jobs/<id>`` — job status
``GRPC_HOST=0.0.0.0:50051`` boot            ``serve(corpus, host, port)`` /
(src/main.rs:16-22)                         ``python -m crawler_ray.cli serve``
==========================================  =====================================

The server owns NO Ray session: whoever boots it (cli.py's ``serve`` mode, or
the test fixture) initialises Ray first, exactly like every other entry point
in this package. Each job gets its own ``CrawlEngine`` (isolated actor set —
the reference spawns one detached tokio task per request, server.rs:35,71).
"""

from __future__ import annotations

import json
import threading
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow as pa

from .config import CrawlConfig
from .engine import CrawlEngine


# --------------------------------------------------------------------------- #
# ScanRequest (proto/crawler.proto:17-27) → CrawlConfig, same field mapping as
# the gRPC server applies (server.rs:19-29: `norobots` inverted, empty agent →
# default) plus the rebuild's scheduler extensions under their cli.py names.

_EXTENSION_KEYS = (
    "max_depth",
    "max_pages",
    "round_ms",
    "wallclock_politeness",
    "blacklist",
    "stop_flag_path",
    "checkpoint_dir",
    "small_round_threshold",
)


def config_from_request(req: dict) -> CrawlConfig:
    kw = dict(
        url=req["url"],
        crawl_id=str(req.get("id", "0")),
        respect_robots_txt=not req.get("norobots", False),
        subdomains=bool(req.get("subdomains", False)),
        tld=bool(req.get("tld", False)),
        proxy=str(req.get("proxy", "")),
        sitemap=bool(req.get("sitemap", False)),
        delay_ms=int(req.get("delay", 0)),
    )
    if req.get("agent"):
        kw["agent"] = str(req["agent"])
    for k in _EXTENSION_KEYS:
        if k in req:
            kw[k] = tuple(req[k]) if k == "blacklist" else req[k]
    return CrawlConfig(**kw)


def _page_lines(fetched, include_content: bool) -> list[bytes]:
    """FETCHED-schema wave (Arrow table or Dataset) → ndjson page lines.
    ``include_content`` adds the page text (concatenated text spans — the
    reference's ``monitor`` ships ``res.get_html()``, client.rs:70-75)."""
    tables = (
        [fetched]
        if isinstance(fetched, pa.Table)
        else fetched.iter_batches(batch_format="pyarrow")
    )
    out = []
    for t in tables:
        cols = {k: t.column(k).to_pylist() for k in ("url", "depth", "status")}
        cols["round"] = t.column("fetch_round").to_pylist()
        texts = None
        if include_content:
            texts = [
                " ".join(s["text"] for s in spans if s["kind"] == "text")
                for spans in t.column("spans").to_pylist()
            ]
        for i in range(t.num_rows):
            row = {
                "url": cols["url"][i],
                "depth": cols["depth"][i],
                "status": cols["status"][i],
                "round": cols["round"][i],
            }
            if texts is not None:
                row["content"] = texts[i]
            out.append(json.dumps(row).encode() + b"\n")
    return out


def _post(url: str, body: bytes, content_type: str = "application/json") -> dict:
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": content_type}, method="POST"
    )
    with urllib.request.urlopen(req, timeout=60) as resp:
        raw = resp.read()
    try:
        return json.loads(raw) if raw else {}
    except json.JSONDecodeError:
        return {}


class CrawlerService:
    """Job registry + executors behind the HTTP handler. One engine per job,
    jobs tracked for the status endpoint."""

    def __init__(self, corpus_parquet: str, robots_table: pa.Table | None = None,
                 out_root: str = ""):
        self.corpus = corpus_parquet
        self.robots = robots_table
        self.out_root = out_root
        self._jobs: dict[int, dict] = {}
        self._next = 0
        self._lock = threading.Lock()

    # ---------------------------------------------------------------- jobs
    def _new_job(self, mode: str, req: dict) -> int:
        with self._lock:
            jid = self._next
            self._next += 1
            self._jobs[jid] = {
                "job_id": jid,
                "mode": mode,
                "url": req.get("url", ""),
                "status": "running",
            }
        return jid

    def _finish(self, jid: int, **fields) -> None:
        with self._lock:
            self._jobs[jid].update(fields)

    def job(self, jid: int) -> dict | None:
        with self._lock:
            j = self._jobs.get(jid)
            return dict(j) if j else None

    def submit(self, mode: str, req: dict) -> dict:
        """Reference reply contract: respond immediately with the ScanReply
        message (server.rs:31-33), crawl runs on its own daemon thread."""
        cfg = config_from_request(req)
        jid = self._new_job(mode, req)
        t = threading.Thread(
            target=self._run_job, args=(jid, mode, cfg, req), daemon=True
        )
        t.start()
        self._jobs[jid]["thread"] = t
        return {"message": f"scanning - {cfg.url!r}", "job_id": jid}

    # ------------------------------------------------------------- executors
    def _callbacks(self, req: dict):
        cb = str(req.get("callback", "")).rstrip("/")
        include = bool(req.get("include_content", False))

        def start_end(which: str, cfg: CrawlConfig) -> None:
            if cb:
                _post(
                    f"{cb}/scan/{which}",
                    json.dumps(
                        {"domain": cfg.url, "user_id": cfg.crawl_id}
                    ).encode(),
                )

        def pages(fetched) -> bool:
            """POST one wave; returns True if the client asked to shut down
            (the monitor-bool of client.rs:88-99)."""
            if not cb:
                return False
            body = b"".join(_page_lines(fetched, include))
            resp = _post(f"{cb}/pages", body, "application/x-ndjson")
            return bool(resp.get("shutdown", False))

        return start_end, pages

    def _run_job(self, jid: int, mode: str, cfg: CrawlConfig, req: dict) -> None:
        import os

        start_end, pages = self._callbacks(req)
        out_dir = (
            os.path.join(self.out_root, f"job={jid}") if self.out_root else ""
        )
        try:
            eng = CrawlEngine(self.corpus, cfg, self.robots)
            try:
                start_end("start", cfg)
                if mode == "scan":
                    # per-wave delivery as found (Scan semantics)
                    stopped = False
                    it = eng.iter_rounds(out_dir=out_dir)
                    for _rnd, fetched in it:
                        if pages(fetched):
                            it.close()  # client-requested shutdown
                            stopped = True
                            break
                    # engine-side truncation (page budget, stop flag) counts
                    # too — run() reports it via CrawlResult.stopped, so the
                    # scan path must agree for the same config
                    res = eng._result(
                        mode, out_dir, stopped or getattr(eng, "stopped_early", False)
                    )
                else:
                    # all links once, when completed (Crawl semantics,
                    # server.rs:53: "send all links crawled when completed").
                    # Streamed per seen-shard batch so the link list never
                    # materializes whole on this thread.
                    res = eng.run(mode="crawl", out_dir=out_dir)
                    cb = str(req.get("callback", "")).rstrip("/")
                    if cb:
                        for b in res.visited_dataset().iter_batches(
                            batch_format="pyarrow"
                        ):
                            body = b"".join(
                                json.dumps({"url": u}).encode() + b"\n"
                                for u in b.column("url").to_pylist()
                            )
                            _post(f"{cb}/pages", body, "application/x-ndjson")
                start_end("end", cfg)
                self._finish(
                    jid,
                    status="done",
                    pages_fetched=res.pages_fetched,
                    visited=res.n_visited,
                    rounds=res.rounds,
                    stopped=res.stopped,
                    out_dir=res.out_dir,
                )
            finally:
                eng.close()
        except Exception as e:  # surfaced via the status endpoint
            self._finish(jid, status="error", error=f"{type(e).__name__}: {e}")

    def stream_job(self, req: dict):
        """Pull-mode stream (``scan_stream`` analogue): generator of ndjson
        chunks, one chunk per completed wave. Runs inline on the handler
        thread — the HTTP response IS the stream."""
        cfg = config_from_request(req)
        include = bool(req.get("include_content", False))
        jid = self._new_job("scan_stream", req)
        try:
            # inside the try: a failed engine construction must still move
            # the registered job to 'error' instead of leaving it 'running'
            eng = CrawlEngine(self.corpus, cfg, self.robots)
        except Exception as e:
            self._finish(jid, status="error", error=f"{type(e).__name__}: {e}")
            raise
        try:
            n = 0
            for _rnd, fetched in eng.iter_rounds():
                lines = _page_lines(fetched, include)
                n += len(lines)
                yield b"".join(lines)
            self._finish(jid, status="done", pages_fetched=n)
        except GeneratorExit:
            self._finish(jid, status="done", stopped=True)
            raise
        except Exception as e:
            self._finish(jid, status="error", error=f"{type(e).__name__}: {e}")
            raise
        finally:
            eng.close()


# --------------------------------------------------------------------------- #
# HTTP plumbing


def _make_handler(svc: CrawlerService):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):  # quiet
            pass

        # ------------------------------------------------------------ util
        def _json(self, obj: dict, code: int = 200) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self) -> dict:
            n = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(n) if n else b""
            return json.loads(raw) if raw else {}

        # --------------------------------------------------------- routes
        def do_GET(self):
            if self.path == "/health":  # S9 health endpoint
                self._json({"status": "ok", "service": "crawler_ray"})
            elif self.path.startswith("/jobs/"):
                try:
                    j = svc.job(int(self.path.rsplit("/", 1)[1]))
                except ValueError:
                    j = None
                if j is None:
                    self._json({"error": "no such job"}, 404)
                else:
                    j.pop("thread", None)
                    self._json(j)
            else:
                self._json({"error": "not found"}, 404)

        def do_POST(self):
            try:
                req = self._body()
            except json.JSONDecodeError:
                self._json({"error": "bad json"}, 400)
                return
            if self.path in ("/scan", "/crawl"):
                if not req.get("url"):
                    self._json({"error": "url required"}, 400)
                    return
                try:
                    self._json(svc.submit(self.path[1:], req))
                except (TypeError, ValueError) as e:
                    # malformed ScanRequest field (e.g. delay: "fast") must
                    # be a 400 response, not an aborted connection
                    self._json({"error": f"bad request: {e}"}, 400)
            elif self.path == "/scan_stream":
                if not req.get("url"):
                    self._json({"error": "url required"}, 400)
                    return
                try:
                    # validate BEFORE the 200 header goes out — the stream
                    # body cannot carry an HTTP error after that
                    config_from_request(req)
                except (TypeError, ValueError) as e:
                    self._json({"error": f"bad request: {e}"}, 400)
                    return
                # close-delimited ndjson stream, flushed per wave
                self.send_response(200)
                self.send_header("Content-Type", "application/x-ndjson")
                self.send_header("Connection", "close")
                self.end_headers()
                for chunk in svc.stream_job(req):
                    self.wfile.write(chunk)
                    self.wfile.flush()
                self.close_connection = True
            else:
                self._json({"error": "not found"}, 404)

    return Handler


def serve(
    corpus_parquet: str,
    robots_table: pa.Table | None = None,
    host: str = "127.0.0.1",
    port: int = 0,
    out_root: str = "",
) -> tuple[ThreadingHTTPServer, CrawlerService]:
    """Boot the crawler server (reference: src/main.rs:16-22 binding
    GRPC_HOST). Returns (server, service); call ``server.serve_forever()``
    (cli does) or drive it from a thread (tests do). ``port=0`` → ephemeral."""
    svc = CrawlerService(corpus_parquet, robots_table, out_root)
    httpd = ThreadingHTTPServer((host, port), _make_handler(svc))
    httpd.daemon_threads = True
    return httpd, svc


# --------------------------------------------------------------------------- #
# client side — examples/client.rs analogue


class WebsiteCallbackServer:
    """The client's own receiver server (two-server topology: the reference
    client runs a ``WebsiteService`` the crawler calls back into,
    examples/client.rs:55-117). Collects events + pages; an optional
    ``monitor`` predicate over each page dict may return True to request
    crawler shutdown (client.rs:88-99)."""

    def __init__(self, monitor=None, host: str = "127.0.0.1"):
        self.events: list[dict] = []
        self.pages: list[dict] = []
        self.done = threading.Event()
        self._monitor = monitor
        self._lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):
                pass

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(n) if n else b""
                shutdown = False
                if self.path == "/pages":
                    batch = [json.loads(x) for x in raw.splitlines() if x]
                    with outer._lock:
                        outer.pages.extend(batch)
                    if outer._monitor is not None:
                        shutdown = any(outer._monitor(p) for p in batch)
                else:  # /scan/start, /scan/end
                    ev = {"path": self.path, **(json.loads(raw) if raw else {})}
                    with outer._lock:
                        outer.events.append(ev)
                    if self.path == "/scan/end":
                        outer.done.set()
                body = json.dumps({"shutdown": shutdown}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._httpd = ThreadingHTTPServer((host, 0), Handler)
        self._httpd.daemon_threads = True
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()

    @property
    def url(self) -> str:
        h, p = self._httpd.server_address
        return f"http://{h}:{p}"

    def close(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()


def submit(base_url: str, mode: str, req: dict) -> dict:
    """POST a ScanRequest to a running crawler server (``crawl_start``,
    examples/client.rs:43-52)."""
    return _post(f"{base_url.rstrip('/')}/{mode}", json.dumps(req).encode())


def scan_stream(base_url: str, req: dict, timeout: float = 300.0):
    """Consume the pull-mode page stream: yields page dicts as waves land."""
    r = urllib.request.Request(
        f"{base_url.rstrip('/')}/scan_stream",
        data=json.dumps(req).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(r, timeout=timeout) as resp:
        for line in resp:
            line = line.strip()
            if line:
                yield json.loads(line)
