"""Command-line entry point — the `ray job submit` surface of the engine
(SURVEY.md §4 cluster-deployment row; reference: gRPC server boot,
/root/reference/src/main.rs:16-22 + docker/Dockerfile). One invocation = one
crawl job, mirroring `ScanRequest` field-for-field (proto/crawler.proto:17-27;
`--norobots` keeps the reference's inverted boolean).

Examples:
    python -m crawler_ray.cli crawl --url https://site-0000.test/ --sitemap
    python -m crawler_ray.cli scan  --url https://site-0000.test/ --delay 500
    python -m crawler_ray.cli crawl --url ... --checkpoint /tmp/ck --resume

Without --corpus, a deterministic synthetic corpus (FIXTURES.md) is generated
and cached under /tmp. This module owns its Ray session (guarded init) — the
library never calls ray.init.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="crawler_ray")
    p.add_argument(
        "mode",
        choices=["crawl", "scan", "serve"],
        help="batch vs streaming mode (reference Crawl/Scan endpoints), or "
        "serve: boot the HTTP job-intake server (reference gRPC server boot, "
        "src/main.rs:16-22; endpoints in crawler_ray/rpc.py)",
    )
    p.add_argument("--url", default="", help="seed URL (ScanRequest.url; required for crawl/scan)")
    p.add_argument("--host", default="127.0.0.1", help="serve: bind host")
    p.add_argument("--port", type=int, default=50055, help="serve: bind port (reference default GRPC_HOST_API port)")
    p.add_argument("--id", default="0", help="crawl/user id (ScanRequest.id)")
    p.add_argument("--norobots", action="store_true", help="ignore robots.txt (ScanRequest.norobots)")
    p.add_argument("--agent", default="crawler_ray/0.1", help="user agent (ScanRequest.agent)")
    p.add_argument("--subdomains", action="store_true", help="include subdomains (ScanRequest.subdomains)")
    p.add_argument("--tld", action="store_true", help="include TLD siblings (ScanRequest.tld)")
    p.add_argument("--proxy", default="", help="proxy pass-through (ScanRequest.proxy; no-op in corpus model)")
    p.add_argument("--sitemap", action="store_true", help="sitemap pre-pass (ScanRequest.sitemap)")
    p.add_argument("--delay", type=int, default=0, help="politeness delay ms (ScanRequest.delay)")
    p.add_argument("--max-depth", type=int, default=-1)
    p.add_argument("--max-pages", type=int, default=-1)
    p.add_argument("--corpus", default="", help="corpus parquet path (default: cached synthetic corpus)")
    p.add_argument("--robots", default="", help="robots rules parquet (default: synthetic fixtures)")
    p.add_argument("--out", default="", help="output dir (fetched/round=N + results.parquet)")
    p.add_argument("--checkpoint", default="", help="checkpoint dir for resumable runs")
    p.add_argument("--resume", action="store_true", help="resume from the latest committed checkpoint")
    p.add_argument("--stop-flag", default="", help="path whose existence aborts the crawl between rounds")
    p.add_argument("--num-cpus", type=int, default=0, help="ray.init num_cpus (0 = Ray default)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import ray

    if not ray.is_initialized():
        kw = dict(address="local", include_dashboard=False, logging_level="ERROR")
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(**kw)
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False

        import pyarrow.parquet as pq

        from .config import CrawlConfig
        from .engine import CrawlEngine
        from .synth import CorpusSpec, corpus_path, robots_path

        if args.corpus:
            cp, robots = args.corpus, None
            if args.robots:
                robots = pq.read_table(args.robots)
        else:
            spec = CorpusSpec()
            cp = corpus_path(spec)
            robots = pq.read_table(args.robots or robots_path(spec))

        if args.mode == "serve":
            from .rpc import serve

            httpd, _svc = serve(
                cp, robots, host=args.host, port=args.port, out_root=args.out
            )
            h, p = httpd.server_address
            print(json.dumps({"serving": f"http://{h}:{p}"}), flush=True)
            try:
                httpd.serve_forever()
            except KeyboardInterrupt:
                pass
            finally:
                httpd.shutdown()
                httpd.server_close()
            return 0

        if not args.url:
            print("--url is required for crawl/scan", file=sys.stderr)
            return 2
        cfg = CrawlConfig(
            url=args.url,
            crawl_id=args.id,
            respect_robots_txt=not args.norobots,
            agent=args.agent,
            subdomains=args.subdomains,
            tld=args.tld,
            proxy=args.proxy,
            sitemap=args.sitemap,
            delay_ms=args.delay,
            max_depth=args.max_depth,
            max_pages=args.max_pages,
            checkpoint_dir=args.checkpoint,
            stop_flag_path=args.stop_flag,
        )
        if args.resume:
            eng = CrawlEngine.resume(cp, cfg, robots, out_dir=args.out)
        else:
            eng = CrawlEngine(cp, cfg, robots)
        try:
            res = eng.run(mode=args.mode, out_dir=args.out)
        finally:
            eng.close()
        print(
            json.dumps(
                {
                    "crawl_id": res.crawl_id,
                    "mode": args.mode,
                    "pages_fetched": res.pages_fetched,
                    "visited": res.n_visited,
                    "rounds": res.rounds,
                    "stopped": res.stopped,
                    "out_dir": res.out_dir,
                }
            )
        )
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
