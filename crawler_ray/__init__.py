"""crawler_ray — a Ray-Data-native rebuild of a11ywatch/crawler's capabilities.

A URL-frontier + fetch scheduler (sharded URL-seen set, per-host politeness,
robots.txt, priority frontier) over tables of interleaved text+media documents,
expressed Ray-Data-first: ``ray.data.Dataset`` pipelines of ``map_batches`` over
zero-copy Arrow batches, actor pools for stateful stages, explicit
partitioning/skew handling, per-round checkpoint + lineage for resume.

Reference behavior surveyed in /root/repo/SURVEY.md (a11ywatch/crawler,
/root/reference, read-only). This package shares no code with the reference —
it re-expresses the semantics on Ray Data.
"""

__version__ = "0.1.0"
