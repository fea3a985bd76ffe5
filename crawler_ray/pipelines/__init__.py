"""Ray-Data pipelines: relational operators over the driver test tables, plus
large-scale training-data operations (dedup, similarity search, text analysis,
multimodal plumbing) and crawl-engine query wrappers.

Every public function takes ``sf_dir`` (a /root/testdata/sf* directory) and
returns a ``ray.data.Dataset`` or small ``pyarrow.Table`` — the contract of
``__ray_entry__.queries()``.
"""
