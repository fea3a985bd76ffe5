"""Text-analysis operators over the `documents` table — the training-data
pipeline stages a 100 TB corpus needs: token counting, fingerprinting,
language ID, quality scoring. All vectorized per batch; the language-ID and
quality stages are actor pools (patterns compiled once per actor).
"""

from __future__ import annotations

import hashlib
import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa


def _read_docs(sf_dir: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


# --------------------------------------------------------------------------- #
def token_stats(sf_dir: str):
    """Whitespace token count + char count per document (vectorized pandas
    str kernels). Oracle-checked against DuckDB string functions."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        stripped = df["text"].fillna("").str.strip()
        toks = stripped.str.split()  # runs of whitespace; '' → []
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_tokens": toks.str.len().astype("int64"),
                "n_chars_actual": df["text"].fillna("").str.len().astype("int64"),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pandas", batch_size=8192
    )


def token_stats_sql() -> str:
    return """
    SELECT doc_id,
           CASE WHEN TRIM(text) = '' THEN 0
                ELSE LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) END AS n_tokens,
           LEN(text) AS n_chars_actual
    FROM documents
    """


# --------------------------------------------------------------------------- #
def fingerprints(sf_dir: str):
    """Content fingerprint per document (md5 — SQL-checkable; the rolling-hash
    shingle fingerprints used by near-dup live in dedup.py)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        fp = df["text"].fillna("").map(lambda s: hashlib.md5(s.encode()).hexdigest())
        return pd.DataFrame({"doc_id": df["doc_id"], "fingerprint": fp})

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pandas", batch_size=8192
    )


def fingerprints_sql() -> str:
    return "SELECT doc_id, MD5(text) AS fingerprint FROM documents"


# --------------------------------------------------------------------------- #
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "es", "no", "con"},
    "fr": {"le", "la", "de", "et", "un", "est", "pas", "pour", "que", "dans"},
}


class LangId:
    """Heuristic language ID (SURVEY 'beyond the reference' text ops):
    function-word hit-rate per language + a CJK-codepoint ratio for zh.
    Stateful actor stage — tables/regexes built once per actor."""

    def __init__(self):
        self.word = re.compile(r"[^\W\d_]+", re.UNICODE)
        self.cjk = re.compile(r"[一-鿿]")
        self.stop = {k: frozenset(v) for k, v in _STOPWORDS.items()}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        preds, scores = [], []
        for text in df["text"].fillna(""):
            if self.cjk.search(text):
                n = len(text)
                preds.append("zh")
                scores.append(round(len(self.cjk.findall(text)) / max(1, n), 6))
                continue
            toks = [t.lower() for t in self.word.findall(text)]
            best, best_score = "und", 0.0
            for lang, sw in self.stop.items():
                s = sum(1 for t in toks if t in sw) / max(1, len(toks))
                if s > best_score:
                    best, best_score = lang, s
            preds.append(best)
            scores.append(round(best_score, 6))
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "pred_lang": preds, "lang_score": scores}
        )


def lang_id(sf_dir: str):
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        LangId, batch_format="pandas", batch_size=4096, concurrency=2
    )


# --------------------------------------------------------------------------- #
class QualityScore:
    """Document quality heuristics (length, punctuation ratio, token diversity,
    stopword rate) — the C4/Gopher-style filter stage, actor pool."""

    def __init__(self):
        self.punct = re.compile(r"[^\w\s]", re.UNICODE)
        self.allstop = frozenset().union(*_STOPWORDS.values())

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"].fillna("")
        n_chars = text.str.len()
        toks = text.str.lower().str.split()
        n_tokens = toks.str.len()
        uniq = toks.map(lambda ts: len(set(ts)))
        stop_hits = toks.map(lambda ts: sum(1 for t in ts if t in self.allstop))
        punct = text.str.count(self.punct)
        nt = n_tokens.clip(lower=1)
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_chars": n_chars.astype("int64"),
                "n_tokens": n_tokens.astype("int64"),
                "uniq_ratio": (uniq / nt).round(6),
                "stop_ratio": (stop_hits / nt).round(6),
                "punct_ratio": (punct / n_chars.clip(lower=1)).round(6),
            }
        )
        # composite score in [0,1]: length-normalized, diversity-weighted
        length_ok = np.clip(out["n_tokens"] / 50.0, 0, 1)
        out["quality"] = (
            0.4 * length_ok + 0.4 * out["uniq_ratio"] + 0.2 * (1 - out["punct_ratio"])
        ).round(6)
        return out

    @staticmethod
    def keep_mask(df: pd.DataFrame) -> pd.Series:
        return (df["n_tokens"] >= 5) & (df["quality"] > 0.3)


def quality(sf_dir: str):
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        QualityScore, batch_format="pandas", batch_size=4096, concurrency=2
    )
