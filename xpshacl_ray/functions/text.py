"""Text-analysis operators for large-scale training-data pipelines.

Actor-pool ``map_batches`` stages over a documents table
(``doc_id, text, lang, source, n_chars``): language-ID (n-gram heuristic),
quality scoring (length/punct/stopword ratios), token counting (whitespace
+ a BPE-ish regex), and document fingerprinting (md5 + 64-bit rolling
hash).  All stateful setup (compiled regexes, stopword tables, n-gram
profiles) happens once per actor in ``__init__``.
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# Tiny per-language stopword profiles (public common words); enough for a
# deterministic heuristic language-ID over the synthetic corpora.
_STOPWORDS: Dict[str, frozenset] = {
    "en": frozenset("the a of and to in is it you that was for on are".split()),
    "de": frozenset("der die das und ist ich nicht ein zu es du wir".split()),
    "fr": frozenset("le la les et est je ne pas un une que des".split()),
    "es": frozenset("el la los y es no un una que de en se".split()),
    "pt": frozenset("o a os e é não um uma que de em para".split()),
}

_EN_STOP = _STOPWORDS["en"]

# BPE-ish pre-tokenizer: word pieces, numbers, or single non-space symbols
# (the common GPT-2-style pre-tokenization regex family, simplified).
_BPEISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count_whitespace(batch: pa.Table, text_col: str = "text",
                           out_col: str = "n_tokens") -> pa.Table:
    """Whitespace token count, fully vectorized in Arrow.

    count = split-on-space parts (matches DuckDB ``len(str_split(text,' '))``).
    """
    txt = batch[text_col]
    spaces = pc.count_substring(txt, " ")
    n = pc.add(spaces, 1)
    n = pc.if_else(pc.is_null(txt), pa.scalar(None, pa.int64()),
                   pc.cast(n, pa.int64()))
    return batch.append_column(out_col, n)


class Tokenizer:
    """BPE-ish token counting actor (regex compiled once per actor)."""

    def __init__(self, pattern: str = _BPEISH, text_col: str = "text",
                 out_col: str = "n_bpeish_tokens"):
        self.re = re.compile(pattern)
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        counts = [
            None if t is None else len(self.re.findall(t)) for t in texts
        ]
        return batch.append_column(self.out_col, pa.array(counts, pa.int64()))


class LanguageId:
    """Heuristic language-ID actor: stopword-profile scoring.

    Scores each language by the fraction of tokens found in its stopword
    profile; ties break deterministically by language code. Emits
    ``lang_pred`` and ``lang_score``. (Char-n-gram profiles would drop in
    the same actor shape; stopword profiles are deterministic and
    dependency-free.)
    """

    def __init__(self, profiles: Optional[Dict[str, frozenset]] = None):
        self.profiles = profiles or _STOPWORDS
        self.word_re = re.compile(r"[^\W\d_]+", re.UNICODE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds: List[Optional[str]] = []
        scores: List[Optional[float]] = []
        for t in batch["text"].to_pylist():
            if not t:
                preds.append(None)
                scores.append(None)
                continue
            toks = [w.lower() for w in self.word_re.findall(t)]
            if not toks:
                preds.append(None)
                scores.append(0.0)
                continue
            best_lang, best = None, -1.0
            for lang in sorted(self.profiles):
                hits = sum(1 for w in toks if w in self.profiles[lang])
                score = hits / len(toks)
                if score > best:
                    best_lang, best = lang, score
            preds.append(best_lang)
            scores.append(round(best, 6))
        return batch.append_column(
            "lang_pred", pa.array(preds, pa.string())
        ).append_column("lang_score", pa.array(scores, pa.float64()))


class QualityScorer:
    """Quality-signal actor: length/punct/stopword/repetition ratios.

    Emits ``q_len`` (chars), ``q_punct_ratio``, ``q_stopword_ratio``,
    ``q_dup_line_ratio`` and an aggregate ``quality_score`` ∈ [0,1] —
    the shape of Gopher/C4-style quality filters.
    """

    def __init__(self, stopwords: frozenset = _EN_STOP):
        self.stop = stopwords
        self.word_re = re.compile(r"[^\W\d_]+", re.UNICODE)
        self.punct_re = re.compile(r"[^\w\s]", re.UNICODE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        lens, punct, stopr, dupr, score = [], [], [], [], []
        for t in batch["text"].to_pylist():
            if not t:
                lens.append(0)
                punct.append(None)
                stopr.append(None)
                dupr.append(None)
                score.append(0.0)
                continue
            n = len(t)
            toks = [w.lower() for w in self.word_re.findall(t)]
            p = len(self.punct_re.findall(t)) / n
            s = (sum(1 for w in toks if w in self.stop) / len(toks)) if toks else 0.0
            lines = [ln for ln in t.splitlines() if ln.strip()]
            d = 1.0 - len(set(lines)) / len(lines) if lines else 0.0
            q = 1.0
            if n < 50 or n > 100_000:
                q *= 0.5
            if p > 0.3:
                q *= 0.5
            if s < 0.01:
                q *= 0.7
            q *= 1.0 - d
            lens.append(n)
            punct.append(round(p, 6))
            stopr.append(round(s, 6))
            dupr.append(round(d, 6))
            score.append(round(q, 6))
        return (
            batch.append_column("q_len", pa.array(lens, pa.int64()))
            .append_column("q_punct_ratio", pa.array(punct, pa.float64()))
            .append_column("q_stopword_ratio", pa.array(stopr, pa.float64()))
            .append_column("q_dup_line_ratio", pa.array(dupr, pa.float64()))
            .append_column("quality_score", pa.array(score, pa.float64()))
        )


def md5_fingerprint(batch: pa.Table, text_col: str = "text",
                    out_col: str = "fingerprint_md5") -> pa.Table:
    """md5 hexdigest fingerprint (DuckDB ``md5(text)``-compatible)."""
    out = [
        None if t is None else hashlib.md5(t.encode("utf-8")).hexdigest()
        for t in batch[text_col].to_pylist()
    ]
    return batch.append_column(out_col, pa.array(out, pa.string()))


def sha256_column(batch: pa.Table, text_col: str = "text",
                  out_col: str = "content_sha256") -> pa.Table:
    """sha256 hexdigest (DuckDB ``sha256(text)``-compatible) — the per-row
    invariant column (BASELINE.json)."""
    out = [
        None if t is None else hashlib.sha256(t.encode("utf-8")).hexdigest()
        for t in batch[text_col].to_pylist()
    ]
    return batch.append_column(out_col, pa.array(out, pa.string()))


_ROLL_BASE = np.uint64(1000003)


def rolling_fingerprint(values: Sequence[Optional[str]]) -> List[Optional[int]]:
    """Deterministic 63-bit polynomial rolling hash per document."""
    out: List[Optional[int]] = []
    mask = np.uint64(0x7FFFFFFFFFFFFFFF)
    for t in values:
        if t is None:
            out.append(None)
            continue
        b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        h = np.uint64(5381)
        # vectorised Horner via precomputed powers in chunks
        for chunk in np.array_split(b, max(1, len(b) // 4096)):
            powers = np.empty(len(chunk), dtype=np.uint64)
            if len(chunk) == 0:
                continue
            powers[0] = np.uint64(1)
            for i in range(1, len(chunk)):
                powers[i] = powers[i - 1] * _ROLL_BASE
            base_pow = powers[-1] * _ROLL_BASE
            h = h * base_pow + (chunk[::-1] * powers).sum()
        out.append(int(h & mask))
    return out


def rolling_fingerprint_column(batch: pa.Table, text_col: str = "text",
                               out_col: str = "fingerprint_roll") -> pa.Table:
    vals = rolling_fingerprint(batch[text_col].to_pylist())
    return batch.append_column(out_col, pa.array(vals, pa.int64()))
