"""Text analysis operators over the ``documents`` table.

Training-data-pipeline staples, each a vectorized ``map_batches`` stage:

- ``token_stats``: whitespace token count + a BPE-ish regex token count
- ``quality_scores``: length / punctuation / stopword / casing ratios
  with a composite score
- ``LangId``: n-gram + stopword heuristic language id (actor pool —
  profiles compiled once per actor)
- ``fingerprints``: Rabin-Karp rolling-hash document fingerprint
  (min-k sketch) plus an md5 content id

Semantics that also exist in ANSI SQL (token counts, length/punct
ratios, md5) are defined to match DuckDB expressions exactly so the
driver's oracle can verify them value-for-value.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

__all__ = ["token_stats", "quality_scores", "LangId", "fingerprints", "add_text_ops"]

# BPE-ish pre-tokenizer: word pieces, numbers, or single non-space symbols
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")
_WS_RE = re.compile(r"\s+")
_PUNCT_RE = re.compile(r"[!-/:-@\[-`{-~]")


def token_stats(batch: pd.DataFrame) -> pd.DataFrame:
    """doc_id, n_tokens_ws (split on \\s+, as DuckDB
    regexp_split_to_array(trim(text),'\\s+')), n_tokens_bpe."""
    text = batch["text"].fillna("")
    stripped = text.str.strip()
    n_ws = stripped.str.split(_WS_RE).str.len()
    n_ws = n_ws.where(stripped != "", 0).astype("int64")
    n_bpe = text.str.count(_BPE_RE).astype("int64")
    return pd.DataFrame({"doc_id": batch["doc_id"], "n_tokens_ws": n_ws, "n_tokens_bpe": n_bpe})


_STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been for on with as at by it this that from".split()
)


def quality_scores(batch: pd.DataFrame) -> pd.DataFrame:
    """Length/punct/stopword/upper ratios + composite quality in [0,1].

    n_chars and punct_ratio match the DuckDB oracle expressions:
    length(text) and length(regexp_replace(text,'[^!-/:-@\\[-`{-~]','','g'))
    / nullif(length(text),0).
    """
    text = batch["text"].fillna("")
    n_chars = text.str.len().astype("int64")
    n_punct = text.str.count(_PUNCT_RE)
    punct_ratio = (n_punct / n_chars.replace(0, np.nan)).fillna(0.0)
    words = text.str.lower().str.findall(r"[a-z]+")
    stop_ratio = words.map(lambda ws: sum(w in _STOPWORDS for w in ws) / len(ws) if ws else 0.0)
    upper_ratio = (text.str.count(r"[A-Z]") / n_chars.replace(0, np.nan)).fillna(0.0)
    mean_word_len = words.map(lambda ws: float(np.mean([len(w) for w in ws])) if ws else 0.0)
    quality = (
        (n_chars.clip(0, 2000) / 2000.0) * 0.3
        + (1.0 - punct_ratio.clip(0, 1)) * 0.2
        + stop_ratio.clip(0, 0.6) / 0.6 * 0.3
        + (1.0 - upper_ratio.clip(0, 1)) * 0.2
    )
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_chars": n_chars,
            "punct_ratio": punct_ratio,
            "stop_ratio": stop_ratio,
            "upper_ratio": upper_ratio,
            "mean_word_len": mean_word_len,
            "quality": quality,
        }
    )


# character-trigram profiles per language (hand-rolled public heuristic)
_LANG_PROFILES = {
    "en": ("the and ing ion tio ent for was har een ere his ith hat", {"the", "and", "of", "to", "is"}),
    "de": ("der die und sch ein ich den cht ung gen", {"der", "die", "und", "das", "ist"}),
    "fr": ("les de la ent ion que une dans pour est", {"les", "des", "une", "est", "dans"}),
    "es": ("de la que el en los del las por con", {"los", "las", "una", "por", "con"}),
}


class LangId:
    """Actor-pool language id: profiles compiled once per actor."""

    def __init__(self):
        self.profiles = {}
        for lang, (tri_text, stops) in _LANG_PROFILES.items():
            self.profiles[lang] = (set(tri_text.split()), stops)
        self.word_re = re.compile(r"[a-zà-ÿ]+")

    def _score(self, text: str) -> str:
        words = self.word_re.findall(text.lower())
        if not words:
            return "und"
        tris = set()
        for w in words[:200]:
            for i in range(len(w) - 2):
                tris.add(w[i : i + 3])
        best, best_score = "und", 0.0
        wordset = set(words[:200])
        for lang, (ptris, pstops) in self.profiles.items():
            score = len(tris & ptris) + 2.0 * len(wordset & pstops)
            if score > best_score:
                best, best_score = lang, score
        return best

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": batch["doc_id"], "lang_pred": [self._score(t or "") for t in batch["text"]]}
        )


_MOD = (1 << 61) - 1
_BASE = 257


def _rolling_hashes(tokens: list[str], window: int = 3) -> list[int]:
    if len(tokens) < window:
        return [hash_tokens(tokens)] if tokens else []
    hs = []
    for i in range(len(tokens) - window + 1):
        hs.append(hash_tokens(tokens[i : i + window]))
    return hs


def hash_tokens(tokens: list[str]) -> int:
    h = 0
    for t in tokens:
        th = int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "little")
        h = (h * _BASE + th) % _MOD
    return h


def fingerprints(batch: pd.DataFrame, k: int = 8) -> pd.DataFrame:
    """Min-k rolling-hash fingerprint + md5 content id (SQL-checkable)."""
    out_fp, out_md5 = [], []
    for text in batch["text"].fillna(""):
        toks = text.split()
        hs = sorted(_rolling_hashes(toks))[:k]
        out_fp.append("-".join("%016x" % h for h in hs))
        out_md5.append(hashlib.md5(text.encode("utf-8")).hexdigest())
    return pd.DataFrame({"doc_id": batch["doc_id"], "fingerprint": out_fp, "content_md5": out_md5})


def add_text_ops(ds, op: str, **kwargs):
    """Apply a named text op to a documents Dataset."""
    fns = {"tokens": token_stats, "quality": quality_scores, "fingerprint": fingerprints}
    if op == "langid":
        return ds.map_batches(LangId, batch_format="pandas", concurrency=kwargs.get("concurrency", 2))
    return ds.map_batches(fns[op], batch_format="pandas")
