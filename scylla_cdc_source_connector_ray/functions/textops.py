"""Text analysis operators for large-scale training-data pipelines:
token counting, quality scoring, language ID, document fingerprinting.

All hot paths are vectorized: ``pyarrow.compute`` regex/count kernels or
pandas str ops; compiled state (regexes, wordlists) lives in actor
``__init__`` when used as a class stage.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

TOKEN_RE = r"\S+"
PUNCT_RE = r"[.,;:!?]"
STOP_RE = r"\b(the|and|of|a|to|in|is)\b"
#: GPT-2-style pre-tokenizer, RE2-compatible (no lookahead): contraction
#: suffixes, letter runs, digit runs, punctuation runs. The SAME pattern
#: string runs in DuckDB's regexp_extract_all (also RE2) — counts are
#: identical by construction.
BPE_TOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s']+"


def text_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized per-document counts: chars, whitespace tokens, punctuation,
    stopwords — the raw ingredients of quality scoring. Arrow kernels only."""
    txt = batch[text_col].combine_chunks()
    n_chars = pc.fill_null(pc.utf8_length(txt), 0).cast(pa.int64())
    n_words = pc.fill_null(pc.count_substring_regex(txt, TOKEN_RE), 0).cast(pa.int64())
    n_punct = pc.fill_null(pc.count_substring_regex(txt, PUNCT_RE), 0).cast(pa.int64())
    n_stop = pc.fill_null(pc.count_substring_regex(txt, STOP_RE), 0).cast(pa.int64())
    n_bpe = pc.fill_null(pc.count_substring_regex(txt, BPE_TOKEN_RE), 0).cast(pa.int64())
    out = batch.append_column("stat_chars", n_chars)
    out = out.append_column("stat_words", n_words)
    out = out.append_column("stat_punct", n_punct)
    out = out.append_column("stat_stop", n_stop)
    out = out.append_column("stat_bpe_tokens", n_bpe)
    return out


def quality_score(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Deterministic quality score in [0,1]: rewards mid-length docs with
    punctuation and stopwords (C4/Gopher-style heuristics, integer-exact
    ingredients so the SQL oracle matches bit-for-bit on the components)."""
    t = text_stats(batch, text_col)
    n_chars = t["stat_chars"].to_numpy(zero_copy_only=False).astype("float64")
    n_words = t["stat_words"].to_numpy(zero_copy_only=False).astype("float64")
    n_punct = t["stat_punct"].to_numpy(zero_copy_only=False).astype("float64")
    n_stop = t["stat_stop"].to_numpy(zero_copy_only=False).astype("float64")
    w = np.maximum(n_words, 1.0)
    score = (
        np.minimum(n_chars / 500.0, 1.0) * 0.4
        + np.minimum(n_stop / w * 5.0, 1.0) * 0.3
        + np.minimum(n_punct / w * 10.0, 1.0) * 0.3
    )
    return t.append_column("quality", pa.array(score, pa.float64()))


class LangId:
    """Stopword-profile language ID as an actor-pool stage: per-language
    ``\\b(w1|w2|...)\\b`` regexes compiled once per actor in ``__init__``,
    counted with the RE2 ``count_substring_regex`` kernel (vectorized).

    Closed-form and SQL-expressible by design: prediction = language with the
    highest stopword-match count over the lowered text, ties broken by
    alphabetical language order, 'unk' when no profile matches — the DuckDB
    oracle recomputes the identical argmax with ``regexp_extract_all``."""

    PROFILES = {
        "en": {"the", "and", "of", "to", "in", "is", "you", "that", "it", "for"},
        "de": {"der", "die", "und", "das", "ist", "nicht", "ich", "ein", "zu", "mit"},
        "fr": {"le", "la", "et", "les", "des", "est", "pas", "une", "pour", "que"},
        "es": {"el", "la", "de", "que", "y", "los", "una", "por", "con", "para"},
        "it": {"il", "la", "di", "che", "e", "un", "per", "una", "non", "sono"},
    }

    def __init__(self):
        self.langs = sorted(self.PROFILES)
        self.patterns = [
            r"\b(" + "|".join(sorted(self.PROFILES[lang])) + r")\b" for lang in self.langs
        ]

    @classmethod
    def oracle_sql(cls) -> str:
        """The DuckDB twin of ``__call__`` — generated from the same profiles
        so engine and oracle can never drift."""
        langs = sorted(cls.PROFILES)
        counts = ",\n           ".join(
            "length(regexp_extract_all(t, '\\b("
            + "|".join(sorted(cls.PROFILES[lang]))
            + ")\\b')) AS s_" + lang
            for lang in langs
        )
        g = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
        arms = "\n            ".join(
            f"WHEN s_{lang} = {g} THEN '{lang}'" for lang in langs
        )
        return f"""
WITH s AS (SELECT doc_id, lower(coalesce(text, '')) AS t FROM documents),
c AS (SELECT doc_id,
           {counts}
      FROM s)
SELECT doc_id,
       CASE WHEN {g} = 0 THEN 'unk'
            {arms}
       END AS lang_pred
FROM c
"""

    def __call__(self, batch: pa.Table) -> pa.Table:
        txt = pc.utf8_lower(pc.fill_null(batch["text"].combine_chunks(), ""))
        scores = np.stack(
            [
                pc.count_substring_regex(txt, p).cast(pa.int64()).to_numpy(zero_copy_only=False)
                for p in self.patterns
            ]
        )  # (L, N)
        best = scores.argmax(axis=0)  # first max → alphabetical tie-break (langs sorted)
        hit = scores.max(axis=0) > 0
        pred = np.where(hit, np.array(self.langs, dtype=object)[best], "unk")
        return batch.append_column("lang_pred", pa.array(pred, pa.string()))


#: Replay-identity version of the normalization below. Bump whenever the
#: normalization semantics change (e.g. the Python-re unicode-\s → RE2
#: ASCII-\s swap): streaming runners pin this into their checkpoint manifest
#: so a stale checkpoint fails loudly instead of re-admitting seen docs.
NORM_IMPL = "re2-ascii-ws-v2"


def md5_normalized(texts: pd.Series) -> list[str]:
    """THE oracle normalization (one definition for fingerprint + dedup):
    collapse whitespace, lower, strip, md5 — matches the DuckDB
    ``md5(trim(lower(regexp_replace(text,'\\s+',' ','g'))))`` twin exactly.

    Normalization runs on pyarrow's RE2 kernels — the SAME engine DuckDB
    uses, so ``\\s`` semantics match by construction (Python ``re`` would
    also match unicode whitespace the oracle does not), and it is ~10×
    faster than the pandas str path it replaced. Only the md5 itself is a
    Python loop (hashlib has no batch API; ~1M short digests/s/core)."""
    arr = pa.array(texts.fillna(""), pa.string())
    norm = pc.utf8_trim(
        pc.utf8_lower(pc.replace_substring_regex(arr, r"\s+", " ")), " "
    )
    return [hashlib.md5(s.encode()).hexdigest() for s in norm.to_pylist()]


def fingerprint(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Whitespace-normalized md5 content fingerprint (see ``md5_normalized``)."""
    batch = batch.copy()
    batch["fp"] = md5_normalized(batch[text_col])
    return batch


def rolling_fingerprint(batch: pd.DataFrame, text_col: str = "text", k: int = 8) -> pd.DataFrame:
    """Winnowing-style fingerprint: min of Rabin-Karp rolling hashes over
    ``k``-grams of words — robust to local edits (Schleimer et al. winnowing).
    Vectorized with numpy over the token hash sequence per doc."""
    out_fp = np.zeros(len(batch), dtype=np.uint64)
    texts = batch[text_col].fillna("").str.lower().str.split()
    B = np.uint64(1000003)
    for i, words in enumerate(texts):
        if not words:
            continue
        h = np.frombuffer(
            b"".join(hashlib.md5(w.encode()).digest()[:8] for w in words), dtype=np.uint64
        ).copy()
        if len(h) >= k:
            # rolling window min over k-gram combined hashes
            acc = h[: len(h) - k + 1].copy()
            for j in range(1, k):
                acc = acc * B + h[j : len(h) - k + 1 + j]
            out_fp[i] = acc.min()
        else:
            acc = h[0]
            for j in range(1, len(h)):
                acc = acc * B + h[j]
            out_fp[i] = acc
    batch = batch.copy()
    batch["rolling_fp"] = out_fp.astype("int64")  # arrow-friendly
    return batch


def token_count_ds(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    return ds.map_batches(lambda b: text_stats(b, text_col), batch_format="pyarrow")
