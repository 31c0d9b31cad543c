"""Text-analysis column expressions for training-data pipelines — all
JVM-side (whole-stage-codegen'd), no Python in the hot path.

Used by plans/queries.py (oracle-checked) and composable on any text column:
language-ID (stopword-family voting), quality scoring (length / punctuation
/ stopword ratios), token counting (whitespace + BPE-ish word-piece regex),
and rolling-hash document fingerprints.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# small stopword families per language for the n-gram/stopword-voting
# language-ID heuristic (deterministic, no model)
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "a", "is", "that"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr": ("le", "la", "de", "et", "les", "des", "en", "un"),
    "de": ("der", "die", "und", "das", "von", "zu", "mit", "ist"),
}


def tokens(col: str | Column = "text") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, r"\s+")


def token_count(col: str | Column = "text") -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def wordpiece_count(col: str | Column = "text") -> Column:
    """BPE-ish sub-word unit count: alpha runs ≤4 chars count 1, longer
    runs count ceil(len/4); digits/punct count 1 each. A deterministic
    stand-in for a tokenizer's token count, implemented as JVM regex ops."""
    c = F.col(col) if isinstance(col, str) else col
    alpha_chars = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    non_alpha = F.length(F.regexp_replace(c, r"[A-Za-z\s]", ""))
    words = F.size(F.split(c, r"\s+"))
    # approx: every word costs ≥1, plus one extra unit per 4 alpha chars
    return (words + (alpha_chars / F.lit(4)).cast("long") + non_alpha).cast("long")


def stopword_ratio(col: str | Column = "text", lang: str = "en") -> Column:
    words = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
    name = col if isinstance(col, str) else "text"
    return F.expr(
        f"size(filter(split({name}, '\\\\s+'), x -> x IN ({words})))"
        f" / CAST(greatest(size(split({name}, '\\\\s+')), 1) AS DOUBLE)"
    )


def punct_ratio(col: str | Column = "text") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    p = F.length(F.regexp_replace(c, r"[^\p{Punct}]", ""))
    return p / F.greatest(F.length(c), F.lit(1)).cast("double")


def quality_score(col: str | Column = "text") -> Column:
    """Composite [0,1] quality heuristic: penalize too-short docs, high
    punctuation, and vanishing stopword ratio (gibberish signal)."""
    c = F.col(col) if isinstance(col, str) else col
    length_ok = F.least(F.length(c) / F.lit(500.0), F.lit(1.0))
    stop = stopword_ratio(col)
    stop_ok = F.least(stop * 4, F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(col) * 5)
    return F.round(length_ok * 0.4 + stop_ok * 0.4 + punct_pen * 0.2, 4)


def lang_id(col: str | Column = "text") -> Column:
    """Stopword-family voting: argmax language by per-family hit count,
    'und' when nothing hits. Pure column expressions (no UDF)."""
    name = col if isinstance(col, str) else "text"
    votes = []
    for lang, words in LANG_STOPWORDS.items():
        lst = ", ".join(f"'{w}'" for w in words)
        votes.append(
            F.expr(
                f"size(filter(split(lower({name}), '\\\\s+'), x -> x IN ({lst})))"
            ).alias(f"v_{lang}")
        )
    s = F.struct(*votes)
    best = F.greatest(*[s[f"v_{lang}"] for lang in LANG_STOPWORDS])
    out = F.lit("und")
    for lang in reversed(list(LANG_STOPWORDS)):
        out = F.when((s[f"v_{lang}"] == best) & (best > 0), F.lit(lang)).otherwise(out)
    return out


def fingerprint(col: str | Column = "text", prefix_tokens: int = 8) -> Column:
    """Prefix rolling fingerprint: md5 of the first N tokens — the cheap
    near-dup blocking key (full MinHash lives in operators/dedup.py)."""
    return F.md5(F.concat_ws(" ", F.slice(tokens(col), 1, prefix_tokens)))
