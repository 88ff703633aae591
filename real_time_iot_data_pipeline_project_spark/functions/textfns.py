"""Text-analysis column expressions for the training-data pipeline
(BASELINE.json north-star: language-ID, quality scoring, token counting,
document fingerprinting).

Everything is a pure Column expression (codegen'd, no Python in the hot
path) and deliberately portable to ANSI SQL so every operator has a
DuckDB oracle.

Portable 60-bit hash: ``bigint(first 15 hex chars of md5(s))`` — the same
value is computable in DuckDB as ``('0x' || substr(md5(s),1,15))::BIGINT``,
which makes MinHash/SimHash signatures oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .physics import ColumnOrName, _c

# Tiny per-language stopword lists for the n-gram/stopword language
# heuristic. Deliberately small & embedded: at scale these ship inside the
# closure, no join needed.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "fr": ["le", "la", "de", "et", "un", "que", "est", "pour", "dans", "ce"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "zu"],
}

ENGLISH_STOPWORDS = LANG_STOPWORDS["en"]

# BPE-ish token regex: runs of letters, runs of digits, or single
# punctuation — a cheap stand-in for subword tokenization.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

PUNCT_RE = "[!-/:-@\\[-`{-~]"


def portable_hash60(s: ColumnOrName) -> Column:
    """Deterministic 60-bit hash portable between Spark and DuckDB."""
    return F.conv(F.substring(F.md5(_c(s)), 1, 15), 16, 10).cast("long")


def normalize_text(text: ColumnOrName) -> Column:
    """Whitespace-collapse + lowercase + trim — canonical form for
    fingerprinting and shingling."""
    return F.lower(F.trim(F.regexp_replace(_c(text), "\\s+", " ")))


def fingerprint(text: ColumnOrName) -> Column:
    """Document fingerprint: md5 of the normalized text (exact-dup key)."""
    return F.md5(normalize_text(text))


def whitespace_tokens(text: ColumnOrName) -> Column:
    """Whitespace tokenization of normalized text (no empty tokens)."""
    return F.split(normalize_text(text), " ")


def token_count(text: ColumnOrName) -> Column:
    """Whitespace token count."""
    return F.size(whitespace_tokens(text))


def bpe_token_count(text: ColumnOrName) -> Column:
    """BPE-ish regex token count (letters-run / digits-run / punct)."""
    return F.regexp_count(_c(text), F.lit(BPE_TOKEN_RE))


def char_count(text: ColumnOrName) -> Column:
    return F.length(_c(text))


def punct_ratio(text: ColumnOrName) -> Column:
    """Punctuation chars / total chars (0 for empty)."""
    n = F.length(_c(text))
    p = F.length(F.regexp_replace(_c(text), f"[^{PUNCT_RE[1:-1]}]", ""))
    return F.when(n > 0, p.cast("double") / n).otherwise(F.lit(0.0))


def stopword_ratio(text: ColumnOrName, stopwords: list[str] | None = None) -> Column:
    """Fraction of whitespace tokens that are stopwords."""
    sw = stopwords or ENGLISH_STOPWORDS
    toks = whitespace_tokens(text)
    sw_arr = F.array(*[F.lit(w) for w in sw])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw_arr, t)))
    n = F.size(toks)
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


def mean_token_length(text: ColumnOrName) -> Column:
    toks = whitespace_tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    n = F.size(toks)
    return F.when(n > 0, total.cast("double") / n).otherwise(F.lit(0.0))


def quality_score(text: ColumnOrName) -> Column:
    """Composite document quality in [0,1]: rewards moderate length,
    low punctuation density, presence of stopwords (prose-likeness),
    sane mean token length. Weights are arbitrary but fixed — the point
    is a deterministic, filterable score."""
    n_tok = token_count(text).cast("double")
    length_score = F.least(F.lit(1.0), n_tok / 100.0)
    punct_score = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(text) * 5.0)
    stop_score = F.least(F.lit(1.0), stopword_ratio(text) * 5.0)
    mtl = mean_token_length(text)
    token_len_score = F.when((mtl >= 3.0) & (mtl <= 10.0), 1.0).otherwise(0.5)
    return (
        length_score * 0.3 + punct_score * 0.3 + stop_score * 0.2
        + token_len_score * 0.2
    )


def language_scores(text: ColumnOrName) -> dict[str, Column]:
    """Per-language stopword hit ratio (the classic cheap lang-ID)."""
    toks = whitespace_tokens(text)
    n = F.size(toks)
    out = {}
    for lang, words in LANG_STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        out[lang] = F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))
    return out


def detect_language(text: ColumnOrName, min_score: float = 0.0) -> Column:
    """Argmax language by stopword ratio; ``und`` (undetermined) when all
    scores ≤ min_score. Deterministic tie-break: language name order."""
    scores = language_scores(text)
    best_score = F.greatest(*scores.values())
    pick = None
    for lang in sorted(LANG_STOPWORDS):  # alpha order → deterministic ties
        cond = scores[lang] == best_score
        pick = F.when(cond, lang) if pick is None else pick.when(cond, lang)
    return F.when(best_score > min_score, pick).otherwise(F.lit("und"))

# --- PII detection / redaction -------------------------------------------
# Regex subset chosen to parse identically under Java regex (Spark) and
# RE2 (DuckDB): character classes, bounded repetition, \b, \d only — no
# lookaround, no backrefs.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "\\b\\d{3}-\\d{3}-\\d{4}\\b"


def pii_counts(text: ColumnOrName) -> tuple[Column, Column]:
    """(n_emails, n_phones) match counts — the PII audit signal."""
    return (
        F.regexp_count(_c(text), F.lit(EMAIL_RE)),
        F.regexp_count(_c(text), F.lit(PHONE_RE)),
    )


def redact_pii(text: ColumnOrName) -> Column:
    """Replace every email / phone match with a typed placeholder token.

    Pure JVM regexp_replace (global) — stays inside whole-stage codegen;
    the standard pre-training scrub pass. Email runs first so a phone
    embedded in a local-part can't be double-redacted."""
    scrubbed = F.regexp_replace(_c(text), EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(scrubbed, PHONE_RE, "<PHONE>")


def lang_confidence(text: ColumnOrName) -> Column:
    """Language-ID confidence: margin between the best and second-best
    language scores (CCNet-style keep/review signal — a doc whose top
    two languages score alike is code-mixed or too short to trust).
    Pure Column arithmetic over the same scores detect_language uses."""
    scores = language_scores(text)
    ordered = F.sort_array(
        F.array(*[scores[k] for k in sorted(scores)]), asc=False
    )
    return ordered[0] - ordered[1]
