"""Document-table text analysis operators (language-ID, quality, token
stats, fingerprints) — thin DataFrame wrappers over the pure column
expressions in functions.textfns. All narrow projections: zero shuffles,
fully codegen'd, linear scans at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import textfns


def text_stats(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Per-doc token/char counts + ratios."""
    return df.select(
        F.col(id_col),
        textfns.char_count(text_col).alias("n_chars"),
        textfns.token_count(text_col).alias("n_tokens"),
        textfns.bpe_token_count(text_col).alias("n_bpe_tokens"),
        F.round(textfns.mean_token_length(text_col), 6).alias("mean_token_len"),
        F.round(textfns.punct_ratio(text_col), 6).alias("punct_ratio"),
        F.round(textfns.stopword_ratio(text_col), 6).alias("stopword_ratio"),
    )


def quality_scores(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    return df.select(
        F.col(id_col),
        F.round(textfns.quality_score(text_col), 6).alias("quality"),
    )


def detect_languages(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    return df.select(
        F.col(id_col),
        textfns.detect_language(text_col).alias("detected_lang"),
    )


def fingerprints(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    return df.select(
        F.col(id_col),
        textfns.fingerprint(text_col).alias("fingerprint"),
        textfns.portable_hash60(textfns.normalize_text(text_col)).alias("hash60"),
    )
