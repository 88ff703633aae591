"""Batch model-inference boundary: score rows with a Python model
(quality / toxicity / reward classifier) without paying per-row model
cost — the curation stage every LLM data pipeline runs between
heuristic filtering and training.

The three things a 100 TB inference stage must get right, encoded here
rather than left to each caller:

1. **Model init once per TASK, never per row/batch.** ``make_scorer``
   (the expensive load: weights off disk, session build, GPU context)
   is called exactly once inside each ``mapInPandas`` task and closed
   over by the batch loop. A lambda applied per row re-loads the model
   millions of times; per-Arrow-batch init still re-loads it every
   ~10k rows.
2. **Bounded inference batches.** Arrow hands the task potentially
   large pandas chunks; the scorer is fed slices of ``batch_size``
   rows so peak memory (GPU or RAM) is bounded by the CALLER's model
   knowledge, not by ``spark.sql.execution.arrow.maxRecordsPerBatch``.
3. **Scan-stage placement.** The boundary is a ``mapInPandas`` over
   the projected input columns only — no shuffle, pipelined with the
   parquet scan; column pruning still reaches the scan because the
   projection happens before the Python boundary.

The model itself is deliberately pluggable: heavyweight frameworks are
absent in this environment, so ``default_quality_scorer`` is a
deterministic closed-form model (softsign over text statistics — pure
IEEE +,*,/ so Spark and any SQL engine produce bit-identical doubles;
no transcendentals whose libm rounding could differ). The PLUMBING —
task-level init, slicing, schema handling, null contract — is the
production path; swapping in a real classifier is replacing
``make_scorer``.

Null contract: rows whose every input column is null get a null score
(SQL-style propagation); the scorer itself never sees them.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# softsign "model" weights: bias, punct_ratio, stopword_ratio,
# capped-length feature (min(n_chars, 2000)/2000)
DEFAULT_WEIGHTS = (0.25, -2.0, 1.5, 0.5)


def default_quality_scorer() -> Callable[[pd.DataFrame], pd.Series]:
    """A deterministic stand-in classifier over the ``text`` column:
    z = w0 + w1*punct_ratio + w2*stopword_ratio + w3*len_feature,
    score = z / (1 + |z|) (softsign — bounded (-1, 1), exact IEEE ops).
    Feature extraction mirrors functions/textfns semantics closely
    enough to be SQL-expressible, which is what lets registry q117
    hash-check the whole boundary cross-engine.

    Fully VECTORIZED (pandas str ops + numpy arithmetic): the default
    model is what users copy, so it models Arrow-batch-friendly scoring
    instead of a per-row Python loop. Every feature is an integer count
    divided by an integer count, so the vectorized path is bit-identical
    to the per-row formulation (same ints → same IEEE doubles):

    - punct count  = non-overlapping matches of the 1-char punct class
      (== len(findall) of the same class per row),
    - token count  = len(split(' ')) (single-space split, '' → ['']),
    - stopword count = matches of ``(?:^| )<stop>(?= |\\Z)`` on the
      lowered text — each match is exactly a single-space-delimited
      token equal to a stopword: the match consumes the token's LEFT
      boundary only (lookahead right boundary), and a token's left
      space is never consumed by the previous match, so consecutive
      stopword tokens all count (== the split-membership count).
      ``\\Z`` (absolute end), NOT ``$``: ``$`` also matches before a
      trailing newline, which would count ``'...the\\n'`` as a
      stopword token that split(' ') membership does not.
    """
    from ..functions.textfns import PUNCT_RE

    w0, w1, w2, w3 = DEFAULT_WEIGHTS
    punct_pat = PUNCT_RE   # the ONE shared punctuation class
    stop = ("the", "a", "of", "and", "to", "in", "is", "that", "it",
            "for")
    stop_pat = r"(?:^| )(?:" + "|".join(stop) + r")(?= |\Z)"

    def score(pdf: pd.DataFrame) -> pd.Series:
        import numpy as np

        s = pdf["text"]
        n_chars = s.str.len().to_numpy(dtype="int64")
        n_punct = s.str.count(punct_pat).to_numpy(dtype="int64")
        low = s.str.lower()
        n_tok = (low.str.count(" ") + 1).to_numpy(dtype="int64")
        n_stop = low.str.count(stop_pat).to_numpy(dtype="int64")
        with np.errstate(divide="ignore", invalid="ignore"):
            pr = np.where(n_chars > 0, n_punct / n_chars, 0.0)
            sr = np.where(n_tok > 0, n_stop / n_tok, 0.0)
        lf = np.minimum(n_chars, 2000) / 2000.0
        z = w0 + w1 * pr + w2 * sr + w3 * lf
        return pd.Series(z / (1.0 + np.abs(z)), index=pdf.index,
                         dtype="float64")

    return score


def batch_score(df: DataFrame, make_scorer: Callable[[], Callable],
                *, input_cols: list[str], score_col: str = "score",
                batch_size: int = 1024) -> DataFrame:
    """Append ``score_col`` (double) to ``df`` by running
    ``scorer = make_scorer()`` once per task and
    ``scorer(pandas.DataFrame[input_cols]) -> Series[float]`` over
    ``batch_size``-row slices (see module doc for why each piece is
    shaped this way). Rows with ALL input columns null get a null
    score. Raises ValueError up front on empty/unknown input_cols or a
    non-positive batch_size."""
    if not input_cols:
        raise ValueError("input_cols must name at least one column")
    missing = [c for c in input_cols if c not in df.columns]
    if missing:
        raise ValueError(f"input_cols not in DataFrame: {missing}")
    if batch_size <= 0:
        raise ValueError(f"batch_size must be positive, got {batch_size}")
    if score_col in df.columns:
        raise ValueError(f"score_col {score_col!r} already exists")

    out_schema = T.StructType(
        df.schema.fields + [T.StructField(score_col, T.DoubleType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        scorer = make_scorer()   # ONCE per task — the expensive init
        for pdf in batches:
            scores = pd.Series(float("nan"), index=pdf.index,
                               dtype="float64")
            feed = pdf[input_cols]
            valid = ~feed.isna().all(axis=1)
            vidx = pdf.index[valid]
            for lo in range(0, len(vidx), batch_size):
                sl = vidx[lo:lo + batch_size]
                out = scorer(feed.loc[sl])
                # POSITIONAL semantics: accept Series/ndarray/list and
                # bind by position, so a scorer that reset its Series
                # index cannot silently misalign via .loc label match
                vals = np.asarray(out, dtype="float64")
                if vals.shape != (len(sl),):
                    raise ValueError(
                        f"scorer returned shape {vals.shape} for a "
                        f"{len(sl)}-row slice — must return one float "
                        "per input row")
                scores.loc[sl] = vals
            res = pdf.copy()
            # NaN marks the all-null rows -> Arrow null double (note a
            # scorer RETURNING NaN also surfaces as SQL null)
            res[score_col] = scores.where(valid, other=None)
            yield res

    return df.mapInPandas(run, schema=out_schema)
