"""Sequence packing: greedy bin-packing of documents into fixed
token-capacity training sequences.

LLM pretraining wants every sample to be exactly ``capacity`` tokens;
packing short documents back-to-back (instead of padding each to the
context length) is the standard throughput win. The greedy first-fit
rule here is the deterministic sequential one: walk the shard's docs in
``(order_col)`` order, keep a running fill, open a new bin whenever the
next doc would overflow. A doc longer than the capacity gets a bin of
its own (truncation is the trainer's call, not the packer's).

Why ``applyInPandas``: the running-fill recurrence is inherently
sequential *within a shard* — ``bin_id(i)`` depends on every prior doc —
so it cannot be a window function (no closed form) and must not be a
global sort. The scale answer is the shard: packing is embarrassingly
parallel ACROSS shards, so we hash-shard the corpus first
(``sampling.shard_assign``), then run the sequential rule per shard as
one Arrow-batched pandas group. At 100 TB with ~1M shards the shuffle is
uniform (md5 buckets) and each group is a few thousand rows — the same
shape as the EWMA state op (operators/ewma.py). This is the sanctioned
Arrow boundary of SURVEY.md §2.11.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pack_sequences(
    df: DataFrame,
    tokens_col: str,
    capacity: int,
    shard_col: str = "shard",
    order_col: str = "doc_id",
) -> DataFrame:
    """Assign each row a ``bin_id`` (per-shard greedy sequential packing).

    Output schema: (shard_col, order_col, tokens_col, bin_id). Bins are
    numbered 0.. per shard in first-open order; ``sum(tokens)`` within a
    bin never exceeds ``capacity`` unless the bin holds a single
    over-long doc.

    ``order_col`` must be unique within each shard: it is the walk order
    of the sequential rule, so ties would make bin assignment depend on
    the incoming row order (non-deterministic under shuffle). The
    default (doc_id under a hash shard) is unique by construction.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    slim = df.select(shard_col, order_col, tokens_col)
    # StructType built programmatically (not a DDL string) so column
    # names containing spaces/hyphens/reserved words survive.
    schema = T.StructType(
        [slim.schema[shard_col], slim.schema[order_col],
         slim.schema[tokens_col],
         T.StructField("bin_id", T.LongType(), nullable=False)]
    )
    cap = int(capacity)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        bins = []
        bin_id, fill = 0, 0
        first = True
        for n in pdf[tokens_col]:
            n = int(n)
            if first:
                fill = n
                first = False
            elif fill + n > cap:
                bin_id += 1
                fill = n
            else:
                fill += n
            bins.append(bin_id)
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        return pdf

    return slim.groupBy(shard_col).applyInPandas(pack, schema=schema)


def packing_stats(packed: DataFrame, tokens_col: str, capacity: int,
                  shard_col: str = "shard") -> DataFrame:
    """Per-bin fill report: docs per bin, token fill, fill ratio —
    the packing-efficiency audit (one combinable grouped agg)."""
    return (
        packed.groupBy(shard_col, "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(tokens_col).alias("fill_tokens"),
        )
        .withColumn(
            "fill_ratio",
            F.round(F.col("fill_tokens").cast("double") / F.lit(float(capacity)), 6),
        )
    )


def split_documents(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                    window_tokens: int = 64, stride: int = 48):
    """Split long documents into stride-overlapped context windows — the
    long-doc complement to pack_sequences (short docs pack, long docs
    split): window i covers tokens [i*stride, i*stride + window_tokens);
    stride < window overlaps consecutive windows so no span is lost at a
    boundary. Window count = 1 if n <= window else ceil((n-window)/stride)+1
    (the last window always reaches the final token).

    Pure map-side array transform + explode — no UDF, no shuffle; output
    is (id, win_idx, n_win_tokens, window_fp=md5(window text)).

    Empty / whitespace-only documents produce ZERO windows (they are
    filtered before the transform): without the filter, split('', ' ')
    is [''] and a degenerate doc would emit one empty window counted as
    1 token, inflating token budgets."""
    from ..functions import textfns

    win, st = int(window_tokens), int(stride)
    if st <= 0 or st > win:
        raise ValueError(f"need 0 < stride <= window_tokens, got {st} > {win}")
    df = df.filter(F.length(textfns.normalize_text(text_col)) > 0)
    # tokens materialized once per row before the window lambda (the
    # q177 quadratic-retokenization catch — optimization round 15)
    base = df.select(F.col(id_col),
                     textfns.whitespace_tokens(text_col).alias("__toks"))
    toks = F.col("__toks")
    n = F.size(toks)
    n_win = (
        F.when(n <= win, F.lit(1).cast("long"))
        .otherwise(F.ceil((n - win) / F.lit(float(st))) + 1)
    )
    windows = F.transform(
        F.sequence(F.lit(0).cast("long"), n_win - 1),
        lambda i: F.array_join(F.slice(toks, i * st + 1, win), " "),
    )
    return base.select(
        F.col(id_col), F.posexplode(windows).alias("win_idx", "window_text")
    ).select(
        id_col, "win_idx",
        F.size(F.split("window_text", " ")).alias("n_win_tokens"),
        F.md5("window_text").alias("window_fp"),
    )
