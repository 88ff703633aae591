"""Feature-hashing ("hashing trick") document embedder — a cheap,
vocabulary-free embedding the large-scale tier uses when a neural
embedder is too expensive to run over the whole corpus: each token is
hashed into one of ``dim`` buckets with a hash-derived ±1 sign
(Weinberger et al., "Feature Hashing for Large Scale Multitask
Learning", ICML'09), giving a sparse signed-count vector whose cosine
geometry approximates token-profile similarity.

Why it earns a place next to the ANN tier: it is ENTIRELY JVM-side —
explode → hash → two doc-keyed aggregates, zero Python, zero UDFs, so
it runs at scan-shuffle speed over 100 TB while producing vectors the
existing cosine/IVF/LSH operators (similarity.py) and int8 quantizer
(quantize.py) consume directly.

Determinism (cross-engine exact): bucket weights are INTEGER sums of
±1 (order-free), the L2 norm is sqrt of an integer-valued double
(IEEE sqrt is correctly rounded, hence exact), and the final division
is one exact IEEE op — so Spark and the SQL oracle produce
bit-identical doubles with no rounding fudge (registry q118).

Output is the SPARSE form (id, bucket, weight) with zero-sum buckets
dropped — the natural shuffle-friendly representation at corpus scale;
``to_dense`` assembles array<double> vectors when a consumer needs
them (broadcast-sized batches only — a 100 TB corpus stays sparse).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import textfns


def hashing_embed_sparse(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", dim: int = 64,
                         normalize: bool = True) -> DataFrame:
    """(id_col, bucket, weight) sparse hashing-trick embedding rows.

    bucket = hash60(token) mod dim; sign = ±1 from the next hash bit
    (integer DIV, not float division — a double quotient of a 60-bit
    hash would lose the low bits that carry the sign). Zero-sum
    buckets are dropped (they carry no geometry and would bloat the
    sparse form). With ``normalize`` the weights are L2-normalized per
    document so dot products ARE cosines.

    Plan shape: one shuffle for the (id, bucket) partial-aggregated
    sum, one doc-keyed exchange for the norm window — both move only
    aggregated rows (≤ dim per doc), never token rows."""
    if dim <= 0:
        raise ValueError(f"dim must be positive, got {dim}")
    toks = (df.select(id_col,
                      F.explode(F.split(F.lower(F.col(text_col)), " "))
                      .alias("__tok"))
            .where(F.col("__tok") != ""))
    hashed = toks.withColumn("__h", textfns.portable_hash60("__tok"))
    # sign from the hash bits ABOVE the bucket bits, via integer DIV —
    # a double quotient of a 60-bit hash would lose exactly those bits
    signed = hashed.select(
        id_col,
        F.pmod(F.col("__h"), F.lit(dim)).alias("bucket"),
        F.when(F.pmod(F.expr(f"__h DIV {dim}"), F.lit(2)) == 0,
               F.lit(1)).otherwise(F.lit(-1)).alias("__sign"),
    )
    sums = (signed.groupBy(id_col, "bucket")
            .agg(F.sum("__sign").alias("__w"))
            .where(F.col("__w") != 0))
    if not normalize:
        return sums.select(id_col, "bucket",
                           F.col("__w").cast("double").alias("weight"))
    w = Window.partitionBy(id_col)
    return (sums.withColumn(
        "__nrm",
        F.sqrt(F.sum(F.col("__w").cast("double") * F.col("__w")).over(w)))
        .select(id_col, "bucket",
                (F.col("__w") / F.col("__nrm")).alias("weight")))


def to_dense(sparse: DataFrame, id_col: str = "doc_id",
             dim: int = 64) -> DataFrame:
    """Assemble (id_col, embedding array<double>) from the sparse form —
    for handing to the ANN/quantization tier. One doc-keyed aggregate;
    missing buckets are 0.0. Meant for bounded batches (a query set, a
    shard) — corpus-scale similarity should consume the sparse form."""
    entries = sparse.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct("bucket", "weight"))).alias("__m"))
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    return entries.select(
        id_col,
        F.transform(idx, lambda i: F.coalesce(
            F.element_at("__m", i.cast("long")), F.lit(0.0)))
        .alias("embedding"))
