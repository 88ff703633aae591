"""Z-order data layout (X43): multi-dimensional clustering for scan
pruning — the table-layout lever that makes selective scans cheap at
100 TB.

A table physically sorted on ONE column gives parquet tight min/max
file statistics on that column only: a predicate on any OTHER column
prunes nothing and the scan reads everything. Interleaving the bits of
two (bounded) key columns onto the Z-order space-filling curve and
range-partitioning the write on that z-value makes every output file
cover a small RECTANGLE of the (x, y) domain — so min/max stats are
tight on BOTH columns and a predicate on either one skips most files
(Morton order; the layout scheme behind Delta/Iceberg OPTIMIZE ZORDER,
re-expressed as plain DataFrame ops + a parquet write).

Scale shape: computing z is scan-stage column arithmetic (bit shifts
inside whole-stage codegen, no UDF); the write is one range shuffle on
z — the same cost as any global sort-write. Pruning then happens at
PLANNING time from footer stats, reading nothing but the matching
files. The curve arithmetic is deterministic integer math, identically
expressible in ANSI SQL — q134 hash-gates it against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["zvalue", "zvalue_n", "with_zorder", "zorder_write",
           "file_extents"]


def zvalue_n(cols: list[Column], bits: int = 16) -> Column:
    """n-column Morton/Z-order value: bit b of ``cols[i]`` lands at
    position n·b + i, so z-adjacent rows are hyperrectangle-adjacent
    in the n-dimensional key space. Caller contract: every input in
    [0, 2^bits) (mask with ``pmod`` first; q134/q135 do).
    n·bits ≤ 62 keeps the result a positive BIGINT. Pure column
    arithmetic — unrolled shifts/adds inside whole-stage codegen, no
    UDF; at the default 2×16 that is 32 add terms, well inside
    codegen's expression budget."""
    n = len(cols)
    if n < 2:
        raise ValueError(f"zvalue_n needs >= 2 key columns, got {n}")
    if not 0 < bits or n * bits > 62:
        raise ValueError(
            f"n*bits must be in (0, 62] to stay a positive BIGINT, "
            f"got {n}*{bits}")
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        cl = c.cast("long")
        for b in range(bits):
            z = z + F.shiftleft(
                F.shiftright(cl, b).bitwiseAND(F.lit(1)), n * b + i)
    return z


def zvalue(x: Column, y: Column, bits: int = 16) -> Column:
    """The two-column Morton value (bit b of ``x`` at 2b, of ``y`` at
    2b+1) — ``zvalue_n`` at n = 2, kept as the named common case."""
    return zvalue_n([x, y], bits=bits)


def with_zorder(df: DataFrame, x_col: str, y_col: str,
                bits: int = 16, n_buckets: int = 16) -> DataFrame:
    """Adds ``z_value`` (the Morton value of the two masked keys) and
    ``z_bucket`` (its top ⌈log2 n_buckets⌉ bits — a fixed-width range
    bucketing of the curve, deterministic on any engine, unlike
    ntile/percentile buckets which depend on the data distribution).
    ``n_buckets`` must be a power of two for the bit-shift bucketing to
    be exact."""
    nb = int(n_buckets)
    if nb <= 0 or nb & (nb - 1):
        raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
    shift = 2 * bits - nb.bit_length() + 1
    if shift < 0:
        # Java shift counts are masked mod 64, so a negative shift
        # would silently collapse every row into bucket 0 instead of
        # erroring (review catch)
        raise ValueError(
            f"n_buckets={n_buckets} exceeds the curve's 4^bits="
            f"{4 ** bits} cells at bits={bits}")
    x = F.pmod(F.col(x_col).cast("long"), F.lit(1 << bits))
    y = F.pmod(F.col(y_col).cast("long"), F.lit(1 << bits))
    z = zvalue(x, y, bits)
    return df.withColumn("z_value", z).withColumn(
        "z_bucket", F.shiftright(F.col("z_value"), shift))


def zorder_write(df: DataFrame, path: str, x_col: str, y_col: str,
                 bits: int = 16, n_files: int = 16,
                 mode: str = "overwrite") -> None:
    """Write ``df`` parquet in Z-order layout: range-repartition on the
    Morton value of (x_col, y_col), sort within partitions, drop the
    helper column. Every output file then covers a contiguous z-range —
    a small rectangle of the (x, y) domain — so parquet footer min/max
    stats are tight on BOTH columns and a selective predicate on either
    prunes most files at planning time (``file_extents`` measures this
    directly; the tests assert it).

    Keys are DOMAIN-NORMALIZED first — affinely scaled onto the full
    [0, 2^bits) range from one tiny min/max aggregate. Interleaving
    only balances the two dimensions when both use the SAME bit width
    at the top: a key with constant high bits (epoch-hours, offset
    ids) or a narrower domain (an 8-bit id against a 12-bit hour)
    would otherwise contribute nothing to the top interleaved bits and
    the layout degrades toward a single-column sort on the wider key —
    both failure modes measured while building the test
    (min-shift-only left zx ≈ 0.94: a y-sort in disguise).
    Rank-normalization would be stronger still on skewed distributions
    but costs a global sort per key; the affine scale fixes
    offset/width imbalance for one cheap agg.

    One range shuffle (sampling + exchange — the cost of any global
    sort-write). At 100 TB run it per partition/day, not globally:
    layout is a per-partition property."""
    mm = df.agg(F.count(F.lit(1)).alias("n"),
                F.min(x_col).alias("nx"), F.max(x_col).alias("xx"),
                F.min(y_col).alias("ny"), F.max(y_col).alias("xy")).head()
    if mm["n"] == 0:
        # empty input: write an empty directory with the right schema
        # instead of int(None)-crashing — a per-day layout job must
        # survive an empty partition (review catch)
        df.write.mode(mode).parquet(path)
        return
    if mm["nx"] is None or mm["ny"] is None:
        raise ValueError(
            f"zorder_write keys must be non-null: min({x_col})="
            f"{mm['nx']}, min({y_col})={mm['ny']} over {mm['n']} rows")
    top = (1 << bits) - 1

    def _scaled(col, lo, hi):
        # divide FIRST, in double: (v − lo)/span ∈ [0, 1] never
        # overflows for any domain width (multiplying a raw
        # epoch-microsecond span by 65535 in long arithmetic would);
        # × top then floor lands in [0, top]. Bucket boundaries are a
        # LAYOUT choice, not a gated value, so double rounding at the
        # 2⁻⁵³ scale is immaterial here — the gated curve arithmetic
        # (q134) masks with pmod and never scales.
        span = max(int(hi) - int(lo), 1)
        frac = (col.cast("double") - F.lit(float(lo))) / F.lit(float(span))
        return F.floor(frac * F.lit(float(top))).cast("long")

    shifted = df.withColumn(
        "__zx", _scaled(F.col(x_col), mm["nx"], mm["xx"])
    ).withColumn(
        "__zy", _scaled(F.col(y_col), mm["ny"], mm["xy"]))
    tagged = with_zorder(shifted, "__zx", "__zy", bits=bits, n_buckets=2)
    (tagged.repartitionByRange(n_files, "z_value")
     .sortWithinPartitions("z_value")
     .drop("z_value", "z_bucket", "__zx", "__zy")
     .write.mode(mode).parquet(path))


def file_extents(spark: SparkSession, path: str, cols: list[str]) -> DataFrame:
    """Per-FILE min/max of ``cols`` for a parquet directory — the
    data-skipping potential made measurable: a reader prunes a file for
    predicate ``c = v`` iff v falls outside that file's [min, max], so
    Σ(extent widths) / (n_files · domain width) is the expected
    fraction of files a random point-predicate must read. One scan,
    grouped by ``input_file_name()``."""
    df = spark.read.parquet(path)
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return (df.groupBy(F.input_file_name().alias("file"))
            .agg(F.count(F.lit(1)).alias("n_rows"), *aggs))
