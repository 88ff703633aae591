"""sf1-scale stress harness: replicate the sf0.1 testdata ~10x with
key remapping and run the headline bench against it, so the quadratic-
stage queries (winnowing overlap, LSH pairs) and the iterative CC loop
reveal their constants before a real cluster does.

Replication is NOT naive duplication — that would plant 10 exact copies
of every document and turn every near-dup query quadratic by
construction, measuring an artifact instead of the algorithm:

- fact keys (event_id, doc_id, vec_id, *_orderkey) are offset per
  replica so keys stay unique;
- document text gets a per-replica Caesar rotation of the alphabet
  (``translate`` — a character bijection with period 26, so no two
  replicas coincide), preserving every within-replica
  length/token/shingle statistic while making cross-replica letter
  shingles disjoint, so near-dup structure scales linearly like a real
  corpus (digit/punctuation/whitespace k-grams still collide across
  replicas — the boilerplate-like tail a real corpus also has);
- embeddings are cyclically rotated per replica (norm-preserving,
  different neighbor structure);
- dims (region/nation/customer/supplier/part) are copied unscaled —
  at 100 TB facts grow and dims don't, which also grows per-key join
  fan-out exactly the way production growth does.

Usage:
  python tools/scale_stress.py [out_dir] [factor]      # default /tmp/sfx10, 10
  SPARK_GRAFT_SF_DIR=/tmp/sfx10 python bench.py        # then stress-bench

Writes outside the repo (out_dir); never touches /root/testdata.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from real_time_iot_data_pipeline_project_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
ALPHA = "abcdefghijklmnopqrstuvwxyz"
DIMS = ["region", "nation", "customer", "supplier", "part"]


# multipliers coprime to 26, identity FIRST: replica i's letter map is
# the affine bijection c → a·c + b (mod 26) with a = _AFFINE_A[i // 26],
# b = i % 26 — so i < 26 is exactly the historical Caesar rotation
# harness, byte-for-byte (a = 1), and earlier probe legs stay
# comparable.
_AFFINE_A = [1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25]


def _sub_alpha(i: int) -> str:
    """Replica i's substitution alphabet — wrap-free replica
    differentiation (VERDICT r9 item 5).

    Plain rotation has period 26: the round-9 q128 x100 probe measured
    replicas i and i+26 as IDENTICAL text — every doc gained ~3 exact
    cross-replica twins and the verified-pair count exploded 320× as a
    pure harness artifact.  The first wrap-free attempt (a constant
    base-26 word SUFFIX per replica group) planted the opposite
    artifact: a per-replica constant suffix on EVERY word is a
    systematic shared-shingle pattern BETWEEN different base docs of
    the same replica — something the base corpus doesn't have — and
    the measured x100 LSH candidate count exploded 6× (689M vs 114M)
    instead of shrinking.

    Affine maps have neither problem: all 312 (a, b) maps are distinct
    bijections, so no two replicas coincide at any factor ≤ 312; a
    bijection preserves shingle-equality structure WITHIN a replica
    (each replica's internal similarity mirrors the base corpus
    exactly); and two DISTINCT affine maps agree on at most
    gcd(a₁−a₂, 26) ≤ 13 characters, so same-base cross-replica docs
    share at most the shingles drawn wholly from the agreeing subset —
    ≤ (1/2)⁵ ≈ 3% worst case, usually ~0 — and sit at relative edit
    distance ≥ 1/2 (far above every near-dup threshold the probes
    use).  Text length, token grids and n_chars are untouched."""
    if i >= len(_AFFINE_A) * len(ALPHA):
        raise ValueError(
            f"replica factor too large for the affine family: {i} >= 312")
    a, b = _AFFINE_A[i // len(ALPHA)], i % len(ALPHA)
    return "".join(ALPHA[(a * c + b) % len(ALPHA)] for c in range(len(ALPHA)))
    # (History: the first harness used a Caesar rotation of a 5-letter
    # vowel set — period 5, so replicas i and i+5 came out IDENTICAL,
    # planting exactly the exact-dup artifact this harness exists to
    # avoid; then a full-alphabet rotation, period 26.  The a=1 members
    # of the affine family reproduce that rotation exactly, so the
    # standalone _rot_alpha helper was deleted in round 11.)


def _replicas(df: DataFrame, factor: int, build) -> DataFrame:
    out = build(df, 0)
    for i in range(1, factor):
        out = out.unionByName(build(df, i))
    return out


def scale_table(spark, name: str, factor: int) -> DataFrame:
    df = spark.read.parquet(f"{SRC}/{name}.parquet")
    if name in DIMS:
        return df
    if name == "events":
        off = df.agg(F.max("event_id")).head()[0] + 1
        return _replicas(df, factor, lambda d, i: d.withColumn(
            "event_id", F.col("event_id") + F.lit(i * off)))
    if name == "documents":
        off = df.agg(F.max("doc_id")).head()[0] + 1

        return _replicas(df, factor, lambda d, i: d.select(
            (F.col("doc_id") + F.lit(i * off)).alias("doc_id"),
            F.translate("text", ALPHA + ALPHA.upper(),
                        _sub_alpha(i) + _sub_alpha(i).upper()).alias("text"),
            "lang", "source", "n_chars"))
    if name == "embeddings":
        off = df.agg(F.max("vec_id")).head()[0] + 1
        dim = len(df.select("embedding").head()[0])

        def _vec(i: int) -> F.Column:
            # dimension rotation wraps at dim (= 64): at factor 100,
            # replicas i and i+64 were IDENTICAL vectors — 72k of 200k
            # x100 vectors had an exact cosine-1.0 twin, inflating
            # every ≥τ pair probe (the text harness's wrap artifact,
            # embedding edition). Replicas past the first dim compose
            # the rotation with a per-group ±1 sign mask (md5 parity
            # of (group, dim), group 0 = all +1 so factors ≤ dim
            # reproduce the historical harness byte-for-byte). A
            # diagonal ±1 matrix is orthogonal: within-replica cosine
            # structure is preserved EXACTLY (sign flips cancel in
            # same-replica dot products and ±1·x is exact in floating
            # point), while same-rotation cross-group vectors get
            # independent sign patterns → expected cosine ~0, no
            # manufactured near-dup pairs.
            r = i % dim
            rotated = F.expr(
                f"concat(slice(embedding, {r + 1}, {dim - r}),"
                f" slice(embedding, 1, {r}))")
            g = i // dim
            if not g:
                return rotated
            import hashlib

            signs = F.array(*[
                F.lit(1.0 if hashlib.md5(
                    f"{g}|{d}".encode()).digest()[0] % 2 == 0 else -1.0)
                for d in range(dim)])
            return F.zip_with(rotated, signs,
                              lambda x, s: (x * s).cast("float"))

        return _replicas(df, factor, lambda d, i: d.select(
            (F.col("vec_id") + F.lit(i * off)).alias("vec_id"),
            _vec(i).alias("embedding"),
            "label"))
    if name in ("orders", "lineitem"):
        key = "o_orderkey" if name == "orders" else "l_orderkey"
        off = (spark.read.parquet(f"{SRC}/orders.parquet")
               .agg(F.max("o_orderkey")).head()[0] + 1)
        return _replicas(df, factor, lambda d, i: d.withColumn(
            key, F.col(key) + F.lit(i * off)))
    raise ValueError(name)


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfx10"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app_name="scale-stress")
    spark.sparkContext.setLogLevel("ERROR")
    tables = DIMS + ["orders", "lineitem", "events", "documents", "embeddings"]
    for t in tables:
        scaled = scale_table(spark, t, factor)
        scaled.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
        print(f"{t}: {spark.read.parquet(f'{out_dir}/{t}.parquet').count()} rows")


if __name__ == "__main__":
    main()
