"""Persistent IVF index: the ANN tier's storage story for 100 TB.

``similarity.ivf_topk`` plans the two-stage search as one job — fine
for a one-off query, but a production corpus answers MANY queries and
GROWS. This module persists the IVF structure so that:

- **search reads only the probed slice of the corpus.** The index data
  is parquet partitioned by ``centroid_id``; a query filters on its
  ``nprobe`` best centroids, which Spark turns into PARTITION PRUNING —
  the scan touches ~nprobe/n_centroids of the files on disk, the
  on-disk analogue of ivf_topk's left-semi probe (plan-asserted:
  tests/test_ann_index.py checks the scan's partition filters).
- **new vectors append without a rebuild.** ``append_index`` assigns
  new vectors against the STORED centroids (broadcast, deterministic
  argmax — the same assignment rule as the build) and appends their
  partitions; existing data is never rewritten. Same incremental
  contract as the dedup tier's signature store (dedup.py q75): the
  index is a grow-only structure whose maintenance cost tracks the
  increment, never the accumulated corpus.
- **assignment is engine-independent.** Centroid selection is the
  md5-ordered hash sample used by ivf_topk; assignment is max_by with
  the (csim, -centroid_id) tie-break. Rebuilding the index over
  base+increment yields byte-identical (id → centroid) assignment to
  build+append — proven by test, and the reason search-after-append ==
  search-after-rebuild exactly.

Layout::

    index_dir/centroids/   (centroid_id, cvec)          — tiny
    index_dir/meta.json    the meta_cols contract — FS JSON sidecar
                           (round 15; legacy one-row parquet meta/
                           dirs remain readable)
    index_dir/data/        (id, embedding, meta...)
                           partitioned by (ingest_id, centroid_id) —
                           ingest_id 0 is the build, each append its
                           own id (the exactly-once overwrite key)
    index_dir/tombstones/  (__tomb_id) partitioned by delete_id —
                           the removal tier (round 14, X66)
    index_dir/pq/          optional PQ tier (round 14, X62):
      manifest.json        (pq_m, pq_kc, residual) — FS JSON sidecar
                           (round 15; legacy parquet manifest/ dirs
                           remain readable)
      codebooks/           (sub_id, code_id, cvec) — m·kc rows, tiny
      codes/               (id, pq_codes array<int>, meta...)
                           partitioned by (ingest_id, centroid_id)
    index_dir/sq/          optional SQ8 tier (round 15, X80):
      grid/                (pos, mn, mx) — d rows, the affine grid,
                           trained at build and PINNED thereafter
      codes/               (id, sq_codes array<int>, meta...)
                           partitioned by (ingest_id, centroid_id)

Centroid refinement (kmeans_refine) composes: refine BEFORE build on a
sample, then build with the refined centroids via ``centroids=``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .similarity import _dot, _norm, _py_norm, assign_centroids, cosine

# ann_recall_report's rung-cache bound (ADVICE r15): the one scored
# pass is cached (DISK_ONLY) for the per-rung top-k windows only while
# the float corpus' optimizer size estimate stays under this — an
# evaluation-sized store, not a production corpus.  Data-sized (bytes),
# never core-count-sized; env-tunable for clusters with big local
# disks.
import os as _os

_RECALL_CACHE_MAX_INPUT_BYTES = int(_os.environ.get(
    "SPARK_GRAFT_RECALL_CACHE_MAX_INPUT_BYTES", str(16 * 1024 ** 3)))


def build_index(df: DataFrame, index_dir: str, n_centroids: int = 16,
                vec_col: str = "embedding", id_col: str = "vec_id",
                centroids: DataFrame | None = None,
                meta_cols: tuple[str, ...] = (),
                pq_m: int | None = None, pq_kc: int = 8,
                pq_residual: bool = False,
                pq_codebooks: DataFrame | None = None,
                pq_refine_iters: int = 0,
                sq: bool = False) -> None:
    """Materialize the IVF index: pick centroids (md5-ordered hash
    sample of ``df`` unless an explicit/refined set is passed), assign
    every vector, write data partitioned by centroid_id.

    ``meta_cols`` names metadata columns of ``df`` (label, source,
    lang, license tier, ...) stored ALONGSIDE each vector in the index
    data — the payload :func:`search_index_batch`'s ``where``
    predicate filters on.  Metadata lives in the same parquet rows as
    the vectors, so a filtered search reads no side table and the
    predicate pushes down into the pruned scan.

    ``pq_m`` (round 14, X62 — VERDICT r13 item 2): additionally
    materialize the PQ tier — per-subspace codebooks (the X57
    md5-sample rule over the stored data, or an explicit/refined set
    via ``pq_codebooks``) and the m-int PQ code of every vector,
    codes partitioned by centroid_id next to the float data.  With
    ``pq_residual=True`` codebooks train on and codes encode the
    residual v − c(v) against the vector's ASSIGNED stored centroid
    (X61's quality-correct formulation).  This is what makes X57/X58
    a STORE rather than a per-query computation: at 100 TB the PQ win
    IS the materialized code table — :func:`search_index_pq` reads
    m ints per vector under the same DPP pruning and metadata
    pushdown as the float path, and never re-encodes the corpus.
    ``pq_refine_iters`` runs that many X63 Lloyd iterations on the
    sampled codebooks before pinning them (the production-quality
    build — refine once at build time, every later encode and append
    uses the refined books); mutually exclusive with an explicit
    ``pq_codebooks``.

    ``sq`` (round 15, X80): additionally materialize the SQ8 tier —
    the per-dimension affine grid (X76's gated arithmetic) trained on
    the stored data and PINNED, plus every vector's d int8 codes
    partitioned next to the float data.  The middle memory tier:
    :func:`search_index_sq` reads d small ints per vector under the
    same DPP pruning with in-bucket ranking essentially exact, where
    the PQ tier pays the ADC recall price for m ints."""
    if centroids is None:
        centroids = (
            df.orderBy(F.md5(F.col(id_col).cast("string")), F.asc(id_col))
            .limit(n_centroids)
            .select(F.col(id_col).alias("centroid_id"),
                    F.col(vec_col).alias("cvec"))
        )
    centroids.write.mode("overwrite").parquet(f"{index_dir}/centroids")
    stored = df.sparkSession.read.parquet(f"{index_dir}/centroids")
    # persist the metadata contract with the index: append_index reads
    # it back so a later append cannot silently write NULL metadata.
    # A plain FS JSON sidecar, not a one-row parquet dataset
    # (optimization round 15): the parquet write/read each cost a full
    # Spark job (~0.5 s of the 4.2 s warm build — measured), where the
    # sidecar is a metadata op; the semantic_stream marker precedent.
    # Readers fall back to the legacy parquet dir for old stores.
    _write_json_sidecar(df.sparkSession, f"{index_dir}/meta.json",
                        {"meta_cols": list(meta_cols)})
    # ingest_id is the store's exactly-once key (round 14): the build
    # holds 0, every append its own id, and writes are DYNAMIC
    # partition overwrites — a retried/replayed append rewrites its own
    # (ingest_id, centroid_id) partitions instead of duplicating rows
    # (the q130/q150/q156 batch_id-keyed overwrite contract applied to
    # the index itself). centroid_id stays a partition column, so the
    # probed pruning is unchanged (plan-asserted).
    (assign_centroids(df, stored, vec_col, id_col,
                      carry_cols=tuple(meta_cols))
     .withColumn("ingest_id", F.lit(0))
     .write.mode("overwrite").partitionBy("ingest_id", "centroid_id")
     .parquet(f"{index_dir}/data"))
    if pq_refine_iters and pq_codebooks is not None:
        raise ValueError(
            "pq_refine_iters refines the sampled codebooks — passing an "
            "explicit pq_codebooks too is ambiguous (refine it yourself "
            "with quantize.pq_refine and pass the result)")
    if pq_m is not None:
        _write_pq_tier(df.sparkSession, index_dir, pq_m, pq_kc,
                       pq_residual, vec_col, id_col, tuple(meta_cols),
                       codebooks=pq_codebooks,
                       refine_iters=pq_refine_iters)
    if sq:
        _write_sq_tier(df.sparkSession, index_dir, vec_col, id_col,
                       tuple(meta_cols))


def _pq_frame(data: DataFrame, centroids: DataFrame, residual: bool,
              vec_col: str, id_col: str) -> tuple[DataFrame, str]:
    """The frame PQ codebooks/codes derive from: the stored (already
    assigned) index data itself, or its residuals v − c(v) against the
    STORED centroids — identical construction to ivfpq_residual_topk's
    rdf, so the persisted tier equals the inline operator by
    construction (pinned by test)."""
    if not residual:
        return data, vec_col
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cvec_d = F.transform(F.col("cvec"), lambda x: x.cast("double"))
    rdf = (data.join(F.broadcast(centroids), "centroid_id")
           .select(data["*"],
                   F.zip_with(vec_d, cvec_d, lambda x, y: x - y)
                   .alias("__rvec")))
    return rdf, "__rvec"


def _write_pq_tier(spark: SparkSession, index_dir: str, m: int, kc: int,
                   residual: bool, vec_col: str, id_col: str,
                   meta_cols: tuple[str, ...],
                   codebooks: DataFrame | None = None,
                   refine_iters: int = 0) -> None:
    from . import quantize

    data = spark.read.parquet(f"{index_dir}/data")
    centroids = spark.read.parquet(f"{index_dir}/centroids")
    frame, pq_vec = _pq_frame(data, centroids, residual, vec_col, id_col)
    if codebooks is None:
        codebooks = quantize.pq_codebooks(frame, m=m, k=kc,
                                          vec_col=pq_vec, id_col=id_col)
        if refine_iters:
            codebooks = quantize.pq_refine(frame, codebooks,
                                           iters=refine_iters,
                                           vec_col=pq_vec, id_col=id_col)
    codebooks.write.mode("overwrite").parquet(f"{index_dir}/pq/codebooks")
    # FS JSON sidecar, not a one-row parquet dataset (see the meta.json
    # note in build_index); legacy parquet manifests remain readable
    _write_json_sidecar(spark, f"{index_dir}/pq/manifest.json",
                        {"pq_m": int(m), "pq_kc": int(kc),
                         "residual": bool(residual)})
    stored_cb = spark.read.parquet(f"{index_dir}/pq/codebooks")
    _append_pq_codes(spark, index_dir, frame, stored_cb, pq_vec, id_col,
                     meta_cols, overwrite=True)


def _append_pq_codes(spark: SparkSession, index_dir: str, frame: DataFrame,
                     codebooks: DataFrame, pq_vec: str, id_col: str,
                     meta_cols: tuple[str, ...],
                     overwrite: bool = False,
                     ingest_id: int = 0) -> None:
    """Encode ``frame`` (which carries centroid_id + metadata) against
    the PINNED codebooks and write wide codes — one row per vector,
    m small ints — partitioned by (ingest_id, centroid_id), the same
    exactly-once overwrite contract as the float data.

    Execution (optimization round 15, guide §2.3/§2.4): the codes are
    computed MAP-SIDE (``quantize.pq_encode_wide`` — the m·kc codebook
    as literals, argmin per subspace in one projection, centroid_id
    and metadata carried through), so the encode-and-write is a single
    scan stage: the tall path's three corpus exchanges (argmin
    groupBy, collect_list pivot, shuffle-hash join-back on id) are
    gone.  Codes are value-identical (persisted==inline pinned by
    test; hash-gated q159/q162/q163)."""
    from . import quantize

    rows = (quantize.pq_encode_wide(
        frame, codebooks, vec_col=pq_vec, id_col=id_col,
        carry_cols=("centroid_id", *meta_cols))
        .select(id_col, "centroid_id", *meta_cols, "pq_codes")
        .withColumn("ingest_id", F.lit(int(ingest_id))))
    (rows.write.mode("overwrite")
     .option("partitionOverwriteMode",
             "dynamic" if not overwrite else "static")
     .partitionBy("ingest_id", "centroid_id")
     .parquet(f"{index_dir}/pq/codes"))


def append_index(df_new: DataFrame, index_dir: str,
                 vec_col: str = "embedding",
                 id_col: str = "vec_id",
                 meta_cols: tuple[str, ...] | None = None,
                 ingest_id: int | None = None) -> None:
    """Assign new vectors against the STORED centroids and append their
    partitions — no rebuild, no rewrite of existing files. Cost tracks
    the increment: one broadcast join over df_new + an append write.

    The metadata contract is ENFORCED from the index's own manifest
    (written by build_index): with the default ``meta_cols=None`` the
    stored column list applies automatically, and an explicit tuple
    that disagrees with the stored one raises — appending rows with
    missing metadata would land as NULLs that every ``where`` filtered
    search silently drops (review catch).  Pre-manifest indexes
    (no ``meta`` dir) fall back to no metadata.

    If the index carries a PQ tier (round 14, X62), the increment is
    additionally encoded against the PINNED stored codebooks (the X32
    append contract applied to PQ: the structure's parameters never
    drift under appends — a rebuild would resample codebooks from
    base+increment and change every stored code) and its code
    partitions append next to the float ones.  Cost still tracks the
    increment: one broadcast codebook argmin over df_new.

    ``ingest_id`` keys the append for EXACTLY-ONCE semantics (round
    14): the write is a dynamic partition overwrite of that id's own
    (ingest_id, centroid_id) partitions, so retrying a failed append —
    or a streaming checkpoint replaying a micro-batch
    (streaming/ann_stream.py pins ingest_id = batch_id + 1) — rewrites
    instead of duplicating.  Retry safety therefore requires a PINNED
    id: the default ``None`` allocates the next unused id (max stored
    + 1), which is NOT safe to retry after a partial failure on a PQ
    index — the float data and the codes are two jobs, and a crash
    between them would leave a torn generation that a max+1 retry
    re-ingests under a NEW id, duplicating float rows while codes
    exist once (ADVICE r14).  Auto-allocation now DETECTS that state
    (the two tiers' max ingest_id disagree) and raises with the
    repair: retry the same batch with the torn id pinned explicitly —
    the dynamic overwrite then rewrites both tiers' partitions of
    that generation idempotently (same batch → same centroid set by
    the deterministic assignment).  The CLI exposes ``--ingest-id``
    for exactly this."""
    spark = df_new.sparkSession
    stored_meta = _read_meta_cols(spark, index_dir)
    if meta_cols is None:
        meta_cols = stored_meta
    elif tuple(meta_cols) != stored_meta:
        raise ValueError(
            f"append meta_cols {tuple(meta_cols)} != the index's "
            f"stored contract {stored_meta} — appended rows would "
            f"carry NULL metadata and vanish from filtered searches")
    if ingest_id is None:
        # next unused id — a partition-column max (directory names,
        # not data) over the store; on a PQ index the two tiers must
        # AGREE first, else a prior append tore between its two jobs
        # and max+1 would duplicate its rows under a fresh id
        data_max = int(
            spark.read.parquet(f"{index_dir}/data")
            .agg(F.max("ingest_id")).head()[0])
        tier_maxes = {}
        if _read_pq_manifest(spark, index_dir) is not None:
            tier_maxes["PQ codes"] = int(
                spark.read.parquet(f"{index_dir}/pq/codes")
                .agg(F.max("ingest_id")).head()[0])
        if _sq_grid_arrays(spark, index_dir) is not None:
            tier_maxes["SQ codes"] = int(
                spark.read.parquet(f"{index_dir}/sq/codes")
                .agg(F.max("ingest_id")).head()[0])
        for tier, codes_max in tier_maxes.items():
            if codes_max != data_max:
                raise RuntimeError(
                    f"torn append detected: float tier at ingest_id "
                    f"{data_max} but {tier} at {codes_max} — a "
                    f"prior append failed between its writes. "
                    f"Retry that batch with "
                    f"ingest_id={max(data_max, codes_max)} to repair "
                    f"idempotently (auto-allocation would duplicate "
                    f"its rows under a new id)")
        ingest_id = data_max + 1
    elif ingest_id <= 0:
        raise ValueError(
            f"ingest_id must be positive (0 is the build), "
            f"got {ingest_id}")
    centroids = spark.read.parquet(f"{index_dir}/centroids")
    assigned = assign_centroids(df_new, centroids, vec_col, id_col,
                                carry_cols=tuple(meta_cols))
    (assigned.withColumn("ingest_id", F.lit(int(ingest_id)))
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("ingest_id", "centroid_id")
     .parquet(f"{index_dir}/data"))
    pq = _read_pq_manifest(spark, index_dir)
    if pq is not None:
        stored_cb = spark.read.parquet(f"{index_dir}/pq/codebooks")
        frame, pq_vec = _pq_frame(assigned, centroids,
                                  bool(pq["residual"]), vec_col, id_col)
        _append_pq_codes(spark, index_dir, frame, stored_cb, pq_vec,
                         id_col, tuple(meta_cols),
                         ingest_id=int(ingest_id))
    sq_dims = _sq_grid_arrays(spark, index_dir)
    if sq_dims is not None:
        # the increment encodes against the PINNED stored grid (the
        # codebook contract applied to SQ: a rebuild would re-train
        # min/max from base+increment and change every stored code)
        _append_sq_codes(spark, index_dir, assigned, sq_dims, vec_col,
                         id_col, tuple(meta_cols),
                         ingest_id=int(ingest_id))


def _write_json_sidecar(spark: SparkSession, path: str, obj: dict) -> None:
    """One-file JSON store metadata — a pure FS op instead of a one-row
    parquet dataset whose write AND read each cost a Spark job (the
    semantic_stream meta.json precedent; measured ~0.5 s/job at bench
    scale).  Overwrite semantics, so a driver-side retry is idempotent.

    Written via temp-file + rename (ADVICE r15): a crash between
    create and write must not leave a TORN final file — the reader
    only falls back to the legacy parquet layout on ABSENCE, so a torn
    sidecar would otherwise wedge the store behind a raw JSON error
    (the reader additionally raises the explicit corrupt-sidecar error
    for files predating this writer)."""
    import json

    from ..streaming.upsert import _fs_and_path

    fs, hpath = _fs_and_path(spark, path)
    fs_tmp, tmp = _fs_and_path(spark, path + ".tmp")
    out = fs_tmp.create(tmp, True)
    try:
        out.write(bytearray(json.dumps(obj).encode("ascii")))
    finally:
        out.close()
    # FileSystem.rename refuses an existing destination on most
    # implementations — drop the old sidecar first. The store is
    # rebuilt-in-place here anyway, so there is no concurrent-reader
    # contract to preserve across this two-step swap.
    if fs.exists(hpath):
        fs.delete(hpath, False)
    if not fs.rename(tmp, hpath):
        raise IOError(f"could not rename {path}.tmp into place")


def _read_json_sidecar(spark: SparkSession, path: str):
    """The sidecar's reader: dict, or None when the file is absent
    (legacy store or no tier) — callers fall back to the pre-round-15
    one-row parquet layout so old stores stay readable.

    Reads to TRUE EOF in one JVM call (ADVICE r15 — the old
    byte-per-py4j-call loop silently truncated at 4096 bytes, turning
    a long meta_cols list into a JSONDecodeError), guards against an
    implausibly large file, and names the store-repair remedy when the
    content does not parse (torn pre-round-16 write)."""
    import json

    from ..streaming.upsert import _fs_and_path

    fs, hpath = _fs_and_path(spark, path)
    if not fs.exists(hpath):
        return None
    n = fs.getFileStatus(hpath).getLen()
    if n > 16 * 1024 * 1024:
        raise ValueError(
            f"store sidecar {path} is {n} bytes — far beyond any "
            f"plausible metadata payload; refusing to load it")
    stream = fs.open(hpath)
    try:
        data = bytes(spark._jvm.org.apache.commons.io.IOUtils
                     .toByteArray(stream))
    finally:
        stream.close()
    try:
        return json.loads(data.decode("ascii"))
    except ValueError as e:
        raise ValueError(
            f"store sidecar {path} is corrupt ({data[:64]!r}...) — a "
            f"crashed write left it torn; rebuild the store or restore "
            f"the sidecar from the build parameters") from e


def _read_meta_cols(spark: SparkSession, index_dir: str) -> tuple:
    """The index's stored meta_cols contract: JSON sidecar first, then
    the legacy one-row parquet dir, then the pre-round-14 empty
    contract."""
    from pyspark.errors import AnalysisException

    side = _read_json_sidecar(spark, f"{index_dir}/meta.json")
    if side is not None:
        return tuple(side["meta_cols"])
    try:
        return tuple(
            spark.read.parquet(f"{index_dir}/meta").head()["meta_cols"])
    except AnalysisException:
        return ()


def _read_pq_manifest(spark: SparkSession, index_dir: str):
    from pyspark.errors import AnalysisException

    side = _read_json_sidecar(spark, f"{index_dir}/pq/manifest.json")
    if side is not None:
        return side
    try:
        row = spark.read.parquet(f"{index_dir}/pq/manifest").head()
    except AnalysisException:
        return None
    return {"pq_m": int(row["pq_m"]), "pq_kc": int(row["pq_kc"]),
            "residual": bool(row["residual"])}


# --- SQ8 tier (round 15, X80): the middle memory tier ---------------

def _sq_grid_arrays(spark: SparkSession, index_dir: str):
    """The stored affine grid as two d-sized literal arrays (the
    quantize._sq_dim_arrays convention: bounded by the embedding
    width, never the corpus) — or None when the index has no SQ
    tier."""
    from pyspark.errors import AnalysisException

    from .quantize import _lit_doubles

    try:
        rows = (spark.read.parquet(f"{index_dir}/sq/grid")
                .orderBy("pos").collect())
    except AnalysisException:
        return None
    # one-parse literals (quantize.py's unrolled-SQL block comment)
    mns = _lit_doubles([float(r.mn) for r in rows])
    scales = _lit_doubles([float(r.mx - r.mn) for r in rows])
    return mns, scales


def _write_sq_tier(spark: SparkSession, index_dir: str, vec_col: str,
                   id_col: str, meta_cols: tuple[str, ...]) -> None:
    from . import quantize

    data = spark.read.parquet(f"{index_dir}/data")
    (quantize.dim_ranges(data, vec_col)
     .write.mode("overwrite").parquet(f"{index_dir}/sq/grid"))
    dims = _sq_grid_arrays(spark, index_dir)
    _append_sq_codes(spark, index_dir, data, dims, vec_col, id_col,
                     meta_cols, overwrite=True)


def _append_sq_codes(spark: SparkSession, index_dir: str,
                     frame: DataFrame, dims, vec_col: str, id_col: str,
                     meta_cols: tuple[str, ...],
                     overwrite: bool = False,
                     ingest_id: int = 0) -> None:
    """Encode ``frame`` (which carries centroid_id + metadata) against
    the PINNED stored grid and write the d-int codes partitioned by
    (ingest_id, centroid_id) — the same exactly-once overwrite
    contract as the float data and the PQ codes.  Encode is one
    scan-stage transform (X76's gated arithmetic); centroid_id and
    metadata carry THROUGH the encode (optimization round 15, guide
    §2.4) so the write is a single scan stage — the shuffle-hash
    join-back on id is gone."""
    from . import quantize

    rows = (quantize.sq_encode(frame, vec_col=vec_col, id_col=id_col,
                               dims=dims,
                               carry_cols=("centroid_id", *meta_cols))
            .withColumn("ingest_id", F.lit(int(ingest_id))))
    (rows.write.mode("overwrite")
     .option("partitionOverwriteMode",
             "dynamic" if not overwrite else "static")
     .partitionBy("ingest_id", "centroid_id")
     .parquet(f"{index_dir}/sq/codes"))


def search_index_sq(spark: SparkSession, index_dir: str,
                    queries: DataFrame, k: int = 10, nprobe: int = 4,
                    query_id_col: str = "query_id",
                    query_vec_col: str = "qvec",
                    id_col: str = "vec_id",
                    where: F.Column | None = None) -> DataFrame:
    """Batch ANN serving over the PERSISTED SQ8 tier (round 15, X80):
    per query, rank the stored centroids and probe the best
    ``nprobe`` (the float path's rule verbatim), then score ONLY the
    probed partitions of the SQ codes — d small ints per vector —
    against their dequantized reconstructions (X76's exact
    arithmetic, the FAISS IndexIVFScalarQuantizer serving path).
    Identical results to the inline ``quantize.ivfsq_topk`` on the
    same parameters (pinned by test), but the inline form re-trains
    the grid and re-encodes the corpus per call, while this path
    reads codes written once: 4× fewer bytes than the float path
    with in-bucket ranking essentially exact — the tier an operator
    serves from when PQ's ADC recall price is too high and float is
    too big (the q175 table's middle row).  centroid_id is the codes
    table's partition column, so the probes join is DYNAMIC
    PARTITION PRUNING; ``where`` metadata predicates push down into
    the pruned scan; tombstones anti-join before scoring.  Returns
    (query_id, vec_id, sq_dist), (dist ASC, id ASC) top-k."""
    from .quantize import LEVELS, _l2sq

    dims = _sq_grid_arrays(spark, index_dir)
    if dims is None:
        raise ValueError(
            f"{index_dir} has no SQ tier — build_index(..., sq=True) "
            f"materializes it")
    mns, scales = dims
    centroids = spark.read.parquet(f"{index_dir}/centroids")
    qvec_d = F.transform(F.col(query_vec_col), lambda x: x.cast("double"))
    cvec_d = F.transform(F.col("cvec"), lambda x: x.cast("double"))
    probes = (
        queries.crossJoin(F.broadcast(centroids))
        .select(query_id_col, "centroid_id",
                cosine(qvec_d, cvec_d).alias("qsim"))
        .withColumn("__rn", F.row_number().over(
            Window.partitionBy(query_id_col)
            .orderBy(F.desc("qsim"), F.asc("centroid_id"))))
        .where(F.col("__rn") <= nprobe)
        .select(query_id_col, "centroid_id"))
    codes = spark.read.parquet(f"{index_dir}/sq/codes")
    if where is not None:
        codes = codes.where(where)
    codes = _without_tombstones(spark, index_dir, codes, id_col)
    deq = F.transform(
        F.col("sq_codes"),
        lambda c, i: F.element_at(mns, i + 1)
        + c.cast("double") * F.element_at(scales, i + 1)
        / F.lit(float(LEVELS)))
    scored = (codes.join(F.broadcast(probes), "centroid_id")
              .withColumn("__deq", deq)
              .join(F.broadcast(queries), query_id_col)
              .select(query_id_col, id_col,
                      F.round(_l2sq(qvec_d, F.col("__deq")), 6)
                      .alias("sq_dist")))
    return (scored.withColumn("__rn", F.row_number().over(
        Window.partitionBy(query_id_col)
        .orderBy(F.asc("sq_dist"), F.asc(id_col))))
        .where(F.col("__rn") <= k)
        .select(query_id_col, id_col, "sq_dist"))


# --- deletes (round 14, X66): the store's removal story -------------
#
# A production vector store must FORGET — takedowns, PII removal,
# retention — without rewriting a 100 TB structure per request.  The
# grow-only layout gets a tombstone tier: deletes write id lists under
# delete_id-keyed overwrite directories (the same exactly-once
# contract as ingest_id appends — a retried delete rewrites its own
# partition), every search anti-joins the tombstone set before
# scoring (both the float and the code path — results equal a store
# that never held those vectors, q164's gate), and a periodic
# out-of-place compaction (the compact_corpus convention: write NEW,
# caller validates and swaps) physically drops tombstoned rows and
# resets the tombstone tier.

_TOMB_SCHEMA = "__tomb_id bigint"


def delete_from_index(ids_df: DataFrame, index_dir: str,
                      id_col: str = "vec_id",
                      delete_id: int | None = None) -> None:
    """Tombstone the given ids (one column, ``id_col``).  Cost is the
    id list, never the corpus; idempotent under retries when
    ``delete_id`` is pinned (dynamic overwrite of its own partition);
    deleting ids the store never held is a no-op by construction
    (anti-join semantics).  Ids must be numeric (the store's bigint
    tombstone type): a non-castable id would become a NULL tombstone
    that matches nothing in the anti-join — a silent delete no-op
    (ADVICE r14) — so the cast is VALIDATED and raises instead."""
    from pyspark.errors import AnalysisException

    spark = ids_df.sparkSession
    if delete_id is None:
        try:
            delete_id = int(
                spark.read.schema(f"{_TOMB_SCHEMA}, delete_id int")
                .parquet(f"{index_dir}/tombstones")
                .agg(F.coalesce(F.max("delete_id"), F.lit(-1)))
                .head()[0]) + 1
        except AnalysisException:
            delete_id = 0
    # id-sized validation pass: any id the bigint cast can't represent
    # would tombstone nothing (NULL under try_cast semantics) or crash
    # the write mid-job (ANSI cast) — refuse up front with the reason
    bad = (ids_df.where(F.col(id_col).isNotNull()
                        & F.col(id_col).try_cast("bigint").isNull())
           .limit(1).collect())
    if bad:
        raise ValueError(
            f"delete_from_index: id {bad[0][id_col]!r} does not cast "
            f"to bigint — its tombstone would be NULL and match "
            f"nothing (a silent no-op); the store is keyed by "
            f"numeric ids")
    (ids_df.select(F.col(id_col).cast("bigint").alias("__tomb_id"))
     .distinct()
     .withColumn("delete_id", F.lit(int(delete_id)))
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("delete_id")
     .parquet(f"{index_dir}/tombstones"))


def _without_tombstones(spark: SparkSession, index_dir: str,
                        df: DataFrame, id_col: str) -> DataFrame:
    """Anti-join the tombstone set onto an index read — the removal
    filter every search path applies before scoring.  The tombstone
    frame is id-sized (small against the corpus); Catalyst broadcasts
    it under its size rule, degrading to shuffle for a huge delete
    backlog instead of a broadcast OOM."""
    from pyspark.errors import AnalysisException

    try:
        tombs = (spark.read.schema(_TOMB_SCHEMA)
                 .parquet(f"{index_dir}/tombstones")
                 .select("__tomb_id").distinct())
    except AnalysisException:
        return df
    return df.join(tombs, df[id_col] == tombs["__tomb_id"], "left_anti")


def index_report(spark: SparkSession, index_dir: str,
                 id_col: str = "vec_id") -> DataFrame:
    """Store health report (round 14, X68; completed round 15 per
    VERDICT r14 item 4): one row per STORED centroid — live vector
    count, tombstoned count, corpus share and skew factor (n·C/total,
    q105's skew-diagnosis arithmetic), plus the PQ tier's parameters
    (pq_m, pq_kc, pq_residual as 0/1 ints; NULL when the store has no
    PQ tier).  The operational signals a 100 TB store is run by: a
    hot centroid (skew_factor ≫ 1) makes every probe of that bucket a
    straggler — the cue to re-train centroids (kmeans_refine) or
    split; an EMPTY centroid (n_vectors = 0 — visible because the
    spine is the stored centroids frame, not the occupied data side)
    is a dead bucket, itself a mis-trained-centroid signal; a fat
    tombstone backlog is the cue to compact (X66).  One narrow-column
    scan of (id, centroid_id) + an id-sized tombstone join onto the
    centroid-sized spine; counts are exact integers, ratios are
    q105's round-6 policy (NULL when every stored vector is
    tombstoned — no live total to share against), so the report is
    hash-gateable cross-engine (q166)."""
    from pyspark.errors import AnalysisException

    cents = (spark.read.parquet(f"{index_dir}/centroids")
             .select("centroid_id"))
    data = (spark.read.parquet(f"{index_dir}/data")
            .select(F.col(id_col), "centroid_id"))
    try:
        tombs = (spark.read.schema(_TOMB_SCHEMA)
                 .parquet(f"{index_dir}/tombstones")
                 .select("__tomb_id").distinct())
    except AnalysisException:
        tombs = spark.createDataFrame([], _TOMB_SCHEMA)
    flagged = (data.join(tombs, data[id_col] == tombs["__tomb_id"],
                         "left")
               .select("centroid_id",
                       F.col("__tomb_id").isNotNull().alias("__dead")))
    per = (flagged.groupBy("centroid_id")
           .agg(F.sum(F.when(~F.col("__dead"), 1).otherwise(0))
                .cast("long").alias("n_vectors"),
                F.sum(F.when(F.col("__dead"), 1).otherwise(0))
                .cast("long").alias("n_tombstoned")))
    # the stored centroids are the spine: an empty centroid appears
    # with zero counts instead of vanishing (VERDICT r14 item 4)
    per = (cents.join(per, "centroid_id", "left")
           .select("centroid_id",
                   F.coalesce("n_vectors", F.lit(0)).cast("long")
                   .alias("n_vectors"),
                   F.coalesce("n_tombstoned", F.lit(0)).cast("long")
                   .alias("n_tombstoned")))
    tot = per.agg(F.sum("n_vectors").cast("long").alias("__total"),
                  F.count(F.lit(1)).cast("long").alias("__n_cent"))
    pq = _read_pq_manifest(spark, index_dir)
    pq_m = F.lit(int(pq["pq_m"]) if pq is not None else None).cast("int")
    pq_kc = F.lit(int(pq["pq_kc"]) if pq is not None else None).cast("int")
    pq_res = F.lit(int(bool(pq["residual"])) if pq is not None
                   else None).cast("int")
    live = F.col("n_vectors").cast("double")
    total_ok = F.col("__total") > 0  # all-tombstoned store: no ratios
    return (per.crossJoin(F.broadcast(tot))
            .select("centroid_id", "n_vectors", "n_tombstoned",
                    F.when(total_ok, F.round(live / F.col("__total"), 6))
                    .alias("share"),
                    F.when(total_ok,
                           F.round(live * F.col("__n_cent")
                                   / F.col("__total"), 6))
                    .alias("skew_factor"),
                    pq_m.alias("pq_m"), pq_kc.alias("pq_kc"),
                    pq_res.alias("pq_residual")))


def compact_index(spark: SparkSession, index_dir: str,
                  output_dir: str, id_col: str = "vec_id") -> dict:
    """Physically drop tombstoned rows: write a NEW index at
    ``output_dir`` (centroids, metadata contract, PQ manifest and
    codebooks copied VERBATIM — parameters stay pinned, so searches
    are unchanged; data and codes rewritten without the tombstoned
    ids at a fresh ingest generation 0; no tombstone tier).
    Out-of-place by the compact_corpus convention — the caller
    validates then swaps pointers; an in-place rewrite of a live
    store would race its readers and destroy data on failure.
    Returns before/after row counts."""
    import os as _os

    from pyspark.errors import AnalysisException

    if _os.path.abspath(output_dir) == _os.path.abspath(index_dir):
        raise ValueError(
            "output_dir must differ from index_dir: compaction is "
            "out-of-place (validate, then swap pointers)")
    (spark.read.parquet(f"{index_dir}/centroids")
     .write.mode("overwrite").parquet(f"{output_dir}/centroids"))
    # pre-manifest indexes (built before round 14, no meta contract)
    # get the empty contract written into the compacted copy — the
    # same fallback chain append_index applies (_read_meta_cols:
    # sidecar → legacy parquet → empty), so the two maintenance paths
    # agree (VERDICT r14 item 5); the copy lands as the round-15 JSON
    # sidecar regardless of the source's vintage
    _write_json_sidecar(spark, f"{output_dir}/meta.json",
                        {"meta_cols": list(_read_meta_cols(spark,
                                                           index_dir))})
    data = spark.read.parquet(f"{index_dir}/data")
    n_before = data.count()
    kept = (_without_tombstones(spark, index_dir, data, id_col)
            .withColumn("ingest_id", F.lit(0)))
    (kept.write.mode("overwrite")
     .partitionBy("ingest_id", "centroid_id")
     .parquet(f"{output_dir}/data"))
    n_after = spark.read.parquet(f"{output_dir}/data").count()
    pq = _read_pq_manifest(spark, index_dir)
    if pq is not None:
        # parameters copied VERBATIM as the round-15 JSON sidecar
        # (pq is the dict _read_pq_manifest resolved, either vintage)
        _write_json_sidecar(spark, f"{output_dir}/pq/manifest.json",
                            {"pq_m": int(pq["pq_m"]),
                             "pq_kc": int(pq["pq_kc"]),
                             "residual": bool(pq["residual"])})
        (spark.read.parquet(f"{index_dir}/pq/codebooks")
         .write.mode("overwrite").parquet(f"{output_dir}/pq/codebooks"))
        codes = spark.read.parquet(f"{index_dir}/pq/codes")
        (_without_tombstones(spark, index_dir, codes, id_col)
         .withColumn("ingest_id", F.lit(0))
         .write.mode("overwrite")
         .partitionBy("ingest_id", "centroid_id")
         .parquet(f"{output_dir}/pq/codes"))
    if _sq_grid_arrays(spark, index_dir) is not None:
        # grid copied VERBATIM (pinned parameters — the codebook
        # rule), live codes rewritten at generation 0
        (spark.read.parquet(f"{index_dir}/sq/grid")
         .write.mode("overwrite").parquet(f"{output_dir}/sq/grid"))
        sq_codes = spark.read.parquet(f"{index_dir}/sq/codes")
        (_without_tombstones(spark, index_dir, sq_codes, id_col)
         .withColumn("ingest_id", F.lit(0))
         .write.mode("overwrite")
         .partitionBy("ingest_id", "centroid_id")
         .parquet(f"{output_dir}/sq/codes"))
    return {"n_before": int(n_before), "n_after": int(n_after),
            "n_dropped": int(n_before - n_after)}


def search_index_pq(spark: SparkSession, index_dir: str,
                    queries: DataFrame, k: int = 10, nprobe: int = 4,
                    query_id_col: str = "query_id",
                    query_vec_col: str = "qvec",
                    id_col: str = "vec_id",
                    where: F.Column | None = None,
                    broadcast_lut: bool = True,
                    rerank: int | None = None,
                    vec_col: str = "embedding") -> DataFrame:
    """Batch ANN serving over the PERSISTED PQ tier (round 14, X62):
    per query, rank the stored centroids and probe the best ``nprobe``
    (the float path's rule verbatim), then score ONLY the probed
    partitions of the CODES table — m small ints per vector — with
    X57's asymmetric distance against the stored codebooks.  Raw and
    residual tiers are served from the same entry point (the stored
    manifest says which; residual keys the LUT per (query, probed
    centroid), X61's rule).

    Identical results to the inline operators (``ivfpq_topk`` /
    ``ivfpq_residual_topk``) on the same parameters — pinned by test —
    but the inline form re-samples codebooks and re-encodes the WHOLE
    corpus per call, while this path reads codes that were written
    once: at 100 TB, ~64× fewer bytes scanned than the float path and
    zero encode work per query batch.  Two structural wins over the
    inline plan: centroid_id is the codes table's partition column, so
    the probes join is DYNAMIC PARTITION PRUNING (the scan touches
    ~nprobe/n_centroids of the files — no assignment join at all), and
    ``where`` metadata predicates (X52) sit on scan columns of the
    code rows, pushing down (PushedFilters) exactly as on the float
    path.  Returns (query_id, vec_id, adc_dist), (adc ASC, id ASC)
    top-k per query; ``broadcast_lut=False`` is the unbounded-query
    escape hatch.

    ``rerank`` (round 14, X67 — the FAISS ``IndexRefineFlat``
    pattern): take the top-``rerank`` candidates per query by ADC
    from the codes, then re-rank JUST those with exact full-precision
    l2² against the stored float vectors and return the top-k by
    (exact_l2 ASC, id ASC).  ADC is lossy (the recall price q157
    measures); reranking buys back precision for the cost of reading
    rerank·|queries| float vectors — bounded, never a corpus scan
    (the candidate frame broadcasts onto a DPP-pruned data read).
    Output column becomes ``exact_l2`` instead of ``adc_dist``."""
    from .quantize import _l2sq, _lut_side, _subspaces

    pq = _read_pq_manifest(spark, index_dir)
    if pq is None:
        raise ValueError(
            f"{index_dir} has no PQ tier — build_index(..., pq_m=) "
            f"materializes it")
    m = int(pq["pq_m"])
    centroids = spark.read.parquet(f"{index_dir}/centroids")
    cb = spark.read.parquet(f"{index_dir}/pq/codebooks")
    d = int(cb.select(F.size("cvec").alias("d")).head()["d"])
    qvec_d = F.transform(F.col(query_vec_col), lambda x: x.cast("double"))
    cvec_d = F.transform(F.col("cvec"), lambda x: x.cast("double"))
    probes = (
        queries.crossJoin(F.broadcast(centroids))
        .select(query_id_col, "centroid_id",
                cosine(qvec_d, cvec_d).alias("qsim"))
        .withColumn("__rn", F.row_number().over(
            Window.partitionBy(query_id_col)
            .orderBy(F.desc("qsim"), F.asc("centroid_id"))))
        .where(F.col("__rn") <= nprobe)
        .select(query_id_col, "centroid_id"))
    codes = spark.read.parquet(f"{index_dir}/pq/codes")
    if where is not None:
        codes = codes.where(where)
    codes = _without_tombstones(spark, index_dir, codes, id_col)
    # the probes join keys the partition column — DPP prunes the scan
    # to the probed partitions (plan-asserted by test); posexplode of
    # the m-int array recovers X57's tall (sub_id, code) form map-side
    tall = (codes.join(F.broadcast(probes), "centroid_id")
            .select(query_id_col, "centroid_id", F.col(id_col),
                    F.posexplode("pq_codes").alias("sub_id", "code")))
    if bool(pq["residual"]):
        qres = (probes.join(queries, query_id_col)
                .join(F.broadcast(centroids), "centroid_id")
                .select(query_id_col, "centroid_id",
                        F.zip_with(qvec_d, cvec_d, lambda x, y: x - y)
                        .alias("__qrvec")))
        qsub = qres.select(
            query_id_col, "centroid_id",
            F.posexplode(_subspaces("__qrvec", m, d))
            .alias("sub_id", "qsvec"))
        lut = (qsub.join(F.broadcast(cb), "sub_id")
               .select(query_id_col, "centroid_id", "sub_id",
                       F.col("code_id").alias("code"),
                       _l2sq(F.col("qsvec"), F.col("cvec"))
                       .cast("decimal(28,12)").alias("__term")))
        keys = [query_id_col, "centroid_id", "sub_id", "code"]
    else:
        qsub = queries.select(
            F.col(query_id_col),
            F.posexplode(_subspaces(query_vec_col, m, d))
            .alias("sub_id", "qsvec"))
        lut = (qsub.join(F.broadcast(cb), "sub_id")
               .select(query_id_col, "sub_id",
                       F.col("code_id").alias("code"),
                       _l2sq(F.col("qsvec"), F.col("cvec"))
                       .cast("decimal(28,12)").alias("__term")))
        keys = [query_id_col, "sub_id", "code"]
    scored = (tall.join(_lut_side(lut, broadcast_lut), keys)
              .groupBy(query_id_col, id_col)
              .agg(F.round(F.sum("__term").cast("double"), 6)
                   .alias("adc_dist")))
    if rerank is None:
        return (scored.withColumn("__rn", F.row_number().over(
            Window.partitionBy(query_id_col)
            .orderBy(F.asc("adc_dist"), F.asc(id_col))))
            .where(F.col("__rn") <= k)
            .select(query_id_col, id_col, "adc_dist"))
    if rerank < k:
        raise ValueError(
            f"rerank ({rerank}) must be >= k ({k}) — reranking fewer "
            f"candidates than the requested top-k can't fill it")
    cand = (scored.withColumn("__rn", F.row_number().over(
        Window.partitionBy(query_id_col)
        .orderBy(F.asc("adc_dist"), F.asc(id_col))))
        .where(F.col("__rn") <= int(rerank))
        .select(query_id_col, id_col))
    # exact refine (X67): the candidate frame is rerank·|queries| rows
    # — broadcast onto the float data (tombstones/where are already
    # baked into the candidates; the codes and data tiers hold the
    # same id set by construction)
    data = spark.read.parquet(f"{index_dir}/data")
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    refined = (data.join(F.broadcast(cand), id_col)
               .join(queries, query_id_col)
               .select(query_id_col, id_col,
                       F.round(_l2sq(vec_d, qvec_d), 6)
                       .alias("exact_l2")))
    return (refined.withColumn("__rn", F.row_number().over(
        Window.partitionBy(query_id_col)
        .orderBy(F.asc("exact_l2"), F.asc(id_col))))
        .where(F.col("__rn") <= k)
        .select(query_id_col, id_col, "exact_l2"))


def search_index_batch(spark: SparkSession, index_dir: str,
                       queries: DataFrame, k: int = 10, nprobe: int = 4,
                       query_id_col: str = "query_id",
                       query_vec_col: str = "qvec",
                       vec_col: str = "embedding",
                       id_col: str = "vec_id",
                       where: F.Column | None = None) -> DataFrame:
    """Batch ANN serving: top-k for MANY query vectors in one job.

    ``queries`` is a (query_id_col, query_vec_col) frame. Per query,
    the ``nprobe`` best centroids are ranked against the broadcast
    centroid table (one tiny crossJoin + window); the probed
    (query, centroid) pairs then JOIN the partitioned index data on
    ``centroid_id`` — Spark's DYNAMIC PARTITION PRUNING turns the
    broadcast join on the partition column into a runtime partition
    filter, so the corpus scan still touches only the union of probed
    partitions even though the probe set isn't known at plan time
    (plan-asserted in tests). Scoring and per-query top-k
    (row_number ≤ k on the (query) window) run over the pruned slice.

    Per-query results are IDENTICAL to :func:`search_index` with the
    same parameters (tested); the batch shape amortizes the corpus
    scan across the whole query set — the difference between q
    queries costing q scans and costing one.

    ``where`` (X52, filtered vector search — the metadata-constrained
    query every production vector store serves: "nearest neighbors
    WITH license = permissive / lang = en / label < 3"): a Column
    predicate over the index's ``meta_cols``, applied to the index
    data BEFORE scoring and ranking — PRE-filter semantics, so the
    result is the exact top-k of the candidates SATISFYING the
    predicate within the probed partitions.  Post-filtering a plain
    top-k instead silently returns fewer than k rows and misses every
    matching neighbor ranked below the unfiltered k — the classic
    filtered-ANN failure mode, pinned by test.  The predicate sits on
    scan columns of the pruned parquet read, so it pushes down
    (PushedFilters) and composes with the partition pruning; recall
    semantics vs nprobe are unchanged (probing still ranks centroids
    by the query alone — at nprobe = n_centroids the filtered search
    is provably the exact filtered top-k)."""
    centroids = spark.read.parquet(f"{index_dir}/centroids")
    qvec_d = F.transform(F.col(query_vec_col), lambda x: x.cast("double"))
    cvec_d = F.transform(F.col("cvec"), lambda x: x.cast("double"))
    probes = (
        queries.crossJoin(F.broadcast(centroids))
        .select(query_id_col, "centroid_id",
                cosine(qvec_d, cvec_d).alias("qsim"))
        .withColumn("__rn", F.row_number().over(
            Window.partitionBy(query_id_col)
            .orderBy(F.desc("qsim"), F.asc("centroid_id"))))
        .where(F.col("__rn") <= nprobe)
        .select(query_id_col, "centroid_id")
    )
    data = spark.read.parquet(f"{index_dir}/data")
    if where is not None:
        data = data.where(where)
    data = _without_tombstones(spark, index_dir, data, id_col)
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # per-operand norms BEFORE the (data × queries) pairing — once per
    # data row / once per query, not once per scored pair;
    # bit-identical (same expression tree per operand). The data-side
    # norm is projected BELOW the probes join (a projection above it
    # would run once per fanned-out (row, query) pair — review catch);
    # the join key is untouched, so dynamic partition pruning still
    # applies (plan-asserted by test).
    queries_n = queries.withColumn("__qnorm", _norm(qvec_d))
    scored = (
        data.withColumn("__dnorm", _norm(vec_d))
        .join(F.broadcast(probes), "centroid_id")
        # no broadcast hint on the queries join: a bounded query batch
        # broadcasts anyway under Catalyst's size rule, and an
        # oversized one degrades to a shuffle join instead of a
        # broadcast OOM (only the probes join needs the hint, for DPP)
        .join(queries_n, query_id_col)
        .select(query_id_col, id_col,
                (_dot(vec_d, qvec_d)
                 / (F.col("__dnorm") * F.col("__qnorm")))
                .alias("cosine_sim"))
    )
    return (
        scored.withColumn("__rn", F.row_number().over(
            Window.partitionBy(query_id_col)
            .orderBy(F.desc("cosine_sim"), F.asc(id_col))))
        .where(F.col("__rn") <= k)
        .select(query_id_col, id_col, "cosine_sim")
    )


def search_index(spark: SparkSession, index_dir: str,
                 query_vec: list[float], k: int = 10, nprobe: int = 4,
                 vec_col: str = "embedding",
                 id_col: str = "vec_id") -> DataFrame:
    """Two-stage search against the persisted index: rank the stored
    centroids vs the query (tiny), then scan ONLY the probed
    partitions (partition pruning via the centroid_id filter) and
    take the exact cosine top-k there. Matches ivf_topk's semantics
    on the same centroid set by construction."""
    q = [float(v) for v in query_vec]
    qcol = F.array(*[F.lit(v) for v in q])
    centroids = spark.read.parquet(f"{index_dir}/centroids")
    cvec_d = F.transform(F.col("cvec"), lambda x: x.cast("double"))
    probe = [r["centroid_id"] for r in
             (centroids.select("centroid_id",
                               cosine(cvec_d, qcol).alias("qsim"))
              .orderBy(F.desc("qsim"), F.asc("centroid_id"))
              .limit(nprobe).collect())]
    data = _without_tombstones(
        spark, index_dir, spark.read.parquet(f"{index_dir}/data"),
        id_col)
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    qn = F.lit(_py_norm(q))  # literal query norm — value-identical
    return (
        data.where(F.col("centroid_id").isin(probe))
        .select(F.col(id_col),
                (_dot(vec_d, qcol) / (_norm(vec_d) * qn))
                .alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def ann_recall_report(spark: SparkSession, df: DataFrame, index_dir: str,
                      queries: DataFrame, k: int = 10,
                      nprobe_values: tuple[int, ...] = (1, 2, 4, 16),
                      query_id_col: str = "query_id",
                      query_vec_col: str = "qvec",
                      vec_col: str = "embedding",
                      id_col: str = "vec_id",
                      where: F.Column | None = None) -> DataFrame:
    """Recall@k evaluation of the persistent IVF index (X45): the
    nprobe sizing curve an operator reads before picking the
    latency/recall trade-off — per (nprobe, query), how many of the
    EXACT top-k the probed search returned.

    The exact reference is the brute-force per-query top-k over the
    full corpus (the q37 verification-tier arithmetic: per-operand
    norms precomputed, (cosine DESC, id ASC) tie-break — identical to
    the index search's ranking rule, so nprobe = n_centroids provably
    reaches recall 100 and anchors the curve's top end).  Every rung
    derives from ONE scored pass at max(nprobe) with the probe rank
    carried (optimization round 15 — a vector lives in exactly one
    centroid partition, so the rank ≤ p filter IS the nprobe = p
    candidate set; results identical to per-rung
    ``search_index_batch`` calls, hash-gated); hits are an inner join
    against the exact set on (query, vec); a (nprobe × query) spine
    keeps zero-recall rows visible instead of silently missing.

    Scale shape: the exact pass is the one corpus-sized stage — a
    broadcast of the bounded query batch over one scan (evaluation
    runs on a query SAMPLE, not the corpus; brute force over a sample
    is the standard recall protocol).  The max(nprobe) scored slice is
    row-narrow but up to |queries| × corpus rows, so it is cached
    DISK_ONLY and only under ``_RECALL_CACHE_MAX_INPUT_BYTES``
    (recomputed per rung beyond that — ADVICE r15); everything past
    the rung windows is k·|queries|·|nprobes| rows.  Returns (nprobe,
    query_id, n_hits,
    k, recall_pct) with all-integer recall so the q138 oracle gate is
    exact.

    ``where`` (X55, the filtered-recall curve — VERDICT r12 item 4):
    a metadata predicate changes recall SEMANTICS, not just the
    result set — candidates thin per probed partition, so the same
    nprobe recalls less than the unfiltered curve suggests, and an
    operator sizing nprobe for filtered queries (X52) has no curve to
    read from the unfiltered report.  With ``where`` set, the exact
    reference becomes the brute-force top-k over the FILTERED corpus
    (``df`` must carry the predicate's metadata columns — the same
    frame the index was built from) and every probed run is the X52
    filtered search with the same predicate, so the report is the
    apples-to-apples filtered sizing curve."""
    qvec_d = F.transform(F.col(query_vec_col), lambda x: x.cast("double"))
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    queries_n = queries.withColumn("__qnorm", _norm(qvec_d))
    exact = (
        (df.where(where) if where is not None else df)
        .withColumn("__dnorm", _norm(vec_d))
        .crossJoin(F.broadcast(queries_n))
        .select(query_id_col, id_col,
                (_dot(vec_d, qvec_d)
                 / (F.col("__dnorm") * F.col("__qnorm")))
                .alias("__cos"))
        .withColumn("__rn", F.row_number().over(
            Window.partitionBy(query_id_col)
            .orderBy(F.desc("__cos"), F.asc(id_col))))
        .where(F.col("__rn") <= k)
        .select(query_id_col, id_col)
    )
    # ONE scored pass at max(nprobe) with the probe RANK carried
    # (optimization round 15, guide §2.4): a vector lives in exactly
    # one centroid partition and probes are unique (query, centroid)
    # pairs, so the nprobe=p candidate set is EXACTLY the rows with
    # probe rank ≤ p — every rung's result derives from one scan +
    # one per-query top-k window instead of |nprobe_values| full
    # search jobs (the old shape re-read the pruned store per rung).
    # Caching posture (ADVICE r15): the scored frame is the LARGEST
    # rung's candidate set — row-NARROW (4 scalar columns, vectors
    # projected away) but up to |queries| × corpus rows when max_np
    # approaches n_centroids, so it is cached DISK_ONLY (never
    # executor memory) and only when the float corpus is small enough
    # that the slice provably fits local disk; above the bound the
    # rungs recompute the pass — the pre-round-15 cost envelope, with
    # results identical either way.  Cosines, tie-breaks and candidate
    # sets are identical to per-rung ``search_index_batch`` calls
    # (hash-gated q138/q152).
    max_np = int(max(int(n) for n in nprobe_values))
    centroids = spark.read.parquet(f"{index_dir}/centroids")
    cvec_d = F.transform(F.col("cvec"), lambda x: x.cast("double"))
    probes = (
        queries.crossJoin(F.broadcast(centroids))
        .select(query_id_col, "centroid_id",
                cosine(qvec_d, cvec_d).alias("qsim"))
        .withColumn("__prank", F.row_number().over(
            Window.partitionBy(query_id_col)
            .orderBy(F.desc("qsim"), F.asc("centroid_id"))))
        .where(F.col("__prank") <= max_np)
        .select(query_id_col, "centroid_id", "__prank"))
    data = spark.read.parquet(f"{index_dir}/data")
    if where is not None:
        data = data.where(where)
    data = _without_tombstones(spark, index_dir, data, id_col)
    scored = (
        data.withColumn("__dnorm", _norm(vec_d))
        .join(F.broadcast(probes), "centroid_id")
        .join(queries_n, query_id_col)
        .select(query_id_col, id_col, "__prank",
                (_dot(vec_d, qvec_d)
                 / (F.col("__dnorm") * F.col("__qnorm")))
                .alias("__cos"))
    )
    # driver-side size estimate, no extra job: the scored slice is a
    # few dozen bytes per probed (row, query) pair, so the float
    # corpus' scan estimate bounds it within a small factor of
    # |queries| — cache only while that is clearly local-disk sized
    est = int(data._jdf.queryExecution().optimizedPlan()
              .stats().sizeInBytes())
    if est <= _RECALL_CACHE_MAX_INPUT_BYTES:
        from pyspark import StorageLevel

        scored = scored.persist(StorageLevel.DISK_ONLY)
    runs = None
    for np_ in nprobe_values:
        got = (
            scored.where(F.col("__prank") <= int(np_))
            .withColumn("__rn", F.row_number().over(
                Window.partitionBy(query_id_col)
                .orderBy(F.desc("__cos"), F.asc(id_col))))
            .where(F.col("__rn") <= k)
            .select(F.lit(int(np_)).alias("nprobe"),
                    query_id_col, id_col))
        runs = got if runs is None else runs.unionByName(got)
    # the shared spine tail (quantize.recall_spine): hits, the
    # (nprobe × query) spine, all-integer recall — both join sides are
    # k-bounded (k·|queries|·|nprobes| rows at most), broadcast
    from .quantize import recall_spine

    return recall_spine(spark, runs, exact, queries, "nprobe",
                        [int(n) for n in nprobe_values], k,
                        query_id_col=query_id_col, id_col=id_col)
