"""Similarity search over embedding columns (array<float>).

Driver-mandated extension (no reference counterpart). Spark-first
design:

  - dot product / cosine as a sequential JVM-side fold
    (``F.aggregate`` over ``F.zip_with``) — deterministic
    (left-to-right, double precision), no Python, no UDF.
  - brute-force top-k: query-set × corpus join, ranked per query with
    a window. The query side is small by construction → broadcast; the
    corpus never shuffles. This is the exact baseline.
  - LSH-bucketed ANN (random hyperplanes): sign-bit bucket key from
    deterministic md5-derived planes; candidates only meet within a
    bucket — the scale path (bucket key is the shuffle/partition key).
"""

from __future__ import annotations

import json
import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast(T.DoubleType()))


def dot_product(a: Column, b: Column) -> Column:
    """Σ a_i·b_i as a strict left fold — order-deterministic."""
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity_col(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors per query vector.

    ``queries`` is expected to be small (it is broadcast); the corpus
    side streams through without a shuffle until the final per-query
    window (partitioned by query id — bounded cardinality).
    Self-matches (same id) are excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(F.col(vec_col)).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(F.col(vec_col)).alias("c_norm"),
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            # norms are per-row columns computed below the join (once per
            # vector), not per pair — same double result, 1 fold per pair
            # instead of 3
            (
                dot_product(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


def hyperplane_bucket(vec: Column, dim: int, num_planes: int = 8) -> Column:
    """Deterministic random-hyperplane LSH bucket id (0..2^planes-1).

    Plane p, component i has weight +1/-1 from bit parity of
    md5(p:i) — reproducible in any engine, no stored model. The bucket
    id is the concatenated sign pattern of the vector against each
    plane. Collisions preserve angular locality.

    The planes ship as one constant-folded nested array literal and the
    per-plane dot products are strict left folds — a compact expression
    tree (vs. planes×dim inline multiply-add nodes, which made codegen
    the dominant cost regardless of data size). Fold order matches the
    naive left-associated sum bit-for-bit, so oracle SQL written as
    `v[1]*s1 + v[2]*s2 + ...` agrees exactly.
    """
    import hashlib

    planes = [
        [
            1.0
            if int(hashlib.md5(f"{p}:{i}".encode()).hexdigest()[:8], 16) % 2
            else -1.0
            for i in range(dim)
        ]
        for p in range(num_planes)
    ]
    planes_lit = F.array(*[F.array(*[F.lit(w) for w in row]) for row in planes])
    powers = F.array(*[F.lit(1 << p).cast(T.LongType()) for p in range(num_planes)])
    v = _to_double(vec)
    dots = F.transform(
        planes_lit,
        lambda plane: F.aggregate(
            F.zip_with(plane, v, lambda w, x: w * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return F.aggregate(
        F.zip_with(
            dots,
            powers,
            lambda d, pw: F.when(d > 0, pw).otherwise(F.lit(0).cast(T.LongType())),
        ),
        F.lit(0).cast(T.LongType()),
        lambda acc, x: acc + x,
    )


def ann_lsh_multiprobe_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe LSH top-k: each query also probes the buckets at
    Hamming distance 1 from its own (flip one hyperplane sign).

    Recall recovery for vectors that sit near a hyperplane: the probe
    set explodes QUERY-side only (1 + num_planes rows per query), so the
    corpus still partitions by its single bucket id and the join stays
    an equi-join — the standard trick for raising LSH recall without
    growing buckets or falling back to a cross product.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(F.col(vec_col)).alias("q_norm"),
        hyperplane_bucket(F.col(vec_col), dim, num_planes).alias("q_bucket"),
    )
    probes = F.array(
        F.col("q_bucket"),
        *[
            F.col("q_bucket").bitwiseXOR(F.lit(1 << p)).cast(T.LongType())
            for p in range(num_planes)
        ],
    )
    q = q.withColumn("bucket", F.explode(probes))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(F.col(vec_col)).alias("c_norm"),
        hyperplane_bucket(F.col(vec_col), dim, num_planes).alias("bucket"),
    )
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                dot_product(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm"))
            ).alias("cosine"),
        )
        # a neighbor can appear via several probes — dedupe before rank
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


def near_dup_pairs(
    corpus: DataFrame,
    dim: int,
    threshold: float = 0.9,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: corpus self-join restricted
    to LSH buckets, kept when cosine ≥ threshold (id_a < id_b).

    The dedup analog of ann_lsh_topk: the bucket id is the shuffle key,
    so candidate generation is linear in bucket size, never the corpus
    cross product. High thresholds pair with high `num_planes` (near-
    identical vectors agree on almost every hyperplane sign).
    """
    side = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        l2_norm(F.col(vec_col)).alias("norm"),
        hyperplane_bucket(F.col(vec_col), dim, num_planes).alias("bucket"),
    )
    a, b = side.alias("a"), side.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (
                dot_product(F.col("a.vec"), F.col("b.vec"))
                / (F.col("a.norm") * F.col("b.norm"))
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


# Size budget (n_cells x dim values) for the literal (zero-shuffle) IVF
# assignment path. Since the r05 from_json rewrite the inlined centroid
# table is ONE constant-folded literal — the old janino/64KB compile
# wall from n_cells x dim Catalyst nodes no longer exists — but the
# folded array constant is serialized into the task binary of every
# stage that references it, so a real coarse quantizer (65k cells x
# 64 dims ≈ 33 MB of doubles) would bloat the plan broadcast. Above the
# budget the assignment switches to a broadcast nested-loop join +
# min_by argmin (the centroid table ships once as a proper broadcast
# relation; one map-side-combined shuffle, compact codegen).
IVF_LITERAL_MAX_NODES = 16384


def assign_ivf_cells(
    vectors: DataFrame,
    centroids,
    rank: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "vec",
    max_literal_nodes: int = IVF_LITERAL_MAX_NODES,
) -> DataFrame:
    """Nearest-`rank` IVF cells per vector by cosine against a (tiny)
    centroid table.

    Two physical strategies behind one contract, picked by centroid
    table size (n_cells x dim expression nodes vs ``max_literal_nodes``):

    - **literal** (small quantizers, e.g. <=256 cells x 64 dims): the
      centroid table is collected once and inlined as a nested array
      literal; each row scores all cells with strict left folds and a
      sort_array over (−score, cell_id) structs. Zero joins, zero
      windows, ZERO shuffles — the corpus never moves.
    - **broadcast-join** (real coarse quantizers, 4k–65k cells): a
      giant literal would hit the janino compile wall, so instead the
      centroid table (still metadata-sized) broadcast-nested-loop joins
      against the corpus and the argmin is a ``groupBy(id).agg(min_by)``
      — partial (map-side) aggregation collapses the n_cells fan-out to
      one row per vector per partition before the single corpus-sized
      shuffle. No window, no giant expression tree.

    Both paths score with the identical left-fold expression, so they
    agree bit-for-bit; ties break on cell_id — deterministic in any
    engine. ``id_col`` must be unique per row (the join path groups on
    it). rank=1 returns one cell per vector; rank>1 fans out to `rank`
    rows per vector.

    ``centroids``: a (cell_id, cv, cent_norm) DataFrame, or the same
    rows pre-collected (so multi-consumer callers collect once).
    """
    rows = (
        centroids
        if isinstance(centroids, list)
        else centroids.select("cell_id", "cv", "cent_norm").collect()
    )
    if not rows:
        raise ValueError("assign_ivf_cells: empty centroid table")
    dim = len(rows[0]["cv"])
    finite = all(
        math.isfinite(x) for r in rows for x in [*r["cv"], r["cent_norm"]]
    )
    if len(rows) * dim > max_literal_nodes or not finite:
        # join path: giant quantizers (see budget note above) and the
        # non-finite corner JSON cannot round-trip portably
        return _assign_ivf_cells_join(vectors, rows, rank, id_col, vec_col)
    in_cols = vectors.columns
    # Inline the centroid table as ONE string literal parsed with
    # from_json: ConstantFolding collapses it to a single array
    # constant during optimization (verified: no from_json survives in
    # the optimized plan), so analysis/codegen cost is O(1) in
    # n_cells x dim where the old F.array(F.lit(...) x 1024) tree made
    # Catalyst walk thousands of nodes per rule batch — that tree was
    # the measured 0.7-0.8 s/side driver-side floor on this query.
    # json.dumps emits shortest-round-trip doubles and Jackson parses
    # them back to the identical bits, so oracle agreement is
    # unaffected (bit-equality re-verified against the old path).
    cv_lit = F.from_json(
        F.lit(json.dumps([[float(x) for x in r["cv"]] for r in rows])),
        "array<array<double>>",
    )
    ids_lit = F.from_json(
        F.lit(json.dumps([int(r["cell_id"]) for r in rows])),
        "array<bigint>",
    )
    norms_lit = F.from_json(
        F.lit(json.dumps([float(r["cent_norm"]) for r in rows])),
        "array<double>",
    )
    v = _to_double(F.col(vec_col))
    ranked = F.sort_array(
        F.transform(
            cv_lit,
            lambda cv, i: F.struct(
                (
                    -(
                        F.aggregate(
                            F.zip_with(cv, v, lambda w, x: w * x),
                            F.lit(0.0),
                            lambda acc, x: acc + x,
                        )
                        / F.element_at(norms_lit, i + 1)
                    )
                ).alias("neg_s"),
                F.element_at(ids_lit, i + 1).alias("cell_id"),
            ),
        )
    )
    if rank == 1:
        return vectors.select(
            *in_cols, F.element_at(ranked, 1)["cell_id"].alias("cell_id")
        )
    return (
        vectors.withColumn("__cells", F.slice(ranked, 1, rank))
        .select(*in_cols, F.explode("__cells").alias("__c"))
        .select(*in_cols, F.col("__c.cell_id").alias("cell_id"))
    )


def _assign_ivf_cells_join(
    vectors: DataFrame,
    rows: list,
    rank: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Scale path for assign_ivf_cells (big quantizers): broadcast
    nested-loop join against the centroid table + min_by argmin.

    The scoring expression is the same strict left fold as the literal
    path (bit-for-bit identical doubles); the −score is materialized as
    a column so min_by over (neg_s, cell_id) structs reproduces the
    literal path's sort order exactly, including ties.
    """
    in_cols = vectors.columns
    spark = vectors.sparkSession
    cents_schema = T.StructType(
        [
            T.StructField("cell_id", T.LongType()),
            T.StructField("cv", T.ArrayType(T.DoubleType())),
            T.StructField("cent_norm", T.DoubleType()),
        ]
    )
    cents = spark.createDataFrame(
        [(int(r["cell_id"]), [float(x) for x in r["cv"]], float(r["cent_norm"])) for r in rows],
        cents_schema,
    )
    v = _to_double(F.col(vec_col))
    neg_s = -(
        F.aggregate(
            F.zip_with(F.col("cv"), v, lambda w, x: w * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / F.col("cent_norm")
    )
    scored = (
        vectors.join(F.broadcast(cents))
        .withColumn("__neg_s", neg_s)
        .drop("cv", "cent_norm")
    )
    order = F.struct(F.col("__neg_s"), F.col("cell_id"))
    if rank == 1:
        # payload rides inside min_by so one grouped aggregate yields the
        # full row — partial aggregation keeps the shuffle corpus-sized
        best = scored.groupBy(F.col(id_col).alias("__gid")).agg(
            F.min_by(F.struct(*in_cols, "cell_id"), order).alias("__best")
        )
        return best.select(*[F.col(f"__best.{c}").alias(c) for c in [*in_cols, "cell_id"]])
    ranked = scored.groupBy(F.col(id_col).alias("__gid")).agg(
        F.min_by(F.struct(*in_cols), order).alias("__row"),
        F.slice(
            F.sort_array(F.collect_list(F.struct(F.col("__neg_s"), F.col("cell_id")))),
            1,
            rank,
        ).alias("__cells"),
    )
    return ranked.select(
        *[F.col(f"__row.{c}").alias(c) for c in in_cols],
        F.explode("__cells").alias("__c"),
    ).select(*in_cols, F.col("__c.cell_id").alias("cell_id"))


def train_ivf_centroids(
    corpus: DataFrame,
    init_ids: list[int] | Column,
    dim: int,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign_max_literal_nodes: int = IVF_LITERAL_MAX_NODES,
) -> DataFrame:
    """Lloyd's k-means for the IVF coarse quantizer, as pure DataFrame
    ops — deterministic at ANY parallelism, so the trained index is
    reproducible and oracle-checkable.

    Each iteration is (1) nearest-cell assignment via the broadcast
    centroid table (no corpus shuffle) and (2) a single groupBy
    computing per-cell component sums. Two deliberate deviations from
    textbook Lloyd's make it engine-deterministic:

      - centroids are represented by component-wise SUMS, never divided
        by the count: cosine is scale-invariant, so ranking against the
        sum vector equals ranking against the mean — and skipping the
        division avoids engine-specific decimal-division rounding;
      - the sums are member-id-ORDERED double folds (the same fix
        train_pq_codebooks uses): casting an arbitrary double to
        DECIMAL rounds differently across engines at the 12th-place
        boundary (Spark rounds the shortest decimal repr, DuckDB the
        exact binary expansion — the 1-ulp divergence observed in PQ
        codebook training), while folding the raw doubles in explicit
        vec_id order is bit-exact everywhere AND deterministic at any
        parallelism. Memory per (cell, dim) group is bounded by cell
        population — coarse quantizers train on a bounded sample at
        any real scale, exactly like PQ codebooks.

    A cell that captures no vectors drops out (k shrinks) — also
    deterministic. Returns (cell_id, cv: array<double>, cent_norm).

    ``assign_max_literal_nodes``: training uses the same size-based
    assignment policy as serving — the zero-shuffle literal plan under
    the node budget, the broadcast-join argmin above it. Measured at a
    small quantizer (80 cells x 64 dims): literal assignment executes
    ~6x faster warm than the join path (0.12 s vs 0.78 s — the join
    evaluates cells x corpus fold pairs before the argmin collapses
    them; the literal fold is one codegen'd pass), and its
    per-iteration recompile is negligible at in-budget sizes; the
    compile wall only bites at real coarse-quantizer sizes (4k-65k
    cells), exactly where the budget flips the strategy. Override to 0
    to force the join path.
    """
    v = corpus.select(
        F.col(id_col).alias("vid"), _to_double(F.col(vec_col)).alias("v")
    )
    # init_ids: explicit seed ids, or a predicate over the corpus's own
    # columns (e.g. pmod(vec_id, stride) == 0 — scales with the corpus
    # without a driver-side collect)
    seed = (
        F.col(id_col).isin(init_ids)
        if isinstance(init_ids, (list, tuple))
        else init_ids
    )
    cents = corpus.filter(seed).select(
        F.col(id_col).alias("cell_id"),
        _to_double(F.col(vec_col)).alias("cv"),
        l2_norm(F.col(vec_col)).alias("cent_norm"),
    )
    for _ in range(iters):
        assigned = assign_ivf_cells(
            v, cents, rank=1, id_col="vid", vec_col="v",
            max_literal_nodes=assign_max_literal_nodes,
        )
        # component sums via posexplode + ONE generic aggregate per
        # (cell, dim) instead of `dim` parallel sum columns: the wide
        # form compiled a ~7 s whole-stage-codegen tree (64 aggregates)
        # before touching any data; the narrow form is generic exprs
        # with near-zero compile. The per-component sum is a vec_id-
        # ordered double fold (see docstring — the PQ 1-ulp decimal
        # hazard, fixed the same way), one extra metadata-sized shuffle
        # (n_cells x dim rows) for the re-assembly groupBy.
        sums = (
            assigned.select(
                "cell_id",
                F.col("vid"),
                F.posexplode("v").alias("__dim", "__x"),
            )
            .groupBy("cell_id", "__dim")
            .agg(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("vid", "__x"))),
                    F.lit(0.0),
                    lambda acc, st: acc + st["__x"],
                ).alias("__s")
            )
        )
        cents = (
            sums.groupBy("cell_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__dim", "__s"))),
                    lambda st: st["__s"],
                ).alias("cv")
            )
            .withColumn("cent_norm", l2_norm(F.col("cv")))
        )
    return cents


def ann_ivf_trained_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    init_ids: list[int] | Column | None = None,
    iters: int = 2,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN over k-means-trained cells (vs ann_ivf_topk's
    sample-as-centroid quantizer): train with ``train_ivf_centroids``,
    then the same probe/candidate plan — broadcast cell assignment,
    equi-join on cell_id."""
    if init_ids is None:
        raise ValueError("ann_ivf_trained_topk requires explicit init_ids")
    cents = train_ivf_centroids(
        corpus, init_ids, dim, iters=iters, id_col=id_col, vec_col=vec_col
    )
    # materialize the trained index: centroids are metadata-sized (one
    # row per cell) by construction, and both the corpus-assignment and
    # query-probe subtrees consume them — collecting once stops the
    # whole training lineage re-executing per consumer. Doubles
    # round-trip the driver exactly, so determinism is unaffected.
    cents = cents.collect()
    return _ivf_topk_over_cells(
        queries, corpus, cents, k=k, n_probe=n_probe, id_col=id_col, vec_col=vec_col
    )


def ann_ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    centroid_ids: list[int] | None = None,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) ANN top-k: data-dependent coarse quantizer.

    Complements the LSH path: cells are actual corpus vectors (the rows
    whose ids are in ``centroid_ids`` — a deterministic strided sample
    by default at a real scale you'd feed k-means centroids), so cell
    populations adapt to the data distribution where hyperplane buckets
    are data-oblivious. Corpus vectors are assigned to their nearest
    cell (1 broadcast join, no shuffle until the candidate join);
    queries probe their ``n_probe`` nearest cells. The candidate join
    is an equi-join on cell_id — the cell is the shuffle/partition key,
    exactly like the LSH bucket, and fan-out is bounded by cell size ×
    n_probe.
    """
    if not centroid_ids:
        raise ValueError("ann_ivf_topk requires explicit centroid_ids")
    cents = corpus.filter(F.col(id_col).isin(centroid_ids)).select(
        F.col(id_col).alias("cell_id"),
        _to_double(F.col(vec_col)).alias("cv"),
        l2_norm(F.col(vec_col)).alias("cent_norm"),
    )
    return _ivf_topk_over_cells(
        queries, corpus, cents, k=k, n_probe=n_probe, id_col=id_col, vec_col=vec_col
    )


def _ivf_topk_over_cells(
    queries: DataFrame,
    corpus: DataFrame,
    cents: DataFrame,
    k: int,
    n_probe: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Shared IVF probe/candidate plan over a (cell_id, cv, cent_norm)
    table: broadcast cell assignment, candidates meet via the cell_id
    equi-join — the cell is the shuffle key, never a cross product."""
    # collect the (metadata-sized) centroid table ONCE — both the
    # corpus-assignment and query-probe subtrees consume the same rows,
    # and assign_ivf_cells would otherwise run its own collect job
    # (plus a duplicate parquet scan of the centroid subtree) per side
    if not isinstance(cents, list):
        cents = cents.select("cell_id", "cv", "cent_norm").collect()
    c_side = assign_ivf_cells(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            l2_norm(F.col(vec_col)).alias("c_norm"),
        ),
        cents,
        rank=1,
        id_col="neighbor_id",
        vec_col="c_vec",
    )
    q_side = assign_ivf_cells(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            l2_norm(F.col(vec_col)).alias("q_norm"),
        ),
        cents,
        rank=n_probe,
        id_col="query_id",
        vec_col="q_vec",
    )
    scored = (
        q_side.join(c_side, "cell_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                dot_product(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm"))
            ).alias("cosine"),
        )
        # a neighbor can be reached through several probed cells
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


def ann_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    The equi-join on the bucket id replaces the full cross product —
    at 100 TB the bucket is the shuffle key and each bucket holds
    ~corpus/2^planes vectors. Recall is tunable via num_planes (fewer
    planes → bigger buckets → higher recall).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(F.col(vec_col)).alias("q_norm"),
        hyperplane_bucket(F.col(vec_col), dim, num_planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(F.col(vec_col)).alias("c_norm"),
        hyperplane_bucket(F.col(vec_col), dim, num_planes).alias("bucket"),
    )
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                dot_product(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) ANN
# ---------------------------------------------------------------------------


def _sq_l2(a: Column, b: Column) -> Column:
    """Squared L2 distance as a strict left fold over zip — identical
    evaluation order to the oracle's list_reduce, so doubles match
    bit-for-bit (0.0 + x == x exactly, so the init makes no bits)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _pq_subvectors(df: DataFrame, dim: int, n_sub: int, id_col: str, vec_col: str) -> DataFrame:
    """(id, m, sv): the vector split into n_sub contiguous subvectors."""
    d = dim // n_sub
    v = _to_double(F.col(vec_col))
    return df.select(
        F.col(id_col).alias("vid"),
        F.posexplode(
            F.array(*[F.slice(v, m * d + 1, d) for m in range(n_sub)])
        ).alias("m", "sv"),
    )


def _pq_assign(sub: DataFrame, codebook: DataFrame) -> DataFrame:
    """Nearest codeword per (vid, m): broadcast the (tiny) codebook,
    argmin via one grouped min over (dist, code) structs — partial
    aggregation collapses the K-way fan-out map-side, so the single
    shuffle carries one row per (vid, m). Ties break on code id."""
    scored = sub.join(F.broadcast(codebook), "m").withColumn(
        "__d", _sq_l2(F.col("sv"), F.col("cw"))
    )
    best = scored.groupBy("vid", "m").agg(
        F.min(F.struct(F.col("__d"), F.col("code"))).alias("__best")
    )
    return best.select("vid", "m", F.col("__best.code").alias("code"))


def train_pq_codebooks(
    corpus: DataFrame,
    seed_ids: list[int],
    dim: int,
    n_sub: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-subspace k-means codebooks (Lloyd's), engine-deterministic:

      - init: the seed rows' own subvectors (code id = seed id, so
        ties are reproducible);
      - update: member-id-ORDERED double folds (collect members per
        codeword sorted by vid, fold each component left-to-right) —
        bit-exact across engines and at any parallelism, unlike a
        double-to-DECIMAL cast whose rounding diverges between Spark
        and DuckDB at the 12th place (see the inline note below).
        The division by count is required here (unlike the cosine
        IVF trainer): L2 is not scale-invariant, so the sum vector
        would NOT rank like the mean;
      - a codeword that captures no subvectors drops out.

    Returns (m, code, cw: array<double>) — n_sub x K rows, metadata-
    sized by construction (the corpus never shuffles wider than
    (vid, m, code))."""
    d = dim // n_sub
    sub = _pq_subvectors(corpus, dim, n_sub, id_col, vec_col)
    cb = (
        _pq_subvectors(
            corpus.filter(F.col(id_col).isin(seed_ids)), dim, n_sub, id_col, vec_col
        )
        .select("m", F.col("vid").alias("code"), F.col("sv").alias("cw"))
    )
    for _ in range(iters):
        assigned = _pq_assign(sub, cb)
        # Member-ID-ORDERED double summation instead of decimal
        # accumulation: casting an arbitrary double to DECIMAL rounds
        # differently across engines at the 12th-place boundary (Spark
        # rounds the shortest decimal repr, DuckDB the exact binary
        # expansion — observed: 1 divergent codeword component in ~30k
        # casts), while folding the raw doubles in an explicit member
        # order is bit-exact everywhere AND deterministic at any
        # parallelism. Memory is bounded by codeword population — PQ
        # codebooks train on a bounded sample at any real scale.
        members = assigned.join(sub, ["vid", "m"]).groupBy("m", "code").agg(
            F.array_sort(F.collect_list(F.struct("vid", "sv"))).alias("__mem"),
            F.count(F.lit(1)).alias("__n"),
        )
        def _comp_mean(i: int):
            return (
                F.aggregate(
                    F.col("__mem"),
                    F.lit(0.0),
                    lambda acc, st: acc + F.element_at(st["sv"], i + 1),
                )
                / F.col("__n")
            )

        cb = members.select(
            "m",
            "code",
            F.array(*[_comp_mean(i) for i in range(d)]).alias("cw"),
        )
    return cb


def ann_pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    seed_ids: list[int],
    n_sub: int = 8,
    k: int = 5,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ ANN with asymmetric distance computation (ADC).

    The corpus is compressed to ``n_sub`` small codes per vector (here
    8 codes ≈ 8 bytes vs 64 float dims = 32x memory compression — the
    reason PQ is THE billion-scale ANN representation); each query
    builds a (m, code) → partial-distance lookup table against the
    trained codebooks, and a neighbor's approximate distance is the
    m-ordered sum of 8 table lookups instead of a 64-dim dot product.

    Scale shape: codebooks and the per-query LUT are metadata-sized
    (n_sub x K and |Q| x n_sub x K); the corpus moves only as
    (vid, m, code) triples. The LUT join fans each corpus code row by
    |Q| — at real scale you batch queries or pre-restrict candidates
    with an IVF cell key (IVF-PQ), which this operator composes with.
    The final distance folds the 8 contributions in m order (via a
    sorted collect) so the double addition sequence — and therefore
    every bit of the result — matches the oracle.

    Returns (query_id, neighbor_id, approx_dist, rnk), rnk <= k by
    ascending ADC distance, ties on neighbor_id.
    """
    codes, lut = _pq_codes_and_lut(
        queries, corpus, dim, seed_ids, n_sub, iters, id_col, vec_col
    )
    pairs = codes.join(F.broadcast(lut), ["m", "code"]).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    return _adc_topk(pairs, k)


def _pq_codes_and_lut(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    seed_ids: list[int],
    n_sub: int,
    iters: int,
    id_col: str,
    vec_col: str,
):
    """Shared PQ index build: (corpus codes, per-query LUT)."""
    cb = train_pq_codebooks(
        corpus, seed_ids, dim, n_sub=n_sub, iters=iters,
        id_col=id_col, vec_col=vec_col,
    )
    cb = corpus.sparkSession.createDataFrame(
        [(int(r["m"]), int(r["code"]), [float(x) for x in r["cw"]]) for r in cb.collect()],
        T.StructType(
            [
                T.StructField("m", T.IntegerType()),
                T.StructField("code", T.LongType()),
                T.StructField("cw", T.ArrayType(T.DoubleType())),
            ]
        ),
    )
    codes = _pq_assign(
        _pq_subvectors(corpus, dim, n_sub, id_col, vec_col), cb
    ).withColumnRenamed("vid", "neighbor_id")
    lut = (
        _pq_subvectors(queries, dim, n_sub, id_col, vec_col)
        .join(F.broadcast(cb), "m")
        .select(
            F.col("vid").alias("query_id"),
            "m",
            "code",
            _sq_l2(F.col("sv"), F.col("cw")).alias("contrib"),
        )
    )
    return codes, lut


def _adc_topk(pairs: DataFrame, k: int) -> DataFrame:
    """(query_id, neighbor_id, m, contrib) rows → top-k by the
    m-ordered ADC distance fold (bit-exact: fixed summation order)."""
    dists = pairs.groupBy("query_id", "neighbor_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("m", "contrib"))),
            F.lit(0.0),
            lambda acc, st: acc + st["contrib"],
        ).alias("approx_dist")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        dists.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "approx_dist", "rnk")
    )


def ann_ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    centroid_ids: list[int],
    seed_ids: list[int],
    n_sub: int = 8,
    k: int = 5,
    n_probe: int = 2,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ: coarse cells restrict the candidate set, PQ codes score
    it — the production billion-scale ANN composition (FAISS's
    IndexIVFPQ shape).

    The two indexes divide the problem: the IVF cell key turns
    candidate generation into a bucket equi-join (a query scores only
    its ``n_probe`` probed cells' populations, not the corpus), and
    within the candidates the ADC lookup replaces the full-width
    distance, so the scored rows are (vid, m, code) triples — at no
    point does a full-width vector pair cross a shuffle. Both index
    builds broadcast metadata-sized tables only.

    Returns (query_id, neighbor_id, approx_dist, rnk) with the same
    deterministic ordering contract as ann_pq_topk.
    """
    cents = (
        corpus.filter(F.col(id_col).isin(centroid_ids))
        .select(
            F.col(id_col).alias("cell_id"),
            _to_double(F.col(vec_col)).alias("cv"),
            l2_norm(F.col(vec_col)).alias("cent_norm"),
        )
        .collect()
    )
    c_cells = assign_ivf_cells(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v")),
        cents, rank=1, id_col="neighbor_id", vec_col="v",
    ).select("neighbor_id", "cell_id")
    q_cells = assign_ivf_cells(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("v")),
        cents, rank=n_probe, id_col="query_id", vec_col="v",
    ).select("query_id", "cell_id")
    cand = (
        q_cells.join(c_cells, "cell_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    codes, lut = _pq_codes_and_lut(
        queries, corpus, dim, seed_ids, n_sub, iters, id_col, vec_col
    )
    pairs = cand.join(codes, "neighbor_id").join(
        F.broadcast(lut), ["query_id", "m", "code"]
    )
    return _adc_topk(pairs, k)


def sq8_stats(
    corpus: DataFrame, dim: int, vec_col: str = "embedding"
) -> tuple[list[float], list[float]]:
    """Per-dimension min/max over the corpus — the scalar-quantizer
    codebook. One posexplode aggregate; the collect is dim-sized
    metadata (like IVF centroids)."""
    rows = (
        corpus.select(F.posexplode(_to_double(F.col(vec_col))).alias("pos", "val"))
        .groupBy("pos")
        .agg(F.min("val").alias("lo"), F.max("val").alias("hi"))
        .collect()
    )
    lo = [0.0] * dim
    hi = [0.0] * dim
    for r in rows:
        lo[r["pos"]] = r["lo"]
        hi[r["pos"]] = r["hi"]
    return lo, hi


def _sq8_codes(vec: Column, lo: list[float], hi: list[float]) -> Column:
    """int8 codes 0..255 per dimension: floor((v-lo)*255/(hi-lo)+0.5),
    clamped; a constant dimension (hi == lo) codes to 0. Two from_json
    constant arrays, never dim*2 Literal nodes (the r05 IVF lesson)."""
    import json as _json

    lo_a = F.from_json(F.lit(_json.dumps(lo)), "array<double>")
    hi_a = F.from_json(F.lit(_json.dumps(hi)), "array<double>")
    return F.transform(
        _to_double(vec),
        lambda x, i: F.when(
            F.get(hi_a, i) == F.get(lo_a, i), F.lit(0).cast(T.LongType())
        ).otherwise(
            F.least(
                F.greatest(
                    F.floor(
                        (x - F.get(lo_a, i))
                        * F.lit(255.0)
                        / (F.get(hi_a, i) - F.get(lo_a, i))
                        + F.lit(0.5)
                    ),
                    F.lit(0),
                ),
                F.lit(255),
            ).cast(T.LongType())
        ),
    )


def ann_sq8_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scalar-quantization ANN (the FAISS SQ8 shape): corpus and
    queries quantized to uint8 codes with a shared per-dim min/max
    codebook (4× smaller than float32, 8× smaller than the double
    pipeline), candidates ranked by the INTEGER code dot product —
    order-free exact, so rank and oracle agree bit-for-bit — and the
    surviving top-k re-scored with the exact double cosine (strict
    left fold) for the final output.

    Returns (query_id, neighbor_id, iscore, cosine, rnk); rnk is the
    int-score rank (ties by neighbor id).

    Scale shape: the codebook is one dim-sized metadata collect; codes
    ship as array<long> per row (narrow); the query side is broadcast
    like brute_force_topk; the exact re-score touches only q*k rows.
    """
    lo, hi = sq8_stats(corpus, dim, vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _sq8_codes(F.col(vec_col), lo, hi).alias("q_code"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _sq8_codes(F.col(vec_col), lo, hi).alias("c_code"),
    )
    iscore = F.aggregate(
        F.zip_with(F.col("q_code"), F.col("c_code"), lambda x, y: x * y),
        F.lit(0).cast(T.LongType()),
        lambda acc, x: acc + x,
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            "q_vec",
            "c_vec",
            iscore.alias("iscore"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("iscore").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("iscore").cast(T.LongType()).alias("iscore"),
            cosine_similarity_col(F.col("q_vec"), F.col("c_vec")).alias(
                "cosine"
            ),
            F.col("rnk").cast(T.LongType()).alias("rnk"),
        )
    )


def recall_at_k(
    truth: DataFrame,
    approx: DataFrame,
    k: int,
    query_col: str = "query_id",
    neighbor_col: str = "neighbor_id",
) -> DataFrame:
    """Recall@k of an approximate neighbor list against exact ground
    truth: per query, |approx ∩ truth| / k. Queries with zero hits
    (or absent from ``approx``) report 0 — the honest eval, not a
    silent drop.

    Scale shape: both inputs are (query, neighbor) lists of at most k
    rows per query; the semi-join and count shuffle on the query key
    only. recall = hits / k is ONE double division of exact integers.
    """
    t = truth.select(query_col, neighbor_col)
    a = approx.select(query_col, neighbor_col)
    hits = (
        t.join(a, [query_col, neighbor_col], "left_semi")
        .groupBy(query_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        t.select(query_col)
        .distinct()
        .join(hits, query_col, "left")
        .select(
            F.col(query_col),
            F.coalesce(F.col("n_hits"), F.lit(0))
            .cast(T.LongType())
            .alias("n_hits"),
            (
                F.coalesce(F.col("n_hits"), F.lit(0)).cast(T.DoubleType())
                / F.lit(float(k))
            ).alias("recall"),
        )
    )


def rp_project(vec: Column, d_in: int, d_out: int, salt: str = "rp") -> Column:
    """Sign-random-projection of a ``d_in`` vector down to ``d_out``
    dims (Achlioptas 2003: a ±1 projection matrix satisfies the
    Johnson-Lindenstrauss lemma — database-friendly, no gaussians).

    Row j, component i carries weight +1/-1 from bit parity of
    md5(salt || j:i) — reproducible in any engine, no stored model
    (the same convention as ``hyperplane_bucket``, distinct salt).
    The matrix ships as one constant-folded nested array literal and
    each output component is a strict left fold over the input — the
    oracle's left-associated `v[1]*s1 + v[2]*s2 + ...` matches
    bit-for-bit. (Unlike ``hyperplane_bucket`` the REAL projected
    values are kept, not just their signs: downstream ranking happens
    in the reduced space, so this is dimensionality reduction, not
    bucketing.) 1/sqrt(d_out) rescaling is omitted — cosine ranking
    is scale-invariant and dropping the factor keeps every double an
    exact ±-sum of input floats.
    """
    import hashlib

    rows = [
        [
            1.0
            if int(hashlib.md5(f"{salt}{j}:{i}".encode()).hexdigest()[:8], 16) % 2
            else -1.0
            for i in range(d_in)
        ]
        for j in range(d_out)
    ]
    rows_lit = F.array(*[F.array(*[F.lit(w) for w in row]) for row in rows])
    v = _to_double(vec)
    return F.transform(
        rows_lit,
        lambda row: F.aggregate(
            F.zip_with(row, v, lambda w, x: w * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )


def ann_rp_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    d_out: int = 16,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k in a sign-random-projected ``d_out``-
    dim space (JL lemma: pairwise angles are approximately preserved,
    so reduced-space ranking tracks full-space ranking).

    The scale story vs brute force: every pairwise score folds
    ``d_out`` components instead of ``dim`` — a 4× (64→16) flop and
    width cut on the all-pairs stage, and at 100 TB the projected
    corpus (16 doubles) is what shuffles/caches, not the raw vectors.
    Same contract as ``brute_force_topk`` otherwise: queries side
    broadcast, per-query bounded window, self-matches excluded,
    deterministic (cosine desc, id) order.
    """
    qp = queries.select(
        F.col(id_col), rp_project(F.col(vec_col), dim, d_out).alias("rp")
    )
    cp = corpus.select(
        F.col(id_col), rp_project(F.col(vec_col), dim, d_out).alias("rp")
    )
    return brute_force_topk(qp, cp, k=k, id_col=id_col, vec_col="rp")


def hard_negative_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    max_cos: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hard-negative mining for contrastive training: per anchor, the
    ``k`` MOST similar corpus vectors whose cosine stays BELOW
    ``max_cos`` — close enough to be informative negatives, below the
    near-duplicate band that would poison the loss with false
    negatives (the standard ANN-mining recipe behind dense-retriever
    and embedding-model training sets).

    Same contract as ``brute_force_topk`` (anchor side broadcast,
    self-matches excluded, deterministic (cosine desc, id) order);
    the ``cosine < max_cos`` cut is a plain filter below the per-
    anchor window, so the excluded near-dup band never enters the
    top-k sort. Returns (query_id, neighbor_id, cosine, rnk).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(F.col(vec_col)).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(F.col(vec_col)).alias("c_norm"),
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                dot_product(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm"))
            ).alias("cosine"),
        )
        .filter(F.col("cosine") < F.lit(float(max_cos)))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


def label_margin(
    corpus: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Embedding-space quality eval against labeled classes: per
    vector, cosine to its OWN label centroid vs the best foreign
    centroid — ``margin = cos_own - max_other``. Aggregated, this is
    the intra/inter-class separation report an embedding-model
    training run watches; per-vector, negative margins flag mislabeled
    or boundary examples (the label-noise audit for training data).

    Determinism (the IVF/PQ discipline): centroids are component-wise
    vec-id-ORDERED double folds of the raw vectors, represented as
    SUMS (cosine is scale-invariant, the count division never
    happens); per-pair cosines are strict left folds; max over foreign
    centroids is order-free. Bit-exact at any parallelism.

    Returns (id_col, label_col, cos_own, max_other, margin), one row
    per corpus vector.

    Scale shape: the centroid build is one posexplode aggregate keyed
    (label, dim) — map-side combinable, |labels| x dim output rows;
    scoring joins the corpus against the LABELS-sized broadcast (a
    bounded dimension by definition — classes, not vectors); one
    narrow per-vector aggregate for own/max-other. The corpus never
    self-joins and never shuffles wider than (id, label, component).
    """
    v = corpus.select(
        F.col(id_col).alias("vid"),
        F.col(label_col).alias("lab"),
        _to_double(F.col(vec_col)).alias("v"),
    )
    sums = (
        v.select("lab", "vid", F.posexplode("v").alias("__dim", "__x"))
        .groupBy("lab", "__dim")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("vid", "__x"))),
                F.lit(0.0),
                lambda acc, st: acc + st["__x"],
            ).alias("__s")
        )
    )
    cents = (
        sums.groupBy("lab")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__dim", "__s"))),
                lambda st: st["__s"],
            ).alias("cv")
        )
        .select(
            F.col("lab").alias("clab"),
            "cv",
            l2_norm(F.col("cv")).alias("cn"),
        )
    )
    scored = (
        v.withColumn("vn", l2_norm(F.col("v")))
        .join(F.broadcast(cents))
        .select(
            "vid",
            "lab",
            "clab",
            (
                dot_product(F.col("v"), F.col("cv"))
                / (F.col("vn") * F.col("cn"))
            ).alias("cos"),
        )
    )
    agg = scored.groupBy("vid", "lab").agg(
        F.max(F.when(F.col("lab") == F.col("clab"), F.col("cos"))).alias(
            "cos_own"
        ),
        F.max(F.when(F.col("lab") != F.col("clab"), F.col("cos"))).alias(
            "max_other"
        ),
    )
    return agg.select(
        F.col("vid").alias(id_col),
        F.col("lab").alias(label_col),
        "cos_own",
        "max_other",
        (F.col("cos_own") - F.col("max_other")).alias("margin"),
    )


def knn_label_eval(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Leave-one-out k-NN classification accuracy over a labeled
    embedding set — the standard embedding-quality eval (does the
    space cluster by label?) and the label-noise screen (a label that
    loses its own neighborhood vote is suspect).

    Per query vector: exact cosine top-k neighbors (self excluded),
    majority vote over neighbor labels, tie broken toward the SMALLER
    label id (deterministic); a query is correct when the vote equals
    its own label. Returns one row per label:
    (label, n_queries, n_correct, accuracy), label ascending.

    Determinism: cosines are strict left folds over per-row norms;
    the vote is min(struct(-count, label)) — both order-free; accuracy
    is one IEEE division of exact longs.

    Scale shape: ``queries`` is the labeled EVAL SAMPLE — bounded by
    labeling cost, broadcast by construction (the brute_force_topk
    contract); the corpus streams through the broadcast join with no
    shuffle until the per-query bounded window. For corpus-scale
    self-eval, swap the exact scorer for the IVF/LSH candidate join —
    the vote/accuracy tail below is unchanged.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("qlab"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(F.col(vec_col)).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("nlab"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(F.col(vec_col)).alias("c_norm"),
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "qlab",
            "nlab",
            "neighbor_id",
            (
                dot_product(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    votes = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .groupBy("query_id", "qlab", "nlab")
        .agg(F.count(F.lit(1)).cast(T.LongType()).alias("cnt"))
    )
    pred = votes.groupBy("query_id", "qlab").agg(
        F.min(
            F.struct((-F.col("cnt")).alias("nc"), F.col("nlab").alias("lab"))
        )["lab"].alias("pred")
    )
    return (
        pred.groupBy(F.col("qlab").alias("label"))
        .agg(
            F.count(F.lit(1)).cast(T.LongType()).alias("n_queries"),
            F.sum((F.col("pred") == F.col("qlab")).cast(T.LongType()))
            .cast(T.LongType())
            .alias("n_correct"),
        )
        .select(
            "label",
            "n_queries",
            "n_correct",
            (
                F.col("n_correct").cast(T.DoubleType())
                / F.col("n_queries").cast(T.DoubleType())
            ).alias("accuracy"),
        )
        .orderBy("label")
    )


def sign_signature(vec: Column, dim: int) -> Column:
    """Pack a vector's component signs into 32-bit words:
    word w, bit j set iff v[w*32 + j] > 0. Returns array<long> of
    ceil(dim/32) words — the 1-bit-per-dimension binary embedding
    (64 floats -> 8 bytes, a 32x shuffle-width cut).

    Bits accumulate with bitwise OR over CONSTANT powers of two
    (unrolled per bit, like the RP plane literals) — no runtime
    shifts, no overflow anywhere (bit 31 < 2^62), identical in any
    engine with CASE + | .
    """
    v = _to_double(vec)
    words = []
    for w in range(0, dim, 32):
        bits = F.lit(0).cast(T.LongType())
        for j in range(min(32, dim - w)):
            bits = bits.bitwiseOR(
                F.when(
                    F.element_at(v, w + j + 1) > F.lit(0.0),
                    F.lit(1 << j).cast(T.LongType()),
                ).otherwise(F.lit(0).cast(T.LongType()))
            )
        words.append(bits)
    return F.array(*words)


def hamming_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Binary-embedding ANN: exact top-k by Hamming distance over
    sign signatures — the most compressed scan in the ANN family
    (PQ 32x, SQ8 4x, sign bits 32x AND distance becomes popcount).
    Sign-random-projection theory (Charikar 2002) makes the Hamming
    distance a monotone estimator of angular distance, so the binary
    scan is the standard first-stage filter before an exact re-rank.

    Distance = sum over words of bit_count(xor(a, b)) — pure integer,
    exact; ties break (hamming asc, neighbor id asc). Self-matches
    excluded. Returns (query_id, neighbor_id, hamming, rnk).

    Scale shape: signatures are computed map-side (8 bytes per vector
    crosses the join instead of 256+); the anchor side broadcasts
    (brute_force_topk's contract) and the per-anchor window is
    bounded. At corpus scale, bucket the top signature word and
    equi-join buckets exactly like the LSH path.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        sign_signature(F.col(vec_col), dim).alias("q_sig"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        sign_signature(F.col(vec_col), dim).alias("c_sig"),
    )
    dist = F.aggregate(
        F.zip_with(
            F.col("q_sig"),
            F.col("c_sig"),
            lambda a, b: F.bit_count(a.bitwiseXOR(b)).cast(T.LongType()),
        ),
        F.lit(0).cast(T.LongType()),
        lambda acc, x: acc + x,
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", dist.alias("hamming"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "hamming", "rnk")
    )
