"""IVF k-means training invariants (extensions/similarity.py).

The correctness bar for the trained quantizer is ENGINE DETERMINISM:
centroid component sums are vec_id-ordered double folds (the same
pattern as PQ codebook training — explicit order, no double→decimal
cast whose rounding differs across engines) and are never divided by
the count (cosine is scale-invariant), so the same corpus must yield
bit-identical centroids at any partitioning — that's what lets a
DuckDB oracle replay the training (test_queries /
q_emb_ann_ivf_trained pins the cross-engine half)."""

import pytest
from pyspark.sql import functions as F

from walex_spark.extensions import similarity as sim

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _train(df, iters=2):
    cents = sim.train_ivf_centroids(
        df, F.pmod(F.col("vec_id"), F.lit(25)) == 0, dim=64, iters=iters
    )
    return sorted(
        (r.cell_id, tuple(r.cv), r.cent_norm) for r in cents.collect()
    )


def test_training_partitioning_invariant(emb):
    """Bit-identical centroids whether the corpus is 1 or 8 partitions —
    a raw double sum would differ in the last bits and flip argmins."""
    assert _train(emb.repartition(1)) == _train(emb.repartition(8))


def test_training_moves_centroids_and_keeps_schema(emb):
    c0 = _train(emb, iters=0)
    c2 = _train(emb, iters=2)
    assert c0 and c2
    # training actually updates the vectors (not a no-op pipeline)
    assert c0 != c2
    # cells only ever shrink (empty cells drop out), never grow
    assert len(c2) <= len(c0)
    assert all(len(cv) == 64 for _, cv, _ in c2)


def test_trained_topk_shape(emb):
    out = sim.ann_ivf_trained_topk(
        emb.filter(F.col("vec_id") < 4), emb, dim=64, k=3,
        init_ids=F.pmod(F.col("vec_id"), F.lit(25)) == 0,
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2, 3}
    for q, rows in by_q.items():
        assert len(rows) <= 3
        assert all(r.neighbor_id != q for r in rows)
        ranks = sorted(r.rnk for r in rows)
        assert ranks == list(range(1, len(rows) + 1))


def test_trained_requires_init():
    with pytest.raises(ValueError):
        sim.ann_ivf_trained_topk(None, None, dim=64)


def test_centroid_sums_match_python_ordered_fold(emb, spark):
    """Model test for the summation path that carried the decimal-cast
    hazard (SURVEY §12.1): after one Lloyd's iteration, every centroid
    component must bit-equal a pure-Python left fold of the assigned
    members' components in vec_id order. A double→decimal→double
    round-trip (the old implementation) diverges from this fold by
    1 ulp whenever a member component's shortest decimal repr rounds
    across the 12th-place boundary; the ordered fold cannot."""
    seed = F.pmod(F.col("vec_id"), F.lit(25)) == 0
    trained = {
        r.cell_id: list(r.cv)
        for r in sim.train_ivf_centroids(emb, seed, dim=64, iters=1).collect()
    }

    # replay: seed centroids -> Spark's own assignment -> Python fold
    v = emb.select(
        F.col("vec_id").alias("vid"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    cents0 = emb.filter(seed).select(
        F.col("vec_id").alias("cell_id"),
        F.col("embedding").cast("array<double>").alias("cv"),
        sim.l2_norm(F.col("embedding")).alias("cent_norm"),
    )
    assigned = sim.assign_ivf_cells(
        v, cents0, rank=1, id_col="vid", vec_col="v"
    ).collect()
    members = {}
    for r in assigned:
        members.setdefault(r.cell_id, []).append((r.vid, list(r.v)))
    expect = {}
    for cell, rows in members.items():
        rows.sort()  # vec_id order — the fold order both engines pin
        comps = []
        for i in range(64):
            acc = 0.0
            for _, vec in rows:
                acc = acc + vec[i]
            comps.append(acc)
        expect[cell] = comps
    assert set(trained) == set(expect)
    for cell in expect:
        assert trained[cell] == expect[cell], f"cell {cell} diverged"


# ---------------------------------------------------------------------
# assign_ivf_cells: two physical paths, one contract
# ---------------------------------------------------------------------

@pytest.fixture(scope="module")
def cents_rows(emb):
    cents = emb.filter(F.pmod(F.col("vec_id"), F.lit(25)) == 0).select(
        F.col("vec_id").alias("cell_id"),
        sim._to_double(F.col("embedding")).alias("cv"),
        sim.l2_norm(F.col("embedding")).alias("cent_norm"),
    )
    return cents.collect()


def _assign_sorted(emb, cents_rows, rank, max_nodes):
    out = sim.assign_ivf_cells(
        emb.select("vec_id", "embedding"),
        cents_rows,
        rank=rank,
        id_col="vec_id",
        vec_col="embedding",
        max_literal_nodes=max_nodes,
    )
    assert out.columns == ["vec_id", "embedding", "cell_id"]
    return sorted((r.vec_id, r.cell_id) for r in out.collect())


@pytest.mark.parametrize("rank", [1, 3])
def test_assign_paths_agree(emb, cents_rows, rank):
    """The literal (zero-shuffle) and broadcast-join (big-quantizer)
    paths must return identical assignments, including tie order."""
    lit = _assign_sorted(emb, cents_rows, rank, 10**9)  # force literal
    jn = _assign_sorted(emb, cents_rows, rank, 0)  # force join path
    assert lit == jn
    assert len(lit) == (len(set(i for i, _ in lit)) * rank if rank > 1 else len(lit))


def test_assign_literal_path_has_no_shuffle(emb, cents_rows):
    """The round-2 contract: rank=1 literal assignment is a pure
    projection — zero Exchange nodes in the physical plan."""
    from walex_spark.plans import audit

    out = sim.assign_ivf_cells(
        emb.select("vec_id", "embedding"), cents_rows, rank=1,
        id_col="vec_id", vec_col="embedding", max_literal_nodes=10**9,
    )
    assert audit(out).shuffle_exchanges == 0


def test_assign_join_path_single_shuffle(emb, cents_rows):
    """The scale path pays exactly one (map-side-combined) shuffle for
    the argmin groupBy; the centroid side broadcasts."""
    from walex_spark.plans import audit

    out = sim.assign_ivf_cells(
        emb.select("vec_id", "embedding"), cents_rows, rank=1,
        id_col="vec_id", vec_col="embedding", max_literal_nodes=0,
    )
    r = audit(out)
    assert r.shuffle_exchanges == 1
    assert r.broadcast_exchanges >= 1


def test_sq8_codes_endpoints_and_constant_dim(spark):
    from walex_spark.extensions import similarity as sim
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, [0.0, 5.0, 7.0]), (2, [10.0, 5.0, 3.0]), (3, [5.0, 5.0, 5.0])],
        "vec_id long, embedding array<double>",
    )
    lo, hi = sim.sq8_stats(df, 3)
    assert lo == [0.0, 5.0, 3.0] and hi == [10.0, 5.0, 7.0]
    codes = {
        r.vec_id: r.c
        for r in df.select(
            "vec_id", sim._sq8_codes(F.col("embedding"), lo, hi).alias("c")
        ).collect()
    }
    # endpoints hit 0 / 255; constant dim (idx 1) codes to 0; midpoint
    # of [3,7] -> floor(2*255/4+0.5) = floor(128.0) = 127 wait 2*63.75=127.5+0.5=128
    assert codes[1] == [0, 0, 255]
    assert codes[2] == [255, 0, 0]
    assert codes[3][0] == 128 and codes[3][1] == 0
    assert codes[3][2] == 128  # (5-3)*255/4 + .5 = 128.0 -> 128


def test_ann_sq8_topk_ranks_by_int_score(spark):
    from walex_spark.extensions import similarity as sim
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [0.0, 1.0]),
            (3, [0.5, 0.5]),
        ],
        "vec_id long, embedding array<double>",
    )
    out = sim.ann_sq8_topk(
        df.filter(F.col("vec_id") == 0), df, dim=2, k=3
    ).collect()
    order = [r.neighbor_id for r in sorted(out, key=lambda r: r.rnk)]
    assert order[0] == 1  # most aligned with query 0
    assert len(out) == 3
    for r in out:
        assert -1.0 <= r.cosine <= 1.0 and r.iscore >= 0


def test_recall_at_k_counts_hits_and_zeroes(spark):
    from walex_spark.extensions import similarity as sim

    truth = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 21)],
        "query_id long, neighbor_id long",
    )
    approx = spark.createDataFrame(
        [(1, 10), (1, 99)], "query_id long, neighbor_id long"
    )
    got = {r.query_id: (r.n_hits, r.recall)
           for r in sim.recall_at_k(truth, approx, k=2).collect()}
    assert got == {1: (1, 0.5), 2: (0, 0.0)}


def test_rp_project_matches_python_replica(spark):
    import hashlib

    from walex_spark.extensions.similarity import rp_project

    vec = [0.5, -1.25, 2.0, 0.125]
    d_in, d_out = 4, 3
    df = spark.createDataFrame([(1, vec)], "vec_id long, embedding array<double>")
    got = df.select(
        rp_project(F.col("embedding"), d_in, d_out).alias("p")
    ).first().p

    for j in range(d_out):
        acc = 0.0
        for i in range(d_in):
            sign = (
                1.0
                if int(hashlib.md5(f"rp{j}:{i}".encode()).hexdigest()[:8], 16) % 2
                else -1.0
            )
            acc = acc + sign * vec[i]  # left fold, same order as operator
        assert got[j] == acc, j


def test_ann_rp_preserves_obvious_neighbors(spark):
    """JL sanity: an exact duplicate vector is its twin's top reduced-
    space neighbor (projection of equal inputs is equal)."""
    import random

    from walex_spark.extensions.similarity import ann_rp_topk

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(30)]
    rows.append((100, list(rows[0][1])))  # exact copy of vec 0
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = ann_rp_topk(
        df.filter(F.col("vec_id") == 0), df, dim=16, d_out=4, k=1
    ).collect()
    assert out[0].neighbor_id == 100 and out[0].rnk == 1


def test_hard_negative_topk_excludes_near_dup_band(spark):
    from walex_spark.extensions.similarity import hard_negative_topk

    rows = [
        (0, [1.0, 0.0]),     # anchor
        (1, [1.0, 0.01]),    # cosine ~0.99995 — near-dup, excluded
        (2, [1.0, 1.0]),     # cosine ~0.7071 — hardest valid negative
        (3, [0.0, 1.0]),     # cosine 0
        (4, [-1.0, 0.0]),    # cosine -1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = hard_negative_topk(
        df.filter(F.col("vec_id") == 0), df, k=2, max_cos=0.9
    ).collect()
    got = [(r.neighbor_id, r.rnk) for r in sorted(out, key=lambda r: r.rnk)]
    assert got == [(2, 1), (3, 2)]  # near-dup 1 banned, self banned


def test_label_margin_hand_computed(spark):
    import math

    from walex_spark.extensions.similarity import label_margin

    rows = [
        (1, [1.0, 0.0], 0),
        (2, [1.0, 0.5], 0),
        (3, [0.0, 1.0], 1),
        (4, [-0.5, 1.0], 1),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = {r.vec_id: r for r in label_margin(df, dim=2).collect()}
    # centroid sums (vec_id-ordered): label0 = [2.0, 0.5], label1 = [-0.5, 2.0]
    c0, c1 = [2.0, 0.5], [-0.5, 2.0]

    def cos(a, b):
        # left folds, same order as the operator
        dot = 0.0
        na = 0.0
        nb = 0.0
        for x, y in zip(a, b):
            dot = dot + x * y
        for x in a:
            na = na + x * x
        for y in b:
            nb = nb + y * y
        return dot / (math.sqrt(na) * math.sqrt(nb))

    v1 = [1.0, 0.0]
    assert out[1].cos_own == cos(v1, c0)
    assert out[1].max_other == cos(v1, c1)
    assert out[1].margin == cos(v1, c0) - cos(v1, c1)
    # same-class vectors sit closer to their own centroid
    for vid in (1, 2, 3, 4):
        assert out[vid].margin > 0


def test_knn_label_eval_hand_case(spark):
    # 2-D toy: label 0 clusters near +x, label 1 near +y, one mislabeled
    # point (id 7: sits inside the +x cluster but carries label 1).
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.95, 0.05], 0),
        (3, [0.9, 0.1], 0),
        (4, [0.0, 1.0], 1),
        (5, [0.05, 0.95], 1),
        (6, [0.1, 0.9], 1),
        (7, [0.92, 0.08], 1),  # label noise
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r.label: r for r in sim.knn_label_eval(df, df, k=2).collect()}
    # every +x query's top-2 = {one L0 clustermate, the L1 noise point}
    # -> 1-1 tie -> smaller label 0 -> all three correct
    assert out[0].n_queries == 3 and out[0].n_correct == 3
    assert out[0].accuracy == 1.0
    # +y queries (4, 5, 6) vote their own cluster; the noise point 7's
    # whole neighborhood is label 0 -> misclassified (the noise screen)
    assert out[1].n_queries == 4 and out[1].n_correct == 3
    assert out[1].accuracy == 3.0 / 4.0


def test_knn_label_eval_tie_breaks_to_smaller_label(spark):
    # query 1 sees exactly one neighbor of label 9 and one of label 2
    # with identical cosine -> k=2 vote ties -> smaller label (2) wins
    rows = [
        (1, [1.0, 0.0], 2),
        (2, [1.0, 1.0], 9),
        (3, [1.0, -1.0], 2),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r.label: r for r in sim.knn_label_eval(
        df.filter(F.col("vec_id") == 1), df, k=2).collect()}
    assert out[2].n_correct == 1  # predicted 2 on the tie


def test_sign_signature_and_hamming_hand_case(spark):
    rows = [
        (1, [1.0] * 64),                      # all bits set
        (2, [-1.0] * 64),                     # no bits set
        (3, [1.0] * 32 + [-1.0] * 32),        # low word only
        (4, [1.0] * 63 + [-1.0]),             # bit 63 clear
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    sigs = {
        r.vec_id: r.s
        for r in df.select(
            "vec_id", sim.sign_signature(F.col("embedding"), 64).alias("s")
        ).collect()
    }
    full = (1 << 32) - 1
    assert sigs[1] == [full, full]
    assert sigs[2] == [0, 0]
    assert sigs[3] == [full, 0]
    assert sigs[4] == [full, full >> 1]
    out = {
        (r.query_id, r.neighbor_id): (r.hamming, r.rnk)
        for r in sim.hamming_topk(
            df.filter(F.col("vec_id") == 1), df, k=3
        ).collect()
    }
    # distances from 1: d(4)=1, d(3)=32, d(2)=64
    assert out[(1, 4)] == (1, 1)
    assert out[(1, 3)] == (32, 2)
    assert out[(1, 2)] == (64, 3)


def test_hamming_tie_breaks_on_neighbor_id(spark):
    rows = [
        (1, [1.0] * 64),
        (5, [1.0] * 63 + [-1.0]),
        (3, [-1.0] + [1.0] * 63),  # also hamming 1 from id 1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = sim.hamming_topk(df.filter(F.col("vec_id") == 1), df, k=2).collect()
    assert [(r.neighbor_id, r.hamming, r.rnk) for r in sorted(out, key=lambda r: r.rnk)] == [
        (3, 1, 1),
        (5, 1, 2),
    ]
