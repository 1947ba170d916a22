"""Sampling and shard-packing operators for training-data pipelines.

No reference counterpart (walex is a CDC router) — these cover the
data-mixing stage of an LLM pipeline: down-sample sources to target
proportions, reproducibly, then pack the survivors into
fixed-token-budget shards.

Spark-first design rules shared with the dedup/text modules:

  - determinism across engines AND runs: selection hashes md5(salt ||
    key) rather than rand(), so a retry, a replay, or the DuckDB oracle
    selects the identical rows (Spark's murmur3 `hash()` is not
    portable; md5 is).
  - no shuffle for sampling (a pure filter over the scan — predicate
    evaluates map-side); one bounded window per partition key for
    packing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# first 8 md5 hex chars → uniform 32-bit bucket, same trick (and the
# same DuckDB translation '0x'||substr(md5(..),1,8))::BIGINT) as the
# MinHash/fingerprint operators
_BUCKET_SPACE = 1 << 32


def _hash_bucket(key: Column, salt: str) -> Column:
    h = F.md5(F.concat(F.lit(salt), key.cast(T.StringType())))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast(T.LongType())


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    key_col: str,
    salt: str = "walex",
) -> DataFrame:
    """Bernoulli sample that keeps a row iff its key's hash bucket falls
    below fraction·2³² — reproducible at any parallelism, stable under
    replay/retry, and recomputable by any engine with md5 (unlike
    ``df.sample``, whose selection depends on partitioning and seed
    plumbing). The predicate is a plain filter: no shuffle, pushes to
    the scan's map side.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction {fraction} outside [0, 1]")
    threshold = int(fraction * _BUCKET_SPACE)
    return df.filter(_hash_bucket(F.col(key_col), salt) < threshold)


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str,
    key_col: str,
    salt: str = "walex",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum sampling rates (the data-mixing knob: e.g. keep 100%
    of low-resource languages, 20% of crawl English). Same md5-bucket
    determinism as ``deterministic_sample``; strata not in ``rates``
    get ``default_rate``. The rate table compiles into the filter
    predicate (a CASE chain — metadata-sized by definition), so the
    whole operator is still a map-side filter with no shuffle or join.
    """
    for stratum, rate in rates.items():
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate {rate} for stratum {stratum!r} outside [0, 1]")
    threshold = F.lit(int(default_rate * _BUCKET_SPACE))
    for stratum, rate in sorted(rates.items()):
        threshold = F.when(
            F.col(stratum_col) == stratum, F.lit(int(rate * _BUCKET_SPACE))
        ).otherwise(threshold)
    return df.filter(_hash_bucket(F.col(key_col), salt) < threshold)


def pack_shards(
    df: DataFrame,
    budget: int,
    cost_col: str | Column,
    part_col: str,
    order_col: str,
) -> DataFrame:
    """Assign each row to a training shard so consecutive rows (in
    ``order_col`` order, within each ``part_col`` group) accumulate to
    roughly ``budget`` cost units (tokens) per shard: shard k holds the
    rows whose RUNNING cost starts in [k·budget, (k+1)·budget).

    First-fit in a fixed order is what keeps this deterministic and
    distributed: the only state is a per-partition running sum —
    one window keyed by the partition column (bounded groups: a
    language/source, never the whole corpus in one ordering).

    Returns the input plus (cost, shard_idx).
    """
    cost = (F.col(cost_col) if isinstance(cost_col, str) else cost_col).cast(
        T.LongType()
    )
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start_offset = F.sum(cost).over(w) - cost
    # exact integer division via pmod: the numerator is an exact
    # multiple of budget, so the double division is exact (a raw
    # floor(a/b) could mis-round near shard boundaries at large sums)
    shard = (start_offset - F.pmod(start_offset, F.lit(budget))) / F.lit(budget)
    return df.withColumn("cost", cost).withColumn(
        "shard_idx", shard.cast(T.LongType())
    )


def temperature_mixture(
    df: DataFrame,
    group_col: str,
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Temperature-balanced down-sampling across skewed groups
    (languages/domains): group g keeps rate sqrt(min_count / count_g),
    so the smallest group survives whole and a group 4x larger keeps
    half — the sqrt-temperature (T=2) mixing rule multilingual corpus
    recipes use to stop a head language drowning the tail.

    Exactness: the rate uses ONLY sqrt (IEEE-754 correctly rounded
    everywhere) — a general pow(x, alpha) differs in the last ulp
    between libm implementations and would flip boundary rows between
    engines. Membership is the deterministic md5-bucket test (same as
    deterministic_sample): u32(id) < floor(rate * 2^32), exact
    integer comparison, so replays and engines agree row-for-row.

    Scale shape: the per-group rate table is one row per group
    (broadcast); the corpus is filtered map-side with zero shuffles
    beyond the metadata-sized counts aggregate.
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__cnt"))
    cmin = counts.agg(F.min("__cnt").alias("__cmin"))
    rates = counts.crossJoin(F.broadcast(cmin)).select(
        group_col,
        F.floor(
            F.sqrt(
                F.col("__cmin").cast(T.DoubleType())
                / F.col("__cnt").cast(T.DoubleType())
            )
            * F.lit(4294967296.0)
        ).cast(T.LongType()).alias("__thresh"),
    )
    u32 = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast(T.StringType()))), 1, 8),
        16,
        10,
    ).cast(T.LongType())
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(u32 < F.col("__thresh"))
        .drop("__thresh")
    )


def weighted_bernoulli_sample(
    df: DataFrame,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "wsample",
    rate_at_max: float = 1.0,
) -> DataFrame:
    """Row-weighted Bernoulli sampling: each row keeps with probability
    ``rate_at_max * weight / max(weight)`` — the per-ROW form of
    temperature_mixture's per-group rates (importance sampling by doc
    length, quality score, ...).

    Exactness: acceptance is the pure-INTEGER comparison
    ``u32(id) * w_max < w * floor(rate_at_max * 2^32)`` — no float
    division, no libm, so engines and replays agree row-for-row even
    at threshold boundaries. The products stay under 2^63 for weights
    below 2^31 — ENFORCED: the broadcast max(weight) row raises
    in-plan when the bound would overflow, instead of producing
    engine-dependent wrapped-product samples. The single max(weight)
    is a metadata aggregate broadcast back; the filter runs map-side,
    zero data shuffles.

    Rows with NULL or non-positive weight are dropped (a sampling
    weight of zero means "never keep"). The weight column must be an
    INTEGRAL type — a fractional weight would silently truncate in
    the integer comparison (0.9 → 0 drops every row), so fractional
    scores must be scaled to integer units first (floor(score * 1e6),
    the same micro-unit rule the rolling-window query uses) and the
    operator raises rather than guess.
    """
    if not 0.0 < rate_at_max <= 1.0:
        raise ValueError("rate_at_max must be in (0, 1]")
    wtype = dict(df.dtypes).get(weight_col)
    if wtype not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"weight column {weight_col!r} has type {wtype}; scale "
            "fractional weights to integer units first "
            "(e.g. floor(score * 1e6))"
        )
    scale = int(rate_at_max * 4294967296.0)
    # Overflow guard: the acceptance test multiplies u32 (< 2^32) by
    # w_max and w (<= w_max) by scale (<= 2^32); either product wraps
    # int64 once w_max reaches 2^31. Checked in-plan on the one-row
    # aggregate so the failure is loud, not engine-dependent garbage.
    wmax = df.agg(F.max(F.col(weight_col)).alias("__wmax")).select(
        # NULL wmax (empty input / all-NULL weights) must pass through:
        # the acceptance comparison is then NULL for every row and the
        # call returns empty, the pre-guard behavior — raising here
        # would turn an empty upstream into a job failure
        F.when(
            F.col("__wmax").isNull() | (F.col("__wmax") < F.lit(1 << 31)),
            F.col("__wmax"),
        )
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "weighted_bernoulli_sample: max(weight) = "
                    ),
                    F.col("__wmax").cast(T.StringType()),
                    F.lit(
                        " >= 2^31 would overflow the int64 acceptance"
                        " product; rescale weights below 2^31"
                    ),
                )
            )
        )
        .alias("__wmax")
    )
    u32 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast(T.StringType()))),
            1,
            8,
        ),
        16,
        10,
    ).cast(T.LongType())
    return (
        df.crossJoin(F.broadcast(wmax))
        .filter(
            F.col(weight_col).isNotNull()
            & (F.col(weight_col) > 0)
            & (
                u32 * F.col("__wmax").cast(T.LongType())
                < F.col(weight_col).cast(T.LongType()) * F.lit(scale)
            )
        )
        .drop("__wmax")
    )


def leakage_safe_folds(
    df: DataFrame,
    n_folds: int = 5,
    cluster_col: str = "cluster_id",
    salt: str = "fold",
) -> DataFrame:
    """Cluster-aware k-fold assignment: every row inherits its
    CLUSTER's fold, so near-duplicate documents can never straddle a
    train/eval boundary (the split-leakage failure mode of naive
    per-doc hashing — eval examples with a near-copy in train).

    fold = u32(md5(salt || cluster_id)) mod n_folds — the same
    deterministic md5-bucket rule the samplers use; ``split`` labels
    fold 0 as 'test', the rest 'train'. Zero shuffles: the fold is a
    map-side expression over whatever partitioning ``df`` has (the
    caller already paid for cluster resolution).
    """
    if n_folds < 2:
        raise ValueError("n_folds must be >= 2")
    fold = F.pmod(
        _hash_bucket(F.col(cluster_col), salt), F.lit(n_folds)
    ).cast(T.LongType())
    return df.withColumn("fold", fold).withColumn(
        "split", F.when(F.col("fold") == 0, F.lit("test")).otherwise(F.lit("train"))
    )


def dsir_select(
    df: DataFrame,
    target_pred: Column,
    n_buckets: int = 1024,
    k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "dsir",
) -> DataFrame:
    """Data Selection with Importance Resampling (Xie et al. 2023,
    NeurIPS — "DSIR") re-expressed as exact integer arithmetic: rank
    the RAW pool (rows failing ``target_pred``) by how target-like
    their hashed-bigram distribution is, keep the top ``k``.

    The paper's importance weight is log p_target(x) - log p_raw(x)
    under bag-of-hashed-ngrams models with add-1 smoothing:

        w(doc) = sum_b n_b(doc) * [log p_t(b) - log p_r(b)]
        p_t(b) = (c_t(b)+1) / (N_t+B),  p_r(b) = (c_r(b)+1) / (N_r+B)

    libm logs are engine-dependent (search.py module docstring), so
    the weight is measured in half-bit units via the shared
    ``half_bits`` primitive (floor(2*log2(x)) = bitlen(x*x)-1, exact
    in any engine), applied per log term BEFORE the subtraction:

        s_b   = hb2(c_t(b)+1) - hb2(c_r(b)+1)
        K     = hb2(N_r+B)    - hb2(N_t+B)        (corpus constant)
        w_hb  = sum_b n_b(doc)*s_b  +  n(doc)*K

    (floor-per-term rather than floor-of-ratio keeps every operand
    within int64 — c*N products would overflow the bitlen-square trick
    at real corpus sizes; the corpus constant K shifts docs only by
    their length, preserving the paper's normalization.) Resampling's
    Gumbel noise is dropped in favor of the deterministic top-k —
    selection must replay identically (module docstring rules).

    Bigram features are hashed md5(salt || w1 || ' ' || w2) into
    ``n_buckets`` buckets — the paper's fixed hashed feature space,
    portable across engines (murmur3 is not). Raw docs with < 2
    tokens have no features and drop out.

    Returns (id_col, n_bigrams, weight_half_bits, rnk), rnk 1..k by
    (weight desc, id).

    Scale shape: ONE wide shuffle — the (doc, bucket) count aggregate
    over the exploded bigram stream (map-side combinable; carries two
    longs + a bool). Bucket totals re-aggregate that table (B-row
    output), join back as a bounded broadcast (n_buckets rows by
    construction), and the per-doc weight is a second map-side
    combinable sum. Top-k is a global sort LIMIT (TakeOrdered), never
    a single-partition window over the pool.
    """
    from walex_spark.extensions.search import half_bits
    from walex_spark.extensions.text import _tokens

    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    toks = _tokens(F.col(text_col))
    bg = (
        df.select(
            F.col(id_col),
            target_pred.alias("is_t"),
            toks.alias("toks"),
        )
        .where(F.size("toks") >= 2)
        .select(
            F.col(id_col),
            "is_t",
            F.explode(
                F.zip_with(
                    F.slice(F.col("toks"), F.lit(1), F.size("toks") - 1),
                    F.slice(F.col("toks"), F.lit(2), F.size("toks") - 1),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                )
            ).alias("big"),
        )
        .select(
            F.col(id_col),
            "is_t",
            F.pmod(_hash_bucket(F.col("big"), salt + "|"), F.lit(n_buckets))
            .alias("b"),
        )
    )
    per_doc = bg.groupBy(id_col, "is_t", "b").agg(F.count(F.lit(1)).alias("n"))
    tot = per_doc.groupBy("b").agg(
        F.sum(F.when(F.col("is_t"), F.col("n")).otherwise(F.lit(0))).alias("ct"),
        F.sum(F.when(~F.col("is_t"), F.col("n")).otherwise(F.lit(0))).alias("cr"),
    )
    scores = tot.select(
        "b",
        (half_bits(F.col("ct") + 1) - half_bits(F.col("cr") + 1)).alias("s"),
        "ct",
        "cr",
    )
    consts = scores.agg(
        (
            half_bits(F.sum("cr") + F.lit(n_buckets))
            - half_bits(F.sum("ct") + F.lit(n_buckets))
        ).alias("k_const")
    )
    ranked = (
        per_doc.filter(~F.col("is_t"))
        .join(F.broadcast(scores.select("b", "s")), "b")
        .groupBy(id_col)
        .agg(
            F.sum("n").cast(T.LongType()).alias("n_bigrams"),
            F.sum(F.col("n") * F.col("s")).alias("__sw"),
        )
        .join(F.broadcast(consts))
        .select(
            F.col(id_col),
            "n_bigrams",
            (F.col("__sw") + F.col("n_bigrams") * F.col("k_const"))
            .cast(T.LongType())
            .alias("weight_half_bits"),
        )
        .orderBy(F.col("weight_half_bits").desc(), F.col(id_col).asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("weight_half_bits").desc(), F.col(id_col).asc())
    # window runs AFTER limit k — bounded input
    return ranked.withColumn("rnk", F.row_number().over(w).cast(T.LongType()))


def token_budget_allocation(
    df: DataFrame,
    budget_tokens: int,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-weighted token-budget apportionment across corpus
    slices — the mixing-plan step of a training run: given a total
    token budget, how many tokens does each source/domain contribute?
    Head sources are damped by the same sqrt (T=2) rule as
    temperature_mixture; unlike the sampler (which keeps/drops rows),
    this emits the integer PLAN the sampler then implements.

    Exactness: weights use ONLY sqrt (IEEE correctly rounded in every
    engine — pow() is not, see temperature_mixture); the weight total
    is a GROUP-ASCENDING strict left fold, so every share double is
    bit-identical across engines; integer allocations come from
    largest-remainder (Hamilton) apportionment — floor every share,
    then hand the leftover tokens to the largest fractional parts
    (ties toward the smaller group key). Sum(alloc) == budget exactly.

    Returns (group_col, n_tokens, weight, alloc_tokens, epochs) where
    epochs = alloc_tokens / n_tokens (>1 means the slice repeats).

    Scale shape: ONE map-side-combinable count aggregate over the
    token stream (group-sized output); everything after operates on
    the |groups|-row table (a bounded dimension by definition) — the
    fold, the fractional-rank window, and the remainder broadcast are
    all metadata-sized.
    """
    from walex_spark.extensions.text import _tokens

    if budget_tokens < 0:
        raise ValueError("budget_tokens must be >= 0")
    counts = (
        df.select(F.col(group_col).alias("g"), _tokens(F.col(text_col)).alias("t"))
        .select("g", F.size("t").alias("n"))
        .groupBy("g")
        .agg(F.sum("n").cast(T.LongType()).alias("n_tokens"))
        # |groups| rows; the fold, the shares join, and the remainder
        # aggregate all read it — materialize instead of re-scanning
        # the corpus token stream per consumer
        .localCheckpoint(eager=False)
    )
    w = counts.select(
        "g", "n_tokens", F.sqrt(F.col("n_tokens").cast(T.DoubleType())).alias("w")
    )
    wtot = w.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("g", "w"))),
            F.lit(0.0),
            lambda acc, st: acc + st["w"],
        ).alias("w_total")
    )
    shares = w.join(F.broadcast(wtot)).select(
        "g",
        "n_tokens",
        "w",
        (F.lit(float(budget_tokens)) * F.col("w") / F.col("w_total")).alias("share"),
    )
    based = shares.select(
        "g",
        "n_tokens",
        "w",
        "share",
        F.floor("share").cast(T.LongType()).alias("base"),
        (F.col("share") - F.floor("share")).alias("frac"),
    )
    rem = based.agg(
        (F.lit(int(budget_tokens)) - F.sum("base")).cast(T.LongType()).alias("rem")
    )
    rw = Window.orderBy(F.col("frac").desc(), F.col("g").asc())
    # window over the |groups|-row table — bounded by definition
    return (
        based.join(F.broadcast(rem))
        .withColumn("__rk", F.row_number().over(rw))
        .select(
            F.col("g").alias(group_col),
            "n_tokens",
            F.col("w").alias("weight"),
            (F.col("base") + (F.col("__rk") <= F.col("rem")).cast(T.LongType()))
            .alias("alloc_tokens"),
        )
        .withColumn(
            "epochs",
            F.col("alloc_tokens").cast(T.DoubleType())
            / F.col("n_tokens").cast(T.DoubleType()),
        )
        .orderBy(group_col)
    )


def exact_stratified_split(
    df: DataFrame,
    fractions: dict[str, float] | None = None,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Train/val/test assignment with EXACT per-stratum quotas — the
    deterministic complement of the Bernoulli splitters: a hash test
    keeps each stratum's split sizes only in expectation, while an
    eval harness usually needs them exact (a 500-doc stratum must
    contribute exactly 400/50/50). Quotas come from largest-remainder
    apportionment of ``fractions`` over each stratum's row count
    (sum == n_s exactly); WHICH rows land in which split is decided by
    the md5 rank within the stratum — deterministic, engine-portable,
    and stable under repartitioning/replay like every selection rule
    in this module.

    Returns (id_col, stratum_col, split), one row per input row.

    Scale shape: ranks come from operators/ordering.py::
    global_sorted_index under the (stratum, hash, id) total order —
    ONE range sort, never a per-stratum single-task window; the
    stratum offset and the quota table are |strata|-row metadata
    joined back as broadcasts. Assignment is pure column CASE logic.
    """
    from walex_spark.operators.ordering import global_sorted_index

    if fractions is None:
        fractions = {"train": 0.8, "val": 0.1, "test": 0.1}
    names = list(fractions)  # declaration order = remainder tie order
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError("fractions must sum to 1")
    d = df.select(
        F.col(id_col),
        F.col(stratum_col).alias("s"),
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast(T.StringType()))).alias(
            "h"
        ),
    )
    ranked = global_sorted_index(d, ["s", "h", id_col], "pos")
    sizes = (
        d.groupBy("s")
        .agg(F.count(F.lit(1)).cast(T.LongType()).alias("n_s"))
        .localCheckpoint(eager=False)  # offsets + quotas both read it
    )
    # stratum offset: rows in lexicographically-earlier strata — the
    # |strata|-row running sum (metadata window, same frame the
    # prefix-sum operators pin)
    ow = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    offs = sizes.select(
        "s", "n_s", F.coalesce(F.sum("n_s").over(ow), F.lit(0)).alias("off")
    )
    # largest-remainder quotas per stratum, folded to cumulative split
    # bounds as |strata| columns (declaration order): a doc with
    # in-stratum rank r joins its stratum row and CASEs through the
    # cumulative bounds
    base_cols, frac_cols = [], []
    for i, nm in enumerate(names):
        share = F.col("n_s").cast(T.DoubleType()) * F.lit(float(fractions[nm]))
        base_cols.append(F.floor(share).cast(T.LongType()).alias(f"b{i}"))
        frac_cols.append((share - F.floor(share)).alias(f"f{i}"))
    quot = offs.select("s", "n_s", "off", *base_cols, *frac_cols)
    rem = F.col("n_s") - sum(F.col(f"b{i}") for i in range(len(names)))
    # rank each split's fractional part within the row (k entries):
    # split i gains +1 iff |{j: (f_j, j) > (f_i, i) strictly}| < rem
    alloc_cols = []
    for i in range(len(names)):
        ahead = sum(
            (
                (F.col(f"f{j}") > F.col(f"f{i}"))
                | ((F.col(f"f{j}") == F.col(f"f{i}")) & F.lit(j < i))
            ).cast(T.LongType())
            for j in range(len(names))
            if j != i
        )
        alloc_cols.append(
            (F.col(f"b{i}") + (ahead < rem).cast(T.LongType())).alias(f"q{i}")
        )
    quotas = quot.select("s", "off", *alloc_cols)
    joined = ranked.join(F.broadcast(quotas), "s").withColumn(
        "rk", F.col("pos") - F.col("off")
    )
    split = F.lit(None).cast(T.StringType())
    bound = F.lit(0).cast(T.LongType())
    expr = None
    for i, nm in enumerate(names):
        bound = bound + F.col(f"q{i}")
        cond = F.col("rk") <= bound
        expr = F.when(cond, F.lit(nm)) if expr is None else expr.when(cond, F.lit(nm))
    return joined.select(
        F.col(id_col),
        F.col("s").alias(stratum_col),
        expr.alias("split"),
    )
