"""Deduplication operators for large-scale training-data pipelines.

No reference counterpart (walex is a CDC router) — these are the
driver-mandated LLM-data-pipeline extensions, designed Spark-first:

  - exact dedup: hash-groupBy; one shuffle on the content hash.
  - MinHash+LSH: shingle → K minhashes → B bands → bucket join. All
    JVM-side expressions (md5 + min aggregates) — no Python in the
    path. The candidate join is an equi-join on (band_idx, band_hash),
    so Catalyst shuffles on the bucket key only; at 100 TB the band
    buckets are the partition key and hot buckets are split by AQE.
  - SimHash: 32-bit signature via per-bit weighted majority, again
    pure aggregates.
  - n-gram Jaccard: exact verification for candidate pairs (use AFTER
    LSH banding at scale — never cross-join the corpus).

All hashes derive from md5 (deterministic, available in any ANSI-ish
engine), so every operator here is oracle-checkable in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _tokens(text_col: Column, lowercase: bool = True) -> Column:
    t = F.lower(text_col) if lowercase else text_col
    return F.filter(F.split(t, r"\s+"), lambda x: x != "")


def partition_by_doc(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Hash-partition raw documents by id BEFORE tokenize/explode.

    Shuffle-before-fan-out: every pipeline below explodes each doc into
    tens/hundreds of token rows and then aggregates by doc id. Moving
    the id shuffle ahead of the explode (a) ships the corpus at its
    smallest (raw text, not exploded tokens) and (b) leaves the stream
    hash-partitioned by id, so the downstream groupBy(id)/distinct
    exchange is elided — same shuffle count, strictly less data moved,
    and the expensive tokenize+hash map work runs at full cluster
    parallelism even when the source is a single-row-group file (a
    single-writer export reads as ONE partition otherwise).

    The partition count is pinned (defaultParallelism) so AQE's
    small-shuffle coalescing doesn't fold a small corpus back into one
    partition and re-serialize the map stage.
    """
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, F.col(id_col))


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact content dedup: md5-group, keep min id as representative.

    One shuffle on the 128-bit content hash; group sizes are tiny so
    no skew concern. Returns (content_hash, rep_id, dup_count).
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.min(id_col).alias("rep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def tokenize_distinct(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, token) rows, distinct per doc — shared by minhash/jaccard.

    Pre-partitioned by id (see partition_by_doc): the distinct's
    ClusteredDistribution(id, token) is satisfied by HashPartitioning
    on id, so no second exchange.
    """
    return (
        partition_by_doc(df, id_col)
        .select(F.col(id_col).alias("id"), F.explode(_tokens(F.col(text_col))).alias("token"))
        .distinct()
    )


def word_shingles(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    dedupe: bool = True,
) -> DataFrame:
    """Word n-gram shingles per doc: (id, token) rows (distinct when
    ``dedupe`` — set-semantics consumers like Jaccard need it; min-
    aggregating consumers like MinHash don't, and skipping it saves a
    full shuffle).

    The canonical MinHash document representation: order-sensitive
    shingles, not bag-of-words. On a corpus drawn from a small
    vocabulary, bag-of-words Jaccard is ~1 between unrelated docs and
    LSH banding degenerates to the cross product; w-shingling keeps
    unrelated docs' signatures disjoint, so band buckets stay small —
    at 100 TB the bucket size bounds the candidate-join fan-out.

    Plan-shape notes (measured 6× at sf0.1):
      - the token array is materialized in a child Project; inlining the
        raw split() expression would re-split the text at every
        element_at site inside the lambda;
      - the explode sits directly over the shingle expression — routing
        the gram array through an intermediate single-reference Project
        lets Catalyst collapse it back and re-inline the construction.
    """
    toked = partition_by_doc(df, id_col).select(
        F.col(id_col).alias("id"), _tokens(F.col(text_col)).alias("__toks")
    )
    toks = F.col("__toks")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast(T.ArrayType(T.StringType())))
    out = toked.select("id", F.explode(grams).alias("token"))
    return out.distinct() if dedupe else out


def minhash_signature(
    tokens: DataFrame, num_hashes: int = 16
) -> DataFrame:
    """K min-hashes per doc as K aggregate columns (no K× row blowup).

    Kirsch–Mitzenmacher double hashing: ONE md5 per token split into
    two 52-bit halves h1, h2; h_i = h1 + i·h2 (max < 2^56 — no bigint
    overflow in Spark or an oracle engine). signature_i = min_token h_i.
    One hash computation instead of K per token row, and the K min()
    aggregates stay a single map-side-combinable groupBy(id) shuffle
    carrying K longs per doc.
    """
    md5 = F.md5(F.col("token"))
    h1 = F.conv(F.substring(md5, 1, 13), 16, 10).cast(T.LongType())
    h2 = F.conv(F.substring(md5, 14, 13), 16, 10).cast(T.LongType())
    # materialize the halves in a child Project: each is referenced K
    # times by the aggregates, which keeps CollapseProject from
    # re-inlining the md5 into every min()
    based = tokens.select("id", h1.alias("__h1"), h2.alias("__h2"))
    aggs = [
        F.min(F.col("__h1") + F.lit(i) * F.col("__h2")).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return based.groupBy("id").agg(*aggs)


def minhash_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """LSH banding: docs sharing any band of minhashes become a pair.

    Returns distinct (id_a, id_b) with id_a < id_b. The self-join is an
    equi-join on (band_idx, band_hash) — only same-bucket docs meet,
    which is the whole point of LSH at scale. ``shingle_n`` > 1 hashes
    word n-gram shingles (the canonical construction — see
    word_shingles for why bag-of-words blows up); 1 = bag of words.
    """
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands ({bands})"
        )
    rows_per_band = num_hashes // bands
    # exploded (id, token) + groupBy-min beats a row-local
    # array_min(transform(...)) signature: higher-order functions are
    # interpreted per element, while explode + hash aggregate keeps md5
    # and min inside whole-stage codegen with map-side combine — the
    # groupBy(id) shuffle carries only K hashes per doc.
    tokens = (
        # dedupe=False: min() over the shingle multiset equals min()
        # over the distinct set — the distinct shuffle adds nothing here
        word_shingles(df, shingle_n, text_col, id_col, dedupe=False)
        if shingle_n > 1
        else tokenize_distinct(df, text_col, id_col)
    )
    sig = minhash_signature(tokens, num_hashes)
    return band_pairs(sig, bands, rows_per_band)


def band_pairs(sig: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    """LSH band self-join over a precomputed signature frame (id,
    mh0..mhK-1) → distinct (id_a, id_b), id_a < id_b. Split out so
    callers that already hold the signature (the estimator eval) don't
    rebuild shingles + aggregates a second time."""
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        # ':' separator disambiguates decimal concatenation (unlike the
        # fixed-width hex strings this replaced)
        band_cols.append(
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(F.concat_ws(":", *parts)).alias("band_hash"),
            )
        )
    banded = sig.select(
        "id", F.explode(F.array(*band_cols)).alias("band")
    ).select("id", "band.band_idx", "band.band_hash")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.0,
) -> DataFrame:
    """Exact Jaccard over distinct-token sets for given candidate pairs.

    ``pairs``: (id_a, id_b). Intersection via token equi-join, sizes
    via per-doc distinct counts; J = |∩| / (|A|+|B|-|∩|). Use on LSH
    candidates, not the full cross product.
    """
    toks = tokenize_distinct(df, text_col, id_col)
    sizes = toks.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    ta = toks.withColumnRenamed("id", "id_a")
    tb = toks.withColumnRenamed("id", "id_b")
    inter = (
        pairs.join(ta, "id_a")
        .join(tb, ["id_b", "token"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("inter").cast(T.DoubleType())
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast(T.DoubleType())
            ).alias("jaccard"),
        )
    )
    if threshold > 0:
        out = out.filter(F.col("jaccard") >= threshold)
    return out


def char_shingles(
    df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct character n-gram shingles per doc: (id, token) rows."""
    # materialize the lowered text once per row (same re-inlining hazard
    # as word_shingles: a raw lower(text) expression would re-lower at
    # every substr site inside the lambda)
    lowered = F.col("__lowered")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(lowered) - (n - 1), F.lit(1))),
        lambda i: lowered.substr(i, F.lit(n)),
    )
    return (
        partition_by_doc(df, id_col)
        .filter(F.length(F.lower(F.col(text_col))) >= n)
        .select(F.col(id_col).alias("id"), F.lower(F.col(text_col)).alias("__lowered"))
        .select("id", F.explode(grams).alias("token"))
        .distinct()
    )


def jaccard_pairs_from_tokens(
    tokens: DataFrame, threshold: float = 0.0, max_doc_freq: int | None = None
) -> DataFrame:
    """Exact Jaccard via an inverted-index token self-join (no cross
    product): pairs sharing ≥1 token meet in the join, J = |∩| /
    (|A|+|B|-|∩|). Pairs with empty intersection have J=0 and are
    implicitly dropped (supply threshold > 0 for the same semantics in
    an oracle).

    ``max_doc_freq`` drops tokens appearing in more than N docs before
    the join — the standard guard against hot-shingle quadratic blowup
    at corpus scale (a stopword shingle would otherwise pair everything
    with everything).
    """
    toks = tokens
    if max_doc_freq is not None:
        freq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
        # anti-join against the HOT tokens: that set is bounded (each
        # member appears in > N docs, so there are at most
        # total_occurrences/N of them) and broadcast-safe at any corpus
        # size — where the keep-list (the tail vocabulary) scales with
        # the corpus and must never be broadcast
        hot = freq.filter(F.col("df") > max_doc_freq).select("token")
        toks = toks.join(F.broadcast(hot), "token", "left_anti")
    sizes = toks.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = toks.select(F.col("id").alias("id_a"), "token")
    b = toks.select(F.col("id").alias("id_b"), "token")
    inter = (
        a.join(b, "token")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("inter").cast(T.DoubleType())
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast(T.DoubleType())
            ).alias("jaccard"),
        )
    )
    if threshold > 0:
        out = out.filter(F.col("jaccard") >= threshold)
    return out


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32
) -> DataFrame:
    """SimHash signature: per-bit weighted majority over token hashes.

    Token hash = first 8 md5 hex chars → uint32. Bit j of the signature
    is set iff more tokens have bit j set than clear. Computed as
    ``bits`` sum() aggregates (map-side combinable single shuffle).
    Returns (id, simhash BIGINT).
    """
    toks = tokenize_distinct(df, text_col, id_col)
    # token-hash width follows the signature width (4 bits per hex
    # char): a narrower hash would pin the high signature bits to a
    # constant majority, making the top bands degenerate all-match
    # keys downstream (simhash_hamming_pairs would cross-product there)
    hex_chars = max(8, (bits + 3) // 4)
    h = F.conv(F.substring(F.md5(F.col("token")), 1, hex_chars), 16, 10).cast(
        T.LongType()
    )
    toks = toks.withColumn("h", h)
    # bit test as shiftright+mask, majority vote as sum(2·bit − 1):
    # keeps each aggregate a handful of integer ops. This matters
    # beyond taste — since the token stream arrives pre-partitioned by
    # id (partition_by_doc), the distinct, the 32 sums and the final
    # projection fuse into ONE whole-stage-codegen unit; with the
    # earlier floor(h/2^j)%2 double-arithmetic CASE trees that unit
    # took ~15 s of janino compile before the first row moved.
    aggs = [
        F.sum(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"b{j}")
        for j in range(bits)
    ]
    per_doc = toks.groupBy("id").agg(*aggs)
    sig = None
    for j in range(bits):
        term = F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return per_doc.select("id", sig.cast(T.LongType()).alias("simhash"))


def duplicate_clusters(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 20,
) -> DataFrame:
    """Resolve near-dup pairs into clusters and pick survivors: the
    final stage of a dedup pipeline (LSH candidates → Jaccard verify →
    THIS → drop non-survivors).

    Connected components by iterative min-label propagation: every doc
    starts labeled with its own id; each round, labels flow across
    edges and each node keeps the minimum seen. Converges in
    O(component diameter) rounds — near-dup clusters are near-cliques
    (diameter 2-3), so the bound is small and ``max_iters`` is a
    safety net, with early exit the moment a round changes nothing.

    Scale shape: one equi-join + one groupBy per round, both keyed on
    doc id (narrow (id, label) rows); ``localCheckpoint`` truncates the
    per-round lineage so the plan stays flat. Deterministic (min), so
    cluster ids are stable and oracle-checkable: cluster_id = smallest
    id in the component, survivor = the doc holding it.

    Returns (id_col, cluster_id, is_survivor) for EVERY node —
    singletons survive as their own cluster.
    """
    # materialize the edge list once: every propagation round joins
    # against it, and without this the full candidate-generation
    # lineage (shingle + inverted-index join) would re-execute per round.
    # Hash-partitioned by src BEFORE the checkpoint (which preserves
    # partitioning): every round's edges-side of the label join is then
    # already laid out on its join key, so the per-round cost drops from
    # "re-shuffle the edge list + labels" to "shuffle the (small)
    # aggregated neighbor-min frame" — the guide-§2.4 shared-exchange
    # shape, and the part that matters at 100 TB where edges dominate.
    # Measured at sf0.1: 210 -> 178 tasks for the 120-doc cluster query
    # with identical output.
    n_part = pairs.sparkSession.sparkContext.defaultParallelism
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionAll(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .repartition(n_part, F.col("src"))
        .localCheckpoint(eager=False)  # round 1's action materializes it
    )
    labels = (
        nodes.select(F.col(id_col).alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .repartition(n_part, F.col("id"))
    )
    # (Measured negative: folding TWO propagation hops into each
    # materialized round — provably the same fixpoint, min is monotone
    # — did NOT cut jobs at near-clique diameters: 26 -> 27 / 35 -> 36
    # jobs on the four cluster queries, because the un-checkpointed
    # mid-hop frame's two consumers project different columns below
    # their exchanges, so ReuseExchange can't dedup them and each round
    # gains more stages than the halved round count saves.)
    for _ in range(max_iters):
        neigh = (
            edges.join(labels, edges.src == labels.id)
            .groupBy(F.col("dst"))
            .agg(F.min("label").alias("nlabel"))
        )
        # lazy localCheckpoint + the convergence count as the ONE
        # action per round: the count's first pass over `stepped`
        # materializes the checkpoint as a side effect, so lineage is
        # still truncated but the old eager-checkpoint-then-count
        # pattern's second job per round is gone (2 jobs/round -> 1).
        stepped = (
            labels.join(neigh, labels.id == neigh.dst, "left")
            .select(
                F.col("id"),
                F.col("label").alias("__old"),
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        changed = stepped.filter(F.col("label") != F.col("__old")).count()
        labels = stepped.select("id", "label")
        if changed == 0:
            break
    else:
        # the loop exhausted max_iters with labels still moving: the
        # result would be silently WRONG (some components split across
        # several labels). Fail loudly — callers pick a larger
        # max_iters for pathological long-chain graphs.
        raise RuntimeError(
            f"duplicate_clusters: min-label propagation did not converge "
            f"within max_iters={max_iters} ({changed} labels still "
            f"changing) — component diameter exceeds the iteration "
            f"budget; raise max_iters"
        )
    return labels.select(
        F.col("id").alias(id_col),
        F.col("label").alias("cluster_id"),
        (F.col("label") == F.col("id")).alias("is_survivor"),
    )


def simhash_hamming_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 48,
    band_bits: int = 8,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup PAIRING: banded candidate generation + exact
    Hamming verify — the downstream half of the simhash() signature
    (signatures alone don't dedup anything).

    Pigeonhole guarantee: with ``bits/band_bits`` bands, any pair
    within ``max_hamming <= bands - 1`` differing bits must agree on
    at least one whole band, so banding has EXACT recall at the
    threshold — no probabilistic miss, unlike MinHash banding.

    Scale shape: signatures are one narrow row per doc; banding
    explodes x(bands) and candidates meet via an equi-join on
    (band, band_key) — bucket-bounded, never the corpus cross product
    (the same shape as minhash_candidate_pairs). The Hamming verify is
    a single xor+bit_count on the already-joined row. Returns
    (id_a, id_b, hamming) with id_a < id_b, deduped across bands.
    """
    n_bands = bits // band_bits
    if max_hamming > n_bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the exact-recall bound "
            f"bands-1={n_bands - 1}; add bands (lower band_bits) or lower "
            "the threshold"
        )
    sigs = simhash(df, text_col, id_col, bits=bits)
    mask = (1 << band_bits) - 1
    banded = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .filter(ham <= max_hamming)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            ham.cast(T.LongType()).alias("hamming"),
        )
        .distinct()
    )


def edit_distance_pairs(
    df: DataFrame,
    max_dist: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact Levenshtein near-dup pairing under length-bucket blocking.

    Because ``levenshtein(a, b) >= |len(a) - len(b)|``, any pair within
    ``max_dist`` edits differs in length by at most ``max_dist`` — so
    bucketing docs by ``floor(len / max_dist)`` and emitting each doc
    into its own and the NEXT bucket makes the blocking LOSSLESS at the
    threshold: every qualifying pair shares at least one bucket key,
    and no cross product ever forms (the 100 TB shape; compose with
    minhash/LSH candidates when length alone blocks too coarsely).

    The duplicate match a same-bucket pair would get from both its
    (b, b) and (b+1, b+1) keys is removed algebraically — a match is
    kept only on the pair's HIGHER native bucket — so no distinct/
    shuffle-dedup pass is needed. Returns (id_a, id_b, dist) with
    id_a < id_b, dist <= max_dist; comparison is case-folded.
    """
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1")
    w = max_dist
    t = F.lower(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("id"), t.alias("t"), F.length(t).alias("ln")
    )
    bucket = F.floor(F.col("ln") / F.lit(w))
    keyed = base.select(
        "id", "t", "ln", F.explode(F.array(bucket, bucket + 1)).alias("bk")
    )
    a = keyed.select(
        F.col("id").alias("id_a"), F.col("t").alias("t_a"),
        F.col("ln").alias("ln_a"), "bk",
    )
    b = keyed.select(
        F.col("id").alias("id_b"), F.col("t").alias("t_b"),
        F.col("ln").alias("ln_b"), "bk",
    )
    native_hi = F.greatest(
        F.floor(F.col("ln_a") / F.lit(w)), F.floor(F.col("ln_b") / F.lit(w))
    )
    pairs = a.join(b, "bk").filter(
        (F.col("id_a") < F.col("id_b"))
        & (F.abs(F.col("ln_a") - F.col("ln_b")) <= w)
        & (F.col("bk") == native_hi)
    )
    dist = F.levenshtein(F.col("t_a"), F.col("t_b"))
    return (
        pairs.select("id_a", "id_b", dist.alias("dist"))
        .filter(F.col("dist") <= max_dist)
    )


def mutual_triangles(pairs: DataFrame) -> DataFrame:
    """Triangles in the near-dup pair graph: triples of documents that
    are all pairwise similar — the strongest clique signal short of
    full clique mining, and the standard graph-quality metric for a
    candidate-pair generator (a pair set with many triangles clusters
    cleanly; one with none is mostly noise).

    Input must carry (id_a, id_b) with id_a < id_b (the orientation
    every pair operator in this module emits). That orientation IS the
    classic distributed triangle-counting trick: each triangle
    a < b < c is found exactly once, via its smallest vertex — two
    equi-joins (wedge build + closing-edge check), never a cross
    product, and no post-dedup pass.

    Returns (a, b, c) with a < b < c.
    """
    e = pairs.select("id_a", "id_b")
    e1 = e.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    e2 = e.select(F.col("id_a").alias("b"), F.col("id_b").alias("c"))
    wedges = e1.join(e2, "b")  # a < b < c by construction
    closing = e.select(F.col("id_a").alias("a"), F.col("id_b").alias("c"))
    return (
        wedges.join(closing, ["a", "c"], "left_semi")
        .select("a", "b", "c")
    )


def _char_windows(
    df: DataFrame, win_len: int, text_col: str, id_col: str
) -> DataFrame:
    """(id, pos, h): every win_len-char window's md5, hash-partitioned
    by doc BEFORE the per-character explode (shuffle-before-fan-out)
    and checkpointed — the windows feed both an aggregate and a
    semi-join probe, and without the checkpoint the explode+md5 (the
    dominant stage) executes once per consumer.

    h is the RAW 16-byte digest (unhex of Spark's hex md5), not the
    32-char hex string: every downstream consumer only groups or
    equi-joins on it, and per-char window rows are the largest frame
    any span operator materializes — halving the hash column halves
    the checkpoint, every shuffle, and the incremental index's parquet
    state (guide §2.3, narrower types)."""
    text = F.col(text_col)
    return (
        partition_by_doc(df, id_col)
        .filter(F.length(text) >= win_len)
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.lit(1), F.length(text) - F.lit(win_len - 1))
            ).alias("pos"),
            text.alias("__t"),
        )
        .select(
            F.col(id_col),
            "pos",
            F.unhex(
                F.md5(F.col("__t").substr(F.col("pos"), F.lit(win_len)))
            ).alias("h"),
        )
        .localCheckpoint(eager=False)
    )


def _merge_marked_spans(
    marked: DataFrame, win_len: int, id_col: str
) -> DataFrame:
    """Gaps-and-islands merge of marked (id, pos) window rows into
    maximal per-doc spans (1-based inclusive char offsets)."""
    w = Window.partitionBy(id_col).orderBy("pos")
    grouped = (
        marked.withColumn("__prev", F.lag("pos").over(w))
        .withColumn(
            "__brk",
            F.when(
                F.col("__prev").isNull()
                | (F.col("pos") > F.col("__prev") + F.lit(win_len)),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "__grp",
            F.sum("__brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return grouped.groupBy(id_col, "__grp").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + F.lit(win_len - 1)).alias("span_end"),
    ).select(
        F.col(id_col),
        F.col("span_start").cast(T.LongType()).alias("span_start"),
        F.col("span_end").cast(T.LongType()).alias("span_end"),
        (F.col("span_end") - F.col("span_start") + F.lit(1))
        .cast(T.LongType())
        .alias("span_len"),
    )


def duplicate_spans(
    df: DataFrame,
    win_len: int = 40,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact duplicated-substring spans, the ExactSubstr dedup of
    Lee et al. 2021 ("Deduplicating Training Data Makes Language
    Models Better"): every ``win_len``-char window that occurs at
    least ``min_count`` times anywhere in the corpus marks its
    characters as duplicated; overlapping/adjacent duplicate windows
    merge into maximal spans per document.

    Returns (id_col, span_start, span_end, span_len), 1-based
    inclusive char offsets.

    Scale shape: the window hash aggregate is the honest cost — one
    shuffle of (md5, doc, pos) per character position, the
    distributed stand-in for the paper's suffix array. The corpus is
    hash-partitioned by id BEFORE the explode (shuffle-before-fan-out
    — a single-file export otherwise runs the whole window hash in one
    task; 9.2 s → 1.5 s at sf0.1), the explode happens AFTER a length
    filter (no degenerate sequence() on short docs), duplicate hashes
    come from one count>=N aggregate (map-side
    combinable), and span merging is a per-doc gaps-and-islands pass —
    bounded partitions, one shuffle on the doc key. Windows never
    carry text beyond win_len chars into the hash expression; only
    hashes and offsets shuffle.
    """
    if win_len < 2:
        raise ValueError("win_len must be >= 2")
    if min_count < 2:
        raise ValueError("min_count must be >= 2")
    wins = _char_windows(df, win_len, text_col, id_col)
    dup_h = (
        wins.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .select("h")
    )
    marked = wins.join(dup_h, "h", "left_semi")
    return _merge_marked_spans(marked, win_len, id_col)


def minhash_estimate_accuracy(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Estimator calibration for the MinHash pipeline: for every LSH
    candidate pair, the signature-based Jaccard ESTIMATE (matching
    components / K) next to the EXACT shingle-set Jaccard and the
    absolute error — the eval a pipeline runs before trusting
    signature thresholds at scale (E[est] = J, sd ≈ sqrt(J(1-J)/K)).

    Returns (id_a, id_b, n_match, est_jaccard, jaccard, abs_err).
    n_match is an integer component count (order-free exact); the two
    ratios and their difference are fixed-order IEEE doubles.

    Scale shape: the signature is computed ONCE and feeds both the
    band candidate join and the per-pair component match; the exact
    Jaccard's inverted-index join is restricted to CANDIDATE docs
    before the token join (semi-join on the pairs' id sets), so the
    all-pairs-per-shared-shingle blowup only ever runs over the
    near-dup subset — never the corpus. The signature re-join ships K
    longs per doc.
    """
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands ({bands})"
        )
    tokens_multiset = word_shingles(
        df, shingle_n, text_col, id_col, dedupe=False
    )
    # sig feeds the band join AND two component-match joins; pairs
    # feeds three consumers — without a checkpoint each consumer
    # re-executes the shingle+aggregate subtree (same reason PageRank
    # checkpoints its edge frame). Both frames are narrow: K longs per
    # doc / two ids per candidate pair.
    sig = minhash_signature(tokens_multiset, num_hashes).localCheckpoint(
        eager=False
    )
    pairs = band_pairs(sig, bands, num_hashes // bands).localCheckpoint(
        eager=False
    )
    n_match = None
    for i in range(num_hashes):
        term = F.when(
            F.col(f"a.mh{i}") == F.col(f"b.mh{i}"), F.lit(1)
        ).otherwise(F.lit(0))
        n_match = term if n_match is None else n_match + term
    est = pairs.join(sig.alias("a"), pairs.id_a == F.col("a.id")).join(
        sig.alias("b"), pairs.id_b == F.col("b.id")
    ).select(
        "id_a", "id_b", n_match.cast(T.LongType()).alias("n_match")
    )
    cand_ids = (
        pairs.select(F.col("id_a").alias("id"))
        .union(pairs.select(F.col("id_b").alias("id")))
        .distinct()
    )
    # toks feeds four plan consumers (ta, tb, and sz joined twice), but
    # checkpointing it is a measured NO-GAIN (16 -> 17 jobs, 203 -> 204
    # tasks): all consumers live in ONE action whose shuffles on the
    # same keys canonicalize identically, so ReuseExchange already
    # dedups the shingle subtree — the checkpoint just adds its own job.
    toks = word_shingles(
        df, shingle_n, text_col, id_col, dedupe=True
    ).join(cand_ids, "id", "left_semi")
    sz = toks.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    ta = toks.select(F.col("id").alias("id_a"), "token")
    tb = toks.select(F.col("id").alias("id_b"), "token")
    inter = (
        ta.join(tb, "token")
        .filter(F.col("id_a") < F.col("id_b"))
        .join(pairs, ["id_a", "id_b"], "left_semi")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("it"))
    )
    out = (
        est.join(inter, ["id_a", "id_b"], "left")
        .join(sz.select(F.col("id").alias("id_a"), F.col("sz").alias("sza")), "id_a")
        .join(sz.select(F.col("id").alias("id_b"), F.col("sz").alias("szb")), "id_b")
    )
    it = F.coalesce(F.col("it"), F.lit(0))
    est_j = F.col("n_match").cast(T.DoubleType()) / F.lit(float(num_hashes))
    exact_j = it.cast(T.DoubleType()) / (
        F.col("sza") + F.col("szb") - it
    ).cast(T.DoubleType())
    return out.select(
        "id_a",
        "id_b",
        "n_match",
        est_j.alias("est_jaccard"),
        exact_j.alias("jaccard"),
        F.abs(est_j - exact_j).alias("abs_err"),
    )


# -------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer, Wilkerson, Aiken, SIGMOD 2003 — the
# MOSS local fingerprinting algorithm)
# -------------------------------------------------------------------------

# position packing: packed = hash·2^30 + reversed-pos must fit int64 in
# BOTH engines — with 32-bit hashes the max is (2^32−1)·2^30 + 2^30−1
# < 2^62, so 30 position bits is the widest safe choice. Documents at
# or above 2^30 chars (1 GiB of text — far past any training-document
# size) are EXCLUDED from fingerprinting; the bound is documented in
# winnow_fingerprints and mirrored by the oracle.
_POS_BITS = 30
_POS_CAP = 1 << _POS_BITS  # max addressable char position per document


def winnow_fingerprints(
    df: DataFrame,
    k: int = 8,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    positions: bool = True,
) -> DataFrame:
    """Winnowing document fingerprints: hash every ``k``-gram, slide a
    ``window``-wide frame over the hash sequence, and select the
    MINIMUM hash of each frame, rightmost position on ties — the
    paper's STANDARD winnowing rule (§4; robust winnowing, which
    instead re-selects the previous window's fingerprint on ties, is a
    different rule and NOT what this implements — changing the
    tie-break would silently diverge from the oracle and the python
    reference test). Expected density for random hashes is
    2/(window+1) (the paper's Theorem; adversarial tie-heavy input
    can select up to one fingerprint per window, and never fewer than
    one per window span).

    Returns (id, fp_pos, fp_hash) — 1-based gram offsets, 32-bit
    md5-derived hashes. Documents shorter than k + window - 1 chars
    yield no fingerprints (no full frame exists), matching the paper;
    documents of 2^30 chars or more are likewise excluded (the
    position-packing bound — see _POS_BITS).
    ``positions=False`` returns (id, fp_hash) only: the same hash may
    be selected at several positions, so dropping fp_pos BEFORE the
    distinct fuses what would otherwise be two dedup shuffles into one
    — the shape match-stage consumers (winnow_candidate_pairs) want.

    Scale shape: one per-char explode (shuffle-before-fan-out via
    partition_by_doc, same discipline as duplicate_spans), then ONE
    per-doc ordered window whose frame is ``window`` rows — bounded
    state, partitioned by doc id, never a global sort. The
    rightmost-min tie-break is folded into the min() itself by packing
    (hash, reversed position) into one BIGINT — min of the packed key
    IS the rightmost-min winner, so no nested window expressions
    and no second pass.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    if window < 2:
        raise ValueError("window must be >= 2")
    text = F.lower(F.col(text_col))
    grams = (
        partition_by_doc(df, id_col)
        .filter(F.length(text) >= k + window - 1)
        .filter(F.length(text) < _POS_CAP)
        .select(
            F.col(id_col).alias("id"),
            F.explode(
                F.sequence(F.lit(1), F.length(text) - F.lit(k - 1))
            ).alias("pos"),
            (F.length(text) - F.lit(k - 1)).alias("__nh"),
            text.alias("__t"),
        )
        .select(
            "id",
            "pos",
            "__nh",
            F.conv(
                F.substring(F.md5(F.col("__t").substr(F.col("pos"), F.lit(k))), 1, 8),
                16,
                10,
            )
            .cast(T.LongType())
            .alias("h"),
        )
    )
    # packed = h * _POS_CAP + (_POS_CAP - 1 - pos), _POS_CAP = 2^_POS_BITS
    # = 2^30: min() picks the smallest hash, then the LARGEST position
    # among equal hashes (rightmost).
    packed = F.col("h") * F.lit(_POS_CAP) + (F.lit(_POS_CAP - 1) - F.col("pos"))
    frame = (
        Window.partitionBy("id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, window - 1)
    )
    winners = grams.withColumn("__c", F.min(packed).over(frame)).filter(
        # only FULL frames select a fingerprint: frame start pos has
        # window hashes iff pos <= nh - window + 1
        F.col("pos") <= F.col("__nh") - F.lit(window - 1)
    )
    if positions:
        cols = [
            (F.lit(_POS_CAP - 1) - F.col("__c") % F.lit(_POS_CAP)).alias("fp_pos"),
            F.shiftright(F.col("__c"), _POS_BITS).alias("fp_hash"),
        ]
    else:
        cols = [F.shiftright(F.col("__c"), _POS_BITS).alias("fp_hash")]
    return winners.select("id", *cols).distinct()


def winnow_candidate_pairs(
    fps: DataFrame,
    min_shared: int = 2,
    max_doc_freq: int | None = None,
    distinct_hashes: bool = False,
) -> DataFrame:
    """Doc pairs sharing >= ``min_shared`` distinct winnowed
    fingerprint hashes (the MOSS match stage), with a MOSS-style
    containment score n_shared / (|A| + |B| - n_shared) over the
    distinct-hash sets.

    ``max_doc_freq`` drops fingerprint hashes present in more than N
    docs before the self-join — the hot-shingle guard (a boilerplate
    fingerprint would otherwise pair everything with everything); the
    hot set is bounded (<= corpus_fp_rows / N members) and
    broadcast-safe at any scale, like jaccard_pairs_from_tokens.

    ``distinct_hashes=True`` declares the input already distinct on
    (id, fp_hash) — e.g. winnow_fingerprints(..., positions=False) —
    and skips the dedup shuffle here.
    """
    sel = fps.select("id", "fp_hash")
    if not distinct_hashes:
        sel = sel.distinct()
    # sel fans out to FOUR plan consumers (the a/b join sides and the
    # two size lookups) whose shared subtree tops out at a
    # HashAggregate, not an Exchange — ReuseExchange cannot dedup it,
    # so the upstream fingerprint pipeline (per-char explode + md5 +
    # window min) would execute once per consumer. Checkpointing the
    # distinct fingerprint set (a ~2/(window+1)-density frame, far
    # smaller than the gram table it came from) bounds that to one
    # execution. Same rationale as _char_windows' checkpoint.
    sel = sel.localCheckpoint(eager=False)
    if max_doc_freq is not None:
        hot = (
            sel.groupBy("fp_hash")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_doc_freq)
            .select("fp_hash")
        )
        sel = sel.join(F.broadcast(hot), "fp_hash", "left_anti")
    sizes = sel.groupBy("id").agg(F.count(F.lit(1)).alias("nfp"))
    a = sel.select(F.col("id").alias("id_a"), "fp_hash")
    b = sel.select(F.col("id").alias("id_b"), "fp_hash")
    pairs = (
        a.join(b, "fp_hash")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return (
        pairs.join(
            sizes.select(F.col("id").alias("id_a"), F.col("nfp").alias("nfp_a")),
            "id_a",
        )
        .join(
            sizes.select(F.col("id").alias("id_b"), F.col("nfp").alias("nfp_b")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            "n_shared",
            (
                F.col("n_shared").cast(T.DoubleType())
                / (F.col("nfp_a") + F.col("nfp_b") - F.col("n_shared")).cast(
                    T.DoubleType()
                )
            ).alias("winnow_sim"),
        )
    )


# -------------------------------------------------------------------------
# Prefix-filtered exact Jaccard join (Bayardo/Ma/Srikant All-Pairs 2007,
# Xiao et al. PPJoin 2008 — the lossless set-similarity-join scale path)
# -------------------------------------------------------------------------


def rarest_first_doc_tokens(toks: DataFrame) -> DataFrame:
    """(id, token) -> (id, toks: array<string> rarest-first, sz): each
    doc's distinct tokens sorted by (global document frequency, token)
    — the shared total order prefix filtering needs. The df comes from
    a count over Window.partitionBy(token): ONE by-token shuffle where
    the groupBy(token)+re-join form pays two (measured 2.7x on this
    stage at sf0.1). The window is KEYED — each partition frame is one
    token's rows, bounded by that token's own df, spillable — never a
    global rank (tests/test_winnow_prefix.py pins the partition spec).
    """
    return (
        toks.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("token"))
        )
        .groupBy("id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("df"), F.col("token")))
            ).alias("__sorted")
        )
        .select(
            "id",
            F.transform(F.col("__sorted"), lambda s: s["token"]).alias("toks"),
            F.size("__sorted").alias("sz"),
        )
    )


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    threshold_num: int = 1,
    threshold_den: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int | None = 3,
    pair_filter: Column | None = None,
) -> DataFrame:
    """Exact set-Jaccard >= t join WITHOUT the full inverted-index
    self-join: prefix filtering. The set representation is ``shingle_n``
    word shingles (None → single word tokens — degenerate on
    low-vocabulary corpora, see word_shingles). Tokens are ordered rarest-first
    (global document frequency, token as tie-break); a doc of size s
    indexes only its first  p = s - ceil(t*s) + 1  tokens in that
    order. Pigeonhole (All-Pairs lemma): J(A,B) >= t implies
    |A∩B| >= ceil(t*max(|A|,|B|)), so the SMALLEST common token under
    the shared order sits inside both prefixes — candidate generation
    through the rare-token prefixes is lossless, and the output equals
    the naive threshold join exactly (which is what the oracle runs).

    The threshold is a rational num/den; the accept test is the
    integer predicate  den*|∩| >= num*(|A|+|B|-|∩|)  — no float
    comparison anywhere near the cut.

    Scale shape vs jaccard_pairs_from_tokens: the inverted join there
    explodes on EVERY shared token (hot tokens quadratic — hence its
    lossy max_doc_freq guard); here the join touches only prefix
    tokens, which are the globally RAREST ones, so hot tokens never
    key the join and no lossy guard is needed. The per-token document
    frequency comes from a count over Window.partitionBy(token) — one
    by-token shuffle instead of the groupBy+self-join's two (measured
    2.7x on the per-doc stage at sf0.1). Candidates are thinned by two
    LOSSLESS All-Pairs filters before any token array ships to the
    verify join (at sf0.1: 409k -> 125k pairs, 2.3x end-to-end):

      - size filter (Arasu et al.): J >= n/d forces
        n*|A| <= d*|B| and n*|B| <= d*|A| — applied on the match rows
        before the pair groupBy;
      - positional filter (ppjoin, Xiao et al. 2008): for the FIRST
        common token, at 0-based prefix positions (ia, jb),
        |A∩B| <= 1 + min(|A|-ia-1, |B|-jb-1), since any other common
        token sorts after it under the shared rarest-first order
        (an earlier one would sit in both prefixes and contradict
        minimality). min(pos) per pair is that first token in BOTH
        docs at once because common-token positions rise together.
        Prune when the bound can't reach the required overlap
        I*(n+d) >= n*(|A|+|B|).

    Verification is a per-pair array_intersect over the two bounded
    token arrays (JVM set intersect, no explode). Shuffles: one
    by-token window, one per-doc agg, the prefix equi-join, the pair
    groupBy, two array lookups — all keyed, broadcast-free,
    skew-immune by construction.
    """
    if not (0 < threshold_num <= threshold_den):
        raise ValueError("threshold must satisfy 0 < num/den <= 1")
    if shingle_n is not None:
        toks = word_shingles(df, shingle_n, text_col, id_col, dedupe=True)
    else:
        toks = tokenize_distinct(df, text_col, id_col)
    per_doc = rarest_first_doc_tokens(toks)
    # p = s - ceil(t*s) + 1, all-integer: ceil(n*s/d) = (n*s + d - 1) div d
    s = F.col("sz")
    p = s - F.expr(
        f"(sz * {threshold_num} + {threshold_den - 1}) div {threshold_den}"
    ) + F.lit(1)
    # per_doc feeds the prefix index AND both verification lookups —
    # without the checkpoint the 2-shuffle subtree executes three
    # times (measured at sf0.1: 7.0 s min vs 5.4 s with it, pre-filter)
    per_doc = per_doc.localCheckpoint(eager=False)
    idx = per_doc.select(
        "id",
        "sz",
        F.posexplode(F.slice(F.col("toks"), F.lit(1), p)).alias(
            "pos", "token"
        ),
    )
    n, d = F.lit(threshold_num), F.lit(threshold_den)
    cand = (
        idx.select(
            F.col("id").alias("id_a"),
            F.col("sz").alias("sz_a"),
            F.col("pos").alias("pa"),
            "token",
        )
        .join(
            idx.select(
                F.col("id").alias("id_b"),
                F.col("sz").alias("sz_b"),
                F.col("pos").alias("pb"),
                "token",
            ),
            "token",
        )
        .filter(F.col("id_a") < F.col("id_b"))
        # optional (id_a, id_b) predicate applied BEFORE the pair
        # aggregate: a cross-corpus caller (decontamination) prunes
        # same-side candidates here, so the asymmetric join never
        # aggregates or verifies train-train mass — this restriction
        # IS the asymmetric All-Pairs variant (both sides' prefixes
        # still index, as the lemma requires)
        .filter(pair_filter if pair_filter is not None else F.lit(True))
        .filter(
            (n * F.col("sz_a") <= d * F.col("sz_b"))
            & (n * F.col("sz_b") <= d * F.col("sz_a"))
        )
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(F.min("pa").alias("ia"), F.min("pb").alias("jb"))
        .filter(
            (
                F.lit(1)
                + F.least(
                    F.col("sz_a") - F.col("ia") - 1,
                    F.col("sz_b") - F.col("jb") - 1,
                )
            )
            * (n + d)
            >= n * (F.col("sz_a") + F.col("sz_b"))
        )
        .select("id_a", "id_b")
    )
    joined = (
        cand.join(
            per_doc.select(
                F.col("id").alias("id_a"),
                F.col("toks").alias("toks_a"),
                F.col("sz").alias("sz_a"),
            ),
            "id_a",
        )
        .join(
            per_doc.select(
                F.col("id").alias("id_b"),
                F.col("toks").alias("toks_b"),
                F.col("sz").alias("sz_b"),
            ),
            "id_b",
        )
        .withColumn(
            "inter", F.size(F.array_intersect(F.col("toks_a"), F.col("toks_b")))
        )
    )
    return (
        joined.filter(
            F.col("inter") * F.lit(threshold_den)
            >= (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
            * F.lit(threshold_num)
        )
        .select(
            "id_a",
            "id_b",
            (
                F.col("inter").cast(T.DoubleType())
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast(
                    T.DoubleType()
                )
            ).alias("jaccard"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    win_len: int = 40,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ExactSubstr REMOVAL (the step Lee et al. 2021 run after
    marking): cut every duplicated span found by duplicate_spans out
    of every document and stitch the kept segments back together.
    This is the aggressive variant — all occurrences of a duplicated
    window are removed, not all-but-one; stated here because both
    policies appear in the literature.

    Returns every input document as (id_col, clean_text, n_removed) —
    n_removed = chars cut; untouched docs pass through with
    n_removed = 0 and clean_text = original text; a fully-duplicated
    doc comes back as the empty string, not NULL.

    Scale shape: segment BOUNDS are computed on the narrow span rows
    (per-doc lag window + a tails aggregate — spans per doc are
    bounded by len/win_len after merging), and the text joins in ONCE
    by doc id for the substr + stitch; the stitch is a per-doc
    collect_list of (start, segment) sorted in-array — bounded by the
    kept-segment count, never a corpus-wide sort.
    """
    # spans feeds the heads window AND the tails aggregate; the rows
    # are narrow (id + two offsets, bounded by len/win_len per doc) but
    # their lineage is the whole window-hash pipeline — checkpoint it
    spans = duplicate_spans(df, win_len, min_count, text_col, id_col).localCheckpoint(
        eager=False
    )
    return _remove_spans(df, spans, text_col, id_col)


def _remove_spans(
    df: DataFrame, spans: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Cut every span out of its document and stitch the kept segments
    (the shared tail of remove_duplicate_spans and
    exact_substr_decontam — see remove_duplicate_spans' scale notes).
    ``spans`` must already be checkpointed/narrow."""
    w = Window.partitionBy(id_col).orderBy("span_start")
    heads = spans.select(
        F.col(id_col),
        (F.coalesce(F.lag("span_end").over(w), F.lit(0)) + 1).alias("seg_start"),
        (F.col("span_start") - 1).alias("seg_end"),
    )
    tails = spans.groupBy(id_col).agg(
        (F.max("span_end") + 1).alias("seg_start"),
        F.lit(None).cast(T.LongType()).alias("seg_end"),  # filled from text
    )
    bounds = heads.unionByName(tails)
    docs = df.select(F.col(id_col), F.col(text_col).alias("__text"))
    segs = bounds.join(docs, id_col).select(
        F.col(id_col),
        "seg_start",
        F.coalesce(F.col("seg_end"), F.length("__text")).alias("seg_end"),
        "__text",
    )
    # empty segments (adjacent spans, span at pos 1 / end of doc)
    # contribute '' — the group must still exist so a fully-duplicated
    # doc stitches to '' rather than falling through to the original
    seg = F.col("__text").substr(
        F.col("seg_start"),
        F.greatest(F.col("seg_end") - F.col("seg_start") + 1, F.lit(0)),
    )
    stitched = (
        segs.select(F.col(id_col), F.struct("seg_start", seg.alias("seg")).alias("__s"))
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("__s")), lambda s: s["seg"]
                ),
                "",
            ).alias("__clean")
        )
    )
    return (
        df.select(F.col(id_col), F.col(text_col).alias("__text"))
        .join(stitched, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("__clean"), F.col("__text")).alias("clean_text"),
            (F.length("__text") - F.length(F.coalesce(F.col("__clean"), F.col("__text"))))
            .cast(T.LongType())
            .alias("n_removed"),
        )
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df_ratio: float = 0.2,
    min_cos: float = 0.30,
    k: int = 100,
) -> DataFrame:
    """Exact sparse tf-idf cosine similarity join via an inverted
    index — the lexical-vector near-dup family the minhash/simhash
    sketches approximate, computed exactly and still as an equi-join.

    Weights are exact integers so the dot product is order-free:
    w(doc, term) = tf * idf_hb where idf_hb = half_bits(n_docs div df)
    (floor(2*log2(N/df)) — the integer-idf trick shared with
    unigram_surprisal). Overflow budget: tf <= doc length (~1e4),
    idf_hb <= 124 (two 31-bit clamps), so w <= ~1.2e6 and a pairwise
    product <= ~1.6e12; a sum over <= vocab-size shared terms stays
    far under 2^63. Norms are sqrt() of exact integer sums — sqrt and
    the final division are single IEEE ops on identical operands in
    any engine, so cos_sim is bit-reproducible.

    Scale shape (the whole point — NEVER an all-pairs join):
      1. (doc, term) tf aggregate — one corpus shuffle on the term key.
      2. df + idf: vocab-sized aggregate, joined back on term.
      3. Stop-term cut: terms with df > max_df_ratio * n_docs are
         dropped BEFORE the self-join. This is the classic inverted-
         index guard — a term in every doc contributes O(N^2) posting
         pairs but ~zero idf weight; the cut bounds posting-list
         length so candidate pairs grow with near-dup mass, not N^2.
         The dropped mass is reported honestly by the caller's tests.
      4. Posting self-join ON THE TERM KEY (equi-join; AQE splits hot
         terms), id_a < id_b, then one (id_a, id_b) aggregate for the
         dot product — map-side combinable.
      5. cos >= min_cos filter, deterministic top-k.

    Returns (doc_a, doc_b, n_shared_terms, dot_ww, cos_sim) ordered by
    (cos_sim DESC, doc_a, doc_b), LIMIT k.
    """
    from walex_spark.extensions.search import half_bits

    toks = partition_by_doc(df.select(id_col, text_col), id_col).select(
        F.col(id_col).alias("doc"),
        F.explode(_tokens(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy("doc", "term").agg(
        F.count(F.lit(1)).cast(T.LongType()).alias("tf")
    )
    n_docs = df.select(F.countDistinct(id_col).alias("n_docs"))
    vocab = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).cast(T.LongType()).alias("df"))
        .join(F.broadcast(n_docs))
        .where(F.col("df") <= (F.lit(max_df_ratio) * F.col("n_docs")))
        .select(
            "term",
            half_bits(F.expr("n_docs div df")).alias("idf_hb"),
        )
        # the half-bit idf floors to 0 for df > n_docs/2 — weightless
        # terms would still inflate posting lists and zero-norm docs
        # made only of them turn cos into 0/0, so drop them outright
        .where(F.col("idf_hb") > 0)
    )
    # materialize the weighted postings once: w feeds THREE consumers
    # (norms + both self-join sides) and tf a fourth (vocab) — without
    # this the tokenize+tf+vocab lineage re-executes per consumer
    # (~4x the corpus-shuffle work; the pinned exchange budget dropped
    # 25 -> single digits with the checkpoint). The materialized stream
    # is the term-pruned (doc, term, w) postings — already stop-term-
    # and zero-idf-cut, i.e. the smallest thing every consumer needs.
    w = (
        tf.join(vocab, "term")
        .select("term", "doc", (F.col("tf") * F.col("idf_hb")).alias("w"))
        .localCheckpoint(eager=False)
    )
    norms = w.groupBy("doc").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w")).cast(T.DoubleType())).alias("norm")
    )
    a = w.select(F.col("term"), F.col("doc").alias("doc_a"), F.col("w").alias("wa"))
    b = w.select(F.col("term"), F.col("doc").alias("doc_b"), F.col("w").alias("wb"))
    dots = (
        a.join(b, "term")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).cast(T.LongType()).alias("n_shared_terms"),
            F.sum(F.col("wa") * F.col("wb")).cast(T.LongType()).alias("dot_ww"),
        )
    )
    na = norms.select(F.col("doc").alias("doc_a"), F.col("norm").alias("na"))
    nb = norms.select(F.col("doc").alias("doc_b"), F.col("norm").alias("nb"))
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_shared_terms",
            "dot_ww",
            (F.col("dot_ww").cast(T.DoubleType()) / (F.col("na") * F.col("nb"))).alias(
                "cos_sim"
            ),
        )
        .where(F.col("cos_sim") >= F.lit(min_cos))
        .orderBy(F.col("cos_sim").desc(), "doc_a", "doc_b")
        .limit(k)
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str,
    window: int = 5,
    min_jaccard: float = 0.0,
) -> DataFrame:
    """Sorted-neighborhood blocking (the classic record-linkage /
    entity-resolution method): sort records by a blocking key, compare
    each record only against the ``window`` records that follow it in
    the total order, score candidate pairs by token-set Jaccard of the
    key. Near-duplicate records cluster under any reasonable key sort,
    so the O(N*w) candidate set replaces the O(N^2) cross join — the
    third blocking family next to LSH banding and prefix filtering.

    The global rank comes from operators/ordering.py::
    global_sorted_index — ONE range-partitioned sort plus broadcast
    per-partition offsets, never a single-partition window. Pair
    generation is an EQUI-JOIN: each row explodes ``window`` probe
    keys (pos + 1 .. pos + w) that meet the right side on its own
    pos — at 1000 executors this is a hash join on a dense integer
    key, skew-free by construction. The ranked table feeds both join
    sides, so it is localCheckpoint'd once.

    Jaccard is exact (two integer set sizes, one IEEE division).
    Returns (id_a, id_b, gap, key_jaccard) for pairs with
    ``key_jaccard >= min_jaccard``; gap = rank distance (1..window);
    id_a precedes id_b in the (key, id) sort order.
    """
    from walex_spark.operators.ordering import global_sorted_index

    if window < 1:
        raise ValueError("window must be >= 1")
    ranked = global_sorted_index(
        df.select(
            F.col(id_col).alias("rid"),
            F.col(key_col).alias("key"),
            F.array_distinct(_tokens(F.col(key_col))).alias("toks"),
        ),
        ["key", "rid"],
        "pos",
    ).localCheckpoint(eager=False)
    probes = ranked.select(
        F.col("rid").alias("id_a"),
        F.col("toks").alias("toks_a"),
        F.col("pos").alias("pos_a"),
        F.explode(
            F.array(*[F.col("pos") + F.lit(j) for j in range(1, window + 1)])
        ).alias("probe"),
    )
    right = ranked.select(
        F.col("rid").alias("id_b"),
        F.col("toks").alias("toks_b"),
        F.col("pos").alias("probe"),
    )
    return (
        probes.join(right, "probe")
        .select(
            "id_a",
            "id_b",
            (F.col("probe") - F.col("pos_a")).cast(T.LongType()).alias("gap"),
            (
                F.size(F.array_intersect("toks_a", "toks_b")).cast(T.DoubleType())
                / F.size(F.array_union("toks_a", "toks_b")).cast(T.DoubleType())
            ).alias("key_jaccard"),
        )
        .where(F.col("key_jaccard") >= F.lit(min_jaccard))
    )


def _doc_segments(
    df: DataFrame,
    seg_words: int,
    id_col: str,
    text_col: str,
    group_col: str,
) -> DataFrame:
    """(id, group, seg_id, seg): non-overlapping ``seg_words``-word
    segments of each document, built entirely from array expressions —
    split once, slice per segment — so the segmentation itself never
    shuffles (the posexplode fans out WITHIN the input partitions).
    The last segment keeps its short tail (ceil division), matching
    the oracle's (idx-1)/w grouping of the word stream."""
    toks = F.split(F.col(text_col), " ")
    n_segs = F.ceil(F.size(toks) / F.lit(int(seg_words))).cast(T.IntegerType())
    segs = F.transform(
        F.sequence(F.lit(0), n_segs - F.lit(1)),
        lambda i: F.array_join(
            F.slice(toks, i * F.lit(int(seg_words)) + F.lit(1), int(seg_words)),
            " ",
        ),
    )
    return df.select(
        F.col(id_col),
        F.col(group_col),
        F.posexplode(segs).alias("seg_id", "seg"),
    )


def boilerplate_segments(
    df: DataFrame,
    seg_words: int = 8,
    min_docs: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Cross-document boilerplate detection, the RefinedWeb / CCNet
    line-level dedup adapted to a corpus without line structure: a
    segment (``seg_words`` consecutive words, non-overlapping) that
    appears VERBATIM in >= ``min_docs`` distinct documents of the same
    source is boilerplate (headers, footers, navigation chrome,
    licence blurbs — text that repeats across a site rather than
    within a document). Per-source report:

      (source, n_segments, n_distinct_segments, n_boilerplate_segments,
       boilerplate_hits, docs_affected)

    Scale shape: segmentation is in-partition (see _doc_segments); the
    distinct-doc count per (source, segment) is ONE exchange on the
    (source, md5(seg)) key with map-side partials — the segment STRING
    never shuffles, only its 128-bit hash; verbatim-equality on md5 is
    the same collision posture as exact_dedup. The final per-source
    fold is metadata-sized. No UDF, no driver collect.
    """
    per = _doc_segments(df, seg_words, id_col, text_col, group_col).select(
        F.col(id_col),
        F.col(group_col),
        F.md5(F.col("seg")).alias("seg_hash"),
    )
    seg_stats = per.groupBy(group_col, "seg_hash").agg(
        F.countDistinct(F.col(id_col)).cast(T.LongType()).alias("n_docs"),
        F.count(F.lit(1)).cast(T.LongType()).alias("n_hits"),
    )
    bp = F.col("n_docs") >= F.lit(int(min_docs))
    return (
        seg_stats.groupBy(group_col)
        .agg(
            F.sum("n_hits").cast(T.LongType()).alias("n_segments"),
            F.count(F.lit(1)).cast(T.LongType()).alias("n_distinct_segments"),
            F.sum(bp.cast(T.LongType())).cast(T.LongType()).alias(
                "n_boilerplate_segments"
            ),
            F.sum(F.when(bp, F.col("n_hits")).otherwise(F.lit(0)))
            .cast(T.LongType())
            .alias("boilerplate_hits"),
            F.sum(F.when(bp, F.col("n_docs")).otherwise(F.lit(0)))
            .cast(T.LongType())
            .alias("doc_slots_affected"),
        )
        .orderBy(group_col)
    )


def strip_boilerplate(
    df: DataFrame,
    seg_words: int = 8,
    min_docs: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Rebuild each document WITHOUT its boilerplate segments (the
    removal half of boilerplate_segments — RefinedWeb's line dedup
    actually deletes the repeated lines; this deletes the repeated
    segments and restitches the survivors in order).

    Returns (id, group, kept_text, n_segs, n_dropped); kept_text is
    the space-joined concatenation of surviving segments in original
    order (empty string when every segment was boilerplate).

    Scale shape: ONE segment fan-out feeds BOTH the boilerplate-set
    aggregate and the removal join (localCheckpoint'd so the fan-out
    runs once); the boilerplate set is the >= min_docs filtered
    aggregate — typically orders of magnitude smaller than the corpus
    but NOT provably bounded, so the removal is an equi-join on
    (group, seg_hash) rather than a broadcast (at 100 TB a hot
    boilerplate hash is exactly the skew AQE splits). Reassembly sorts
    WITHIN each doc's collected struct array — no window, one
    exchange on the doc id.
    """
    per = (
        _doc_segments(df, seg_words, id_col, text_col, group_col)
        .select(
            F.col(id_col),
            F.col(group_col),
            "seg_id",
            "seg",
            F.md5(F.col("seg")).alias("seg_hash"),
        )
        .localCheckpoint(eager=False)
    )
    bp_set = (
        per.groupBy(group_col, "seg_hash")
        .agg(F.countDistinct(F.col(id_col)).alias("n_docs"))
        .where(F.col("n_docs") >= F.lit(int(min_docs)))
        .select(group_col, "seg_hash", F.lit(True).alias("is_bp"))
    )
    marked = per.join(bp_set, [group_col, "seg_hash"], "left")
    return (
        marked.groupBy(F.col(id_col), F.col(group_col))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("is_bp").isNull(),
                                F.struct(F.col("seg_id"), F.col("seg")),
                            )
                        )
                    ),
                    lambda s: s.seg,
                ),
                " ",
            ).alias("kept_text"),
            F.count(F.lit(1)).cast(T.LongType()).alias("n_segs"),
            F.sum(F.col("is_bp").isNotNull().cast(T.LongType()))
            .cast(T.LongType())
            .alias("n_dropped"),
        )
    )
