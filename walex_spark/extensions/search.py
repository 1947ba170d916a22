"""Full-text relevance scoring over the documents table: BM25 ranked
retrieval and unigram-LM surprisal (the CCNet/DSIR-style "perplexity"
quality signal), both engineered for bit-exact cross-engine replay.

Design notes (floats are the enemy — see queries.py header):

* BM25 uses the LOG-FREE idf ``(N - df + 0.5) / (df + 0.5)`` — the
  same convention as chunking.term_scores' log-free idf. ln() is libm
  (Java Math.log is only semi-monotonic, not correctly rounded) so its
  bits are engine-dependent; the rational idf is one IEEE division,
  identical everywhere. Ranking quality is unchanged for short queries
  (idf stays monotone in df).
* Per-document BM25 totals are sums over the query's terms. Each
  term's contribution is isolated with a conditional aggregate (a doc
  has at most one tf row per term, so each SUM folds one element) and
  the final total is written as t1 + t2 + ... in the fixed query-term
  order — no fold whose order an engine could choose.
* Surprisal avoids log() the same way quantile/idf queries do: the
  per-token information content is measured in HALF-BIT units via
  ``bitlen(r*r) - 1`` where ``r = clamp(n_total / count)`` — binary
  string length is exact integer arithmetic in both engines
  (length(bin(x)) - 1 == floor(log2(x))), and squaring first yields
  floor(2*log2(r)) i.e. half-bit granularity. Deliberate trade:
  half-bit resolution is plenty for a corpus quality GATE (Gopher/
  CCNet thresholds are whole-bit coarse) and the score is bit-exact
  at any parallelism, which a libm log can never promise.

Scale shape: both operators tokenize with the shared whitespace
tokenizer (text.py::_tokens), aggregate token counts map-side, and
join doc-level stats on term keys. BM25 filters the exploded tokens
to the query's terms BEFORE any shuffle (the corpus long tail never
leaves the scan stage); surprisal's vocabulary aggregate is the only
wide shuffle and carries (token, count) pairs, never text. No UDFs,
no collects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from walex_spark.extensions.text import _tokens

__all__ = ["bm25_topk", "unigram_surprisal", "bigram_surprisal", "half_bits"]


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents for a bag-of-words query under BM25 with
    log-free idf (module docstring).

    Returns (id_col, n_terms_matched, score, rnk) — rnk 1..k, ties
    broken by id. Score arithmetic is written as a fixed sequence of
    IEEE double ops mirrored verbatim by the SQL oracle:

        idf_t   = (N - df_t + 0.5) / (df_t + 0.5)
        tfn_t   = (tf * (k1+1)) / (tf + k1 * ((1-b) + b * (dl / avgdl)))
        score   = sum over query terms, in the given term order

    Scale shape: the exploded token stream is filtered to the query's
    terms before the (doc, term) aggregate, so the shuffle carries only
    matching postings; dl comes from the same scan via a size()
    expression (no second tokenize pass is shuffled); N/avgdl/df are
    one-row / |q|-row aggregates broadcast back. The final top-k is a
    global sort LIMIT k (TakeOrdered — no single-partition window).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if len(set(query_terms)) != len(query_terms):
        raise ValueError("query_terms must be distinct")

    toks = _tokens(F.col(text_col))
    base = df.select(
        F.col(id_col),
        F.size(toks).alias("dl"),
        F.explode(toks).alias("term"),
    ).filter(F.col("term").isin(list(query_terms)))

    tf = base.groupBy(id_col, "dl", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )

    # corpus stats: N and total token count from one narrow agg pass
    stats = df.select(
        F.count(F.lit(1)).alias("n_docs"),
        # NULL-text guard: pre-ANSI size(NULL) is -1, which would
        # silently skew avgdl where the oracle's SUM skips NULLs —
        # count NULL docs as zero tokens on both engines instead
        F.sum(F.when(toks.isNotNull(), F.size(toks)).otherwise(F.lit(0)))
        .alias("total_tokens"),
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(stats))
        .select(
            F.col(id_col),
            F.col("term"),
            _bm25_contrib(
                F.col("tf"),
                F.col("df"),
                F.col("dl"),
                F.col("n_docs"),
                F.col("total_tokens"),
                k1,
                b,
            ).alias("contrib"),
        )
    )
    # one conditional sum per query term; total written in term order
    per_term = [
        F.sum(F.when(F.col("term") == t, F.col("contrib"))).alias(f"__c{i}")
        for i, t in enumerate(query_terms)
    ]
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_terms_matched"), *per_term
    )
    total = None
    for i in range(len(query_terms)):
        c = F.coalesce(F.col(f"__c{i}"), F.lit(0.0))
        total = c if total is None else total + c
    ranked = (
        agg.select(
            F.col(id_col),
            F.col("n_terms_matched").cast(T.LongType()).alias("n_terms_matched"),
            total.alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    # the window runs AFTER limit k — k rows, not a global single
    # partition pass
    return ranked.withColumn(
        "rnk", F.row_number().over(w).cast(T.LongType())
    )


def _bm25_contrib(
    tf: Column, dfreq: Column, dl: Column, n_docs: Column,
    total_tokens: Column, k1: float, b: float,
) -> Column:
    tfd = tf.cast(T.DoubleType())
    dfd = dfreq.cast(T.DoubleType())
    nd = n_docs.cast(T.DoubleType())
    dld = dl.cast(T.DoubleType())
    avgdl = total_tokens.cast(T.DoubleType()) / nd
    idf = (nd - dfd + F.lit(0.5)) / (dfd + F.lit(0.5))
    tfn = (tfd * F.lit(k1 + 1.0)) / (
        tfd + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (dld / avgdl))
    )
    return idf * tfn


_R_CAP = (1 << 31) - 1


def half_bits(ratio: Column) -> Column:
    """floor(2 * log2(r)) for integer r >= 1 via exact binary-string
    length: length(bin(r*r)) - 1. ``r`` is clamped to 2^31 - 1 so the
    square fits int64 (the clamp only touches tokens rarer than one in
    2^31 — their surprisal saturates at ~62 half-bits)."""
    r = F.least(ratio, F.lit(_R_CAP)).cast(T.LongType())
    return (F.length(F.bin(r * r)) - F.lit(1)).cast(T.LongType())


def unigram_surprisal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document unigram-LM surprisal in half-bit units — the
    model-free analogue of CCNet's perplexity quality bucket.

    The corpus itself is the language model: token t with count c out
    of N total tokens carries ``half_bits(N div c)`` half-bits of
    information (≈ 2*log2(N/c)); a document's score is the sum over
    its tokens. High bits/token = rare-token-heavy (gibberish, code,
    boilerplate-free); low = repetitive/templated. Exact integer
    arithmetic end to end (module docstring).

    Returns (id_col, n_tokens, total_half_bits, half_bits_per_token)
    with the per-token average as one double division.

    Scale shape: vocabulary aggregate = one (token, count) shuffle —
    the same shape as q_doc_vocab_topk; per-doc totals re-join the
    exploded stream on the token key (map-side combinable sum). The
    join is on the vocab's zipf head+tail but carries two longs per
    token; no text crosses the second shuffle.
    """
    # n_total derives from the vocab (a metadata aggregate) rather
    # than a third corpus pass. base still evaluates twice (vocab agg
    # + scoring join) — deliberately NOT checkpointed: a whitespace
    # split re-runs cheaper than materializing the exploded token
    # stream (measured 0.79 s vs 0.95 s at sf0.1, and at 100 TB the
    # checkpoint would persist corpus-token rows)
    base = df.select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("tok")
    )
    vocab = base.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("n_total"))
    scored = (
        base.join(vocab, "tok")
        .join(F.broadcast(total))
        .select(
            F.col(id_col),
            # exact integer division (double `/` + cast could round a
            # >2^53 quotient across the floor boundary)
            half_bits(F.expr("n_total div cnt")).alias("hb"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast(T.LongType()).alias("n_tokens"),
        F.sum("hb").cast(T.LongType()).alias("total_half_bits"),
    ).select(
        F.col(id_col),
        "n_tokens",
        "total_half_bits",
        (
            F.col("total_half_bits").cast(T.DoubleType())
            / F.col("n_tokens").cast(T.DoubleType())
        ).alias("half_bits_per_token"),
    )


def bigram_surprisal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document bigram-LM conditional surprisal in half-bit units
    — the order-2 upgrade of :func:`unigram_surprisal` (CCNet trains a
    5-gram KenLM; a corpus-as-its-own-LM bigram model is the largest
    order whose count tables stay join-shaped without backoff).

    Model: p(w2 | w1) = c(w1,w2) / c(w1·) where c(w1·) is the number
    of corpus bigrams whose first token is w1 (so the conditional
    normalizes exactly — unigram token counts would not, the last
    token of each doc never opens a bigram). Each bigram position
    contributes ``half_bits(c(w1·) div c(w1,w2))`` ≈ 2*log2(1/p);
    exact integer arithmetic end to end (module docstring — libm log
    is engine-dependent, binary-string length is not).

    High half-bits/bigram = locally unpredictable token transitions
    (gibberish, shuffled boilerplate); low = templated n-gram runs the
    unigram model cannot see (a doc of rare-but-always-adjacent tokens
    scores HIGH on unigram and LOW here — the gap between the two is
    the repetition signal CCNet buckets on). Docs with < 2 tokens have
    no bigrams and drop out, same convention as the oracle.

    Returns (id_col, n_bigrams, total_half_bits, half_bits_per_bigram)
    with the average as one double division.

    Scale shape: ONE exploded bigram stream feeds everything. The
    (w1,w2) count table is a map-side-combinable shuffle on the pair
    key; the context count c(w1·) re-aggregates that (already
    vocab²-bounded, in practice vocab-sized) table — NOT the corpus
    stream — so the second shuffle carries (w1, count) longs only.
    Scoring re-joins the stream once against the context-enriched
    pair table on (w1,w2). No text crosses any shuffle except the
    bigram tokens themselves; no UDFs, no collects.
    """
    # adjacent-pair zip: slice(t, 1, n-1) x slice(t, 2, n-1) — stays
    # inside the scan stage, no posexplode + self-join
    base = (
        df.select(F.col(id_col), _tokens(F.col(text_col)).alias("toks"))
        .where(F.size("toks") >= 2)
        .select(
            F.col(id_col),
            F.explode(
                F.zip_with(
                    F.slice(F.col("toks"), F.lit(1), F.size("toks") - 1),
                    F.slice(F.col("toks"), F.lit(2), F.size("toks") - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("bg"),
        )
        .select(F.col(id_col), F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    pair = base.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    ctx = pair.groupBy("w1").agg(F.sum("c12").alias("c1"))
    enriched = pair.join(ctx, "w1")
    scored = base.join(enriched, ["w1", "w2"]).select(
        F.col(id_col),
        half_bits(F.expr("c1 div c12")).alias("hb"),
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast(T.LongType()).alias("n_bigrams"),
            F.sum("hb").cast(T.LongType()).alias("total_half_bits"),
        )
        .select(
            F.col(id_col),
            "n_bigrams",
            "total_half_bits",
            (
                F.col("total_half_bits").cast(T.DoubleType())
                / F.col("n_bigrams").cast(T.DoubleType())
            ).alias("half_bits_per_bigram"),
        )
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str = "doc_id",
    rank_col: str = "rnk",
    k_const: int = 60,
    top_k: int | None = 100,
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked retrieval lists (the
    standard hybrid-search combiner: lexical BM25 + embedding ANN).

    score(d) = 1/(k + rank_a(d)) + 1/(k + rank_b(d)), missing list
    membership contributes 0. Each term is one IEEE division of exact
    integers and the sum is written a-then-b — bit-exact anywhere.

    Returns (id_col, rank_a, rank_b, rrf_score, rnk) ordered by
    fused score (ties: present-in-both first via lower min-rank is
    implied by score; final tie-break id). ``top_k`` limits output.

    Scale shape: a full-outer equi-join of two k-row lists per query
    context — both sides are already top-k bounded, so this is
    metadata-sized relative to the corpus; TakeOrdered for the final
    cut. The final ``rnk`` is a partition-less ordered window, which
    is only safe because it runs AFTER the ``top_k`` LIMIT; ``top_k``
    therefore defaults to 100 rather than None. Passing
    ``top_k=None`` is allowed ONLY for inputs that are already
    top-k-bounded lists (the intended use) — never hand this an
    unbounded frame with ``top_k=None``, the single-task window would
    serialize it.
    """
    a = ranked_a.select(
        F.col(id_col), F.col(rank_col).cast(T.LongType()).alias("rank_a")
    )
    b = ranked_b.select(
        F.col(id_col), F.col(rank_col).cast(T.LongType()).alias("rank_b")
    )
    fused = a.join(b, id_col, "full_outer").select(
        F.col(id_col),
        "rank_a",
        "rank_b",
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(float(k_const)) + F.col("rank_a")),
                F.lit(0.0),
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(float(k_const)) + F.col("rank_b")),
                F.lit(0.0),
            )
        ).alias("rrf_score"),
    )
    out = fused.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
    if top_k is not None:
        out = out.limit(top_k)
    w = Window.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
    return out.withColumn("rnk", F.row_number().over(w).cast(T.LongType()))


def ndcg_at_k(
    ranked: DataFrame,
    relevance: DataFrame,
    k: int = 20,
    id_col: str = "doc_id",
    rank_col: str = "rnk",
    rel_col: str = "rel",
) -> DataFrame:
    """nDCG@1..k of a ranked retrieval list against graded relevance —
    the standard ranking-quality eval (the judge a production search
    stack runs beside recall@k).

    dcg@r   = sum_{i<=r} (2^rel_i - 1) / log2(i + 1)
    idcg@r  = the same sum over the IDEAL ordering (all corpus docs by
              rel desc, id asc — global ideal, truncated at k)
    ndcg@r  = dcg@r / idcg@r

    Cross-engine exactness: the 1/log2(i+1) discount weights are the
    ONLY transcendentals, and the ranks are the fixed integers 1..k —
    so the weights are computed ONCE in Python and embedded as double
    literals in both the Spark plan and the SQL oracle (libm never
    runs inside either engine). Gains are exact integers; the running
    sums are ordered windowed folds (rank asc), which both engines
    evaluate left-to-right — every double matches bit-for-bit.

    Returns (rnk, doc_id, rel, dcg_at, idcg_at, ndcg_at), one row per
    retrieved rank 1..k.

    Scale shape: ``ranked`` is an already-top-k list (metadata-sized);
    the ideal ordering is a TakeOrdered over the relevance frame (sort
    LIMIT k, never a global window over unbounded input); the join is
    k-vs-k on the rank key. The windowed running sums run over k rows.
    """
    import math

    weights = {r: 1.0 / math.log2(r + 1) for r in range(1, k + 1)}
    wmap = F.create_map(
        *[x for r, wt in weights.items() for x in (F.lit(r), F.lit(wt))]
    )
    got = ranked.filter(F.col(rank_col) <= k).select(
        F.col(rank_col).cast(T.LongType()).alias("rnk"), F.col(id_col)
    )
    rel = relevance.select(F.col(id_col), F.col(rel_col).cast(T.LongType()))
    gain = F.pow(F.lit(2.0), F.col(rel_col).cast(T.DoubleType())) - F.lit(1.0)
    scored = (
        got.join(rel, id_col, "left")
        .withColumn(rel_col, F.coalesce(F.col(rel_col), F.lit(0)))
        .withColumn("__c", gain * wmap[F.col("rnk")])
    )
    ideal = (
        rel.orderBy(F.col(rel_col).desc(), F.col(id_col).asc())
        .limit(k)
        .withColumn(
            "rnk",
            F.row_number()
            .over(Window.orderBy(F.col(rel_col).desc(), F.col(id_col).asc()))
            .cast(T.LongType()),
        )
        .withColumn("__ci", gain * wmap[F.col("rnk")])
        .select("rnk", "__ci")
    )
    both = scored.join(ideal, "rnk")
    # running DCG/IDCG as EXPLICIT prefix left-folds over the rank-
    # sorted contribution lists, NOT windowed SUMs: DuckDB evaluates
    # windowed aggregates with a segment tree (pairwise association),
    # so even identical per-rank doubles drift ~1 ulp from rank 4 on
    # (observed); a slice-then-fold is left-associated in both engines
    # and the frames are LIMIT-k bounded, so the k^2/2 adds are free.
    lists = both.agg(
        F.array_sort(F.collect_list(F.struct("rnk", "__c"))).alias("__lc"),
        F.array_sort(F.collect_list(F.struct("rnk", "__ci"))).alias("__lci"),
    )

    def _prefix(lst, field):
        return F.aggregate(
            F.slice(F.col(lst), F.lit(1), F.col("rnk").cast("int")),
            F.lit(0.0),
            lambda acc, x: acc + x[field],
        )

    return (
        both.join(F.broadcast(lists))
        .select(
            "rnk",
            id_col,
            rel_col,
            _prefix("__lc", "__c").alias("dcg_at"),
            _prefix("__lci", "__ci").alias("idcg_at"),
        )
        .withColumn("ndcg_at", F.col("dcg_at") / F.col("idcg_at"))
    )


def mmr_select(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    pool: int = 30,
    lambda_num: int = 7,
    lambda_den: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Maximal-marginal-relevance selection (Carbonell & Goldstein
    1998): greedily pick ``k`` documents from the BM25 top-``pool``
    maximizing λ·relevance − (1−λ)·max-similarity-to-already-picked —
    the diversified retrieval / diverse-exemplar-curation step (near
    duplicates of an already-chosen doc add no marginal value, so MMR
    suppresses them even when each scores high alone).

    Relevance = the BM25 score (bit-exact per ``bm25_topk``);
    similarity = exact Jaccard of distinct token sets; λ arrives as a
    rational (7/10) and every float op is a fixed double expression
    (λ·rel − (1−λ)·sim with λ literals in E-notation on the SQL side,
    where a bare decimal literal would type as DECIMAL and round
    differently). Ties at equal MMR break toward the smaller id.

    Scale note — why a driver-side greedy is the RIGHT shape here:
    MMR is inherently sequential (pick t depends on picks 1..t−1),
    and its entire state is the pool's score vector plus the pool×pool
    similarity matrix — O(pool²) values BOUNDED BY THE LIMIT, not by
    the corpus. Everything corpus-sized (tokenize, posting aggregate,
    top-pool cut, candidate token sets) runs distributed; the collect
    ships ``pool`` rows (the same metadata class as IVF centroids or
    the BPE per-round argmax). A distributed greedy would spend k
    scheduler rounds on 30 rows.

    Returns (pick, id_col, score) — pick 1..k in selection order.
    """
    from pyspark.sql import types as T2

    sc = bm25_topk(
        df, query_terms, k=pool, text_col=text_col, id_col=id_col
    ).select(id_col, "score")
    toksets = (
        df.join(sc.select(id_col), id_col, "left_semi")
        .select(
            F.col(id_col),
            F.array_distinct(_tokens(F.col(text_col))).alias("toks"),
        )
    )
    cand = [
        (r[0], float(r[1]), set(r[2]))
        for r in sc.join(toksets, id_col)
        .select(id_col, "score", "toks")
        .collect()
    ]
    cand.sort(key=lambda c: (-c[1], c[0]))
    # BOTH weights as exact rationals: 1.0 - 0.7 is 0.30000000000000004
    # in doubles, while the oracle's 3e-1 literal parses to the double
    # nearest 0.3 — divide each numerator instead, which IS that double
    lam = float(lambda_num) / float(lambda_den)
    mu = float(lambda_den - lambda_num) / float(lambda_den)
    picked: list[tuple[int, int, float]] = []
    chosen_sets: list[set] = []
    remaining = list(cand)
    for pick in range(1, min(k, len(cand)) + 1):
        if not chosen_sets:
            # First pick: the oracle's sel1 CTE orders by the RAW
            # score (rel desc, id asc). Selecting by lam*rel here can
            # diverge when two distinct score doubles collide after
            # the lambda multiply — take the head of the already
            # (-rel, id)-sorted pool, which mirrors sel1 exactly.
            doc, rel, toks = cand[0]
            picked.append((pick, doc, rel))
            chosen_sets.append(toks)
            remaining = [c for c in remaining if c[0] != doc]
            continue
        best = None
        for doc, rel, toks in remaining:
            msim = 0.0
            for s in chosen_sets:
                inter = len(toks & s)
                if inter:
                    sim = float(inter) / float(len(toks | s))
                    if sim > msim:
                        msim = sim
            mmr = lam * rel - mu * msim
            # strict > with (mmr desc, id asc) tie-break
            if best is None or mmr > best[0] or (mmr == best[0] and doc < best[1]):
                best = (mmr, doc, rel, toks)
        picked.append((pick, best[1], best[2]))
        chosen_sets.append(best[3])
        remaining = [c for c in remaining if c[0] != best[1]]
    spark = df.sparkSession
    schema = T2.StructType(
        [
            T2.StructField("pick", T2.LongType()),
            T2.StructField(id_col, T2.LongType()),
            T2.StructField("score", T2.DoubleType()),
        ]
    )
    return spark.createDataFrame(picked, schema)


def junk_rank_fusion(
    df: DataFrame,
    k_const: int = 60,
    top_k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Junk-first curation ranking: reciprocal-rank fusion of three
    independent degenerate-text signals over the WHOLE corpus —
    repetition (top-bigram fraction, high = templated), character
    entropy (low = key-mash/single-char runs), and unigram surprisal
    (low = boilerplate). The fused head of the list is the
    remove-first candidate set a curation pass reviews; rank fusion
    beats score fusion here because the three signals live on
    incomparable scales (fractions, half-bits/char, half-bits/token)
    and RRF needs only their orderings (Cormack et al. 2009).

    score(d) = Σ_s 1/(k + rank_s(d)), terms added in the fixed order
    repetition → entropy → surprisal; a doc missing from a signal
    (e.g. < 2 tokens ⇒ no bigram signal) contributes 0 for it.
    Signal values are the bit-exact outputs of the underlying
    operators; each ranking is a (value, id)-keyed
    ``global_sorted_index`` — ONE distributed range sort per signal,
    never a corpus-wide single-task window (the reason this is not
    ``rrf_fuse`` over unbounded frames, whose final window is only
    safe after a LIMIT). The final rnk window runs AFTER the top-k
    LIMIT.

    Returns (id_col, rank_rep, rank_ent, rank_sur, rrf_score, rnk),
    top-``top_k`` by fused score (ties: smaller id).
    """
    from walex_spark.extensions.text import char_entropy, repetition_stats
    from walex_spark.operators.ordering import global_sorted_index

    def _rank(signal: DataFrame, value_col, asc: bool, name: str) -> DataFrame:
        order = [
            F.col("__v").asc() if asc else F.col("__v").desc(),
            F.col(id_col).asc(),
        ]
        # checkpoint at birth: each rank frame (two longs per doc)
        # feeds the full-outer fusion join chain, under which the
        # whole signal-compute + range-sort subtree would otherwise
        # re-evaluate (26 → 15 exchanges across the three signals)
        return (
            global_sorted_index(
                signal.select(F.col(id_col), value_col.alias("__v")),
                order,
                index_col=name,
            )
            .select(id_col, name)
            .localCheckpoint(eager=False)
        )

    rep = _rank(
        repetition_stats(df, text_col=text_col, id_col=id_col),
        F.col("top_bigram_frac"),
        asc=False,
        name="rank_rep",
    )
    ent = _rank(
        char_entropy(df, text_col=text_col, id_col=id_col),
        F.col("half_bits_per_char"),
        asc=True,
        name="rank_ent",
    )
    sur = _rank(
        unigram_surprisal(df, text_col=text_col, id_col=id_col),
        F.col("half_bits_per_token"),
        asc=True,
        name="rank_sur",
    )
    kf = F.lit(float(k_const))
    fused = (
        rep.join(ent, id_col, "full_outer")
        .join(sur, id_col, "full_outer")
        .select(
            F.col(id_col),
            "rank_rep",
            "rank_ent",
            "rank_sur",
            (
                F.coalesce(F.lit(1.0) / (kf + F.col("rank_rep")), F.lit(0.0))
                + F.coalesce(F.lit(1.0) / (kf + F.col("rank_ent")), F.lit(0.0))
                + F.coalesce(F.lit(1.0) / (kf + F.col("rank_sur")), F.lit(0.0))
            ).alias("rrf_score"),
        )
    )
    out = fused.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc()).limit(
        top_k
    )
    w = Window.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
    return out.withColumn("rnk", F.row_number().over(w).cast(T.LongType()))


def prf_expand_topk(
    df: DataFrame,
    query_terms: list[str],
    fb_k: int = 10,
    expand_k: int = 4,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Pseudo-relevance-feedback retrieval (Rocchio 1971 / RM1-style):
    run BM25, treat the top-``fb_k`` documents as relevant, mine the
    ``expand_k`` best expansion terms from them, and re-run BM25 with
    the widened query — the classic recall lever when the original
    bag-of-words misses vocabulary the relevant docs actually use.

    Expansion-term weight is EXACT integer arithmetic: (Σ tf over the
    feedback docs) × half_bits(n_docs div corpus_df) — feedback mass
    times a half-bit idf (the module's log-free discipline), original
    terms excluded, ties (weight desc, term asc). The final query is
    original terms in their given order followed by expansion terms
    in weight-rank order; ``bm25_topk`` then sums contributions in
    exactly that term order, which the oracle mirrors with an
    ORDER-BY-term-rank left fold (0.0 + x == x in IEEE, so the
    coalesce-chain and the present-only fold are bit-identical).

    Returns bm25_topk's shape (id_col, n_terms_matched, score, rnk)
    for the expanded query.

    Scale shape: both retrieval passes are ``bm25_topk`` (query-term
    filter BEFORE any shuffle); term mining joins the feedback docs'
    tokens (fb_k docs — LIMIT-bounded) against the corpus
    document-frequency aggregate and TakeOrders ``expand_k`` rows;
    the only collect ships ``expand_k`` strings (metadata, the
    IVF-centroid class — term selection must reach the driver to
    parameterize the second pass's plan).
    """
    fb = bm25_topk(
        df, query_terms, k=fb_k, text_col=text_col, id_col=id_col
    ).select(id_col)
    toks = df.select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("tok")
    )
    dfreq = toks.groupBy("tok").agg(
        F.countDistinct(id_col).cast(T.LongType()).alias("df")
    )
    n_docs = df.agg(F.count(F.lit(1)).cast(T.LongType()).alias("n_docs"))
    fb_tf = (
        toks.join(fb, id_col, "left_semi")
        .filter(~F.col("tok").isin(list(query_terms)))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast(T.LongType()).alias("fb_tf"))
    )
    wts = (
        fb_tf.join(dfreq, "tok")
        .join(F.broadcast(n_docs))
        .select(
            "tok",
            (
                F.col("fb_tf") * half_bits(F.expr("n_docs div df"))
            ).alias("w"),
        )
    )
    expansion = [
        r.tok
        for r in wts.orderBy(F.col("w").desc(), F.col("tok").asc())
        .limit(expand_k)
        .collect()
    ]
    return bm25_topk(
        df,
        list(query_terms) + expansion,
        k=k,
        text_col=text_col,
        id_col=id_col,
    )
