"""Text-analysis operators: token stats, quality scores, language id,
fingerprinting.

Driver-mandated extensions. Everything is built-in column expressions
(split/regexp/aggregate) — JVM-side, whole-stage-codegen'd, no UDFs —
so each operator is a narrow map over the corpus: zero shuffles,
trivially scalable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# crude marker lists per language for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "a"),
    "es": ("el", "la", "de", "y"),
    "de": ("der", "die", "und", "das"),
    "fr": ("le", "la", "et", "les"),
}


def _tokens(text_col: Column) -> Column:
    return F.filter(F.split(F.lower(text_col), r"\s+"), lambda x: x != "")


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens, n_distinct, avg_token_len, type_token_ratio)."""
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    total_len = F.aggregate(
        toks, F.lit(0).cast(T.LongType()), lambda acc, x: acc + F.length(x)
    )
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        nd.alias("n_distinct"),
        (total_len.cast(T.DoubleType()) / n.cast(T.DoubleType())).alias("avg_token_len"),
        (nd.cast(T.DoubleType()) / n.cast(T.DoubleType())).alias("type_token_ratio"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features + a composite score ∈ [0,1].

    Features: char length, token count, stopword ratio, punctuation
    ratio, mean token length. Score formula is a fixed deterministic
    blend (documented here, reproducible in SQL).
    """
    text = F.col(text_col)
    toks = _tokens(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[\.,;:!\?]", ""))
    stop_ratio = n_stop.cast(T.DoubleType()) / n_tokens.cast(T.DoubleType())
    punct_ratio = n_punct.cast(T.DoubleType()) / n_chars.cast(T.DoubleType())
    len_ok = F.when((n_tokens >= 10) & (n_tokens <= 1000), F.lit(1.0)).otherwise(F.lit(0.3))
    score = (
        F.lit(0.4) * len_ok
        + F.lit(0.3) * F.least(stop_ratio * 4, F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0)))
    )
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        score.alias("quality_score"),
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language heuristic: argmax over per-language marker
    counts, 'und' (undetermined) when no marker hits. Deterministic
    tie-break by language code order.

    Emits one row per DISTINCT ``id_col`` value: if the input has
    duplicate ids, their token streams pool into a single prediction
    (the groupBy is keyed on the id, not the row). Feed a unique doc id
    — or pre-aggregate deliberately if pooling is what you want.
    """
    # explode + isin-filter + hash-aggregate, all whole-stage codegen —
    # the same shape that beat per-element HOF lambdas 5× for MinHash
    # signatures. The isin filter drops every non-marker token BEFORE
    # the shuffle, so only marker hits (a vanishing fraction of the
    # token stream) ever exchange; docs with zero hits rejoin as 'und'
    # via the left join (counts is hit-doc-sized → AQE broadcasts it).
    langs = sorted(LANG_MARKERS)
    all_markers = sorted({m for ms in LANG_MARKERS.values() for m in ms})
    base = df.select(F.col(id_col), _tokens(F.col(text_col)).alias("__toks"))
    hits = base.select(F.col(id_col), F.explode("__toks").alias("__tok")).filter(
        F.col("__tok").isin(*all_markers)
    )
    counts = hits.groupBy(id_col).agg(
        *[
            F.sum(F.col("__tok").isin(*LANG_MARKERS[lang]).cast(T.IntegerType())).alias(
                f"__n_{lang}"
            )
            for lang in langs
        ]
    )
    joined = base.select(F.col(id_col)).join(counts, id_col, "left")
    best = F.lit("und")
    best_score = F.lit(0).cast(T.LongType())
    # forward fold with strict > : alphabetically-first language wins ties
    for lang in langs:
        sc = F.coalesce(F.col(f"__n_{lang}"), F.lit(0).cast(T.LongType()))
        cond = sc > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, sc).otherwise(best_score)
    return joined.select(F.col(id_col), best.alias("pred_lang"))


# BPE-ish pre-tokenization: letter runs, digit runs, single punctuation
# marks — the split BPE vocabularies are trained over (simplified from
# the GPT-2 pattern; no \p classes so the same regex runs in any engine)
BPE_ISH_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def subword_token_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Token counting with a BPE-ish regex (complement to the whitespace
    counts in token_stats): (id, n_subtokens, n_distinct_subtokens,
    chars_per_subtoken). Pure regexp_extract_all — JVM-side, no UDF;
    chars_per_subtoken is the usual tokens-per-byte cost estimator for
    LLM training budgets."""
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(BPE_ISH_PATTERN), 0)
    n = F.size(toks)
    return df.select(
        F.col(id_col),
        n.alias("n_subtokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_subtokens"),
        (F.length(F.col(text_col)).cast(T.DoubleType()) / n.cast(T.DoubleType())).alias(
            "chars_per_subtoken"
        ),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase text
    plus a 32-bit integer bucket of it (for hash-partitioned dedup)."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    fp = F.md5(norm)
    return df.select(
        F.col(id_col),
        fp.alias("fingerprint"),
        F.conv(F.substring(fp, 1, 8), 16, 10).cast(T.LongType()).alias("fp_bucket"),
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality signal: the fraction of a doc's
    word bigrams taken by its single most frequent bigram (repetitive
    boilerplate / degenerate text scores high and gets filtered).

    Shape: repartition by doc id BEFORE the bigram explode (the corpus
    ships at raw-text size, and the groupBy(id, bigram) exchange is
    elided by the existing partitioning), then two bounded hash
    aggregates. The fraction is one int/int double division — exact and
    engine-portable. Docs with < 2 tokens drop out (no bigrams).
    """
    from walex_spark.extensions.dedup import partition_by_doc

    base = partition_by_doc(df, id_col).select(
        F.col(id_col), _tokens(F.col(text_col)).alias("__toks")
    )
    n = F.size(F.col("__toks"))
    bigrams = F.zip_with(
        F.slice(F.col("__toks"), 1, n - 1),
        F.slice(F.col("__toks"), 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    per = (
        base.filter(n >= 2)
        .select(F.col(id_col), F.explode(bigrams).alias("bigram"))
        .groupBy(id_col, "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return per.groupBy(id_col).agg(
        F.sum("c").alias("n_bigrams"),
        F.count(F.lit(1)).alias("n_distinct_bigrams"),
        (
            F.max("c").cast(T.DoubleType())
            / F.sum("c").cast(T.DoubleType())
        ).alias("top_bigram_frac"),
    )


# -- PII redaction -----------------------------------------------------

# Shared Java-regex / RE2 subset (no lookaround, no backrefs) so the
# exact same pattern strings run in Spark and in the DuckDB oracle.
# url/email are single-sourced from extensions/pii.py (the 6-class
# detection/monitoring family and its incremental twin); the phone
# pattern here is DELIBERATELY broader (any 8+-char digit run with
# (), -, spaces — the scrub-stage posture where recall beats
# precision) than pii.py's strict 3-3-4 monitoring pattern, whose
# rate-delta alarms would drown in loose-match noise.


def _shared_pii(name: str) -> str:
    from walex_spark.extensions.pii import PII_PATTERNS as _P6

    return next(pat for n, pat, _ in _P6 if n == name)


PII_PATTERNS: dict[str, str] = {
    "url": _shared_pii("url"),
    "email": _shared_pii("email"),
    "phone": r"\+?[0-9][0-9()\-\s]{6,}[0-9]",
}
PII_ORDER = ("url", "email", "phone")  # urls first: they may embed emails


def redact_pii(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Scrub common PII shapes (urls, emails, phone-like digit runs)
    before a corpus enters training: each match is replaced with a
    typed tag (``<URL>``/``<EMAIL>``/``<PHONE>``), applied in
    PII_ORDER so URL-embedded emails count once as urls.

    Returns (id, redacted_text, n_urls, n_emails, n_phones) with
    counts measured on the text as each stage sees it (post-prior-
    stage), matching what was actually replaced. Pure regexp column
    expressions — narrow map, zero shuffle, codegen'd.
    """
    out = df.select(F.col(id_col), F.col(text_col).alias("__t"))
    counts = []
    for kind in PII_ORDER:
        pat = PII_PATTERNS[kind]
        out = out.withColumn(f"n_{kind}s", F.regexp_count(F.col("__t"), F.lit(pat)))
        out = out.withColumn("__t", F.regexp_replace(F.col("__t"), pat, f"<{kind.upper()}>"))
        counts.append(f"n_{kind}s")
    return out.select(
        F.col(id_col),
        F.col("__t").alias("redacted_text"),
        *[F.col(c).cast(T.LongType()).alias(c) for c in counts],
    )


# -- normalization -----------------------------------------------------


def normalize_text(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Canonical text normalization ahead of dedup/tokenization:
    lowercase, strip ASCII control chars, collapse all whitespace runs
    to single spaces, trim. The same document with incidental
    formatting differences (tabs, CRLF, double spaces, case) maps to
    one canonical string, so exact dedup after normalization catches
    what byte-exact dedup misses.

    Patterns live in the shared Java-regex/RE2 subset (no lookaround)
    so the DuckDB oracle runs the literal same strings. Pure column
    expressions — narrow map, zero shuffle, whole-stage codegen'd.

    Returns (id, norm_text, n_chars_norm, norm_fingerprint) where the
    fingerprint is the md5 of the canonical string — the join key a
    normalized exact-dedup pass would shuffle on.
    """
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), r"[\x00-\x1f\x7f]", " "),
            r"\s+",
            " ",
        )
    )
    return df.select(
        F.col(id_col),
        norm.alias("norm_text"),
        F.length(norm).cast(T.LongType()).alias("n_chars_norm"),
        F.md5(norm).alias("norm_fingerprint"),
    )


# -- Gopher-style quality filters --------------------------------------

GOPHER_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def gopher_signals(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """The Gopher-paper quality-filter signal set (Rae et al. 2021,
    public): word count, mean word length, alphabetic-word ratio, and
    stopword hits, plus the composite pass flag with the paper's
    bounds (50 ≤ words ≤ 100k, 3 ≤ mean len ≤ 10, ≥80% words contain
    a letter, ≥2 distinct stopwords). Complements quality_score's
    smooth score with the hard gates a production corpus filter runs.

    Every signal is integer counting + exact integer-ratio division —
    bit-reproducible in any engine. Pure column expressions, zero
    shuffle, whole-stage codegen'd.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    out = df.select(
        F.col(id_col),
        toks.alias("__toks"),
    ).select(
        F.col(id_col),
        F.size("__toks").cast(T.LongType()).alias("n_words"),
        F.aggregate(
            F.transform(F.col("__toks"), lambda t: F.length(t).cast(T.LongType())),
            F.lit(0).cast(T.LongType()),
            lambda acc, x: acc + x,
        ).alias("__chars"),
        F.size(
            F.filter(F.col("__toks"), lambda t: t.rlike("[a-z]"))
        ).cast(T.LongType()).alias("__alpha"),
        F.size(
            F.array_intersect(
                F.array_distinct(F.col("__toks")),
                F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
            )
        ).cast(T.LongType()).alias("stop_hits"),
    )
    mean_len = F.col("__chars").cast(T.DoubleType()) / F.col("n_words").cast(T.DoubleType())
    alpha_ratio = F.col("__alpha").cast(T.DoubleType()) / F.col("n_words").cast(T.DoubleType())
    return out.select(
        F.col(id_col),
        "n_words",
        mean_len.alias("mean_word_len"),
        alpha_ratio.alias("alpha_word_ratio"),
        "stop_hits",
        (
            (F.col("n_words") >= 50) & (F.col("n_words") <= 100000)
            & (mean_len >= 3.0) & (mean_len <= 10.0)
            & (alpha_ratio >= 0.8)
            & (F.col("stop_hits") >= 2)
        ).alias("passes_gopher"),
    )


def ngram_novelty(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document n-gram novelty: the share of a doc's DISTINCT
    token n-grams whose corpus-wide first occurrence (minimum doc id)
    is this doc — i.e. how much genuinely new n-gram content the doc
    contributes when the corpus is consumed in id order.

    The curriculum/curation signal behind "novelty sampling": docs
    that only restate earlier n-grams (novelty → 0) are deprioritized,
    first-sighting docs (novelty → 1) carry new content. Deterministic
    by construction — min(doc_id) is order-free, the ratio is one IEEE
    division of exact longs. Docs with fewer than ``n`` tokens have no
    n-grams and drop out (oracle shares the convention).

    Returns (id_col, n_distinct_ngrams, n_novel, novelty_ratio).

    Scale shape: one (doc, ngram) DISTINCT shuffle over the exploded
    stream (the only wide exchange — map-side partial dedup applies),
    one map-side-combinable min() per ngram re-aggregating that table,
    and a join back on the ngram key; the final per-doc sum is again
    map-side combinable. No UDFs, no collects, nothing driver-sized.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    toks = _tokens(F.col(text_col))
    grams = (
        df.select(F.col(id_col), toks.alias("toks"))
        .where(F.size("toks") >= n)
        .select(
            F.col(id_col),
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - (n - 1)),
                    lambda i: F.concat_ws(
                        " ",
                        *[F.element_at(F.col("toks"), (i + j).cast("int"))
                          for j in range(n)],
                    ),
                )
            ).alias("gram"),
        )
        .distinct()
    )
    first = grams.groupBy("gram").agg(F.min(id_col).alias("__first"))
    return (
        grams.join(first, "gram")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast(T.LongType()).alias("n_distinct_ngrams"),
            F.sum(
                F.when(F.col("__first") == F.col(id_col), 1).otherwise(0)
            ).cast(T.LongType()).alias("n_novel"),
        )
        .select(
            F.col(id_col),
            "n_distinct_ngrams",
            "n_novel",
            (
                F.col("n_novel").cast(T.DoubleType())
                / F.col("n_distinct_ngrams").cast(T.DoubleType())
            ).alias("novelty_ratio"),
        )
    )


def nb_lang_classifier(
    df: DataFrame,
    n_buckets: int = 256,
    train_fraction: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "lang",
    salt: str = "nbsplit",
) -> DataFrame:
    """Multinomial Naive Bayes language classifier, trained AND applied
    inside the engine — the model-trained upgrade of the heuristic
    ``language_id`` (the fasttext-filter shape in CCNet-style
    pipelines, minus the external model file).

    Train/test split is the md5-bucket Bernoulli rule (leakage-safe,
    replayable: hash(salt || id) < 0.8*2^32). Features are hashed
    unigrams into ``n_buckets`` buckets — the model stays
    metadata-sized (C x B longs) and broadcastable no matter the
    corpus. Add-1 smoothing; libm logs are engine-dependent, so scores
    live in exact half-bit units with the floor applied PER LOG TERM
    (the DSIR discipline — see sampling.py::dsir_select):

        score_hb(d, c) = sum_b tf(d,b) * hb2(n(c,b) + 1)
                       - len(d) * hb2(n(c,.) + B)
                       + hb2(n_docs(c) + 1)

    (absent (c,b) model rows contribute hb2(0+1) = 0, so the sparse
    model IS the smoothed model). Overflow budget: tf <= doc length,
    every hb2 <= 62 → per-doc scores < 2^40 at any real doc size.
    Argmax ties break toward the lexicographically smaller class.

    Returns the held-out confusion matrix (lang, pred, n_docs) ordered
    by (lang, pred) — the per-class precision/recall report a pipeline
    derives its quality-gate thresholds from.

    Scale shape: ONE corpus-wide shuffle — the (doc, bucket) tf
    aggregate over the exploded token stream (map-side combinable).
    The model is a re-aggregate of the train side of that table
    (C x B rows) joined back as a bounded broadcast; per-class
    constants are a C-row broadcast; scoring fans each test (doc, b)
    row out x C (classes are a bounded dimension) and folds with a
    second map-side-combinable sum. The confusion output is C x C.
    """
    from walex_spark.extensions.sampling import _BUCKET_SPACE, _hash_bucket
    from walex_spark.extensions.search import half_bits

    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    threshold = int(train_fraction * _BUCKET_SPACE)
    base = (
        df.select(
            F.col(id_col),
            F.col(label_col).alias("lab"),
            (_hash_bucket(F.col(id_col), salt) < threshold).alias("is_train"),
            F.explode(_tokens(F.col(text_col))).alias("tok"),
        )
        .select(
            F.col(id_col),
            "lab",
            "is_train",
            F.pmod(_hash_bucket(F.col("tok"), salt + "|tok"), F.lit(n_buckets))
            .alias("b"),
        )
        .groupBy(id_col, "lab", "is_train", "b")
        .agg(F.count(F.lit(1)).cast(T.LongType()).alias("tf"))
        # four consumers (model, consts, per_doc, sums) — materialize
        # the bucketized tf table once (narrow: <= n_docs x min(len, B)
        # rows of longs) instead of re-tokenizing the corpus per branch
        .localCheckpoint(eager=False)
    )
    train = base.filter(F.col("is_train"))
    # model: per (class, bucket) half-bit weight; absent rows = hb2(1) = 0
    model = (
        train.groupBy(F.col("lab").alias("c"), "b")
        .agg(F.sum("tf").alias("cnt"))
        .select("c", "b", half_bits(F.col("cnt") + 1).alias("w_hb"))
    )
    # per-class constants: token total (denominator) + doc-count prior
    consts = (
        train.groupBy(F.col("lab").alias("c"))
        .agg(
            half_bits(F.sum("tf") + F.lit(n_buckets)).alias("den_hb"),
            half_bits(F.countDistinct(id_col) + F.lit(1)).alias("prior_hb"),
        )
    )
    test = base.filter(~F.col("is_train"))
    # every test doc scores against EVERY class: C-row broadcast cross
    # join guarantees classes with zero shared buckets still compete
    per_doc = test.groupBy(id_col, "lab").agg(
        F.sum("tf").cast(T.LongType()).alias("len")
    )
    sums = (
        test.join(F.broadcast(model), "b")
        .groupBy(id_col, "c")
        .agg(F.sum(F.col("tf") * F.col("w_hb")).alias("s"))
    )
    scored = (
        per_doc.join(F.broadcast(consts))
        .join(sums, [id_col, "c"], "left")
        .select(
            F.col(id_col),
            "lab",
            "c",
            (
                F.coalesce(F.col("s"), F.lit(0))
                - F.col("len") * F.col("den_hb")
                + F.col("prior_hb")
            ).alias("score_hb"),
        )
    )
    pred = scored.groupBy(id_col, "lab").agg(
        F.min(
            F.struct((-F.col("score_hb")).alias("ns"), F.col("c").alias("c"))
        )["c"].alias("pred")
    )
    return (
        pred.groupBy(F.col("lab").alias("lang"), "pred")
        .agg(F.count(F.lit(1)).cast(T.LongType()).alias("n_docs"))
        .orderBy("lang", "pred")
    )


def distinct_ngram_diversity(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distinct-n lexical diversity per corpus slice — the distinct-1 /
    distinct-2 metrics (Li et al. 2016) a data pipeline watches per
    source/domain: templated or model-generated slices collapse to few
    distinct n-grams over many tokens, organic text doesn't. The
    corpus-level complement of the per-document repetition gates
    (``repetition_stats`` / the Gopher signals).

    distinct_n = |distinct n-grams in the slice| / |n-gram tokens in
    the slice| — exact longs + one IEEE division per ratio.

    Returns (group_col, n_docs, n_tokens, distinct_unigrams,
    distinct_1, n_bigrams, distinct_bigrams, distinct_2), one row per
    slice, ordered by group_col.

    Scale shape: two (slice, gram) aggregates over the exploded
    stream — count-distinct shuffles on the gram key with map-side
    partial aggregation, output is slice-sized; the three branches
    join on the slice key (tiny, broadcastable by AQE). No joins or
    windows touch corpus-sized rows.
    """
    toked = df.select(
        F.col(group_col).alias("g"),
        F.col(id_col),
        _tokens(F.col(text_col)).alias("toks"),
    )
    uni = (
        toked.select("g", F.explode("toks").alias("tok"))
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast(T.LongType()).alias("n_tokens"),
            F.countDistinct("tok").cast(T.LongType()).alias("distinct_unigrams"),
        )
    )
    bi = (
        toked.where(F.size("toks") >= 2)
        .select(
            "g",
            F.explode(
                F.zip_with(
                    F.slice(F.col("toks"), F.lit(1), F.size("toks") - 1),
                    F.slice(F.col("toks"), F.lit(2), F.size("toks") - 1),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                )
            ).alias("big"),
        )
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast(T.LongType()).alias("n_bigrams"),
            F.countDistinct("big").cast(T.LongType()).alias("distinct_bigrams"),
        )
    )
    nd = toked.groupBy("g").agg(
        F.count(F.lit(1)).cast(T.LongType()).alias("n_docs")
    )
    return (
        nd.join(uni, "g")
        .join(bi, "g")
        .select(
            F.col("g").alias(group_col),
            "n_docs",
            "n_tokens",
            "distinct_unigrams",
            (
                F.col("distinct_unigrams").cast(T.DoubleType())
                / F.col("n_tokens").cast(T.DoubleType())
            ).alias("distinct_1"),
            "n_bigrams",
            "distinct_bigrams",
            (
                F.col("distinct_bigrams").cast(T.DoubleType())
                / F.col("n_bigrams").cast(T.DoubleType())
            ).alias("distinct_2"),
        )
        .orderBy(group_col)
    )


def zipf_fit(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Zipf's-law fit per corpus slice: least-squares slope of
    log2(freq) against log2(rank) over the slice's token frequency
    table. Organic language sits near slope -2 in half-bit units
    (i.e. -1 in bits — Zipf 1949); templated or synthetic slices bend
    the curve, so the slope is a per-source corpus-health diagnostic
    next to ``distinct_ngram_diversity``.

    Determinism discipline: both axes are EXACT integer half-bit logs
    (``search.half_bits`` — floor(2*log2(r)) via binary length), and
    the five regression sufficient statistics (n, Σx, Σy, Σxy, Σx²)
    are exact int64 aggregates — Σxy ≤ n·62² stays far inside int64
    at any corpus size. Only the final slope/intercept leave integer
    land, as fixed-shape IEEE-double expressions over the five sums
    (each op correctly rounded, so any engine reproduces the bits;
    the cross products n·Σxy would overflow int64 at ~10¹⁴ types,
    hence double ARITHMETIC over exact integer INPUTS, never a
    decimal intermediate).

    Rank is per-slice (freq DESC, token ASC) — computed from ONE
    global range sort via ``global_sorted_index`` minus broadcast
    per-slice offsets, never a per-slice single-task window.

    Returns (group_col, n_types, sum_x, sum_y, sum_xy, sum_xx,
    zipf_slope, zipf_intercept) — slope/intercept NULL for a
    degenerate slice (all ranks in one half-bit bucket).
    """
    from walex_spark.extensions.search import half_bits
    from walex_spark.operators.ordering import global_sorted_index

    toks = df.select(
        F.col(group_col).alias("g"),
        F.explode(_tokens(F.col(text_col))).alias("tok"),
    )
    vocab = toks.groupBy("g", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    # checkpoint at birth: ranked feeds BOTH the per-slice offset
    # aggregate and the regression points — without it the whole
    # tokenize+count+range-sort subtree evaluates twice (the tf-idf
    # postings discipline; vocab-sized narrow rows, safe to pin)
    ranked = global_sorted_index(
        vocab,
        [F.col("g").asc(), F.col("cnt").desc(), F.col("tok").asc()],
        index_col="__pos",
    ).localCheckpoint(eager=False)
    offs = ranked.groupBy("g").agg(F.min("__pos").alias("__g0"))
    pts = ranked.join(F.broadcast(offs), "g").select(
        "g",
        half_bits(F.col("__pos") - F.col("__g0") + F.lit(1)).alias("x"),
        half_bits(F.col("cnt")).alias("y"),
    )
    agg = pts.groupBy("g").agg(
        F.count(F.lit(1)).cast(T.LongType()).alias("n_types"),
        F.sum("x").cast(T.LongType()).alias("sum_x"),
        F.sum("y").cast(T.LongType()).alias("sum_y"),
        F.sum(F.col("x") * F.col("y")).cast(T.LongType()).alias("sum_xy"),
        F.sum(F.col("x") * F.col("x")).cast(T.LongType()).alias("sum_xx"),
    )
    n = F.col("n_types").cast(T.DoubleType())
    sx = F.col("sum_x").cast(T.DoubleType())
    sy = F.col("sum_y").cast(T.DoubleType())
    sxy = F.col("sum_xy").cast(T.DoubleType())
    sxx = F.col("sum_xx").cast(T.DoubleType())
    # fixed expression shapes — the oracle SQL mirrors them verbatim
    den = n * sxx - sx * sx
    num = n * sxy - sx * sy
    return agg.select(
        F.col("g").alias(group_col),
        "n_types",
        "sum_x",
        "sum_y",
        "sum_xy",
        "sum_xx",
        F.when(den != F.lit(0.0), num / den).alias("zipf_slope"),
        F.when(
            den != F.lit(0.0), (sy - (num / den) * sx) / n
        ).alias("zipf_intercept"),
    ).orderBy(group_col)


def char_entropy(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document character-unigram entropy — the gibberish /
    binary-spill / encoding-junk detector that complements the token
    gates: natural text sits in a narrow entropy band, base64 blobs
    and key-mash spike high, single-char runs collapse to ~0.

    Exact half-bit units: with c_ch occurrences of character ch out
    of n total, the doc's total information is
    Σ_ch c_ch · half_bits(n div c_ch) — all-integer arithmetic (the
    ``unigram_surprisal`` discipline applied at character level);
    only the final per-char average divides.

    Scale shape: ZERO shuffles — a pure projection. Per-doc char
    counts come from the row itself (count of ch = len(text) −
    len(replace(text, ch)) over array_distinct chars), so the corpus
    is touched once, inside one whole-stage-codegen span, and nothing
    is exploded; O(distinct_chars · len) string work per row with
    distinct_chars bounded by the alphabet.

    Returns (id_col, n_chars, n_distinct_chars, total_half_bits,
    half_bits_per_char). NULL/empty texts are DROPPED (the character
    population is undefined for them, and the SQL twin's
    position-explode produces no row to group).
    """
    from walex_spark.extensions.search import half_bits

    df = df.where(
        F.col(text_col).isNotNull() & (F.length(F.col(text_col)) > 0)
    )
    n = F.length(F.col(text_col)).cast(T.LongType())
    chars = F.array_distinct(F.split(F.col(text_col), ""))
    terms = F.transform(
        chars,
        lambda ch: (
            n - F.length(F.replace(F.col(text_col), ch))
        ).cast(T.LongType()),
    )
    # n div c via floor(double /): both operands < 2^31 so the true
    # quotient is ≥ 1/c > 2^-31 away from any wrong integer — the
    # correctly-rounded double can't cross the floor boundary
    hb_terms = F.transform(
        terms, lambda c: c * half_bits(F.floor(n / c).cast(T.LongType()))
    )
    total = F.aggregate(
        hb_terms, F.lit(0).cast(T.LongType()), lambda acc, t: acc + t
    )
    return df.select(
        F.col(id_col),
        n.alias("n_chars"),
        F.size(chars).cast(T.LongType()).alias("n_distinct_chars"),
        total.alias("total_half_bits"),
        F.when(
            n > F.lit(0),
            total.cast(T.DoubleType()) / n.cast(T.DoubleType()),
        ).alias("half_bits_per_char"),
    )


def token_burstiness(
    df: DataFrame,
    top_k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token dispersion statistics for the corpus's top-k tokens —
    burstiness in the Church & Gale sense: content words clump (a doc
    that mentions a term mentions it repeatedly → variance far above
    mean), function words spread evenly (VMR ≈ 1, Poisson-like).
    Rising VMR on a supposedly-organic slice means templated
    repetition; dispersion is also the signal for stopword-list
    derivation and df-vs-cf weighting choices.

    Per token over ALL docs (zeros included): doc frequency df,
    corpus count, Σx² of per-doc counts, then
    variance-to-mean ratio VMR = (n·Σx² − total²) / (n·total)
    (population variance over mean) and mean count among docs that
    contain the token. The three sufficient statistics are exact
    int64 aggregates; VMR/means are fixed-shape IEEE-double
    expressions over them, mirrored verbatim in the oracle.

    Returns (token, corpus_cnt, df, n_docs, sum_sq, vmr, mean_count,
    mean_given_present) ordered by (corpus_cnt desc, token).

    Scale shape: one (doc, token) count aggregate (map-side
    combinable), one token-level re-aggregate, an equi-join against
    the top-k frame (k rows — AQE broadcasts it), and the one-row
    doc-count broadcast. Top-k is a global TakeOrdered, never a
    single-partition window; nothing corpus-sized is collected.
    """
    per_doc = (
        df.select(F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    per_tok = per_doc.groupBy("tok").agg(
        F.sum("x").cast(T.LongType()).alias("corpus_cnt"),
        F.count(F.lit(1)).cast(T.LongType()).alias("df"),
        F.sum(F.col("x") * F.col("x")).cast(T.LongType()).alias("sum_sq"),
    )
    top = per_tok.orderBy(F.col("corpus_cnt").desc(), F.col("tok").asc()).limit(
        top_k
    )
    n_docs = df.agg(F.count(F.lit(1)).cast(T.LongType()).alias("n_docs"))
    n = F.col("n_docs").cast(T.DoubleType())
    tot = F.col("corpus_cnt").cast(T.DoubleType())
    ss = F.col("sum_sq").cast(T.DoubleType())
    return (
        top.join(F.broadcast(n_docs))
        .select(
            F.col("tok").alias("token"),
            "corpus_cnt",
            "df",
            "n_docs",
            "sum_sq",
            ((n * ss - tot * tot) / (n * tot)).alias("vmr"),
            (tot / n).alias("mean_count"),
            (tot / F.col("df").cast(T.DoubleType())).alias("mean_given_present"),
        )
        .orderBy(F.col("corpus_cnt").desc(), F.col("token").asc())
    )


def heaps_fit(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Heaps'-law fit: least-squares slope of half-bit log2(distinct
    vocabulary size) against half-bit log2(cumulative tokens) over
    id-ordered corpus prefixes — the vocabulary-GROWTH diagnostic that
    pairs with ``zipf_fit``'s frequency-decay one. Organic text grows
    vocabulary as V ≈ K·nᵝ with β ≈ 0.5–0.7 (Heaps 1978); a corpus
    whose curve flattens early is templated/synthetic (closed
    vocabulary), one near β = 1 is id-like junk. In half-bit log-log
    space the fitted slope IS β (both axes scale by the same factor).

    One prefix point per document: cumulative tokens and cumulative
    new-type count at that doc, both exact int64 (new types per doc =
    tokens whose corpus-wide min(doc_id) is that doc — the
    ``ngram_novelty`` trick at unigram level; INCLUSIVE prefix sums =
    exclusive ``prefix_sums_multi`` + the row's own value). The five
    regression sums are exact int64; slope/intercept are the same
    fixed-shape double expressions as ``zipf_fit``.

    Returns ONE row: (n_points, sum_x, sum_y, sum_xy, sum_xx,
    heaps_beta, heaps_intercept).

    Scale shape: one token aggregate per axis (min / count, map-side
    combinable), a doc-keyed join of two doc-sized narrow frames, ONE
    range shuffle for both prefix sums (the prefix_sums_multi
    contract), and a global 5-long aggregate. Σxy ≤ n·62² — int64 at
    any corpus size.
    """
    from walex_spark.extensions.search import half_bits
    from walex_spark.operators.ordering import prefix_sums_multi

    toks = df.select(
        F.col(id_col).alias("d"), F.explode(_tokens(F.col(text_col))).alias("tok")
    )
    first = toks.groupBy("tok").agg(F.min("d").alias("fd"))
    new_types = first.groupBy(F.col("fd").alias("d")).agg(
        F.count(F.lit(1)).cast(T.LongType()).alias("nv")
    )
    # checkpoint at birth: per_doc feeds prefix_sums_multi, whose
    # internal range/offset machinery evaluates its child more than
    # once — without the pin the token explode + both aggregates
    # re-run per evaluation (12 → ~4 exchanges). Three longs per doc.
    per_doc = (
        toks.groupBy("d")
        .agg(F.count(F.lit(1)).cast(T.LongType()).alias("nt"))
        .join(new_types, "d", "left")
        .select("d", "nt", F.coalesce(F.col("nv"), F.lit(0)).alias("nv"))
        .localCheckpoint(eager=False)
    )
    cum = prefix_sums_multi(
        per_doc, ["d"], ["nt", "nv"], ["ct0", "cv0"]
    ).select(
        (F.col("ct0") + F.col("nt")).alias("ct"),
        (F.col("cv0") + F.col("nv")).alias("cv"),
    )
    pts = cum.select(
        half_bits(F.col("ct")).alias("x"), half_bits(F.col("cv")).alias("y")
    )
    agg = pts.agg(
        F.count(F.lit(1)).cast(T.LongType()).alias("n_points"),
        F.sum("x").cast(T.LongType()).alias("sum_x"),
        F.sum("y").cast(T.LongType()).alias("sum_y"),
        F.sum(F.col("x") * F.col("y")).cast(T.LongType()).alias("sum_xy"),
        F.sum(F.col("x") * F.col("x")).cast(T.LongType()).alias("sum_xx"),
    )
    n = F.col("n_points").cast(T.DoubleType())
    sx = F.col("sum_x").cast(T.DoubleType())
    sy = F.col("sum_y").cast(T.DoubleType())
    sxy = F.col("sum_xy").cast(T.DoubleType())
    sxx = F.col("sum_xx").cast(T.DoubleType())
    den = n * sxx - sx * sx
    num = n * sxy - sx * sy
    return agg.select(
        "n_points",
        "sum_x",
        "sum_y",
        "sum_xy",
        "sum_xx",
        F.when(den != F.lit(0.0), num / den).alias("heaps_beta"),
        F.when(
            den != F.lit(0.0), (sy - (num / den) * sx) / n
        ).alias("heaps_intercept"),
    )


def dataset_card(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One-row dataset card — the summary artifact a corpus release
    publishes (HF dataset-card / Datasheets-for-Datasets numbers):
    document and token volume, vocabulary size, slice counts, and the
    exact-duplicate rate. All exact integers plus two IEEE divisions.

    Returns ONE row: (n_docs, n_tokens, total_chars, vocab_size,
    n_sources, n_langs, dup_groups, dup_docs, dup_rate,
    mean_doc_tokens).

    Scale shape: one corpus pass computes every per-row statistic
    (counts, char/token sums, the md5 group count and the two slice
    count-distincts ride the same Expand-based aggregate); the
    vocabulary size is the one exploded aggregate (token-keyed,
    map-side combinable) and rejoins as a one-row broadcast. Nothing
    is collected; output is literally one row.
    """
    toks = _tokens(F.col(text_col))
    base = df.agg(
        F.count(F.lit(1)).cast(T.LongType()).alias("n_docs"),
        # NULL-text guard (the bm25_topk precedent): pre-ANSI
        # size(NULL) is -1, which would skew the sum where the
        # oracle's SUM simply skips NULLs
        F.sum(F.when(toks.isNotNull(), F.size(toks)).otherwise(F.lit(0)))
        .cast(T.LongType())
        .alias("n_tokens"),
        F.sum(F.length(F.col(text_col))).cast(T.LongType()).alias(
            "total_chars"
        ),
        F.countDistinct(F.col("source")).cast(T.LongType()).alias(
            "n_sources"
        ),
        F.countDistinct(F.col("lang")).cast(T.LongType()).alias("n_langs"),
        F.countDistinct(F.md5(F.col(text_col)))
        .cast(T.LongType())
        .alias("dup_groups"),
    )
    vocab = (
        df.select(F.explode(toks).alias("tok"))
        .agg(F.countDistinct("tok").cast(T.LongType()).alias("vocab_size"))
    )
    return base.join(F.broadcast(vocab)).select(
        "n_docs",
        "n_tokens",
        "total_chars",
        "vocab_size",
        "n_sources",
        "n_langs",
        "dup_groups",
        (F.col("n_docs") - F.col("dup_groups")).alias("dup_docs"),
        (
            (F.col("n_docs") - F.col("dup_groups")).cast(T.DoubleType())
            / F.col("n_docs").cast(T.DoubleType())
        ).alias("dup_rate"),
        (
            F.col("n_tokens").cast(T.DoubleType())
            / F.col("n_docs").cast(T.DoubleType())
        ).alias("mean_doc_tokens"),
    )


def source_drift_psi(
    df: DataFrame,
    bucket_width: int = 10,
    n_buckets: int = 15,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Population Stability Index of each corpus slice's document
    token-count distribution against the whole-corpus baseline — the
    standard data-ops drift monitor (Siddiqi 2006 credit-scoring
    practice; in a training pipeline, per-source/per-dump PSI is the
    alarm that one ingestion slice changed shape: truncation bugs,
    boilerplate floods, crawler drift). Rule-of-thumb thresholds:
    < 0.1 stable, 0.1-0.25 drifting, > 0.25 shifted — our half-bit
    variant scales those by 2/ln 2 ≈ 2.89.

    PSI(s) = Σ_i (a_i/A − b_i/B) · log(a_i·B / (b_i·A)) over token-
    count buckets i (bucket = min(n_tokens div bucket_width,
    n_buckets−1)), a = slice doc counts, b = corpus doc counts.
    Exact-integer surface (the module's half-bit discipline): the log
    factor is ±half_bits(max(aB, bA) div min(aB, bA)) — the signed
    integer half-bit log of the cross ratio — saturated at −61 (the
    half_bits clamp) for buckets the slice never hits; the mass
    factor's numerator d_i = a_i·B − b_i·A is an exact int64 over the
    common denominator A·B. psi_num = Σ d_i·hb_i is summed in
    DECIMAL(38,0) (d can reach A·B ≈ 2^63 at extreme scale; the
    products a·B / b·A themselves bound corpus size at ~3e9 docs per
    side before int64 overflow — beyond that, run per-shard and sum)
    and surfaces as int64; psi_half_bits = psi_num / (A·B) is one
    double division. Every term is engine-independent, so the oracle
    hash-matches bit for bit.

    Returns (group_col, n_docs, buckets_hit, zero_buckets, psi_num,
    psi_half_bits) ordered by group_col.

    Scale shape: ONE corpus pass — the narrow (slice, bucket) map and
    a map-side-combinable count into the (slice, bucket) histogram,
    which is |slices| × n_buckets rows: metadata by construction. The
    histogram is checkpointed, and the corpus histogram, the slice
    totals, and the corpus total are all folded FROM it as
    metadata-sized aggregates (Catalyst has no cross-consumer subtree
    reuse, so without the materialization each fold would re-run the
    corpus scan — and the tokenize projection, the actual cost at
    100 TB — once per consumer: the 4-pass shape the r09 review
    flagged).
    localCheckpoint(eager=False) rather than persist(): the truncated
    lineage makes every downstream plan IDENTICAL whether or not the
    cache is already materialized (persist() left the full scan
    lineage in the plan text, and plan-equality tests flapped with
    CacheManager state — the r10 deflake). The tradeoff is honest:
    losing a checkpoint block means rerunning the query rather than
    recomputing from lineage — acceptable for a monitor whose unit of
    work IS one scan, and the checkpointed artifact is a few KB of
    histogram. The grid join is
    |corpus buckets| × |slices|, built with two bounded broadcasts
    (the burstiness / dataset_card class). Nothing corpus-sized
    crosses an exchange and no text leaves the first projection.
    """
    from walex_spark.extensions.search import half_bits

    per = df.select(
        F.col(group_col),
        F.least(
            F.floor(
                F.size(_tokens(F.col(text_col))) / F.lit(int(bucket_width))
            ),
            F.lit(int(n_buckets) - 1),
        )
        .cast(T.LongType())
        .alias("bucket"),
    )
    slice_counts = (
        per.groupBy(group_col, "bucket")
        .agg(F.count(F.lit(1)).cast(T.LongType()).alias("a"))
        .localCheckpoint(eager=False)
    )
    # every coarser count folds from the cached histogram — exact
    # integer sums of exact integer counts, so the values (and the
    # oracle hash) are unchanged from the 4-pass shape
    corpus_counts = slice_counts.groupBy("bucket").agg(
        F.sum("a").cast(T.LongType()).alias("b")
    )
    # totals named sa/cb (not A/B): Spark's default case-insensitive
    # resolver would make `A` ambiguous with the per-bucket `a`
    slice_tot = slice_counts.groupBy(group_col).agg(
        F.sum("a").cast(T.LongType()).alias("sa")
    )
    corpus_tot = slice_counts.agg(
        F.sum("a").cast(T.LongType()).alias("cb")
    )
    grid = (
        corpus_counts.join(F.broadcast(slice_tot))
        .join(slice_counts, [group_col, "bucket"], "left")
        .join(F.broadcast(corpus_tot))
        .select(
            group_col,
            "bucket",
            F.coalesce(F.col("a"), F.lit(0)).alias("a"),
            "b",
            "sa",
            "cb",
        )
    )
    ab = F.col("a") * F.col("cb")
    ba = F.col("b") * F.col("sa")
    # exact INTEGER division (Spark `/` on longs is double division —
    # `div` is the cross-engine-exact spelling, DuckDB's `//`)
    hb = (
        F.when(F.col("a") == 0, F.lit(-61).cast(T.LongType()))
        .when(ab >= ba, half_bits(F.expr("(a * cb) div (b * sa)")))
        .otherwise(-half_bits(F.expr("(b * sa) div (a * cb)")))
    )
    term = (ab - ba).cast(T.DecimalType(38, 0)) * hb.cast(T.DecimalType(38, 0))
    return (
        grid.withColumn("__hb", hb)
        .groupBy(group_col)
        .agg(
            F.max("sa").alias("n_docs"),
            F.sum((F.col("a") > 0).cast(T.LongType()))
            .cast(T.LongType())
            .alias("buckets_hit"),
            F.sum((F.col("a") == 0).cast(T.LongType()))
            .cast(T.LongType())
            .alias("zero_buckets"),
            F.sum(term).cast(T.LongType()).alias("psi_num"),
            F.max("sa").alias("__A"),
            F.max("cb").alias("__B"),
        )
        .select(
            group_col,
            "n_docs",
            "buckets_hit",
            "zero_buckets",
            "psi_num",
            (
                F.col("psi_num").cast(T.DoubleType())
                / (
                    F.col("__A").cast(T.DoubleType())
                    * F.col("__B").cast(T.DoubleType())
                )
            ).alias("psi_half_bits"),
        )
        .orderBy(group_col)
    )


def source_drift_ks(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift statistic of each corpus
    slice's document token-count distribution against the whole-corpus
    baseline — the bucket-free complement to ``source_drift_psi``.
    PSI needs a binning choice and saturates on empty buckets; KS is
    the sup-norm distance between the two EMPIRICAL CDFs evaluated on
    the raw value domain, so it catches shifts that fall inside one
    PSI bucket (e.g. every doc in a dump losing its last sentence).

    KS(s) = max_v |ECDF_s(v) − ECDF_corpus(v)| over observed token
    counts v. Exact-integer surface: at threshold v the difference is
    |ca·B − cb·A| / (A·B) with ca/cb the cumulative doc counts ≤ v for
    the slice / the corpus and A/B their totals — the numerator is an
    exact int64 (the PSI overflow note applies: products bound corpus
    size at ~3e9 docs per side; beyond that run per-shard), the max of
    int64s is exact, and the one IEEE division happens at the very
    end. The argmax threshold is recovered deterministically — filter
    to rows where the diff equals the per-slice windowed max, then
    MIN(v) among ties — NOT engine-specific ``max_by``/``arg_max``,
    whose tie-breaking is unspecified and would flip the value hash.

    Returns (group_col, n_docs, n_values, ks_num, ks_at, ks_stat)
    ordered by group_col: ks_num/ks_at the exact integer numerator and
    smallest threshold attaining it, ks_stat = ks_num/(A·B) ∈ [0, 1].

    Scale shape: ONE corpus pass into the (slice, token-count)
    histogram — the value domain is bounded by the longest document,
    not the corpus, so the histogram is |slices| × |values| rows:
    metadata-sized. It is checkpointed and the corpus histogram /
    slice totals / corpus total fold FROM it (without the
    materialization, Catalyst's lack of cross-consumer subtree reuse
    re-runs the corpus scan — and the tokenize projection, the real
    cost at 100 TB — once per consumer).
    localCheckpoint(eager=False) rather than persist() —
    persist's CacheManager plan-equality substitution makes repeated
    constructions analyze to different plans (cache-state-dependent
    exchange counts); see source_drift_psi's note.
    The grid is |values| × |slices| rows built from two bounded
    broadcasts (the ``source_drift_psi`` grid), one window partitioned
    by slice computes BOTH cumulative counts (the grid is
    corpus-value-driven, so every partition carries the full common
    threshold set), and the argmax rides the same partitioning as one
    more Window node — no join-back, no second grid subtree.
    """
    per = df.select(
        F.col(group_col),
        F.size(_tokens(F.col(text_col))).cast(T.LongType()).alias("v"),
    )
    slice_counts = (
        per.groupBy(group_col, "v")
        .agg(F.count(F.lit(1)).cast(T.LongType()).alias("a"))
        .localCheckpoint(eager=False)
    )
    # metadata-sized folds of the cached histogram — exact integer
    # sums, value-hash identical to the 4-pass shape
    corpus_counts = slice_counts.groupBy("v").agg(
        F.sum("a").cast(T.LongType()).alias("b")
    )
    slice_tot = slice_counts.groupBy(group_col).agg(
        F.sum("a").cast(T.LongType()).alias("sa")
    )
    corpus_tot = slice_counts.agg(
        F.sum("a").cast(T.LongType()).alias("cb")
    )
    grid = (
        corpus_counts.join(F.broadcast(slice_tot))
        .join(slice_counts, [group_col, "v"], "left")
        .join(F.broadcast(corpus_tot))
        .select(
            group_col,
            "v",
            F.coalesce(F.col("a"), F.lit(0)).alias("a"),
            "b",
            "sa",
            "cb",
        )
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    diffs = grid.select(
        group_col,
        "v",
        "sa",
        "cb",
        F.abs(
            F.sum("a").over(w) * F.col("cb")
            - F.sum("b").over(w) * F.col("sa")
        ).alias("d"),
    )
    # per-slice max and threshold count as UNBOUNDED windows over the
    # same partition key (one more Window node on the existing
    # exchange), then filter-to-max + MIN(v): a groupBy-then-join-back
    # argmax would consume `diffs` twice, and Catalyst's lack of
    # cross-consumer reuse would duplicate the whole grid subtree
    wg = Window.partitionBy(group_col)
    scored = diffs.select(
        group_col,
        "v",
        "sa",
        "cb",
        "d",
        F.max("d").over(wg).alias("ks_num"),
        F.count(F.lit(1)).over(wg).cast(T.LongType()).alias("n_values"),
    )
    return (
        scored.filter(F.col("d") == F.col("ks_num"))
        .groupBy(group_col)
        .agg(
            F.max("sa").alias("n_docs"),
            F.max("n_values").alias("n_values"),
            F.max("ks_num").alias("ks_num"),
            F.min("v").alias("ks_at"),
            F.max("cb").alias("__B"),
        )
        .select(
            group_col,
            "n_docs",
            "n_values",
            "ks_num",
            "ks_at",
            (
                F.col("ks_num").cast(T.DoubleType())
                / (
                    F.col("n_docs").cast(T.DoubleType())
                    * F.col("__B").cast(T.DoubleType())
                )
            ).alias("ks_stat"),
        )
        .orderBy(group_col)
    )
