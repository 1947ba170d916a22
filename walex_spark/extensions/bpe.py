"""Byte-pair-encoding merge training as DataFrame iterations.

BPE (Sennrich et al. 2016, public) learns a subword vocabulary by
repeatedly merging the most frequent adjacent symbol pair. The
classic trainer is a single-machine dict loop; the corpus-scale form
decomposes per iteration into:

  1. pair counting — pair each symbol with its successor IN-ARRAY
     (zip_with over two shifted slices: no explode-then-window, no
     per-round by-word shuffle — r08 replaced the posexplode +
     Window.partitionBy(seq) form, whose window shuffle keyed on the
     whole symbol ARRAY, with this; measured ~2x per round at sf0.1,
     set-equal output), then
     explode the pair array and sum weighted by word frequency
     (map-side combined; the one shuffle per round runs over the
     DISTINCT-word pair table, not the corpus);
  2. argmax — one metadata-sized action (the single best pair) with
     the deterministic tie-break (count DESC, pair ASC);
  3. merge — a greedy leftmost fold over each symbol ARRAY
     (F.aggregate, JVM-side): the freshly merged symbol can never
     left-overlap the next match because the accumulator tail is
     already "ab", not "b" — the same semantics every reference BPE
     implementation has. A literal string replace would be WRONG
     here twice over: "a b" matches across symbol boundaries
     ("xa b" → "xab"), and delimiter-padded patterns skip alternate
     occurrences in runs ("a b a b" merges once, not twice).

The distinct-word table is the scale trick every practical BPE
trainer uses: iteration cost is O(|vocab|), not O(corpus), because
sequences carry their corpus frequency as a weight. Sequences are
localCheckpointed per round so the plan does not grow with merges.

Pair counting includes overlapping adjacencies ("y y y" counts
(y,y) twice), matching the reference counter; merging is greedy
leftmost non-overlapping — bit-reproducible, integer/string exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["train_bpe_merges", "merge_pair", "encode_words"]


def merge_pair(seq_arr: Column, a: str, b: str, merged: str) -> Column:
    """Greedy leftmost merge of adjacent (a, b) in a symbol array."""
    last = F.try_element_at  # null (not an error) on index 0 / empty

    def step(acc: Column, x: Column) -> Column:
        hit = (
            (F.size(acc) > 0)
            & (last(acc, F.size(acc)) == F.lit(a))
            & (x == F.lit(b))
        )
        return F.when(
            hit,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(
        seq_arr, F.array().cast(T.ArrayType(T.StringType())), step
    )


def encode_words(
    words: DataFrame,
    merges: list[tuple[int, str, str]],
    word_col: str = "word",
    out_col: str = "tokens",
) -> DataFrame:
    """APPLY trained merges: every ``word_col`` value gains ``out_col``
    = its BPE token array (array<string>) under the given merge list.

    The standard encoder semantics (matching every reference BPE):
    split the word to characters, then apply each merge in TRAINED
    ORDER as a greedy leftmost fold (merge_pair — the same JVM
    F.aggregate the trainer uses, so train and encode can never
    disagree on a word the trainer saw). Words unseen at training time
    encode through the identical path — merges simply match or don't.

    Scale shape: call this on the DISTINCT-word table and join the
    result back to the corpus (the trainer's own O(vocab) trick) —
    the fold then runs once per vocabulary entry, not once per
    occurrence. The merge list is metadata (tens to tens of thousands
    of entries in practice; each becomes three string literals in ONE
    projection), never a join side.

    Invariant worth stating: concat(tokens) == word for every row —
    BPE merges only ever fuse adjacent symbols, so the token sequence
    always re-spells the word (the model test pins this).
    """
    seq = F.split(
        F.rtrim(F.regexp_replace(F.col(word_col), "(.)", "$1 ")), " "
    )
    for _, pair, merged in merges:
        a, b = pair.split(" ")
        seq = merge_pair(seq, a, b, merged)
    return words.withColumn(out_col, seq)


def train_bpe_merges(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
) -> list[tuple[int, str, str]]:
    """Learn ``n_merges`` BPE merges; returns [(step, pair, merged)].

    ``pair`` is the space-separated symbol pair ("t h"), ``merged``
    the fused symbol ("th"). Symbolization: lowercased whitespace
    words, split to characters. Stops early when no pair occurs
    twice.
    """
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")

    words = (
        docs.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda x: x != "",
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast(T.LongType()).alias("cnt"))
    )
    seqs = words.select(
        F.split(
            F.rtrim(F.regexp_replace(F.col("word"), "(.)", "$1 ")), " "
        ).alias("seq"),
        "cnt",
    ).localCheckpoint(eager=False)

    merges: list[tuple[int, str, str]] = []
    for step_no in range(1, n_merges + 1):
        # adjacent pairs in-array: zip each symbol with its successor
        # (two shifted slices of equal length size-1) — overlapping
        # adjacencies included ("y y y" counts (y, y) twice), same
        # counter semantics as the reference dict loop, zero shuffle
        # before the pair aggregate
        m = F.size("seq") - F.lit(1)
        pair_arr = F.zip_with(
            F.slice(F.col("seq"), F.lit(1), m),
            F.slice(F.col("seq"), F.lit(2), m),
            lambda x, y: F.concat_ws(" ", x, y),
        )
        pairs = (
            seqs.filter(F.size("seq") >= 2)
            .select(F.explode(pair_arr).alias("pair"), "cnt")
            .groupBy("pair")
            .agg(F.sum("cnt").alias("n"))
        )
        best = pairs.orderBy(F.col("n").desc(), F.col("pair").asc()).first()
        if best is None or best["n"] < 2:
            break
        pair = best["pair"]
        a, b = pair.split(" ")
        merged = a + b
        merges.append((step_no, pair, merged))
        seqs = seqs.select(
            merge_pair(F.col("seq"), a, b, merged).alias("seq"), "cnt"
        ).localCheckpoint(eager=False)
    return merges


def wordpiece_segment(
    df: DataFrame,
    top_pieces: int = 16,
    max_piece_len: int = 6,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """WordPiece-style greedy longest-match-first subword segmentation
    (Wu et al. 2016's inference rule — the tokenizer actually used at
    encode time by BERT-family stacks, vs BPE's merge-order replay):
    a corpus-derived piece vocabulary, then each word is consumed
    left-to-right taking the LONGEST vocabulary piece that prefixes
    the remaining suffix.

    Vocabulary (deterministic, no training loop): every single
    character seen in the corpus (the coverage guarantee — greedy
    always progresses) plus the ``top_pieces`` most frequent
    substrings of length 2..``max_piece_len`` over distinct words,
    weighted by word frequency, ties broken (weight DESC, piece ASC).

    Returns (id_col, n_words, n_pieces, pieces_per_word) per doc —
    all-integer/string arithmetic plus one final IEEE division, exact
    in any engine (no floats anywhere else; the safest determinism
    class in the repo).

    Scale shape — the same O(|word vocab|) trick as the BPE trainer:
    everything iterative runs over the DISTINCT-word table, never the
    corpus. The greedy loop is ONE F.aggregate fold per word over
    sequence(1, len(w)) against the piece-vocab literal (a
    metadata-sized collect, same class as the IVF centroid/codebook
    constants): no joins, no shuffles in the loop, and the plan size
    is corpus-independent (the pre-r12 form unrolled max-word-length
    Project rounds whose fused codegen method grew with the longest
    word); the corpus is touched exactly twice (the word-count
    aggregate and the final per-doc sum join).
    """
    from walex_spark.extensions.text import _tokens

    toks = _tokens(F.col(text_col))
    pieces = _wordpiece_word_pieces(df, top_pieces, max_piece_len, text_col)
    # NO broadcast hint: the distinct-WORD table is corpus-vocab-sized
    # (unbounded at 100 TB, unlike the piece vocab) — let AQE pick
    per_doc = (
        df.select(F.col(id_col), F.explode(toks).alias("w"))
        .join(pieces, "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast(T.LongType()).alias("n_words"),
            F.sum("n_pieces").cast(T.LongType()).alias("n_pieces"),
        )
        .select(
            F.col(id_col),
            "n_words",
            "n_pieces",
            (
                F.col("n_pieces").cast(T.DoubleType())
                / F.col("n_words").cast(T.DoubleType())
            ).alias("pieces_per_word"),
        )
    )
    return per_doc


def _wordpiece_word_pieces(
    df: DataFrame,
    top_pieces: int,
    max_piece_len: int,
    text_col: str,
) -> DataFrame:
    """The (word, n_pieces) DISTINCT-word segmentation table behind
    ``wordpiece_segment`` / ``wordpiece_fertility`` — vocabulary
    derivation + the greedy longest-match loop, verbatim from
    wordpiece_segment's original body (see its docstring for the
    algorithm and scale notes)."""
    from walex_spark.extensions.text import _tokens

    toks = _tokens(F.col(text_col))
    words = (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # substrings of length lo..hi over distinct words, weighted by
    # word frequency; single chars enter unconditionally (coverage).
    # (i, L) pairs are generated over constant-bounded sequences and
    # FILTERED to i + L - 1 <= len(w): F.sequence(1, n) with n < 1
    # produces a DESCENDING array, not an empty one, so bound
    # arithmetic inside sequence() silently fabricates pieces.
    # words feeds THREE actions (the top-piece collect, the char
    # collect and the caller's final query) — the checkpoint pays
    # exactly like the twins' multi-consumer rule (across actions;
    # within one action ReuseExchange already dedups): the corpus
    # explode + word aggregate runs once, not three times.
    words = words.localCheckpoint(eager=False)

    def _subs(lo: int, hi: int):
        pairs = F.flatten(
            F.transform(
                F.sequence(F.lit(1), F.length("w")),
                lambda i: F.transform(
                    F.sequence(F.lit(lo), F.lit(hi)),
                    lambda L: F.struct(i.alias("i"), L.alias("L")),
                ),
            )
        )
        ok = F.filter(
            pairs, lambda s: s["i"] + s["L"] - 1 <= F.length("w")
        )
        return words.select(
            "w",
            "c",
            F.explode(
                F.transform(
                    ok, lambda s: F.expr("w").substr(s["i"], s["L"])
                )
            ).alias("p"),
        )

    # one action for the whole vocabulary: the top-piece subtree and
    # the char subtree union into a single collect (both are
    # metadata-sized; the set() dedups client-side). Replaces two
    # sequential collects — one fewer job barrier per call.
    top_sel = (
        _subs(2, max_piece_len)
        .groupBy("p")
        .agg(F.sum("c").alias("wt"))
        .orderBy(F.col("wt").desc(), F.col("p").asc())
        .limit(top_pieces)
        .select("p")
    )
    chars_sel = _subs(1, 1).select("p").distinct()
    vocab = sorted(
        {r.p for r in top_sel.unionByName(chars_sel).collect()}
    )  # metadata-sized constant
    vlit = F.array(*[F.lit(p) for p in vocab])

    # Greedy longest-match loop as ONE interpreted fold per word
    # (F.aggregate over sequence(1, len(w))), replacing max-word-length
    # stacked Project rounds of a 6-way array_contains expression each:
    # that stack fused into a single WholeStageCodegen whose generated
    # method grows with the corpus' longest word — a janino compile of
    # single-threaded seconds that dwarfed the actual data work at
    # bench scale (and an extra max(length(w)) action to size the
    # loop). Each fold step consumes >= 1 char (single-char coverage
    # guarantees a match), so len(w) steps always suffice; steps after
    # exhaustion are no-ops — identical semantics, plan-size now
    # corpus-independent, and the max-length action is gone.
    def _step(acc: Column, _i: Column) -> Column:
        rest = acc["rest"]
        best = None
        for L in range(max_piece_len, 0, -1):
            hit = F.when(
                F.array_contains(vlit, rest.substr(1, L)), F.lit(L)
            ).otherwise(F.lit(0))
            best = hit if best is None else F.greatest(best, hit)
        return F.when(rest == "", acc).otherwise(
            F.struct(
                rest.substr(best + F.lit(1), F.lit(10_000)).alias("rest"),
                (acc["n"] + F.lit(1)).alias("n"),
            )
        )

    seg = F.aggregate(
        F.sequence(F.lit(1), F.length("w")),
        F.struct(F.col("w").alias("rest"), F.lit(0).alias("n")),
        _step,
    )
    return words.select("w", seg["n"].alias("n_pieces"))


def wordpiece_fertility(
    df: DataFrame,
    group_cols: tuple[str, ...] = ("source", "lang"),
    top_pieces: int = 16,
    max_piece_len: int = 6,
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer fertility / compression eval per corpus slice — the
    fairness audit run before committing to a tokenizer: fertility
    (pieces per word) and compression (word chars per piece) per
    (source, lang) slice expose languages or domains the piece vocab
    under-serves (high fertility = more sequence positions spent per
    word = that slice trains and infers slower; the standard
    multilingual-tokenizer eval, cf. the fertility metric in
    mBERT/XLM-R analyses).

    Same segmentation table as ``wordpiece_segment`` (one greedy
    zero-shuffle loop over DISTINCT words); occurrences join it on
    the word key and aggregate per slice — slice-sized output.
    All-integer sums; two IEEE divisions at the end.

    Returns (*group_cols, n_words, n_pieces, n_word_chars,
    pieces_per_word, chars_per_piece) ordered by group_cols.
    """
    from walex_spark.extensions.text import _tokens

    pieces = _wordpiece_word_pieces(df, top_pieces, max_piece_len, text_col)
    occ = df.select(
        *[F.col(c) for c in group_cols],
        F.explode(_tokens(F.col(text_col))).alias("w"),
    )
    return (
        occ.join(pieces, "w")
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast(T.LongType()).alias("n_words"),
            F.sum("n_pieces").cast(T.LongType()).alias("n_pieces"),
            F.sum(F.length("w")).cast(T.LongType()).alias("n_word_chars"),
        )
        .select(
            *group_cols,
            "n_words",
            "n_pieces",
            "n_word_chars",
            (
                F.col("n_pieces").cast(T.DoubleType())
                / F.col("n_words").cast(T.DoubleType())
            ).alias("pieces_per_word"),
            (
                F.col("n_word_chars").cast(T.DoubleType())
                / F.col("n_pieces").cast(T.DoubleType())
            ).alias("chars_per_piece"),
        )
        .orderBy(*group_cols)
    )


def token_id_arrays(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize the corpus as integer token-id sequences — the
    final tokenize step of a training-data pipeline: vocabulary ids
    assigned by frequency rank (count desc, token asc — the
    conventional "id 1 = most frequent" layout), each document
    re-emitted as its id array in token order.

    Returns (id_col, n_tokens, token_ids: array<bigint>).

    Scale shape: the vocab rank comes from operators/ordering.py::
    global_sorted_index over the VOCAB (one range sort of vocab-sized
    rows — never a single-task global window); the corpus joins the
    ranked vocab on the token key (vocab is zipf-headed: AQE splits
    the hot-token skew) and re-assembles per doc with ONE
    groupBy(id) collect_list — the same exchange the tf aggregate
    already pays, carrying (pos, int) pairs instead of strings.
    """
    from walex_spark.extensions.text import _tokens
    from walex_spark.operators.ordering import global_sorted_index

    toks = df.select(
        F.col(id_col),
        F.posexplode(_tokens(F.col(text_col))).alias("pos", "tok"),
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    ranked = global_sorted_index(
        vocab, [(-F.col("cnt")), F.col("tok")], "tid"
    ).select("tok", F.col("tid").cast(T.LongType()).alias("tid"))
    return (
        toks.join(ranked, "tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast(T.LongType()).alias("n_tokens"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tid"))),
                lambda st: st["tid"],
            ).alias("token_ids"),
        )
    )
