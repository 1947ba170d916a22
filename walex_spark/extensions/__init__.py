from walex_spark.extensions.dedup import (  # noqa: F401
    exact_dedup,
    minhash_signature,
    minhash_candidate_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from walex_spark.extensions.similarity import (  # noqa: F401
    cosine_similarity_col,
    brute_force_topk,
)
from walex_spark.extensions.text import (  # noqa: F401
    token_stats,
    quality_score,
    language_id,
    fingerprint,
)
