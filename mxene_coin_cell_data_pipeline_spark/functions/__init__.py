from .text import (  # noqa: F401
    tokenize,
    token_stats,
    quality_score,
    language_id,
    fingerprint,
    repetition_metrics,
    redact_pii,
)
from .dedup import (  # noqa: F401
    exact_dedup,
    shingles,
    minhash_signatures,
    lsh_candidate_pairs,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from .similarity import cosine_topk, ivf_topk, embedding_near_dup_pairs  # noqa: F401
from .multimodal import binary_payload_meta, decode_images  # noqa: F401
