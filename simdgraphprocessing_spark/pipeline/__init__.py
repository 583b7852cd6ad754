from simdgraphprocessing_spark.pipeline.text import (  # noqa: F401
    tokens_col,
    token_counts,
    quality_scores,
    lang_id,
    doc_fingerprints,
)
from simdgraphprocessing_spark.pipeline.dedup import (  # noqa: F401
    exact_dedup,
    ngram_jaccard_pairs,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash_codes,
    simhash_near_pairs,
)
from simdgraphprocessing_spark.pipeline.multimodal import (  # noqa: F401
    media_from_documents,
    extract_features,
    extract_feature_sums,
    frame_sample,
    verify_media_sha,
)
from simdgraphprocessing_spark.pipeline.similarity import (  # noqa: F401
    quantize_embeddings,
    brute_force_topk,
    topk_matmul,
    lsh_buckets,
    lsh_topk,
    embedding_cosine_dups,
)
