from .dedup import (  # noqa: F401
    cluster_pairs,
    connected_components,
    connected_components_two_phase,
    decontaminate,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    release_all_caches,
    release_caches,
    simhash16,
    with_shingles,
)
from .relational import (  # noqa: F401
    asof_join,
    asof_join_pandas,
    deterministic_shuffle,
    topk_per_group,
    write_bucketed,
)
from .similarity import (  # noqa: F401
    cosine_sim,
    cosine_topk,
    dequantize_embeddings,
    embedding_near_dup_pairs,
    label_centroids,
    quantize_embeddings,
    semantic_dedup,
)
from .text import (  # noqa: F401
    chunk_documents,
    doc_fingerprint,
    lang_id,
    pack_sequences,
    repetition_metrics,
    text_quality,
    tfidf_top_terms,
    tokens,
    vocabulary,
)
