from semantic_olap_spark.functions.text import (  # noqa: F401
    bm25_topk,
    doc_fingerprint,
    extract_entities,
    hash_embed,
    lang_id,
    ngram_counts,
    ngram_lm_score,
    quality_score,
    sentiment_score,
    text_profile,
    token_count,
    token_count_bpe,
    winnow_fingerprints,
)
from semantic_olap_spark.functions.dedup import (  # noqa: F401
    dedup_against,
    dedup_against_embeddings,
    dedup_against_minhash,
    dedup_clusters,
    dedup_exact,
    dedup_keep_best,
    duplicate_spans,
    duplicate_spans_against,
    jaccard_pairs,
    minhash_index,
    minhash_lsh_pairs,
    remove_duplicate_spans,
    remove_spans_against,
    simhash_pairs,
    span_index,
    winnow_overlap_pairs,
)
from semantic_olap_spark.functions.similarity import (  # noqa: F401
    cosine_pairs,
    cosine_topk,
    dequantize_embeddings,
    quantize_embeddings,
    quantize_index,
    quantized_topk,
    ivf_topk,
    lsh_topk,
)
from semantic_olap_spark.functions.multimodal import (  # noqa: F401
    attach_binary_metadata,
    audio_features,
    caption_media,
    image_features,
    sample_frames,
    sniff_format,
)
from semantic_olap_spark.functions.sampling import (  # noqa: F401
    hash_sample,
    leakage_safe_split,
    mix_corpus,
    quantile_filter,
    reservoir_sample,
    shuffle_rows,
    stratified_sample,
    train_test_split,
    uniform_hash,
    weighted_sample,
    weighted_sample_n,
)
from semantic_olap_spark.functions.packing import (  # noqa: F401
    assemble_docs,
    chunk_documents,
    pack_documents,
)
from semantic_olap_spark.functions.retrieval import (  # noqa: F401
    llm_rerank,
    rrf_fuse,
)
from semantic_olap_spark.functions.analytics import (  # noqa: F401
    cohort_retention,
    funnel,
)
from semantic_olap_spark.functions.cleaning import (  # noqa: F401
    cap_per_group,
    contamination_report,
    decontaminate,
    heuristic_filter,
    normalize_text,
    redact_pii,
    repetition_profile,
    take_token_budget,
)
from semantic_olap_spark.functions.profiling import (  # noqa: F401
    profile_columns,
)
from semantic_olap_spark.functions.sketches import (  # noqa: F401
    distinct_sketch,
    estimate_distinct,
    freq_sketch,
    merge_distinct_sketches,
    top_frequent,
)
from semantic_olap_spark.functions.timeseries import (  # noqa: F401
    detect_anomalies,
    ffill,
    resample,
    rolling_agg,
    sessionize,
)
from semantic_olap_spark.functions.quality import (  # noqa: F401
    k_anonymity_violations,
    quality_report,
    referential_violations,
    snapshot_diff,
    unique_violations,
)
from semantic_olap_spark.functions.stats import (  # noqa: F401
    corr_matrix,
    histogram,
)
from semantic_olap_spark.functions.incremental import (  # noqa: F401
    agg_state,
    finalize_agg,
    finalize_quantiles,
    merge_agg_states,
    merge_quantile_states,
    quantile_state,
)
from semantic_olap_spark.functions.graph import (  # noqa: F401
    pagerank,
)
from semantic_olap_spark.functions.cdc import (  # noqa: F401
    apply_cdc,
    scd2_history,
    temporal_join,
)
from semantic_olap_spark.functions.binning import (  # noqa: F401
    quantile_bucket,
    target_encode,
)
from semantic_olap_spark.functions.bpe import (  # noqa: F401
    bpe_encode,
    bpe_token_count,
    learn_bpe,
    word_counts,
)
