"""Training-data pipeline operators: dedup, similarity, text stats, media."""

from whoosh_spark.pipeline.dedup import (  # noqa: F401
    connected_components,
    dedup_sweep,
    duplicate_substring_spans,
    merge_cluster_labels,
    remove_duplicate_substrings,
    exact_duplicates,
    minhash_dedup_against,
    minhash_dedup_pairs,
    minhash_lsh_candidates,
    minhash_signatures,
    normalized_duplicates,
    pairs_jaccard,
    paragraph_dedup,
    select_canonical,
    shingle_jaccard_pairs,
    simhash,
    simhash_pairs,
)
from whoosh_spark.pipeline.classify import (  # noqa: F401
    nb_filter,
    nb_score,
    nb_train,
)
from whoosh_spark.pipeline.multimodal import (  # noqa: F401
    decode_image,
    fake_decode_meta,
    sample_frames,
    synth_assets,
)
from whoosh_spark.pipeline.similarity import (  # noqa: F401
    ann_topk,
    cosine_neardup_pairs,
    cosine_topk,
    group_centroids,
    hyperplane_buckets,
    cluster_neardup_pairs,
    ivf_centroids,
    ivf_pq_topk,
    ivf_topk,
)
from whoosh_spark.pipeline.textstats import (  # noqa: F401
    bigram_logprob,
    c4_line_filter,
    collocations,
    contamination_pairs,
    dedup_lines,
    dsir_gumbel_topk,
    dsir_logweights,
    exact_ngram_contamination,
    fingerprint_overlap_pairs,
    langid,
    line_shape_stats,
    mixture_report,
    ngram_novelty,
    quality_scores,
    redact_pii,
    repetition_stats,
    token_counts,
    trending_terms,
    unigram_logprob,
    winnow_fingerprints,
)
from whoosh_spark.pipeline.bpe import (  # noqa: F401
    bpe_encode,
    bpe_train,
    bpe_vocab,
    bpe_word_counts,
)
from whoosh_spark.pipeline.rollup import hypertable_rollup  # noqa: F401
from whoosh_spark.pipeline.sketch import (  # noqa: F401
    kmv_distinct,
    kmv_estimate_from,
    kmv_merge,
    kmv_set_ops,
    kmv_sketch,
)
from whoosh_spark.pipeline.temporal import asof_join, lookback_join  # noqa: F401
from whoosh_spark.pipeline.sampling import (  # noqa: F401
    hash_sample,
    proportional_sample,
    shard_shuffle,
    stratified_sample,
    temperature_mixture,
    token_budget_sample,
    weighted_hash_sample,
)
from whoosh_spark.pipeline.curate import (  # noqa: F401
    curation_labels,
)
from whoosh_spark.pipeline.packing import (  # noqa: F401
    pack_bins_ffd,
    pack_sequences,
)
from whoosh_spark.pipeline.conversations import (  # noqa: F401
    assemble_context,
    assemble_conversations,
    conversation_qa,
    conversation_stats,
    expand_context,
    loss_mask_spans,
    sliding_turn_windows,
    truncate_conversations,
)
