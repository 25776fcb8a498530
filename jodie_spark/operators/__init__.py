"""User-facing operators (the reference library's public API surface)."""

from jodie_spark.operators.dedup import (
    append_without_duplicates,
    kill_duplicate_records,
    remove_duplicate_records,
)
from jodie_spark.operators.helpers import (
    copy_table,
    delta_file_sizes,
    find_composite_key_candidate,
    get_storage_location,
    humanize_bytes,
    is_composite_key_candidate,
    latest_version,
    show_delta_file_sizes,
    validate_append,
    with_md5_columns,
)
from jodie_spark.operators.bloom import (
    BloomFilter,
    bloom_filter_new,
    build_bloom,
    optimal_geometry,
)
from jodie_spark.operators.chunking import chunk_documents
from jodie_spark.operators.hamming_index import (
    append_to_hamming_index,
    build_hamming_index,
    hamming_index_filter_new,
    query_hamming_index,
)
from jodie_spark.operators.minhash_index import (
    append_to_minhash_index,
    build_minhash_index,
    minhash_index_filter_new,
    query_minhash_index,
)
from jodie_spark.operators.contamination import contamination_check, decontaminate
from jodie_spark.operators.sampling import (
    deterministic_sample,
    stratified_sample,
)
from jodie_spark.operators.fulltext import (
    bm25_topk,
    build_inverted_index,
    keyword_search,
    term_postings,
)
from jodie_spark.operators.scd import type2_generic_upsert, type2_upsert
from jodie_spark.operators.tokenize import (
    build_vocab,
    decode_token_ids,
    encode_documents,
)
from jodie_spark.operators.similarity import (
    ann_topk,
    brute_force_topk,
    cosine_similarity_join,
    knn_graph,
    with_ann_signatures,
)
from jodie_spark.operators.text_dedup import (
    connected_component_reps,
    dedup_against,
    embedding_dedup,
    exact_dedup,
    minhash_candidate_pairs,
    minhash_dedup,
    ngram_jaccard_pairs,
    simhash,
    simhash_dedup,
)
from jodie_spark.operators.ann_index import (
    append_to_ann_index,
    build_ann_index,
    load_ann_model,
    query_ann_index,
)
from jodie_spark.operators.helpers import shallow_clone
from jodie_spark.operators.ivf import ivf_topk, train_centroids, with_ivf_assignments
from jodie_spark.operators.line_dedup import dedup_lines, duplicate_line_stats
from jodie_spark.operators.media_dedup import (
    audio_dedup,
    image_dedup,
    video_dedup,
    with_audio_hash,
    with_image_dhash,
    with_video_frame_hashes,
)
from jodie_spark.operators.substring_dedup import (
    duplicate_window_stats,
    remove_duplicate_substrings,
)
from jodie_spark.operators.packing import (
    pack_sequences,
    sequence_stats,
    with_global_offsets,
)
from jodie_spark.operators.perplexity import (
    perplexity_filter,
    perplexity_score,
    unigram_model,
)
from jodie_spark.operators.pq import pq_topk, train_pq, with_pq_codes
from jodie_spark.operators.profile import profile_table
from jodie_spark.operators.sampling import epoch_shuffle, mixture_weights
from jodie_spark.operators.semantic_dedup import semantic_candidate_pairs, semantic_dedup

__all__ = [
    "BloomFilter",
    "append_to_ann_index",
    "append_to_hamming_index",
    "append_to_minhash_index",
    "build_hamming_index",
    "hamming_index_filter_new",
    "query_hamming_index",
    "build_minhash_index",
    "minhash_index_filter_new",
    "query_minhash_index",
    "bloom_filter_new",
    "build_bloom",
    "optimal_geometry",
    "append_without_duplicates",
    "chunk_documents",
    "connected_component_reps",
    "contamination_check",
    "decontaminate",
    "deterministic_sample",
    "stratified_sample",
    "kill_duplicate_records",
    "remove_duplicate_records",
    "copy_table",
    "delta_file_sizes",
    "find_composite_key_candidate",
    "get_storage_location",
    "humanize_bytes",
    "is_composite_key_candidate",
    "latest_version",
    "show_delta_file_sizes",
    "validate_append",
    "with_md5_columns",
    "type2_generic_upsert",
    "type2_upsert",
    "ann_topk",
    "bm25_topk",
    "build_inverted_index",
    "build_vocab",
    "decode_token_ids",
    "encode_documents",
    "keyword_search",
    "term_postings",
    "brute_force_topk",
    "cosine_similarity_join",
    "knn_graph",
    "with_ann_signatures",
    "embedding_dedup",
    "exact_dedup",
    "minhash_candidate_pairs",
    "minhash_dedup",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_dedup",
    "dedup_against",
    "build_ann_index",
    "load_ann_model",
    "query_ann_index",
    "shallow_clone",
    "ivf_topk",
    "train_centroids",
    "with_ivf_assignments",
    "dedup_lines",
    "duplicate_line_stats",
    "duplicate_window_stats",
    "audio_dedup",
    "image_dedup",
    "remove_duplicate_substrings",
    "video_dedup",
    "with_audio_hash",
    "with_image_dhash",
    "with_video_frame_hashes",
    "pack_sequences",
    "sequence_stats",
    "with_global_offsets",
    "perplexity_filter",
    "perplexity_score",
    "unigram_model",
    "pq_topk",
    "train_pq",
    "with_pq_codes",
    "profile_table",
    "epoch_shuffle",
    "mixture_weights",
    "semantic_candidate_pairs",
    "semantic_dedup",
]
