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
from jodie_spark.operators.chunking import chunk_documents
from jodie_spark.operators.contamination import contamination_check, decontaminate
from jodie_spark.operators.sampling import (
    deterministic_sample,
    stratified_sample,
)
from jodie_spark.operators.scd import type2_generic_upsert, type2_upsert
from jodie_spark.operators.similarity import (
    ann_topk,
    brute_force_topk,
    cosine_similarity_join,
    with_ann_signatures,
)
from jodie_spark.operators.text_dedup import (
    connected_component_reps,
    embedding_dedup,
    exact_dedup,
    minhash_candidate_pairs,
    minhash_dedup,
    ngram_jaccard_pairs,
    simhash,
    simhash_dedup,
)

__all__ = [
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
    "brute_force_topk",
    "cosine_similarity_join",
    "with_ann_signatures",
    "embedding_dedup",
    "exact_dedup",
    "minhash_candidate_pairs",
    "minhash_dedup",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_dedup",
]
