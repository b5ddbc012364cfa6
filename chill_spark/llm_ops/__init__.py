from .dedup import (
    dedup_exact,
    dedup_minhash,
    embedding_near_dups,
    embedding_near_dups_banded,
    exact_dup_groups,
    jaccard_pairs,
    minhash_candidates,
    minhash_signature,
    simhash,
    simhash_near_dups,
)
from .incremental_dedup import (
    compact_sketch_store,
    incremental_minhash_dups,
    read_sketch_store,
    store_bucket_partitions,
    write_sketch_store,
)
from .incremental_embedding import (
    compact_embedding_store,
    incremental_embedding_dups,
    read_embedding_store,
    write_embedding_store,
)
from .attribution import (
    attribution_report,
    attribution_update,
    write_attribution_store,
)
from .chunking import (
    chunk_documents,
    distributed_running_offset,
    pack_sequences,
    pack_split_sequences,
)
from .components import component_survivors, connected_components
from .sampling import assign_split, hash_bucket, stratified_sample
from .selection import dsir_logweights, dsir_select
from .semantic import semantic_dedup
from .similarity import brute_force_topk, build_ivf, ivf_topk, topk_join
from .text import (
    bpe_ish_token_count,
    doc_fingerprint,
    frequent_ngrams,
    lang_id,
    quality_score,
    whitespace_token_count,
)

__all__ = [
    "dedup_exact", "dedup_minhash", "embedding_near_dups",
    "embedding_near_dups_banded",
    "exact_dup_groups", "jaccard_pairs", "minhash_candidates",
    "minhash_signature", "simhash", "simhash_near_dups",
    "compact_sketch_store", "incremental_minhash_dups",
    "read_sketch_store", "store_bucket_partitions",
    "write_sketch_store",
    "compact_embedding_store",
    "incremental_embedding_dups", "read_embedding_store",
    "write_embedding_store",
    "brute_force_topk", "build_ivf", "ivf_topk", "topk_join",
    "bpe_ish_token_count", "doc_fingerprint", "frequent_ngrams",
    "lang_id", "quality_score", "whitespace_token_count",
    "dsir_logweights", "dsir_select", "semantic_dedup",
    "assign_split", "hash_bucket", "stratified_sample",
    "chunk_documents", "pack_sequences", "pack_split_sequences",
    "distributed_running_offset", "write_attribution_store",
    "attribution_update", "attribution_report",
    "component_survivors", "connected_components",
]
