from .asof import asof_join, asof_join_tolerance
from .dedup import (
    content_hash,
    duplicate_spans,
    duplicated_paragraph_removal,
    exact_dedup,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    semantic_dedup_decisions,
    semantic_dedup_pairs,
    simhash_pairs,
)
from .contamination import (
    boilerplate_grams,
    boilerplate_profile,
    ngram_contamination,
)
from .overlay import apply_overlay, build_overlay_for_updates, compact
from .resample import cumulative_agg, locf_fill, resample, rolling_agg, time_spine
from .layout import (
    file_stats,
    optimize_layout,
    overlap_fraction,
    zorder_layout,
)
from .chunking import chunk_documents
from .downsample import lttb, minmax_decimate
from .maintenance import (
    compact_partitions,
    drop_partitions_older_than,
    sweep_residue,
)
from .rollup import ContinuousRollup, RollupScheduler
from .profile import profile_columns, repetition_profile
from .clustering import assign_nearest, label_centroids
from .packing import assign_packs, pack_stats
from .sampling import (
    deterministic_sample,
    dsir_select,
    dsir_weights,
    hash_split,
    stratified_sample,
    temperature_sample,
    weighted_sample,
)
from .resample import counter_rate, predict_linear
from .similarity import IvfIndex, cosine_topk, lsh_cosine_topk
from .topk import topk, topk_per_group

__all__ = [
    "asof_join", "asof_join_tolerance", "content_hash", "exact_dedup",
    "minhash_dedup_pairs", "ngram_jaccard_pairs", "simhash_pairs",
    "duplicate_spans", "duplicated_paragraph_removal",
    "semantic_dedup_pairs", "semantic_dedup_decisions",
    "boilerplate_grams", "boilerplate_profile", "ngram_contamination",
    "apply_overlay", "build_overlay_for_updates", "compact",
    "cumulative_agg", "locf_fill", "resample", "rolling_agg", "time_spine",
    "IvfIndex", "cosine_topk", "counter_rate", "lsh_cosine_topk",
    "predict_linear", "topk", "topk_per_group",
    "optimize_layout", "file_stats", "overlap_fraction", "zorder_layout",
    "ContinuousRollup",
    "RollupScheduler",
    "profile_columns", "repetition_profile",
    "assign_nearest", "label_centroids",
    "chunk_documents",
    "compact_partitions", "drop_partitions_older_than", "sweep_residue",
    "lttb", "minmax_decimate",
    "assign_packs", "pack_stats",
    "deterministic_sample", "dsir_select", "dsir_weights", "hash_split",
    "stratified_sample", "temperature_sample", "weighted_sample",
]
