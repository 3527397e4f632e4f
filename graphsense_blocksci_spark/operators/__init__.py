from graphsense_blocksci_spark.operators.windows import (
    latest_per_group,
    dedup_last_write_wins,
    skyline_2d,
    top_k,
    high_water_mark_filter,
)
from graphsense_blocksci_spark.operators.asof import asof_join
from graphsense_blocksci_spark.operators.linkage import (
    explode_inputs,
    explode_outputs,
    link_inputs_to_outputs,
)
from graphsense_blocksci_spark.operators.text_dedup import (
    exact_dedup,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash,
    simhash_hamming_join,
    ngram_jaccard_pairs,
    substring_dedup,
)
from graphsense_blocksci_spark.operators.skew import salted_agg, salted_join
from graphsense_blocksci_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_gemm,
    cosine_topk_ivf,
    cosine_topk_ivfpq,
    cosine_topk_lsh,
    embedding_neardup,
    embedding_neardup_gemm,
)
from graphsense_blocksci_spark.operators.text_analysis import (
    bpe_encode,
    bpe_token_count,
    text_stats,
    quality_classifier,
    quality_score,
    language_id,
    doc_fingerprint,
)
from graphsense_blocksci_spark.operators.retrieval import bm25_topk, rank_fusion_borda
from graphsense_blocksci_spark.operators.chunking import chunk_documents
from graphsense_blocksci_spark.operators.cooccurrence import pmi_pairs
from graphsense_blocksci_spark.operators.redaction import redact_pii
from graphsense_blocksci_spark.operators.clustering import (
    kmeans_assign,
    kmeans_lloyd,
    seed_centroids,
    semdedup,
)
from graphsense_blocksci_spark.operators.batching import plan_batches
from graphsense_blocksci_spark.operators.sampling import (
    group_capped_sample,
    hash_sample,
    systematic_sample,
    temperature_sample,
    train_test_split,
)
from graphsense_blocksci_spark.operators.intervals import (
    interval_overlap_join,
    sweep_concurrency,
)
from graphsense_blocksci_spark.operators.entity_resolution import record_linkage
from graphsense_blocksci_spark.operators.diff import scd2_intervals, snapshot_diff
from graphsense_blocksci_spark.operators.tokenizer import bpe_train
from graphsense_blocksci_spark.operators.multimodal import (
    attach_payload,
    audio_frame_features,
    decode_audio,
    decode_image,
    extract_features,
    frame_sample,
    image_dhash,
    resize_image,
    resize_netpbm,
)
from graphsense_blocksci_spark.operators.sketches import (
    bloom_decontaminate,
    kmv_estimate,
    kmv_hashes,
    kmv_sketch,
    kmv_trim,
    hdr_bucket,
    hdr_bucket_low,
    hdr_histogram,
    hdr_quantiles,
    heavy_hitters,
)
from graphsense_blocksci_spark.operators.attribution import (
    attribute_conversions,
)
from graphsense_blocksci_spark.operators.evaluation import (
    distribution_drift,
    equiwidth_bins,
    roc_auc,
    zscore_normalize,
)
from graphsense_blocksci_spark.operators.sampling import (
    kfold_assign,
    weighted_reservoir,
)
from graphsense_blocksci_spark.operators.setsim import (
    jaccard_join,
    tf_cosine_join,
)
from graphsense_blocksci_spark.operators.graph import (
    bfs_reachability,
    connected_components,
    incremental_components,
    kcore,
    label_propagation,
    louvain,
    modularity,
    multi_source_bfs,
    pagerank,
    random_walks,
    shortest_paths,
    triangle_count,
    two_hop_counts,
)

__all__ = [
    "exact_dedup",
    "attribute_conversions",
    "roc_auc",
    "distribution_drift",
    "equiwidth_bins",
    "zscore_normalize",
    "weighted_reservoir",
    "kfold_assign",
    "jaccard_join",
    "tf_cosine_join",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash",
    "simhash_hamming_join",
    "ngram_jaccard_pairs",
    "substring_dedup",
    "bm25_topk",
    "rank_fusion_borda",
    "chunk_documents",
    "pmi_pairs",
    "redact_pii",
    "kmeans_assign",
    "kmeans_lloyd",
    "seed_centroids",
    "semdedup",
    "group_capped_sample",
    "plan_batches",
    "hash_sample",
    "systematic_sample",
    "temperature_sample",
    "train_test_split",
    "interval_overlap_join",
    "sweep_concurrency",
    "record_linkage",
    "bpe_train",
    "scd2_intervals",
    "snapshot_diff",
    "cosine_topk_bruteforce",
    "cosine_topk_gemm",
    "cosine_topk_ivf",
    "cosine_topk_ivfpq",
    "cosine_topk_lsh",
    "embedding_neardup",
    "embedding_neardup_gemm",
    "bpe_encode",
    "bpe_token_count",
    "text_stats",
    "quality_classifier",
    "quality_score",
    "language_id",
    "doc_fingerprint",
    "attach_payload",
    "audio_frame_features",
    "decode_audio",
    "decode_image",
    "extract_features",
    "frame_sample",
    "image_dhash",
    "resize_image",
    "resize_netpbm",
    "heavy_hitters",
    "bloom_decontaminate",
    "hdr_bucket",
    "hdr_bucket_low",
    "hdr_histogram",
    "hdr_quantiles",
    "kmv_estimate",
    "kmv_hashes",
    "kmv_sketch",
    "kmv_trim",
    "bfs_reachability",
    "connected_components",
    "incremental_components",
    "kcore",
    "label_propagation",
    "louvain",
    "modularity",
    "multi_source_bfs",
    "pagerank",
    "random_walks",
    "shortest_paths",
    "triangle_count",
    "two_hop_counts",
    "salted_agg",
    "salted_join",
    "latest_per_group",
    "dedup_last_write_wins",
    "skyline_2d",
    "top_k",
    "high_water_mark_filter",
    "asof_join",
    "explode_inputs",
    "explode_outputs",
    "link_inputs_to_outputs",
]
