from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# Keep test shuffles narrow; AQE coalesces anyway.
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    from graphsense_blocksci_spark.session import get_spark

    s = get_spark("gbs-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory) -> str:
    from graphsense_blocksci_spark import fixtures

    return str(fixtures.ensure_fixtures())


# ---------------------------------------------------------------------------
# Fast/slow tiers (round 14; VERDICT r13 item 5): the full suite takes
# 27-58 min, which overruns the driver's pytest budget. The tests below
# (everything measured >= 6 s in a full --durations=0 run; dominated by
# the all-oracle type sweep and the streaming end-to-end flows) carry a
# `slow` marker, and pytest.ini excludes them BY DEFAULT so the
# driver-verifiable tier finishes in well under ten minutes. Every
# operator family keeps fast coverage in the default tier; the full
# tier (`pytest -m ""` or `-m slow`) remains the round-close battery.
_SLOW_TESTS = {
    "test_oracle_types.py::test_every_oracle_type_matches_spark_schema",  # 366.0s
    "test_streaming.py::test_stateful_sessionize_idle_timeout_flush",  # 244.4s
    "test_round13_opt.py::test_static_pin_profile_matches_default_across_operators",  # 77.8s
    "test_round6_props.py::test_scc_random_digraphs_vs_tarjan",  # 17.4s
    "test_round12_qd88_degenerate.py::test_qd88_degenerate_rows_match_oracle",  # 17.1s
    "test_streaming.py::test_stream_dedup_within_watermark",  # 15.2s
    "test_streaming.py::test_stream_stream_left_outer_emits_on_timeout",  # 12.4s
    "test_setsim.py::test_louvain_two_cliques_optimal_and_deterministic",  # 12.1s
    "test_streaming.py::test_streaming_knn_matches_batch_lsh",  # 11.8s
    "test_properties.py::test_label_propagation_random_graphs",  # 11.5s
    "test_properties.py::test_sequence_packing_matches_python_reference",  # 11.3s
    "test_evaluation_ops.py::test_distribution_drift_identical_and_disjoint",  # 11.2s
    "test_streaming.py::test_curate_stream_dedups_and_filters",  # 11.0s
    "test_properties.py::test_asof_directions_match_pandas",  # 9.7s
    "test_properties.py::test_edit_distance_join_never_misses_a_pair",  # 9.6s
    "test_evaluation_ops.py::test_roc_auc_perfect_and_random",  # 9.2s
    "test_clustering.py::test_lloyd_numpy_parity",  # 9.2s
    "test_properties.py::test_jaccard_join_never_misses_a_pair",  # 9.2s
    "test_properties.py::test_asof_join_matches_pandas_merge_asof",  # 8.9s
    "test_llm_ops.py::test_knn_lsh_gemm_matches_fold_variant",  # 8.6s
    "test_round13_opt.py::test_personalized_pagerank_prepartitioned_path_matches_default",  # 8.2s
    "test_round4_ops.py::test_shortest_paths_matches_reference",  # 7.9s
    "test_round6_ops.py::test_index_daemon_batch_replay_idempotent",  # 7.8s
    "test_properties.py::test_exact_dedup_idempotent_and_min_keeper",  # 7.8s
    "test_round12_hygiene.py::test_ivfpq_fullprobe_identity_on_testdata",  # 7.7s
    "test_streaming.py::test_stream_stream_join_matches_batch",  # 7.6s
    "test_streaming.py::test_streaming_lsh_pairs_union_equals_batch",  # 7.4s
    "test_setsim.py::test_betweenness_pair_counting_matches_brandes",  # 7.4s
    "test_round7_props.py::test_log2_hist_stream_multibatch",  # 7.4s
    "test_round6_ops.py::test_scc_direction_sensitivity",  # 7.3s
    "test_streaming.py::test_stateful_sessionize_across_batches",  # 7.2s
    "test_round13_opt.py::test_pagerank_prepartitioned_path_matches_default",  # 7.2s
    "test_properties.py::test_bfs_reachability_random_graphs",  # 7.2s
    "test_round11_wave2.py::test_qd97_equals_batch_reuse_curve",  # 7.1s
    "test_properties.py::test_simhash_pigeonhole_never_misses_a_pair",  # 6.9s
    "test_round4_ops.py::test_streaming_cms_accumulates_across_batches",  # 6.9s
    "test_round7_props.py::test_bitmap_or_stream_multibatch",  # 6.9s
    "test_properties.py::test_connected_components_random_graphs",  # 6.8s
    "test_round8_props.py::test_kmeans_quantized_matches_float_on_separated_blobs",  # 6.7s
    "test_setsim.py::test_louvain_recovers_planted_cliques",  # 6.7s
    "test_streaming.py::test_asof_join_works_stream_static",  # 6.7s
    "test_llm_ops.py::test_knn_lsh_multiprobe_recall_not_worse",  # 6.6s
    "test_audio_decode.py::test_decode_audio_dataframe",  # 6.5s
    "test_operators.py::TestIngestDaemon::test_daemon_catches_up_and_is_idempotent",  # 6.4s
    "test_round4_ops.py::test_multi_source_bfs_matches_per_seed_bfs",  # 6.3s
    "test_streaming.py::test_sessionize_on_rocksdb_state_store",  # 6.3s
    "test_round4_ops.py::test_streaming_hll_accumulates_across_batches",  # 6.2s
    "test_round10_ops.py::test_streaming_dedup_rate_equals_batch_monitor",  # 6.1s
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        key = item.nodeid.split("/")[-1]  # "<file>.py::[Class::]<name>"
        if key in _SLOW_TESTS or key.split("[")[0] in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
