"""Test harness: force an 8-device virtual CPU mesh (multi-chip sharding tests
run without real TPU hardware) and enable float64 for densified oracles.

Must configure jax before any backend is initialized, hence module level.
"""

import os
import tempfile

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Hermetic autotune cache: runner tests default --autotune-cache on; a
# per-session empty file keeps them from reading (or polluting) the user's
# ~/.cache picks across test runs.
os.environ["DCTN_TPU_AUTOTUNE_CACHE"] = os.path.join(
    tempfile.mkdtemp(prefix="dctn_tpu_test_"), "autotune.json"
)

import jax

try:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # backend already initialized (e.g. re-entrant run); tests that need
    # 8 devices will skip themselves
jax.config.update("jax_enable_x64", True)

import pytest


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


# ---------------------------------------------------------------------------
# smoke tier (VERDICT r3 #10): one fast representative per subsystem, so a
# full-suite run (~35 min on this 1-core host) stops gating every iteration.
# Run with:  python -m pytest -m smoke -q        (~3 min)
# The list is curated here centrally instead of decorating 30 files.

_SMOKE = {
    "test_eps.py::test_eps_matches_per_window_oracle[2-2-2-3-2-2-2]",
    "test_eps.py::test_eps_gradient_parity",
    "test_eps_pallas.py::test_pallas_forward_matches_xla[1-2-2-3-4-4-2]",
    "test_eps_pallas.py::test_pallas_gradients_match_xla[1-2-2-3-4-4-2]",
    "test_fast_layout.py::test_fast_forward_matches_reference_layout",
    "test_model.py::test_forward_matches_composition",
    "test_model.py::test_dropout_semantics",
    "test_composition.py::test_two_layer_inner_product",
    "test_pos2d.py::test_bijection",
    "test_rank_one.py::test_hand_computed",
    "test_logmatmulexp.py::test_matches_oracle",
    "test_logmatmulexp_pallas.py::test_forward_matches_oracle[shape0]",
    "test_sbs.py::test_forward_matches_dense_eps",
    "test_sbs_pallas.py::test_sbs_pallas_forward_matches_xla[0]",
    "test_data.py::test_feature_map_values",
    "test_data.py::test_seed0_shuffle_matches_reference_recorded_indices",
    "test_train.py::test_score_matches_manual",
    "test_train.py::test_nan_stopper",
    "test_parallel.py::test_parallel_step_matches_single_device",
    "test_tensor_parallel.py::test_tp_train_step_matches_single_device[epswise-False]",
    "test_spatial_parallel.py::test_sp_train_step_matches_single_device[epswise]",
    "test_sp_tp.py::test_sp_tp_train_step_matches_single_device[epswise]",
    "test_quantized.py::test_q8_kernel_matches_oracle[1-2-2-3-4-4-2]",
    "test_quantized.py::test_q8train_forward_matches_serving_kernel",
    "test_autotune.py::test_candidate_splits_legal_and_ranked",
    "test_export.py::test_export_roundtrip_matches_forward",
    "test_serve.py::test_healthz_and_meta",
    "test_conv_sbs_model.py::test_forward_shapes",
    "test_reference_parity.py::test_eps_forward_parity[2-1-2-3-4]",
    "test_torch_interop.py::test_eps_plus_linear_roundtrip_strict_load",
    "test_preemption.py::test_handler_hook_saves_once_and_stops",
    "test_viz_and_sweep.py::test_config_to_argv",
    "test_viz_and_sweep.py::test_metrics_writer_jsonl",
    "test_fallbacks.py::test_sink_receives_events",
    "test_runner.py::test_parse_epses_specs",
    "test_runner.py::test_flag_validation_messages",
    "test_profiling.py::test_step_tracer_window",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        short = item.nodeid.split("/")[-1]
        if short in _SMOKE:
            item.add_marker(pytest.mark.smoke)
