"""Legacy ConvSBS runner end-to-end on synthetic data (CPU): pipeline wiring,
window-std multiplier, layer rescaling, warmup, checkpointing."""

import os

import pytest

from dctn_tpu.cli.legacy_runner import run


def test_legacy_runner_end_to_end(tmp_path):
    params, best_acc = run(
        ds_path="synthetic",
        models_dir=str(tmp_path),
        num_sbs_layers=2,
        bond_dim_size=2,
        initialization="khrulkov-normal",
        learning_rate=3e-3,
        optimizer_type="rmsprop",
        batch_size=32,
        epochs=3,
        warmup_num_epochs=1,
        warmup_initial_multiplier=1e-2,
        make_input_window_std_one=True,
        scale_layers_using_batch=64,
        synthetic_sizes=(128, 64),
        seed=0,
    )
    files = os.listdir(str(tmp_path))
    assert any(f.startswith("dctn_epoch=") and f.endswith(".npz") for f in files)
    assert 0.0 <= best_acc <= 1.0


def test_legacy_runner_pixel_shuffle(tmp_path):
    params, best_acc = run(
        ds_path="synthetic",
        models_dir=str(tmp_path),
        num_sbs_layers=2,
        bond_dim_size=2,
        initialization="dumb-normal",
        initialization_std=0.5,
        learning_rate=1e-3,
        optimizer_type="sgd",
        momentum=0.9,
        weight_decay=1e-5,
        batch_size=32,
        epochs=2,
        warmup_num_epochs=1,
        shuffle_pixels=True,
        input_multiplier=1.2,
        synthetic_sizes=(64, 32),
        seed=1,
    )
    assert 0.0 <= best_acc <= 1.0
