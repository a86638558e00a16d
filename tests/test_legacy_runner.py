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
    # provenance parity with mnist.py: run_info + log.log written
    assert "run_info.txt" in files and "log.log" in files
    # observability parity with mnist.py:510-570: weights/grads/LR/
    # intermediate-output/TT-stat tags land in metrics.jsonl
    import json

    tags = {
        json.loads(l)["tag"]
        for l in open(os.path.join(str(tmp_path), "metrics.jsonl"))
    }
    assert {"val/acc", "val/mean_ce", "train/last_batch_loss", "lr"} <= tags
    assert any(t.startswith("weights/") for t in tags)
    assert any(t.startswith("grads/") for t in tags)
    assert any(t.startswith("intermediate_dumb_mean/layer0.string0") for t in tags)
    assert "intermediate_dumb_std/logits" in tags
    assert "layer0.string0/tt_mean" in tags and "layer1.string0/tt_std" in tags


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
