"""Data pipeline: feature maps, IDX parsing, ν scaling vs the rank-one oracle,
deterministic shuffles and batching (strategies: reference dataset regression
asserts + recorded shuffle indices)."""

import os
import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dctn_tpu.data import (
    apply_feature_map,
    phi_cos_sin_squared_1,
    calc_scaling_factor,
    load_dataset,
    Batcher,
)
from dctn_tpu.data import io as data_io
from dctn_tpu.data.pipeline import _seed0_shuffled_indices
from dctn_tpu.ops.windows import make_windows


def test_feature_map_values():
    x = np.array([[[0.0, 1.0], [0.5, 0.25]]], dtype=np.float32)
    q = apply_feature_map(x)
    assert q.shape == (1, 1, 2, 2, 2)
    np.testing.assert_allclose(q[0, 0, 0, 0], [0.0, 2.0], atol=1e-6)  # φ(0)
    np.testing.assert_allclose(q[0, 0, 0, 1], [2.0, 0.0], atol=1e-6)  # φ(1)
    np.testing.assert_allclose(q[0, 0, 1, 0], [1.0, 1.0], atol=1e-6)  # φ(0.5)
    # μ²+... the map satisfies φ₁+φ₂ = 2 exactly
    np.testing.assert_allclose(q.sum(-1), 2.0, atol=1e-6)


def test_seed0_shuffle_matches_reference_recorded_indices():
    idx = _seed0_shuffled_indices(50000)
    # recorded in reference dataset_loading.py:160
    assert idx[:10] == [25247, 49673, 27562, 2653, 16968, 33506, 31845, 26537, 19877, 31234]


def test_idx_roundtrip(tmp_path):
    images = np.arange(2 * 3 * 4, dtype=np.uint8).reshape(2, 3, 4)
    labels = np.array([7, 1], dtype=np.uint8)
    img_path = tmp_path / "train-images-idx3-ubyte"
    lbl_path = tmp_path / "train-labels-idx1-ubyte"
    with open(img_path, "wb") as f:
        f.write(struct.pack(">IIII", 2051, 2, 3, 4))
        f.write(images.tobytes())
    with open(lbl_path, "wb") as f:
        f.write(struct.pack(">II", 2049, 2))
        f.write(labels.tobytes())
    got_img, got_lbl = data_io.load_mnist_like(str(tmp_path), "MNIST", train=True)
    np.testing.assert_array_equal(got_img, images)
    np.testing.assert_array_equal(got_lbl, labels)


def test_calc_scaling_factor_vs_rank_one_oracle(rng):
    """ν computed by the host numpy path equals the value derived from the
    jax RankOneTensorsBatch statistics directly."""
    x = np.asarray(jax.random.uniform(rng, (1, 20, 6, 6, 2), jnp.float64)) * 1.5
    k = 3
    nu = calc_scaling_factor(x, k)
    w = make_windows(jnp.asarray(x), k)
    mu = float(w.mean_over_batch())
    var = float(w.var_over_batch(unbiased=True))
    expected = (mu**2 + var) ** (-1 / (2 * k**2))
    np.testing.assert_allclose(nu, expected, rtol=1e-10)
    # after scaling, windows have μ²+σ² == 1
    w2 = make_windows(jnp.asarray(x * nu), k)
    m2 = float(w2.mean_over_batch())
    v2 = float(w2.var_over_batch(unbiased=True))
    np.testing.assert_allclose(m2**2 + v2, 1.0, rtol=1e-9)


def test_synthetic_determinism_and_disjointness():
    a1, y1 = data_io.synthetic_mnist_like(16, seed=5)
    a2, y2 = data_io.synthetic_mnist_like(16, seed=5)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(y1, y2)
    b, yb = data_io.synthetic_mnist_like(16, seed=5, offset=16)
    assert not np.array_equal(a1, b)
    assert a1.min() >= 0.0 and a1.max() <= 1.0


def test_load_dataset_synthetic_autoscale():
    splits = load_dataset(
        "fashionmnist",
        "synthetic",
        autoscale_kernel_size=4,
        synthetic_sizes=(64, 32, 32),
    )
    assert splits.train.x.shape == (1, 64, 28, 28, 2)
    assert splits.val.x.shape[1] == 32
    assert splits.nu is not None and len(splits.nu) == 1
    # windows of the scaled train set have μ²+σ²≈1
    w = make_windows(jnp.asarray(splits.train.x, jnp.float64), 4)
    m = float(w.mean_over_batch())
    v = float(w.var_over_batch(unbiased=True))
    np.testing.assert_allclose(m**2 + v, 1.0, rtol=1e-5)


def test_phi_multiplier_replaces_factor_2():
    splits = load_dataset(
        "mnist", "synthetic", phi_multiplier=0.5, synthetic_sizes=(8, 4, 4)
    )
    # φ = (0.5·sin², 0.5·cos²) so coordinates sum to 0.5 everywhere
    np.testing.assert_allclose(splits.train.x.sum(-1), 0.5, atol=1e-6)


def test_colored_synthetic_pipeline():
    splits = load_dataset(
        "cifar10_rgb",
        "synthetic",
        center_and_normalize_each_channel=True,
        add_constant_channel=1.0,
        nu_per_channel=(1.1, 1.2, 1.3),
        synthetic_sizes=(32, 8, 8),
    )
    assert splits.train.x.shape == (1, 32, 32, 32, 4)  # 3 colors + constant
    assert splits.nu == (1.1, 1.2, 1.3, 1.0)
    # constant channel was 1.0, ν for it is 1.0
    np.testing.assert_allclose(splits.train.x[..., 3], 1.0, atol=1e-6)
    # normalized channels: train μ≈0 (before constant/ν) — check channel 0 μ
    ch0 = splits.train.x[..., 0] / 1.1
    assert abs(ch0.mean()) < 1e-4


def test_batcher():
    splits = load_dataset("mnist", "synthetic", synthetic_sizes=(20, 8, 8))
    b = Batcher(splits.train, batch_size=6, shuffle=True, drop_last=True, seed=3)
    batches = list(b)
    assert len(batches) == 3  # 20//6, last dropped
    x, y, idx = batches[0]
    assert x.shape == (1, 6, 28, 28, 2)
    assert y.shape == (6,) and idx.shape == (6,)
    # reshuffles across epochs deterministically given the seed
    order1 = [tuple(bt[2]) for bt in b]
    order2 = [tuple(bt[2]) for bt in b]
    assert order1 != order2
    b_fixed = Batcher(splits.val, batch_size=3, shuffle=False, drop_last=False)
    vb = list(b_fixed)
    assert len(vb) == 3 and vb[-1][1].shape == (2,)  # ragged final batch kept


def _write_cifar_batches(root, n_per_batch=20, seed=5):
    """Synthesize CIFAR-10 python-format pickles (the reference on-disk
    layout: data_batch_1..5 + test_batch dicts with b"data" (N, 3072) uint8
    row-major CHW and b"labels")."""
    import pickle

    rng = np.random.default_rng(seed)
    d = os.path.join(root, "cifar-10-batches-py")
    os.makedirs(d, exist_ok=True)
    all_imgs, all_lbls = [], []
    for b in range(1, 6):
        data = rng.integers(0, 256, (n_per_batch, 3072), dtype=np.uint8)
        labels = [int(v) for v in rng.integers(0, 10, n_per_batch)]
        with open(os.path.join(d, f"data_batch_{b}"), "wb") as f:
            pickle.dump({b"data": data, b"labels": labels}, f)
        all_imgs.append(data)
        all_lbls.extend(labels)
    test = rng.integers(0, 256, (n_per_batch, 3072), dtype=np.uint8)
    test_lbls = [int(v) for v in rng.integers(0, 10, n_per_batch)]
    with open(os.path.join(d, "test_batch"), "wb") as f:
        pickle.dump({b"data": test, b"labels": test_lbls}, f)
    imgs = np.concatenate(all_imgs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    test_imgs = test.reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    return imgs, np.asarray(all_lbls), test_imgs, np.asarray(test_lbls)


def test_cifar_pickle_roundtrip(tmp_path):
    imgs, lbls, test_imgs, test_lbls = _write_cifar_batches(str(tmp_path))
    got_x, got_y = data_io.load_cifar10(str(tmp_path), train=True)
    np.testing.assert_array_equal(got_x, imgs)
    np.testing.assert_array_equal(got_y, lbls)
    got_xt, got_yt = data_io.load_cifar10(str(tmp_path), train=False)
    np.testing.assert_array_equal(got_xt, test_imgs)
    np.testing.assert_array_equal(got_yt, test_lbls)


@pytest.mark.parametrize("colors", ["rgb", "YCbCr"])
def test_cifar_colored_real_file_branch(tmp_path, monkeypatch, colors):
    """The real-data colored branch end to end on synthesized files:
    seed-0 shuffle, color conversion, 45k/5k-analog split (train-sample
    count scaled down for the tiny fixture)."""
    from dctn_tpu.data import pipeline as pl

    imgs, lbls, test_imgs, test_lbls = _write_cifar_batches(str(tmp_path))
    monkeypatch.setattr(pl, "CIFAR10_NUM_TRAIN_SAMPLES", 80)
    splits = pl._cifar_colored_splits(str(tmp_path), colors, (0, 0, 0))
    tr, va, te = splits
    assert tr.x.shape == (1, 80, 32, 32, 3) and va.x.shape == (1, 20, 32, 32, 3)
    assert te.x.shape == (1, 20, 32, 32, 3)
    # the deterministic seed-0 shuffle maps split rows back to file rows
    order = _seed0_shuffled_indices(100)
    np.testing.assert_array_equal(np.asarray(tr.y), lbls[order[:80]])
    np.testing.assert_array_equal(np.asarray(va.y), lbls[order[80:]])
    if colors == "rgb":
        np.testing.assert_allclose(
            np.asarray(tr.x[0, 0]), imgs[order[0]].astype(np.float32) / 255.0
        )
    else:
        from PIL import Image

        expect = (
            np.asarray(
                Image.fromarray(imgs[order[0]]).convert("YCbCr"), np.float32
            )
            / 255.0
        )
        np.testing.assert_allclose(np.asarray(tr.x[0, 0]), expect)


def test_cifar_grayscale_real_file_branch(tmp_path, monkeypatch):
    from dctn_tpu.data import pipeline as pl
    from dctn_tpu.data.feature_maps import phi_cos_sin_squared_1

    _write_cifar_batches(str(tmp_path))
    monkeypatch.setattr(pl, "CIFAR10_NUM_TRAIN_SAMPLES", 80)
    for size in (28, 32):
        tr, va, te = pl._cifar_grayscale_splits(
            str(tmp_path), size, phi_cos_sin_squared_1, (0, 0, 0)
        )
        assert tr.x.shape == (1, 80, size, size, 2)
        assert va.x.shape == (1, 20, size, size, 2)
        assert np.all(np.asarray(tr.x) >= 0.0)


def test_mnist_real_file_branch(tmp_path, monkeypatch):
    """The real-file MNIST-like branch end to end on synthesized IDX files:
    /255 normalization, 50k/10k-analog split, φ application, index arrays."""
    from dctn_tpu.data import pipeline as pl
    from dctn_tpu.data.feature_maps import phi_cos_sin_squared_1

    rng = np.random.default_rng(7)
    imgs = rng.integers(0, 256, (120, 28, 28), dtype=np.uint8)
    lbls = rng.integers(0, 10, 120).astype(np.uint8)
    test_imgs = rng.integers(0, 256, (30, 28, 28), dtype=np.uint8)
    test_lbls = rng.integers(0, 10, 30).astype(np.uint8)
    for prefix, im, lb in (("train", imgs, lbls), ("t10k", test_imgs, test_lbls)):
        with open(tmp_path / f"{prefix}-images-idx3-ubyte", "wb") as f:
            f.write(struct.pack(">IIII", 2051, *im.shape))
            f.write(im.tobytes())
        with open(tmp_path / f"{prefix}-labels-idx1-ubyte", "wb") as f:
            f.write(struct.pack(">II", 2049, len(lb)))
            f.write(lb.tobytes())
    monkeypatch.setattr(pl, "MNISTLIKE_NUM_TRAIN_SAMPLES", 100)
    tr, va, te = pl._mnist_like_splits(
        "mnist", str(tmp_path), phi_cos_sin_squared_1, (0, 0, 0)
    )
    assert tr.x.shape == (1, 100, 28, 28, 2)
    assert va.x.shape == (1, 20, 28, 28, 2)
    assert te.x.shape == (1, 30, 28, 28, 2)
    np.testing.assert_array_equal(np.asarray(va.y), lbls[100:120])
    np.testing.assert_array_equal(va.indices, np.arange(100, 120))
    # φ of the raw pixel value round-trips
    expect = 2.0 * np.sin(imgs[0, 0, 0] / 255.0 * np.pi / 2.0) ** 2
    assert tr.x[0, 0, 0, 0, 0] == pytest.approx(expect, rel=1e-6)
