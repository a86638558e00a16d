"""L2 data pipeline: datasets → quantum features → ν scaling → batches.

Capability parity with reference ``dctn/dataset_loading.py``:
- MNIST/FashionMNIST: train = first 50k, val = last 10k of the train files,
  test = the test files; φ applied to the WHOLE split up front.
- CIFAR-10 grayscale 28×28 / 32×32 (PIL resize + ITU-R grayscale) and colored
  rgb / YCbCr (color values become the Q₀=3 quantum dim); deterministic
  seed-0 shuffle (random.sample — verified to reproduce the reference's
  recorded first indices 25247, 49673, …) then 45k/5k split.
- ν autoscaling: multiply x so K×K windows of rank-one tensors have μ²+σ²=1,
  computed in float64 over the first 10880 train samples
  (dataset_loading.py:79-94), with the FashionMNIST K=4 regression constants
  asserted (dataset_loading.py:316-317).
- per-channel normalization / constant channel / per-channel ν for colored
  CIFAR (dataset_loading.py:331-389).

TPU-first notes: everything here is host-side numpy (float64 where the
reference uses it). Batching is index-based — the training loop keeps whole
splits resident in device HBM and gathers batches on device, so no per-step
host↔device traffic (the reference pays a pinned-memory copy per iteration).
"""

from __future__ import annotations

import dataclasses
import logging
import random
from typing import Iterator, Optional, Tuple

import numpy as np

from .feature_maps import PhiMap, phi_cos_sin_squared_1, apply_feature_map
from . import io as data_io

logger = logging.getLogger(__name__)

DATASET_TYPES = (
    "mnist",
    "fashionmnist",
    "cifar10_28x28_grayscale",
    "cifar10_32x32_grayscale",
    "cifar10_rgb",
    "cifar10_YCbCr",
)

CIFAR10_NUM_TRAIN_SAMPLES = 45000

# Regression constants for the ν-scaled FashionMNIST train split with K=4 and
# the default φ (reference dataset_loading.py:316-317).
FASHIONMNIST_K4_SCALED_MEAN = 0.7284077405929565
FASHIONMNIST_K4_SCALED_STD = 0.6384438872337341

# train/val boundary of the torchvision-train split (dataset_loading.py:47-57);
# a module constant so file-format tests can run the real branch on small
# synthesized files
MNISTLIKE_NUM_TRAIN_SAMPLES = 50000


@dataclasses.dataclass
class QuantumSplit:
    """One split: quantum features x (C, N, H, W, Q) float32, labels, indices
    into the original dataset, and the pre-φ images (for TB imagery)."""

    x: np.ndarray
    y: np.ndarray
    indices: np.ndarray
    unmodified_x: Optional[np.ndarray] = None

    def __len__(self) -> int:
        return len(self.y)


@dataclasses.dataclass
class Splits:
    train: QuantumSplit
    val: QuantumSplit
    test: QuantumSplit
    nu: Optional[Tuple[float, ...]] = None  # the scaling actually applied

    def __iter__(self):
        return iter((self.train, self.val, self.test))


# ---------------------------------------------------------------------------
# ν window scaling (host, float64)


def calc_scaling_factor(x: np.ndarray, kernel_size: int, subset: int = 10880) -> float:
    """ν such that K×K windows of ν·x (rank-one tensors) have μ²+σ²=1.

    ``x``: (C, N, H, W, Q). Float64 throughout; windows are never densified —
    per-window sums/norms use the rank-one product identities
    (dataset_loading.py:79-94 + rank_one_tensor.py identities).
    """
    xs = x[:, :subset].astype(np.float64)
    c, n, h, w, q = xs.shape
    hp, wp = h - kernel_size + 1, w - kernel_size + 1
    sums = np.ones((n, hp, wp))
    sqnorms = np.ones((n, hp, wp))
    nfactors = 0
    for dh in range(kernel_size):
        for dw in range(kernel_size):
            for ch in range(c):
                view = xs[ch, :, dh : dh + hp, dw : dw + wp, :]
                sums *= view.sum(axis=-1)
                sqnorms *= (view**2).sum(axis=-1)
                nfactors += 1
    ntensors = n * hp * wp
    ncoords = float(q) ** nfactors
    total = sums.sum()
    mean = total / (ntensors * ncoords)
    nelement = ntensors * ncoords
    # unbiased variance over the implied dense batch (var_over_batch default)
    divisor = nelement - 1
    var = (
        sqnorms.sum() / divisor - 2 * total / divisor * mean + nelement / divisor * mean**2
    )
    return float((mean**2 + var) ** (-1.0 / (2 * kernel_size**2)))


# ---------------------------------------------------------------------------
# split construction


def _mnist_like_splits(
    ds_type: str, root: str, phi: PhiMap, synthetic_sizes: Tuple[int, int, int]
):
    name = {"mnist": "MNIST", "fashionmnist": "FashionMNIST"}[ds_type]
    if root == "synthetic":
        n_tr, n_val, n_te = synthetic_sizes
        seed = 1234 if ds_type == "mnist" else 4321
        tr_x, tr_y = data_io.synthetic_mnist_like(n_tr, seed=seed, offset=0)
        va_x, va_y = data_io.synthetic_mnist_like(n_val, seed=seed, offset=n_tr)
        te_x, te_y = data_io.synthetic_mnist_like(
            n_te, seed=seed, offset=n_tr + n_val
        )
        raws = (tr_x, va_x, te_x)
        ys = (tr_y, va_y, te_y)
        idxs = tuple(np.arange(len(y)) for y in ys)
    else:
        images, labels = data_io.load_mnist_like(root, name, train=True)
        test_images, test_labels = data_io.load_mnist_like(root, name, train=False)
        images = images.astype(np.float32) / 255.0
        test_images = test_images.astype(np.float32) / 255.0
        n_tr = MNISTLIKE_NUM_TRAIN_SAMPLES
        raws = (images[:n_tr], images[n_tr : n_tr + 10000], test_images)
        ys = (labels[:n_tr], labels[n_tr : n_tr + 10000], test_labels)
        idxs = (
            np.arange(len(ys[0])),
            np.arange(n_tr, n_tr + len(ys[1])),
            np.arange(len(test_labels)),
        )
    return tuple(
        QuantumSplit(apply_feature_map(r, phi), y, i, unmodified_x=r)
        for r, y, i in zip(raws, ys, idxs)
    )


def _seed0_shuffled_indices(n: int) -> list:
    """The reference's deterministic shuffle: random.seed(0) +
    libcrap.shuffled == random.sample (verified against the recorded
    indices/hash in dataset_loading.py:157-160)."""
    random.seed(0)
    return random.sample(range(n), n)


def _cifar_grayscale_splits(
    root: str, image_size: int, phi: PhiMap, synthetic_sizes: Tuple[int, int, int]
):
    if root == "synthetic":
        n_tr, n_val, n_te = synthetic_sizes
        tr_x, tr_y = data_io.synthetic_mnist_like(
            n_tr, image_size, image_size, seed=77
        )
        va_x, va_y = data_io.synthetic_mnist_like(
            n_val, image_size, image_size, seed=77, offset=n_tr
        )
        te_x, te_y = data_io.synthetic_mnist_like(
            n_te, image_size, image_size, seed=77, offset=n_tr + n_val
        )
        raws, ys = (tr_x, va_x, te_x), (tr_y, va_y, te_y)
        idxs = tuple(np.arange(len(y)) for y in ys)
    else:
        from PIL import Image

        def to_gray(batch: np.ndarray) -> np.ndarray:
            out = np.empty((len(batch), image_size, image_size), np.float32)
            for i, img in enumerate(batch):
                pil = Image.fromarray(img)
                if image_size != 32:
                    pil = pil.resize((image_size, image_size), Image.BILINEAR)
                out[i] = np.asarray(pil.convert("L"), np.float32) / 255.0
            return out

        x, y = data_io.load_cifar10(root, train=True)
        xt, yt = data_io.load_cifar10(root, train=False)
        order = _seed0_shuffled_indices(len(x))
        logger.info("cifar shuffle first 10 indices: %s", order[:10])
        gray = to_gray(x[order])
        y_sh = y[order]
        raws = (
            gray[:CIFAR10_NUM_TRAIN_SAMPLES],
            gray[CIFAR10_NUM_TRAIN_SAMPLES:],
            to_gray(xt),
        )
        ys = (
            y_sh[:CIFAR10_NUM_TRAIN_SAMPLES],
            y_sh[CIFAR10_NUM_TRAIN_SAMPLES:],
            yt,
        )
        idxs = (
            np.asarray(order[:CIFAR10_NUM_TRAIN_SAMPLES]),
            np.asarray(order[CIFAR10_NUM_TRAIN_SAMPLES:]),
            np.arange(len(yt)),
        )
    return tuple(
        QuantumSplit(apply_feature_map(r, phi), y, i, unmodified_x=r)
        for r, y, i in zip(raws, ys, idxs)
    )


def _cifar_colored_splits(
    root: str, colors: str, synthetic_sizes: Tuple[int, int, int]
):
    """Colored CIFAR: C=1 image channel, the 3 color values ARE the quantum
    dim (Q₀=3) — x shape (1, N, 32, 32, 3) (dataset_loading.py:180-226)."""
    if root == "synthetic":
        n_tr, n_val, n_te = synthetic_sizes
        tr_x, tr_y = data_io.synthetic_mnist_like(n_tr, 32, 32, channels=3, seed=99)
        va_x, va_y = data_io.synthetic_mnist_like(
            n_val, 32, 32, channels=3, seed=99, offset=n_tr
        )
        te_x, te_y = data_io.synthetic_mnist_like(
            n_te, 32, 32, channels=3, seed=99, offset=n_tr + n_val
        )
        raws, ys = (tr_x, va_x, te_x), (tr_y, va_y, te_y)
        idxs = tuple(np.arange(len(y)) for y in ys)
    else:
        from PIL import Image

        def convert(batch: np.ndarray) -> np.ndarray:
            if colors == "rgb":
                return batch.astype(np.float32) / 255.0
            out = np.empty_like(batch, dtype=np.float32)
            for i, img in enumerate(batch):
                out[i] = (
                    np.asarray(Image.fromarray(img).convert("YCbCr"), np.float32)
                    / 255.0
                )
            return out

        x, y = data_io.load_cifar10(root, train=True)
        xt, yt = data_io.load_cifar10(root, train=False)
        order = _seed0_shuffled_indices(len(x))
        logger.info("cifar shuffle first 10 indices: %s", order[:10])
        xc = convert(x[order])
        y_sh = y[order]
        raws = (
            xc[:CIFAR10_NUM_TRAIN_SAMPLES],
            xc[CIFAR10_NUM_TRAIN_SAMPLES:],
            convert(xt),
        )
        ys = (
            y_sh[:CIFAR10_NUM_TRAIN_SAMPLES],
            y_sh[CIFAR10_NUM_TRAIN_SAMPLES:],
            yt,
        )
        idxs = (
            np.asarray(order[:CIFAR10_NUM_TRAIN_SAMPLES]),
            np.asarray(order[CIFAR10_NUM_TRAIN_SAMPLES:]),
            np.arange(len(yt)),
        )
    return tuple(
        QuantumSplit(r[None].astype(np.float32), y, i, unmodified_x=r)
        for r, y, i in zip(raws, ys, idxs)
    )


def load_dataset(
    ds_type: str,
    root: str,
    *,
    phi: PhiMap = phi_cos_sin_squared_1,
    phi_multiplier: Optional[float] = None,
    autoscale_kernel_size: Optional[int] = None,
    center_and_normalize_each_channel: bool = False,
    add_constant_channel: Optional[float] = None,
    nu_per_channel: Optional[Tuple[float, float, float]] = None,
    synthetic_sizes: Tuple[int, int, int] = (8192, 2048, 2048),
) -> Splits:
    """Build (train, val, test) QuantumSplits with all reference semantics.

    ``phi_multiplier`` ν REPLACES the factor 2 of the default φ:
    φ = (ν·sin²(πx/2), ν·cos²(πx/2)) (new_runner.py:354-361). It is mutually
    exclusive with ``autoscale_kernel_size`` and ``nu_per_channel``.
    """
    assert ds_type in DATASET_TYPES, ds_type
    colored = ds_type in ("cifar10_rgb", "cifar10_YCbCr")
    assert (
        sum(
            x is not None
            for x in (phi_multiplier, autoscale_kernel_size, nu_per_channel)
        )
        <= 1
    )
    assert not (colored and phi_multiplier is not None)
    assert not (nu_per_channel is not None and not colored)
    assert not (center_and_normalize_each_channel and not colored)
    assert not (add_constant_channel is not None and not colored)

    if phi_multiplier is not None:
        m = phi_multiplier
        phi = tuple(
            (lambda X, f=f: f(X) * (m / 2.0)) for f in phi
        )  # ν·sin², ν·cos² for the default φ

    if ds_type in ("mnist", "fashionmnist"):
        train, val, test = _mnist_like_splits(ds_type, root, phi, synthetic_sizes)
    elif ds_type in ("cifar10_28x28_grayscale", "cifar10_32x32_grayscale"):
        size = 28 if ds_type == "cifar10_28x28_grayscale" else 32
        train, val, test = _cifar_grayscale_splits(root, size, phi, synthetic_sizes)
    else:
        train, val, test = _cifar_colored_splits(
            root, "rgb" if ds_type == "cifar10_rgb" else "YCbCr", synthetic_sizes
        )

    splits = Splits(train, val, test)
    nu_applied: Optional[Tuple[float, ...]] = None

    if colored:
        if center_and_normalize_each_channel:
            mu = train.x.astype(np.float64).mean(axis=(0, 1, 2, 3))
            sigma = train.x.astype(np.float64).std(axis=(0, 1, 2, 3))
            for s in splits:
                s.x = ((s.x - mu) / sigma).astype(np.float32)
            logger.info(
                "channels normalized: μ=%s σ=%s", mu.tolist(), sigma.tolist()
            )
        nu = nu_per_channel
        if add_constant_channel is not None:
            for s in splits:
                const = np.full_like(s.x[..., :1], add_constant_channel)
                s.x = np.concatenate((s.x, const), axis=4)
            if nu is not None:
                nu = tuple(nu) + (1.0,)
        if autoscale_kernel_size is not None:
            v = calc_scaling_factor(train.x, autoscale_kernel_size)
            nu = (v,) * train.x.shape[-1]
            logger.info("calc_scaling_factor chose ν=%s", nu)
        if nu is not None:
            arr = np.asarray(nu, np.float32)
            for s in splits:
                s.x = s.x * arr
            nu_applied = tuple(float(v) for v in nu)
    elif autoscale_kernel_size is not None:
        v = calc_scaling_factor(train.x, autoscale_kernel_size)
        logger.info("ν=%s", v)
        for s in splits:
            s.x = (s.x * v).astype(np.float32)
        nu_applied = (float(v),)
        if (
            ds_type == "fashionmnist"
            and autoscale_kernel_size == 4
            and phi is phi_cos_sin_squared_1
            and root != "synthetic"
        ):
            assert np.allclose(train.x.mean(), FASHIONMNIST_K4_SCALED_MEAN, atol=1e-6)
            assert np.allclose(train.x.std(), FASHIONMNIST_K4_SCALED_STD, atol=1e-6)
    splits.nu = nu_applied
    return splits


# ---------------------------------------------------------------------------
# batching


class Batcher:
    """Index-based batch iterator (replaces the reference's DataLoader).

    Yields (x, y, indices) numpy batches with x stacked on dim 1 like
    ``collate_quantum`` (dataset_loading.py:282-286): x is (C, B, H, W, Q).
    Train mode reshuffles every epoch with a seeded generator and drops the
    last incomplete batch (dataset_loading.py:325).
    """

    def __init__(
        self,
        split: QuantumSplit,
        batch_size: int,
        shuffle: bool,
        drop_last: bool,
        seed: int = 0,
    ):
        self.split = split
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        n = len(self.split)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def epoch_order(self) -> np.ndarray:
        n = len(self.split)
        return self._rng.permutation(n) if self.shuffle else np.arange(n)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        order = self.epoch_order()
        n = len(order)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for start in range(0, stop, self.batch_size):
            sel = order[start : start + self.batch_size]
            yield self.split.x[:, sel], self.split.y[sel], self.split.indices[sel]

    def batches_forever(self):
        while True:
            yield from iter(self)

    def iter_indices(self) -> Iterator[np.ndarray]:
        """One epoch of POSITION index batches (for device-resident gathers)."""
        order = self.epoch_order()
        n = len(order)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for start in range(0, stop, self.batch_size):
            yield order[start : start + self.batch_size]

    def indices_forever(self) -> Iterator[np.ndarray]:
        while True:
            yield from self.iter_indices()
