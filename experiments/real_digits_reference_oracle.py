"""Accuracy-parity dress rehearsal vs the ACTUAL torch reference stack.

The recorded FashionMNIST/CIFAR accuracy runs are data-blocked here (zero
egress), so this is the maximally-real substitute (VERDICT r3 #2): train
all three recorded model families on sklearn's REAL 8×8 digits —

  - EPS(4,4)+linear        (the 90.19-vacc architecture family,
                            replicate_90.19_vacc_experiment.py:7-40)
  - deep three-EPS         (three stacked EPS layers — the family of
                            three_epses_on_fashionmnist.py — at a scale
                            that LEARNS on 1,200 8×8 samples; see below)
  - legacy ConvSBS         (mnist.py:169-284, 2 snake-string layers bond 2)

— TWICE each: once with THIS framework (on the TPU when available), once
with the reference implementation imported read-only from /root/reference
and driven as a black-box torch training loop on the SAME data, SAME
initial parameters and SAME batch schedule. Records per family: test
accuracy of both stacks, their delta, and test-set prediction agreement.
f32 end-to-end on both sides, so tiny rounding divergence accumulates over
the trajectory — the contract is acc-delta ≈ 0 and high agreement, not
bitwise equality (op- and 30-step-trajectory BITWISE parity is separately
proven in tests/test_reference_parity.py).

The deep family's note: the EXACT recorded deep config
((4,4),(3,12),(2,24)) does not train on 1,200-sample digits under ANY
stable setting we probed — Adam diverges (loss ~1e24) at lr ≥ 3e-4 with or
without the reference's heavy composition reg, and stays at chance at
1e-4 over 400 iters (the reference's own recipe is lr=1e-7 over many
epochs of 50k FashionMNIST images — a regime this tiny dataset cannot
reproduce). Both stacks agreed on that failure mode too (first run:
chance accuracy both sides). The oracle therefore uses a three-layer
config scaled to the data — ((2,4),(2,6),(2,12)), val ≈ 0.90 — which
exercises the same family (3 cascaded EPS contractions + linear).

Run: python experiments/real_digits_reference_oracle.py
Writes experiments/real_digits_reference_oracle_results.json.
"""

import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

REFERENCE_ROOT = "/root/reference"


# --- reference import glue (stubs for its data/trainer deps; our code) ---


class _Anything:
    def __call__(self, *a, **k):
        if len(a) == 1 and callable(a[0]) and not k:
            return a[0]
        return self

    def __getattr__(self, name):
        return self


_ANY = _Anything()


def _stub_module(name: str, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    if "." in name:
        parent, child = name.rsplit(".", 1)
        if parent in sys.modules:
            setattr(sys.modules[parent], child, mod)
    return mod


def import_reference():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    for name in (
        "click_log",
        "libcrap",
        "libcrap.torch",
        "libcrap.torch.click",
        "libcrap.torch.training",
        "torchvision",
        "torchvision.datasets",
        "torchvision.datasets.mnist",
        "torchvision.transforms",
        "torchvision.transforms.functional",
        "ignite",
        "ignite.engine",
        "ignite.metrics",
        "ignite.handlers",
        "ignite.contrib",
        "ignite.contrib.handlers",
        "ignite.contrib.handlers.param_scheduler",
        "ignite.contrib.handlers.tensorboard_logger",
    ):
        mod = _stub_module(name)
        mod.__getattr__ = lambda attr: (
            (_ for _ in ()).throw(AttributeError(attr))
            if attr.startswith("__") and attr.endswith("__")
            else _ANY
        )
    import dctn.eps as ref_eps
    import mnist as ref_mnist

    return types.SimpleNamespace(eps=ref_eps, mnist=ref_mnist)


def batch_schedule(n, bs, iters, seed=1):
    rng = np.random.RandomState(seed)
    perm, off, out = rng.permutation(n), 0, []
    for _ in range(iters):
        if off + bs > n:
            perm, off = rng.permutation(n), 0
        out.append(perm[off : off + bs].copy())
        off += bs
    return out


# --- EPS families -----------------------------------------------------------


def ours_train_eps(specs, data, idx_list, lr, init="unit_theoretical_output_std"):
    from dctn_tpu.models import EPSesPlusLinearConfig, init_eps_plus_linear
    from dctn_tpu.train import make_optimizer, make_train_step

    (x_tr, y_tr), _, (x_te, y_te) = data
    cfg = EPSesPlusLinearConfig(epses_specs=specs, image_size=8, q0=2)
    init_kw = (
        {"init_input": jnp.asarray(x_tr), "init_batch_size": 256}
        if init == "unit_empirical_output_std"
        else {}
    )
    params = init_eps_plus_linear(jax.random.PRNGKey(0), cfg, init, **init_kw)
    init_np = jax.tree_util.tree_map(lambda a: np.asarray(a), params)
    opt = make_optimizer("adam", lr)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt, "epswise", 0.0, donate=False)
    xd, yd = jnp.asarray(x_tr), jnp.asarray(y_tr)
    key = jax.random.PRNGKey(2)
    t0 = time.perf_counter()
    for idx in idx_list:
        i = jnp.asarray(idx)
        key, sub = jax.random.split(key)
        params, opt_state, m = step(
            params, opt_state, sub, jnp.take(xd, i, axis=1), jnp.take(yd, i)
        )
    secs = time.perf_counter() - t0
    from dctn_tpu.models import eps_plus_linear_forward

    logits = eps_plus_linear_forward(params, jnp.asarray(x_te), cfg)
    preds = np.asarray(jnp.argmax(logits, axis=1))
    return preds, float(np.mean(preds == y_te)), secs, init_np


def reference_train_eps(REF, init_np, data, idx_list, lr):
    import torch
    import torch.nn.functional as F

    (x_tr, y_tr), _, (x_te, y_te) = data
    cores = [
        torch.from_numpy(np.asarray(c, np.float32)).clone().requires_grad_(True)
        for c in init_np["epses"]
    ]
    w = torch.from_numpy(np.asarray(init_np["linear"]["w"], np.float32)).clone()
    b = torch.from_numpy(np.asarray(init_np["linear"]["b"], np.float32)).clone()
    w.requires_grad_(True)
    b.requires_grad_(True)
    opt = torch.optim.Adam(cores + [w, b], lr=lr)
    tx = torch.from_numpy(np.asarray(x_tr, np.float32))
    ty = torch.from_numpy(np.asarray(y_tr, np.int64))

    def forward(xb):
        h = xb
        for core in cores:
            h = REF.eps.eps(core, h)[None]  # (1, B, H', W', O)
        return h[0].reshape(h.shape[1], -1) @ w + b

    t0 = time.perf_counter()
    for idx in idx_list:
        i = torch.from_numpy(idx)
        logits = forward(tx[:, i])
        loss = F.cross_entropy(logits, ty[i])
        opt.zero_grad()
        loss.backward()
        opt.step()
    secs = time.perf_counter() - t0
    with torch.no_grad():
        preds = (
            forward(torch.from_numpy(np.asarray(x_te, np.float32)))
            .argmax(dim=1)
            .numpy()
        )
    return preds, float(np.mean(preds == y_te)), secs


# --- legacy ConvSBS family --------------------------------------------------


def legacy_pair(REF, data_raw, idx_list, lr):
    """Train the ConvSBS snake-string model in BOTH stacks from the same
    scaled init (our window-std multiplier + per-layer output rescaling,
    mnist.py:434-463 recipe) and batch schedule."""
    import torch
    import torch.nn.functional as F

    from dctn_tpu.models.conv_sbs_model import (
        ConvSBSModelConfig,
        init_conv_sbs_model,
        conv_sbs_model_forward,
        calc_std_of_coordinates_of_windows,
        scale_layers_using_batch,
    )
    from dctn_tpu.train import make_optimizer

    (x_tr, y_tr), _, (x_te, y_te) = data_raw
    backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    std = float(
        calc_std_of_coordinates_of_windows(jnp.asarray(x_tr), 3, False, 1.0)
    )
    multiplier = std ** (-1.0 / 9.0)
    cfg = ConvSBSModelConfig(
        num_sbs_layers=2, bond_dim_size=2, backend=backend,
        cos_sin_squared=True, input_multiplier=multiplier,
    )
    params = init_conv_sbs_model(jax.random.PRNGKey(0), cfg)
    params = scale_layers_using_batch(params, cfg, jnp.asarray(x_tr[:512]))

    # ours on-device
    import optax

    opt = make_optimizer("adam", lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, o, xb, yb):
        def loss_fn(pp):
            logits = conv_sbs_model_forward(pp, cfg, xb)
            lp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.mean(jnp.take_along_axis(lp, yb[:, None], axis=1))

        loss, grads = jax.value_and_grad(loss_fn)(p)
        up, o = opt.update(grads, o, p)
        return optax.apply_updates(p, up), o, loss

    xd, yd = jnp.asarray(x_tr), jnp.asarray(y_tr)
    p = params
    t0 = time.perf_counter()
    for idx in idx_list:
        i = jnp.asarray(idx)
        p, opt_state, _ = step(
            p, opt_state, jnp.take(xd, i, axis=0), jnp.take(yd, i)
        )
    ours_secs = time.perf_counter() - t0
    ours_preds = np.asarray(
        jnp.argmax(conv_sbs_model_forward(p, cfg, jnp.asarray(x_te)), axis=1)
    )

    # reference torch model, same init
    mod = REF.mnist.DCTNMnistModel(
        num_sbs_layers=2,
        bond_dim_size=2,
        trace_edge=False,
        initialization=_ref_dumb_init(),
        cos_sin_squared=True,
        input_multiplier=multiplier,
    ).float()
    with torch.no_grad():
        for layer, many in zip(params, mod.conv_sbses):
            for cores, string in zip(layer, many.strings):
                for c, pt in zip(cores, string.cores):
                    assert tuple(pt.shape) == c.shape
                    pt.data = torch.from_numpy(np.asarray(c, np.float32)).clone()
    optim = torch.optim.Adam(mod.parameters(), lr=lr)
    tx = torch.from_numpy(np.asarray(x_tr, np.float32))[:, None]  # (N,1,H,W)
    ty = torch.from_numpy(np.asarray(y_tr, np.int64))
    t0 = time.perf_counter()
    for idx in idx_list:
        i = torch.from_numpy(idx)
        loss = F.cross_entropy(mod(tx[i]), ty[i])
        optim.zero_grad()
        loss.backward()
        optim.step()
    ref_secs = time.perf_counter() - t0
    with torch.no_grad():
        ref_preds = (
            mod(torch.from_numpy(np.asarray(x_te, np.float32))[:, None])
            .argmax(dim=1)
            .numpy()
        )
    return {
        "family": "legacy ConvSBS (2 snake layers, bond 2, mnist.py:169-284)",
        "ours_test_acc": float(np.mean(ours_preds == y_te)),
        "reference_test_acc": float(np.mean(ref_preds == y_te)),
        "acc_delta": float(
            abs(np.mean(ours_preds == y_te) - np.mean(ref_preds == y_te))
        ),
        "pred_agreement": float(np.mean(ours_preds == ref_preds)),
        "ours_seconds": round(ours_secs, 1),
        "reference_seconds": round(ref_secs, 1),
        "iters": len(idx_list),
    }


def _ref_dumb_init():
    import dctn.conv_sbs as ref_sbs

    return ref_sbs.DumbNormalInitialization(0.5)


def eps_pair(name, REF, specs, data, iters, bs, lr,
             init="unit_theoretical_output_std"):
    (x_tr, y_tr), _, (x_te, y_te) = data
    idx_list = batch_schedule(y_tr.shape[0], bs, iters)
    ours_preds, ours_acc, ours_secs, init_np = ours_train_eps(
        specs, data, idx_list, lr, init=init
    )
    ref_preds, ref_acc, ref_secs = reference_train_eps(
        REF, init_np, data, idx_list, lr
    )
    row = {
        "family": name,
        "specs": list(map(list, specs)),
        "ours_test_acc": ours_acc,
        "reference_test_acc": ref_acc,
        "acc_delta": abs(ours_acc - ref_acc),
        "pred_agreement": float(np.mean(ours_preds == ref_preds)),
        "ours_seconds": round(ours_secs, 1),
        "reference_seconds": round(ref_secs, 1),
        "iters": iters,
        "batch_size": bs,
    }
    print(json.dumps(row), flush=True)
    return row


def main() -> None:
    from real_digits_demo import load_raw_splits, load_splits

    REF = import_reference()
    (x_tr, y_tr), va, te, _nu = load_splits()
    data = ((x_tr, y_tr), va[:2], te[:2])

    rows = [
        eps_pair(
            "EPS(4,4)+linear (the 90.19-vacc family)", REF, ((4, 4),),
            data, iters=400, bs=128, lr=3e-4,
        ),
        eps_pair(
            # three-layer family at digits-trainable scale (see module
            # docstring for why the exact 28x28 deep config cannot learn
            # from 1,200 samples); empirical unit-output-std init
            "deep three-EPS family (2,4),(2,6),(2,12) at 8x8", REF,
            ((2, 4), (2, 6), (2, 12)), data,
            iters=int(os.environ.get("DCTN_TPU_DEEP3_ITERS", "400")),
            bs=32, lr=1e-3, init="unit_empirical_output_std",
        ),
    ]
    raw = load_raw_splits()
    legacy_iters = int(os.environ.get("DCTN_TPU_LEGACY_ITERS", "400"))
    row = legacy_pair(
        REF, raw, batch_schedule(raw[0][1].shape[0], 128, legacy_iters),
        lr=1e-3,
    )
    print(json.dumps(row), flush=True)
    rows.append(row)

    out = {
        "device_ours": str(jax.devices()[0]),
        "reference": "torch CPU, /root/reference driven as a black box",
        "families": rows,
    }
    path = os.path.join(
        os.path.dirname(__file__), "real_digits_reference_oracle_results.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
