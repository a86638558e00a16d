"""Reference-as-oracle parity tests (VERDICT r1 finding #2).

Imports the actual reference implementation at /root/reference READ-ONLY and
asserts, on identical random inputs, that this repo's ops compute the same
numbers (forward AND gradients, float64). This is the strongest parity
evidence available in a zero-egress environment where accuracy-replication
runs are data-blocked.

The reference package needs torchvision/libcrap/ignite only for data download
and trainer glue; those are stubbed so the pure-math modules import. Nothing
is copied — the reference is called as a black-box oracle.

Oracles covered (reference file:line):
- eps / eps_one_by_one fwd+grad            dctn/eps.py:19-63
- contract_on_input_dims, inner_product    dctn/eps.py:106-124
- transform_in_slices                      dctn/eps.py:126-137
- theoretical + empirical init scale       dctn/eps.py:144-181
- epses_composition.inner_product          dctn/epses_composition.py:21-58
- ConvSBS.forward fwd+grad                 dctn/conv_sbs.py:258-304
- ConvSBS.{sum,mean,var,squared_fro_norm,as_explicit_tensor,as_eps}
                                           dctn/conv_sbs.py:161-256
- logmatmulexp fwd+grad                    dctn/logmatmulexp.py:5-14
- calc_scaling_factor (ν)                  dctn/dataset_loading.py:79-94
- RankOneTensorsBatch statistics           dctn/rank_one_tensor.py:57-110
- φ feature map                            dctn/dataset_loading.py:33-36
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REFERENCE_ROOT = "/root/reference"

torch = pytest.importorskip("torch")

if not os.path.isfile(os.path.join(REFERENCE_ROOT, "dctn", "eps.py")):
    pytest.skip("reference checkout not available", allow_module_level=True)


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


def _import_reference():
    """Import the reference package with its data/trainer-glue deps stubbed."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    for name, attrs in (
        ("libcrap", {"shuffled": lambda xs: list(xs)}),
        ("torchvision", {}),
        ("torchvision.datasets", {"MNIST": object, "FashionMNIST": object, "CIFAR10": object}),
        ("torchvision.transforms", {"Compose": object}),
        (
            "torchvision.transforms.functional",
            {"to_grayscale": None, "to_tensor": None, "resize": None, "to_pil_image": None},
        ),
        ("ignite", {}),
        ("ignite.engine", {"Engine": object}),
    ):
        _stub_module(name, **attrs)
    import dctn.eps as ref_eps_mod
    import dctn.epses_composition as ref_comp_mod
    import dctn.conv_sbs as ref_sbs_mod
    import dctn.conv_sbs_spec as ref_spec_mod
    import dctn.pos2d as ref_pos2d_mod
    import dctn.logmatmulexp as ref_lmme_mod
    import dctn.rank_one_tensor as ref_r1t_mod
    import dctn.dataset_loading as ref_data_mod

    return types.SimpleNamespace(
        eps=ref_eps_mod,
        comp=ref_comp_mod,
        sbs=ref_sbs_mod,
        spec=ref_spec_mod,
        pos2d=ref_pos2d_mod,
        lmme=ref_lmme_mod,
        r1t=ref_r1t_mod,
        data=ref_data_mod,
    )


REF = _import_reference()

from dctn_tpu.ops import eps as R_eps
from dctn_tpu.ops import composition as R_comp
from dctn_tpu.ops import sbs as R_sbs
from dctn_tpu.ops import logmatmulexp as R_lmme
from dctn_tpu.ops.rank_one import RankOneTensorsBatch as RRankOne
from dctn_tpu.data.pipeline import calc_scaling_factor as r_calc_scaling_factor
from dctn_tpu.data.feature_maps import apply_feature_map
from dctn_tpu.utils.pos2d import Pos2D as RPos2D


def _t(a: np.ndarray, requires_grad: bool = False) -> "torch.Tensor":
    t = torch.from_numpy(np.asarray(a, np.float64)).clone()
    t.requires_grad_(requires_grad)
    return t


def _np(x) -> np.ndarray:
    if isinstance(x, torch.Tensor):
        return x.detach().cpu().numpy()
    return np.asarray(x)


def _rand(rng: np.random.Generator, *shape) -> np.ndarray:
    return rng.standard_normal(shape)


# ---------------------------------------------------------------------------
# EPS


@pytest.mark.parametrize(
    "kernel,channels,q,out,hw",
    [(2, 1, 2, 3, 4), (2, 2, 2, 2, 3), (3, 1, 2, 4, 5)],
)
def test_eps_forward_parity(kernel, channels, q, out, hw):
    rng = np.random.default_rng(hash((kernel, channels, q, out)) % 2**32)
    core = _rand(rng, *(q,) * (kernel**2 * channels), out)
    x = _rand(rng, channels, 2, hw, hw, q)

    ref_out = _np(REF.eps.eps(_t(core), _t(x)))
    ref_obo = _np(REF.eps.eps_one_by_one(_t(core), _t(x)))
    got = np.asarray(R_eps.eps(jnp.asarray(core), jnp.asarray(x)))
    got_obo = np.asarray(R_eps.eps_one_by_one(jnp.asarray(core), jnp.asarray(x)))

    np.testing.assert_allclose(got, ref_out, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(got_obo, ref_obo, rtol=1e-12, atol=1e-12)


def test_eps_grad_parity():
    rng = np.random.default_rng(7)
    kernel, channels, q, out = 2, 2, 2, 3
    core = _rand(rng, *(q,) * (kernel**2 * channels), out)
    x = _rand(rng, channels, 2, 4, 4, q)
    cot = _rand(rng, 2, 3, 3, out)

    tc, tx = _t(core, True), _t(x, True)
    (REF.eps.eps(tc, tx) * _t(cot)).sum().backward()

    def loss(c, xi):
        return jnp.sum(R_eps.eps(c, xi) * jnp.asarray(cot))

    gc, gx = jax.grad(loss, argnums=(0, 1))(jnp.asarray(core), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(gc), _np(tc.grad), rtol=1e-11, atol=1e-11)
    np.testing.assert_allclose(np.asarray(gx), _np(tx.grad), rtol=1e-11, atol=1e-11)


def test_eps_algebra_parity():
    rng = np.random.default_rng(8)
    a = _rand(rng, 2, 2, 2, 2, 3)
    b = _rand(rng, 2, 2, 2, 2, 4)
    got = np.asarray(R_eps.contract_on_input_dims(jnp.asarray(a), jnp.asarray(b)))
    ref = _np(REF.eps.contract_on_input_dims(_t(a), _t(b)))
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12)

    c = _rand(rng, 2, 2, 2, 2, 3)
    got_ip = float(R_eps.inner_product(jnp.asarray(a), jnp.asarray(c)))
    ref_ip = float(REF.eps.inner_product(_t(a), _t(c)))
    assert got_ip == pytest.approx(ref_ip, rel=1e-12)


def test_transform_in_slices_parity():
    rng = np.random.default_rng(9)
    core = _rand(rng, 2, 2, 2, 2, 3)
    x = _rand(rng, 1, 10, 5, 5, 2)
    got = np.asarray(R_eps.transform_in_slices(jnp.asarray(core), jnp.asarray(x), batch_size=4))
    ref = _np(REF.eps.transform_in_slices(_t(core), _t(x), batch_size=4))
    assert got.shape == ref.shape == (1, 10, 4, 4, 3)
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12)


def test_theoretical_init_scale_parity():
    """Both initializers draw randn · (Q^(C·K²))^(-1/2); compare the applied
    scale (population std · sqrt(total_in)) rather than the draws."""
    kernel, channels, q, out = 3, 1, 2, 64
    total = q ** (channels * kernel**2)
    ref_core = _np(
        REF.eps.make_eps_unit_theoretical_output_std(
            kernel, channels, q, out, torch.device("cpu"), torch.float64
        )
    )
    got_core = np.asarray(
        R_eps.make_eps_unit_theoretical_output_std(
            jax.random.PRNGKey(0), kernel, channels, q, out, jnp.float64
        )
    )
    assert ref_core.shape == got_core.shape
    # sample std of N(0, 1/total) draws: equal scale up to sampling noise
    assert ref_core.std() * total**0.5 == pytest.approx(1.0, abs=0.02)
    assert got_core.std() * total**0.5 == pytest.approx(1.0, abs=0.02)


def test_empirical_init_output_std_parity():
    """Both empirical inits must make the output std over the init subset
    exactly 1 (population std), per eps.py:163-181."""
    rng = np.random.default_rng(10)
    x = np.abs(_rand(rng, 1, 40, 6, 6, 2))
    kernel, out = 2, 3

    ref_core = REF.eps.make_eps_unit_empirical_output_std(
        kernel, out, _t(x), torch.device("cpu"), torch.float64, batch_size=16
    )
    ref_out = REF.eps.transform_in_slices(ref_core, _t(x), 16)
    assert float(ref_out.std(unbiased=False)) == pytest.approx(1.0, rel=1e-6)

    got_core = R_eps.make_eps_unit_empirical_output_std(
        jax.random.PRNGKey(1), kernel, out, jnp.asarray(x), jnp.float64, batch_size=16
    )
    got_out = np.asarray(R_eps.transform_in_slices(got_core, jnp.asarray(x), 16))
    assert float(got_out.std()) == pytest.approx(1.0, rel=1e-5)


# ---------------------------------------------------------------------------
# composition inner product


@pytest.mark.parametrize("nlayers", [1, 2, 3])
def test_composition_inner_product_parity(nlayers):
    rng = np.random.default_rng(20 + nlayers)
    # layer i: kernel 2, Q_i -> O_i chained
    qs = [2, 3, 2, 3][: nlayers + 1]
    epses1 = [_rand(rng, *(qs[i],) * 4, qs[i + 1]) for i in range(nlayers)]
    epses2 = [_rand(rng, *(qs[i],) * 4, qs[i + 1]) for i in range(nlayers)]
    ref = float(REF.comp.inner_product([_t(e) for e in epses1], [_t(e) for e in epses2]))
    got = float(R_comp.inner_product([jnp.asarray(e) for e in epses1], [jnp.asarray(e) for e in epses2]))
    assert got == pytest.approx(ref, rel=1e-11)


# ---------------------------------------------------------------------------
# ConvSBS


def _make_specs(positions, out_dims, bond_sizes, channels, q):
    r_spec = R_sbs.SBSSpecString(
        tuple(R_sbs.SBSSpecCore(RPos2D(h, w), o) for (h, w), o in zip(positions, out_dims)),
        tuple(bond_sizes),
        channels,
        q,
    )
    ref_spec = REF.spec.SBSSpecString(
        tuple(
            REF.spec.SBSSpecCore(REF.pos2d.Pos2D(h, w), o)
            for (h, w), o in zip(positions, out_dims)
        ),
        tuple(bond_sizes),
        channels,
        q,
    )
    return r_spec, ref_spec


def _ref_conv_sbs_module(ref_spec, cores_np):
    mod = REF.sbs.ConvSBS(ref_spec)
    assert len(mod.cores) == len(cores_np)
    for p, c in zip(mod.cores, cores_np):
        assert tuple(p.shape) == c.shape, (tuple(p.shape), c.shape)
        p.data = _t(c)
    return mod.double()


GRID_CASES = [
    # (positions, out_dims, bond_sizes, channels, q)  — raster, snake, ring, 2-channel
    ([(0, 0), (0, 1), (1, 0), (1, 1)], (1, 2, 1, 1), (1, 2, 3, 2), 1, 2),
    ([(0, 0), (0, 1), (1, 1), (1, 0)], (1, 1, 2, 1), (1, 2, 2, 3), 1, 2),
    ([(0, 0), (0, 1), (1, 0), (1, 1)], (1, 1, 1, 2), (2, 2, 2, 2), 1, 2),
    ([(0, 0), (0, 1), (1, 1), (1, 0)], (1, 2, 1, 1), (1, 3, 2, 2), 2, 2),
]


@pytest.mark.parametrize("case", GRID_CASES)
def test_conv_sbs_forward_parity(case):
    positions, out_dims, bond_sizes, channels, q = case
    rng = np.random.default_rng(hash(str(case)) % 2**32)
    r_spec, ref_spec = _make_specs(positions, out_dims, bond_sizes, channels, q)
    cores = [_rand(rng, *s.as_tuple()) for s in r_spec.shapes]
    x = _rand(rng, channels, 2, 4, 4, q)

    mod = _ref_conv_sbs_module(ref_spec, [c for c in cores])
    ref_out = _np(mod(_t(x)))
    got = np.asarray(R_sbs.conv_sbs(r_spec, [jnp.asarray(c) for c in cores], jnp.asarray(x)))
    assert got.shape == ref_out.shape
    np.testing.assert_allclose(got, ref_out, rtol=1e-11, atol=1e-11)


def test_conv_sbs_grad_parity():
    positions, out_dims, bond_sizes, channels, q = GRID_CASES[0]
    rng = np.random.default_rng(33)
    r_spec, ref_spec = _make_specs(positions, out_dims, bond_sizes, channels, q)
    cores = [_rand(rng, *s.as_tuple()) for s in r_spec.shapes]
    x = _rand(rng, channels, 2, 4, 4, q)

    mod = _ref_conv_sbs_module(ref_spec, cores)
    tx = _t(x, True)
    out = mod(tx)
    cot = _rand(rng, *out.shape)
    (out * _t(cot)).sum().backward()
    ref_core_grads = [_np(p.grad) for p in mod.cores]

    def loss(cs, xi):
        return jnp.sum(R_sbs.conv_sbs(r_spec, cs, xi) * jnp.asarray(cot))

    gc, gx = jax.grad(loss, argnums=(0, 1))(
        [jnp.asarray(c) for c in cores], jnp.asarray(x)
    )
    for got_g, ref_g in zip(gc, ref_core_grads):
        np.testing.assert_allclose(np.asarray(got_g), ref_g, rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(gx), _np(tx.grad), rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("case", GRID_CASES[:2])
def test_conv_sbs_tt_algebra_parity(case):
    positions, out_dims, bond_sizes, channels, q = case
    rng = np.random.default_rng(hash(str(case)) % 2**31)
    r_spec, ref_spec = _make_specs(positions, out_dims, bond_sizes, channels, q)
    cores = [_rand(rng, *s.as_tuple()) for s in r_spec.shapes]
    mod = _ref_conv_sbs_module(ref_spec, cores)
    jcores = [jnp.asarray(c) for c in cores]

    assert float(R_sbs.tt_sum(r_spec, jcores)) == pytest.approx(float(mod.sum()), rel=1e-11)
    assert float(R_sbs.tt_mean(r_spec, jcores)) == pytest.approx(float(mod.mean()), rel=1e-11)
    assert float(R_sbs.tt_squared_fro_norm(r_spec, jcores)) == pytest.approx(
        float(mod.squared_fro_norm()), rel=1e-11
    )
    assert float(R_sbs.tt_var(r_spec, jcores)) == pytest.approx(float(mod.var()), rel=1e-11)

    dense_ref = _np(mod.as_explicit_tensor())
    dense_got = np.asarray(R_sbs.as_explicit_tensor(r_spec, jcores))
    np.testing.assert_allclose(dense_got, dense_ref, rtol=1e-11, atol=1e-11)


@pytest.mark.parametrize("case", GRID_CASES[:2])
def test_conv_sbs_as_eps_parity(case):
    positions, out_dims, bond_sizes, channels, q = case
    rng = np.random.default_rng(hash(str(case)) % 2**30)
    r_spec, ref_spec = _make_specs(positions, out_dims, bond_sizes, channels, q)
    cores = [_rand(rng, *s.as_tuple()) for s in r_spec.shapes]
    mod = _ref_conv_sbs_module(ref_spec, cores)
    ref_eps_core = _np(mod.as_eps())
    got_eps_core = np.asarray(R_sbs.as_eps(r_spec, [jnp.asarray(c) for c in cores]))
    assert got_eps_core.shape == ref_eps_core.shape
    np.testing.assert_allclose(got_eps_core, ref_eps_core, rtol=1e-11, atol=1e-11)


# ---------------------------------------------------------------------------
# legacy DCTNMnistModel (mnist.py) — model-level parity


class _Anything:
    """Permissive stand-in: acts as a decorator factory / decorator / any
    attribute, so the reference's CLI/trainer glue imports resolve without
    the real packages."""

    def __call__(self, *a, **k):
        if len(a) == 1 and callable(a[0]) and not k:
            return a[0]
        return self

    def __getattr__(self, name):
        return self


_ANY = _Anything()


def _import_reference_mnist():
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
        "ignite",
        "ignite.engine",
        "ignite.metrics",
        "ignite.handlers",
        "ignite.contrib",
        "ignite.contrib.handlers",
        "ignite.contrib.handlers.param_scheduler",
        "ignite.contrib.handlers.tensorboard_logger",
    ):
        # upgrade stubs _import_reference may have created with a fixed attr
        # set: any missing attribute resolves to the permissive stand-in —
        # EXCEPT dunders (__file__/__spec__/…), which introspection (e.g.
        # torch's lazy-import frame walking) must see as genuinely absent
        mod = _stub_module(name)
        mod.__getattr__ = lambda attr: (
            (_ for _ in ()).throw(AttributeError(attr))
            if attr.startswith("__") and attr.endswith("__")
            else _ANY
        )
    import mnist as ref_mnist  # /root/reference/mnist.py (read-only)

    return ref_mnist


def test_legacy_model_forward_and_grad_parity():
    """Our conv_sbs_model vs the reference's DCTNMnistModel with identical
    cores: quantum map, snake strings, layer chaining, spatial-mean logits
    (mnist.py:169-263), forward AND core gradients, float64."""
    ref_mnist = _import_reference_mnist()
    from dctn_tpu.models.conv_sbs_model import (
        ConvSBSModelConfig,
        init_conv_sbs_model,
        conv_sbs_model_forward,
    )

    cfg = ConvSBSModelConfig(
        num_sbs_layers=2, bond_dim_size=2, cos_sin_squared=True,
        input_multiplier=1.3,
    )
    params = init_conv_sbs_model(jax.random.PRNGKey(3), cfg, dtype=jnp.float64)
    mod = ref_mnist.DCTNMnistModel(
        num_sbs_layers=2,
        bond_dim_size=2,
        trace_edge=False,
        initialization=REF.sbs.DumbNormalInitialization(0.5),
        cos_sin_squared=True,
        input_multiplier=1.3,
    ).double()
    for layer, many in zip(params, mod.conv_sbses):
        for cores, string in zip(layer, many.strings):
            for c, p in zip(cores, string.cores):
                assert tuple(p.shape) == c.shape
                p.data = _t(np.asarray(c))

    rng = np.random.default_rng(90)
    x = rng.uniform(0.0, 1.0, (3, 7, 7))
    ref_out = mod(_t(x[:, None]))  # reference takes (B, 1, H, W)
    got = conv_sbs_model_forward(params, cfg, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), _np(ref_out), rtol=1e-11, atol=1e-12)

    # core gradients of a CE loss
    y = np.array([1, 5, 9])
    lp = torch.log_softmax(ref_out, dim=1)
    (-lp[np.arange(3), y].mean()).backward()
    ref_grads = [
        _np(p.grad)
        for many in mod.conv_sbses
        for string in many.strings
        for p in string.cores
    ]

    def loss(ps):
        logits = conv_sbs_model_forward(ps, cfg, jnp.asarray(x))
        lpj = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(lpj, jnp.asarray(y)[:, None], 1))

    got_grads = [
        np.asarray(g)
        for layer in jax.grad(loss)(params)
        for cores in layer
        for g in cores
    ]
    assert len(got_grads) == len(ref_grads)
    for a, b in zip(got_grads, ref_grads):
        np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-12)


def test_legacy_helpers_parity():
    """batch_to_quantum and calc_std_of_coordinates_of_windows
    (mnist.py:130-166) on identical pixel batches."""
    ref_mnist = _import_reference_mnist()
    from dctn_tpu.models.conv_sbs_model import (
        batch_to_quantum,
        calc_std_of_coordinates_of_windows,
    )

    rng = np.random.default_rng(91)
    x = rng.uniform(0.0, 1.0, (4, 6, 6))
    for squared, mult in ((False, 1.0), (True, 0.7)):
        ref_q = _np(ref_mnist.batch_to_quantum(_t(x[:, None]), squared, mult))
        got_q = np.asarray(batch_to_quantum(jnp.asarray(x), squared, mult))
        # ours is channel-leading (1, B, H, W, 2); reference is (B, H, W, 2)
        np.testing.assert_allclose(got_q[0], ref_q, rtol=1e-12)
        ref_std = float(
            ref_mnist.calc_std_of_coordinates_of_windows(
                _t(x[:, None]), 3, squared, mult
            )
        )
        got_std = float(
            calc_std_of_coordinates_of_windows(jnp.asarray(x), 3, squared, mult)
        )
        assert got_std == pytest.approx(ref_std, rel=1e-10)


def test_legacy_scale_layers_parity():
    """Data-dependent layer rescaling (mnist.py:265-284) produces the same
    scaled cores as scale_layers_using_batch. Float32: the reference's own
    internal assert (`torch.allclose(tensor.std(), torch.tensor(1.0))`,
    mnist.py:282) type-errors on a double model, so f64 is not runnable."""
    ref_mnist = _import_reference_mnist()
    from dctn_tpu.models.conv_sbs_model import (
        ConvSBSModelConfig,
        init_conv_sbs_model,
        scale_layers_using_batch,
    )

    cfg = ConvSBSModelConfig(num_sbs_layers=2, bond_dim_size=2)
    params = init_conv_sbs_model(jax.random.PRNGKey(4), cfg, dtype=jnp.float32)
    mod = ref_mnist.DCTNMnistModel(
        num_sbs_layers=2, bond_dim_size=2, trace_edge=False,
        initialization=REF.sbs.DumbNormalInitialization(0.5),
        cos_sin_squared=False, input_multiplier=1.0,
    )
    for layer, many in zip(params, mod.conv_sbses):
        for cores, string in zip(layer, many.strings):
            for c, p in zip(cores, string.cores):
                p.data = torch.from_numpy(np.asarray(c)).clone()

    rng = np.random.default_rng(92)
    x = rng.uniform(0.0, 1.0, (8, 7, 7)).astype(np.float32)
    mod.scale_layers_using_batch(torch.from_numpy(x[:, None]))
    scaled = scale_layers_using_batch(params, cfg, jnp.asarray(x))
    for layer, many in zip(scaled, mod.conv_sbses):
        for cores, string in zip(layer, many.strings):
            for c, p in zip(cores, string.cores):
                np.testing.assert_allclose(
                    np.asarray(c), _np(p), rtol=2e-4, atol=1e-6
                )


# ---------------------------------------------------------------------------
# logmatmulexp


def test_logmatmulexp_parity():
    rng = np.random.default_rng(40)
    la = _rand(rng, 5, 7) * 4.0
    lb = _rand(rng, 7, 6) * 4.0
    cot = _rand(rng, 5, 6)

    ta, tb = _t(la, True), _t(lb, True)
    ref_out = REF.lmme.logmatmulexp(ta, tb)
    (ref_out * _t(cot)).sum().backward()

    def loss(a, b):
        return jnp.sum(R_lmme.logmatmulexp(a, b) * jnp.asarray(cot))

    got_out = np.asarray(R_lmme.logmatmulexp(jnp.asarray(la), jnp.asarray(lb)))
    np.testing.assert_allclose(got_out, _np(ref_out), rtol=1e-12, atol=1e-12)
    ga, gb = jax.grad(loss, argnums=(0, 1))(jnp.asarray(la), jnp.asarray(lb))
    np.testing.assert_allclose(np.asarray(ga), _np(ta.grad), rtol=1e-11, atol=1e-11)
    np.testing.assert_allclose(np.asarray(gb), _np(tb.grad), rtol=1e-11, atol=1e-11)


# ---------------------------------------------------------------------------
# data pipeline: ν and φ


def test_calc_scaling_factor_parity():
    rng = np.random.default_rng(50)
    # φ-like positive inputs, (1, N, H, W, 2)
    x = rng.uniform(0.0, 2.0, (1, 64, 8, 8, 2))
    for kernel in (2, 4):
        ds = types.SimpleNamespace(x=_t(x))
        ref_nu = REF.data.calc_scaling_factor(ds, kernel, torch.device("cpu"))
        got_nu = r_calc_scaling_factor(x, kernel, subset=10880)
        assert got_nu == pytest.approx(ref_nu, rel=1e-10)


def test_phi_feature_map_parity():
    rng = np.random.default_rng(51)
    pixels = rng.uniform(0.0, 1.0, (6, 5, 5))
    got = apply_feature_map(pixels)  # (1, 6, 5, 5, 2)
    tp = _t(pixels)
    ref = torch.stack([phi_i(tp) for phi_i in REF.data.φ_cos_sin_squared_1], dim=3).unsqueeze(0)
    np.testing.assert_allclose(got, _np(ref), rtol=1e-12, atol=1e-12)


# ---------------------------------------------------------------------------
# end-to-end training-trajectory parity
#
# The strongest available substitute for the (data-blocked) accuracy-parity
# runs: train this repo's jitted step and the reference's op stack (torch
# autograd + torch.optim.SGD) from IDENTICAL initial parameters on IDENTICAL
# synthetic batches, float64, and require the loss trajectory and the final
# parameters to agree to near machine precision. Exercises: forward
# (eps × 2 layers + linear), CE loss, the epses_composition regularizer
# (inner_product recursion), backward, and the optimizer update — the whole
# training-math stack end to end.


def test_training_trajectory_parity_sgd():
    import torch.nn.functional as F

    rng = np.random.default_rng(77)
    n, hw, q0 = 24, 6, 2
    specs = ((2, 3), (2, 4))
    lr, reg_coeff, steps, bs = 0.05, 1e-3, 12, 8

    x_all = rng.uniform(0.0, 1.5, (1, n, hw, hw, q0))
    y_all = rng.integers(0, 10, n)
    e1 = 0.3 * _rand(rng, *(q0,) * 4, 3)
    e2 = 0.3 * _rand(rng, *(3,) * 4, 4)
    hp = hw - 2 + 1 - 2 + 1  # 4
    w0 = 0.1 * _rand(rng, hp * hp * 4, 10)
    b0 = 0.1 * _rand(rng, 10)

    # --- this repo: the real jitted train step in f64
    from dctn_tpu.models import EPSesPlusLinearConfig
    from dctn_tpu.train import make_optimizer, make_train_step

    cfg = EPSesPlusLinearConfig(
        epses_specs=specs, image_size=hw, q0=q0, dtype=jnp.float64
    )
    params = {
        "epses": (jnp.asarray(e1), jnp.asarray(e2)),
        "linear": {"w": jnp.asarray(w0), "b": jnp.asarray(b0)},
    }
    opt = make_optimizer("sgd", lr)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt, "epses_composition", reg_coeff, donate=False)
    xj, yj = jnp.asarray(x_all), jnp.asarray(y_all)
    jax_losses = []
    key = jax.random.PRNGKey(0)
    for it in range(steps):
        idx = jnp.asarray((np.arange(bs) + it * bs) % n)
        xb = jnp.take(xj, idx, axis=1)
        yb = jnp.take(yj, idx, axis=0)
        params, opt_state, metrics = step(params, opt_state, key, xb, yb)
        jax_losses.append(float(metrics["loss"]))

    # --- reference op stack: torch autograd + torch.optim.SGD
    te1, te2, tw, tb = _t(e1, True), _t(e2, True), _t(w0, True), _t(b0, True)
    optim = torch.optim.SGD([te1, te2, tw, tb], lr=lr)
    tx, ty = _t(x_all), torch.from_numpy(np.asarray(y_all))
    ref_losses = []
    for it in range(steps):
        idx = torch.from_numpy(((np.arange(bs) + it * bs) % n))
        xb = tx[:, idx]
        yb = ty[idx]
        h = REF.eps.eps(te1, xb)
        h = REF.eps.eps(te2, h.unsqueeze(0))
        logits = h.reshape(bs, -1) @ tw + tb
        ce = F.cross_entropy(logits, yb)
        reg = REF.comp.inner_product((te1, te2), (te1, te2)) + (tw**2).sum()
        loss = ce + reg_coeff * reg
        optim.zero_grad()
        loss.backward()
        optim.step()
        ref_losses.append(float(loss.detach()))

    np.testing.assert_allclose(jax_losses, ref_losses, rtol=1e-9)
    for got, ref in (
        (params["epses"][0], te1),
        (params["epses"][1], te2),
        (params["linear"]["w"], tw),
        (params["linear"]["b"], tb),
    ):
        np.testing.assert_allclose(
            np.asarray(got), _np(ref), rtol=1e-9, atol=1e-11
        )


# ---------------------------------------------------------------------------
# rank-one batch statistics


@pytest.mark.parametrize("dims", [(0, 3), (1, 2)])
def test_rank_one_stats_parity(dims):
    factors_dim, coordinates_dim = dims
    rng = np.random.default_rng(60 + factors_dim)
    arr = _rand(rng, 3, 4, 5, 2)
    ref = REF.r1t.RankOneTensorsBatch(_t(arr), factors_dim, coordinates_dim)
    got = RRankOne(jnp.asarray(arr), factors_dim, coordinates_dim)

    np.testing.assert_allclose(
        np.asarray(got.sum_per_tensor()), _np(ref.sum_per_tensor()), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(got.mean_per_tensor()), _np(ref.mean_per_tensor()), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(got.squared_fro_norm_per_tensor()),
        _np(ref.squared_fro_norm_per_tensor()),
        rtol=1e-12,
    )
    for unbiased in (True, False):
        assert float(got.var_over_batch(unbiased)) == pytest.approx(
            float(ref.var_over_batch(unbiased)), rel=1e-11
        )
    # reference quirk: ref std_over_batch ignores its `unbiased` argument
    # (rank_one_tensor.py:107-110 calls var_over_batch() with the default);
    # this repo respects the flag, so only the default case is comparable.
    assert float(got.std_over_batch(True)) == pytest.approx(
        float(ref.std_over_batch(True)), rel=1e-11
    )
    assert float(got.std_over_batch(False)) == pytest.approx(
        float(got.var_over_batch(False)) ** 0.5, rel=1e-11
    )
    assert float(got.mean_over_batch()) == pytest.approx(float(ref.mean_over_batch()), rel=1e-12)
    assert float(got.sum_over_batch()) == pytest.approx(float(ref.sum_over_batch()), rel=1e-12)


# ---------------------------------------------------------------------------
# r3 trajectory-parity widening (VERDICT r2 next-round #4): the exact
# optimizer/init stack behind the recorded 90.25%/88.20% runs — Adam
# (new_runner.py:505-507 semantics), parameter dropout, and the
# empirical-init-in-the-loop recipe — verified end to end in f64.


def test_training_trajectory_parity_adam():
    """torch.optim.Adam (with torch-style L2-in-gradient weight decay) vs
    make_optimizer('adam', lr, wd) over 30 steps, f64: losses and final
    params to near machine precision. Every recorded reference accuracy run
    used Adam (replicate_90.19_vacc_experiment.py:7-40)."""
    import torch.nn.functional as F

    rng = np.random.default_rng(177)
    n, hw, q0 = 24, 6, 2
    specs = ((2, 3), (2, 4))
    lr, wd, reg_coeff, steps, bs = 3e-3, 1e-4, 1e-3, 30, 8

    x_all = rng.uniform(0.0, 1.5, (1, n, hw, hw, q0))
    y_all = rng.integers(0, 10, n)
    e1 = 0.3 * _rand(rng, *(q0,) * 4, 3)
    e2 = 0.3 * _rand(rng, *(3,) * 4, 4)
    hp = hw - 2 + 1 - 2 + 1  # 4
    w0 = 0.1 * _rand(rng, hp * hp * 4, 10)
    b0 = 0.1 * _rand(rng, 10)

    from dctn_tpu.models import EPSesPlusLinearConfig
    from dctn_tpu.train import make_optimizer, make_train_step

    cfg = EPSesPlusLinearConfig(
        epses_specs=specs, image_size=hw, q0=q0, dtype=jnp.float64
    )
    params = {
        "epses": (jnp.asarray(e1), jnp.asarray(e2)),
        "linear": {"w": jnp.asarray(w0), "b": jnp.asarray(b0)},
    }
    opt = make_optimizer("adam", lr, wd)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt, "epses_composition", reg_coeff, donate=False)
    xj, yj = jnp.asarray(x_all), jnp.asarray(y_all)
    jax_losses = []
    key = jax.random.PRNGKey(0)
    for it in range(steps):
        idx = jnp.asarray((np.arange(bs) + it * bs) % n)
        params, opt_state, metrics = step(
            params, opt_state, key, jnp.take(xj, idx, axis=1), jnp.take(yj, idx)
        )
        jax_losses.append(float(metrics["loss"]))

    te1, te2, tw, tb = _t(e1, True), _t(e2, True), _t(w0, True), _t(b0, True)
    optim = torch.optim.Adam([te1, te2, tw, tb], lr=lr, weight_decay=wd)
    tx, ty = _t(x_all), torch.from_numpy(np.asarray(y_all))
    ref_losses = []
    for it in range(steps):
        idx = torch.from_numpy(((np.arange(bs) + it * bs) % n))
        h = REF.eps.eps(te1, tx[:, idx])
        h = REF.eps.eps(te2, h.unsqueeze(0))
        logits = h.reshape(bs, -1) @ tw + tb
        ce = F.cross_entropy(logits, ty[idx])
        reg = REF.comp.inner_product((te1, te2), (te1, te2)) + (tw**2).sum()
        loss = ce + reg_coeff * reg
        optim.zero_grad()
        loss.backward()
        optim.step()
        ref_losses.append(float(loss.detach()))

    np.testing.assert_allclose(jax_losses, ref_losses, rtol=1e-9)
    for got, ref in (
        (params["epses"][0], te1),
        (params["epses"][1], te2),
        (params["linear"]["w"], tw),
        (params["linear"]["b"], tb),
    ):
        np.testing.assert_allclose(np.asarray(got), _np(ref), rtol=1e-8, atol=1e-10)


def test_training_trajectory_parity_adam_dropout():
    """Parameter dropout in the loop: our step draws its masks internally
    (the _dropout_epses key chain); the SAME masks are exported and injected
    into the reference op stack (mask·core/p, eps_plus_linear.py:138-147
    semantics), so the dropout trajectories must agree exactly."""
    import torch.nn.functional as F

    rng = np.random.default_rng(178)
    n, hw, q0 = 24, 6, 2
    specs = ((2, 3), (2, 4))
    p_keep = 0.7
    lr, reg_coeff, steps, bs = 3e-3, 1e-3, 12, 8

    x_all = rng.uniform(0.0, 1.5, (1, n, hw, hw, q0))
    y_all = rng.integers(0, 10, n)
    e1 = 0.3 * _rand(rng, *(q0,) * 4, 3)
    e2 = 0.3 * _rand(rng, *(3,) * 4, 4)
    hp = 4
    w0 = 0.1 * _rand(rng, hp * hp * 4, 10)
    b0 = 0.1 * _rand(rng, 10)

    from dctn_tpu.models import EPSesPlusLinearConfig
    from dctn_tpu.train import make_optimizer, make_train_step

    cfg = EPSesPlusLinearConfig(
        epses_specs=specs, image_size=hw, q0=q0, dtype=jnp.float64,
        dropout_p=p_keep,
    )
    params = {
        "epses": (jnp.asarray(e1), jnp.asarray(e2)),
        "linear": {"w": jnp.asarray(w0), "b": jnp.asarray(b0)},
    }
    opt = make_optimizer("adam", lr)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt, "epses_composition", reg_coeff, donate=False)
    xj, yj = jnp.asarray(x_all), jnp.asarray(y_all)
    base = jax.random.PRNGKey(42)
    jax_losses, masks_per_step = [], []
    for it in range(steps):
        rng_it = jax.random.fold_in(base, it)
        # export the masks our step will draw internally (same key math as
        # models.eps_plus_linear._dropout_epses)
        k1, k2 = jax.random.split(rng_it, 2)
        masks_per_step.append((
            np.asarray(jax.random.bernoulli(k1, p_keep, e1.shape), np.float64),
            np.asarray(jax.random.bernoulli(k2, p_keep, e2.shape), np.float64),
        ))
        idx = jnp.asarray((np.arange(bs) + it * bs) % n)
        params, opt_state, metrics = step(
            params, opt_state, rng_it, jnp.take(xj, idx, axis=1), jnp.take(yj, idx)
        )
        jax_losses.append(float(metrics["loss"]))

    te1, te2, tw, tb = _t(e1, True), _t(e2, True), _t(w0, True), _t(b0, True)
    optim = torch.optim.Adam([te1, te2, tw, tb], lr=lr)
    tx, ty = _t(x_all), torch.from_numpy(np.asarray(y_all))
    ref_losses = []
    for it in range(steps):
        m1, m2 = masks_per_step[it]
        idx = torch.from_numpy(((np.arange(bs) + it * bs) % n))
        e1d = _t(m1) * te1 / p_keep
        e2d = _t(m2) * te2 / p_keep
        h = REF.eps.eps(e1d, tx[:, idx])
        h = REF.eps.eps(e2d, h.unsqueeze(0))
        logits = h.reshape(bs, -1) @ tw + tb
        ce = F.cross_entropy(logits, ty[idx])
        # regularizer on the RAW (unmasked) params, like the training loop
        reg = REF.comp.inner_product((te1, te2), (te1, te2)) + (tw**2).sum()
        loss = ce + reg_coeff * reg
        optim.zero_grad()
        loss.backward()
        optim.step()
        ref_losses.append(float(loss.detach()))

    np.testing.assert_allclose(jax_losses, ref_losses, rtol=1e-9)
    for got, ref in (
        (params["epses"][0], te1),
        (params["epses"][1], te2),
        (params["linear"]["w"], tw),
        (params["linear"]["b"], tb),
    ):
        np.testing.assert_allclose(np.asarray(got), _np(ref), rtol=1e-8, atol=1e-10)


def test_empirical_init_in_the_loop_trajectory_parity(monkeypatch):
    """The full recorded-run recipe: empirical-unit-output-std init on the
    SAME subset (base random cores injected identically into both stacks),
    then Adam training — init'd cores AND the training trajectory match.
    Reference: epses_composition.py:91-105 + replicate_90.19 run config."""
    import torch.nn.functional as F

    rng = np.random.default_rng(179)
    n, hw, q0 = 24, 6, 2
    specs = ((2, 3), (2, 4))
    lr, reg_coeff, steps, bs = 3e-3, 1e-3, 8, 8

    x_all = rng.uniform(0.0, 1.5, (1, n, hw, hw, q0))
    base_cores = [
        _rand(rng, *(q0,) * 4, 3),
        _rand(rng, *(3,) * 4, 4),
    ]
    y_all = rng.integers(0, 10, n)
    hp = 4
    w0 = 0.1 * _rand(rng, hp * hp * 4, 10)
    b0 = 0.1 * _rand(rng, 10)

    # inject the SAME base cores into both init stacks
    jax_pool = [jnp.asarray(c) for c in base_cores]
    real_normal = jax.random.normal

    def fake_normal(key, shape=(), dtype=float):
        for i, c in enumerate(jax_pool):
            if tuple(c.shape) == tuple(shape):
                return jax_pool.pop(i).astype(dtype)
        return real_normal(key, shape, dtype)

    monkeypatch.setattr(jax.random, "normal", fake_normal)
    from dctn_tpu.ops import composition as R_comp_live

    got_epses = R_comp_live.make_unit_empirical_output_std(
        jax.random.PRNGKey(0), specs, jnp.asarray(x_all), jnp.float64, 8
    )
    monkeypatch.setattr(jax.random, "normal", real_normal)

    torch_pool = [_t(c) for c in base_cores]
    real_randn = torch.randn

    def fake_randn(*shape, **kw):
        for i, c in enumerate(torch_pool):
            if tuple(c.shape) == tuple(shape):
                return torch_pool.pop(i).clone()
        return real_randn(*shape, **kw)

    monkeypatch.setattr(torch, "randn", fake_randn)
    ref_epses = REF.comp.make_epses_composition_unit_empirical_output_std(
        specs, _t(x_all), torch.device("cpu"), torch.float64, batch_size=8
    )
    monkeypatch.setattr(torch, "randn", real_randn)
    assert not jax_pool and not torch_pool  # both inits consumed both cores

    for got, ref in zip(got_epses, ref_epses):
        np.testing.assert_allclose(np.asarray(got), _np(ref), rtol=1e-9)

    # train both from the empirical init
    from dctn_tpu.models import EPSesPlusLinearConfig
    from dctn_tpu.train import make_optimizer, make_train_step

    cfg = EPSesPlusLinearConfig(
        epses_specs=specs, image_size=hw, q0=q0, dtype=jnp.float64
    )
    params = {
        "epses": tuple(got_epses),
        "linear": {"w": jnp.asarray(w0), "b": jnp.asarray(b0)},
    }
    opt = make_optimizer("adam", lr)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt, "epses_composition", reg_coeff, donate=False)
    xj, yj = jnp.asarray(x_all), jnp.asarray(y_all)
    key = jax.random.PRNGKey(0)
    jax_losses = []
    for it in range(steps):
        idx = jnp.asarray((np.arange(bs) + it * bs) % n)
        params, opt_state, metrics = step(
            params, opt_state, key, jnp.take(xj, idx, axis=1), jnp.take(yj, idx)
        )
        jax_losses.append(float(metrics["loss"]))

    te1 = ref_epses[0].clone().requires_grad_(True)
    te2 = ref_epses[1].clone().requires_grad_(True)
    tw, tb = _t(w0, True), _t(b0, True)
    optim = torch.optim.Adam([te1, te2, tw, tb], lr=lr)
    tx, ty = _t(x_all), torch.from_numpy(np.asarray(y_all))
    ref_losses = []
    for it in range(steps):
        idx = torch.from_numpy(((np.arange(bs) + it * bs) % n))
        h = REF.eps.eps(te1, tx[:, idx])
        h = REF.eps.eps(te2, h.unsqueeze(0))
        logits = h.reshape(bs, -1) @ tw + tb
        ce = F.cross_entropy(logits, ty[idx])
        reg = REF.comp.inner_product((te1, te2), (te1, te2)) + (tw**2).sum()
        loss = ce + reg_coeff * reg
        optim.zero_grad()
        loss.backward()
        optim.step()
        ref_losses.append(float(loss.detach()))

    np.testing.assert_allclose(jax_losses, ref_losses, rtol=1e-8)
    for got, ref in (
        (params["epses"][0], te1),
        (params["epses"][1], te2),
    ):
        np.testing.assert_allclose(np.asarray(got), _np(ref), rtol=1e-7, atol=1e-9)


@pytest.mark.parametrize(
    "opt_kind,opt_kw",
    [
        ("sgd", dict(momentum=0.9, weight_decay=1e-2)),
        ("rmsprop", dict(momentum=0.9, rmsprop_alpha=0.95, weight_decay=1e-2)),
        ("rmsprop", dict(momentum=0.0, rmsprop_alpha=0.99, weight_decay=0.0)),
    ],
)
def test_legacy_optimizer_trajectory_parity(opt_kind, opt_kw):
    """The legacy family's FULL optimizer stack over a multi-epoch
    trajectory: torch.optim.SGD/RMSprop with momentum + weight_decay + the
    exponential epoch warmup (mnist.py:464-499) vs ``make_legacy_optimizer``
    + ``make_warmup_lr_schedule`` driving the real ConvSBS model, float64.

    Pins the torch semantics the factory replicates: RMSprop's eps OUTSIDE
    the sqrt, momentum applied to the rms-SCALED step, weight_decay folded
    into the raw gradient before moment accumulation, and the epoch-indexed
    lr multiplier m^((W-e)/W)."""
    import optax

    ref_mnist = _import_reference_mnist()
    from dctn_tpu.models.conv_sbs_model import (
        ConvSBSModelConfig,
        init_conv_sbs_model,
        conv_sbs_model_forward,
        make_warmup_lr_schedule,
        make_legacy_optimizer,
    )

    cfg = ConvSBSModelConfig(
        num_sbs_layers=2, bond_dim_size=2, cos_sin_squared=False,
        input_multiplier=1.0,
    )
    params0 = init_conv_sbs_model(jax.random.PRNGKey(7), cfg, dtype=jnp.float64)

    base_lr, warmup_epochs = 3e-3, 2
    steps_per_epoch, n_epochs, bs = 3, 4, 4
    rng = np.random.default_rng(92)
    x_all = rng.uniform(0.0, 1.0, (steps_per_epoch * n_epochs, bs, 7, 7))
    y_all = rng.integers(0, 10, (steps_per_epoch * n_epochs, bs))

    # --- ours: the runner's exact stack ---
    schedule = make_warmup_lr_schedule(
        base_lr, warmup_epochs, steps_per_epoch, 1e-2
    )
    opt = make_legacy_optimizer(opt_kind, schedule, **opt_kw)
    params = params0
    opt_state = opt.init(params)

    @jax.jit
    def step(p, o, xb, yb):
        def loss_fn(pp):
            logits = conv_sbs_model_forward(pp, cfg, xb)
            lp = jax.nn.log_softmax(logits)
            return -jnp.mean(jnp.take_along_axis(lp, yb[:, None], axis=1))

        grads = jax.grad(loss_fn)(p)
        updates, o = opt.update(grads, o, p)
        return optax.apply_updates(p, updates), o

    for it in range(steps_per_epoch * n_epochs):
        params, opt_state = step(
            params, opt_state, jnp.asarray(x_all[it]), jnp.asarray(y_all[it])
        )

    # --- reference: torch model + torch optimizer + epoch-start lr set ---
    mod = ref_mnist.DCTNMnistModel(
        num_sbs_layers=2,
        bond_dim_size=2,
        trace_edge=False,
        initialization=REF.sbs.DumbNormalInitialization(0.5),
        cos_sin_squared=False,
        input_multiplier=1.0,
    ).double()
    for layer, many in zip(params0, mod.conv_sbses):
        for cores, string in zip(layer, many.strings):
            for c, p in zip(cores, string.cores):
                p.data = _t(np.asarray(c))
    if opt_kind == "sgd":
        optim = torch.optim.SGD(
            mod.parameters(), lr=base_lr, momentum=opt_kw["momentum"],
            weight_decay=opt_kw["weight_decay"],
        )
    else:
        optim = torch.optim.RMSprop(
            mod.parameters(), lr=base_lr, momentum=opt_kw["momentum"],
            alpha=opt_kw["rmsprop_alpha"], weight_decay=opt_kw["weight_decay"],
        )
    for it in range(steps_per_epoch * n_epochs):
        epoch = it // steps_per_epoch
        frac = max(0.0, min(1.0, (warmup_epochs - epoch) / warmup_epochs))
        for g in optim.param_groups:
            g["lr"] = base_lr * 1e-2**frac
        logits = mod(_t(x_all[it][:, None]))
        ce = torch.nn.functional.cross_entropy(
            logits, torch.from_numpy(np.asarray(y_all[it]))
        )
        optim.zero_grad()
        ce.backward()
        optim.step()

    got = [
        np.asarray(c)
        for layer in params
        for cores in layer
        for c in cores
    ]
    ref = [
        _np(p)
        for many in mod.conv_sbses
        for string in many.strings
        for p in string.cores
    ]
    assert len(got) == len(ref)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(a, b, rtol=1e-8, atol=1e-11)
