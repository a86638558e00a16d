"""Torch-checkpoint interop: migrate reference users' ``.pt`` state_dicts.

The reference persists models as ``torch.save(model.state_dict())``
(dctn/training.py:120-121) and reloads them via ``load_state_dict``
(new_runner.py:432-433, mnist.py:455-456). These tests prove, against the
ACTUAL reference modules:

- a reference ``.pt`` converts to our params with FORWARD parity in f64
  (the linear weight transposes: torch (out,in) vs our (in,out)),
- the reverse conversion loads back into the reference module with
  ``strict=True`` and reproduces the original forward bitwise,
- both runners accept ``.pt`` files directly (--load-model-state /
  --init-load-file), and
- the ``torch_convert`` CLI moves checkpoints both ways.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from test_reference_parity import REF, _import_reference_mnist, _np  # noqa: E402

from dctn_tpu.interop import (  # noqa: E402
    is_torch_checkpoint,
    load_torch_state_dict,
    eps_plus_linear_params_from_state_dict,
    state_dict_from_eps_plus_linear_params,
    conv_sbs_params_from_state_dict,
    state_dict_from_conv_sbs_params,
)


def _make_reference_epl(image_size=6, specs=((2, 3), (2, 4)), seed=0):
    import dctn.eps_plus_linear as epl

    torch.manual_seed(seed)
    return epl.EPSesPlusLinear(
        epses_specs=specs,
        initialization=epl.UnitTheoreticalOutputStd(),
        p=1.0,
        device=torch.device("cpu"),
        dtype=torch.float64,
        image_size=image_size,
        Q_0=2,
    )


def test_eps_plus_linear_pt_to_params_forward_parity(tmp_path):
    """A reference-saved ``.pt`` converts to our params; our forward on them
    matches the reference module's forward in f64."""
    from dctn_tpu.models import EPSesPlusLinearConfig
    from dctn_tpu.models.eps_plus_linear import eps_plus_linear_forward

    hw, specs = 6, ((2, 3), (2, 4))
    m = _make_reference_epl(hw, specs).eval()
    pt = str(tmp_path / "model.pt")
    torch.save(m.state_dict(), pt)

    assert is_torch_checkpoint(pt)
    params = eps_plus_linear_params_from_state_dict(load_torch_state_dict(pt))
    assert params["linear"]["w"].shape == (
        m.linear.in_features,
        m.linear.out_features,
    )

    rng = np.random.default_rng(3)
    x = rng.uniform(0.0, 1.5, (1, 5, hw, hw, 2))
    ref_out = m(torch.from_numpy(x))
    cfg = EPSesPlusLinearConfig(
        epses_specs=specs, image_size=hw, q0=2, dtype=jnp.float64
    )
    got = eps_plus_linear_forward(params, jnp.asarray(x), cfg)
    np.testing.assert_allclose(np.asarray(got), _np(ref_out), rtol=1e-12, atol=1e-14)


def test_eps_plus_linear_roundtrip_strict_load(tmp_path):
    """params → state_dict loads into a FRESH reference module with
    strict=True and reproduces the original module's forward bitwise."""
    hw, specs = 6, ((2, 3), (2, 4))
    m = _make_reference_epl(hw, specs, seed=1).eval()
    params = eps_plus_linear_params_from_state_dict(
        {k: v.numpy() for k, v in m.state_dict().items()}
    )
    sd = state_dict_from_eps_plus_linear_params(params)
    m2 = _make_reference_epl(hw, specs, seed=2).eval()  # different init
    m2.load_state_dict(sd, strict=True)
    x = torch.from_numpy(np.random.default_rng(5).uniform(0, 1, (1, 4, hw, hw, 2)))
    np.testing.assert_array_equal(_np(m(x)), _np(m2(x)))


def test_conv_sbs_pt_roundtrip_forward_parity(tmp_path):
    """DCTNMnistModel ``.pt`` → our legacy params (forward parity on the φ'd
    input) → back into a fresh reference model, bitwise."""
    ref_mnist = _import_reference_mnist()
    from dctn_tpu.models.conv_sbs_model import (
        ConvSBSModelConfig,
        conv_sbs_model_forward,
    )

    torch.manual_seed(7)
    m = ref_mnist.DCTNMnistModel(
        num_sbs_layers=2,
        bond_dim_size=2,
        trace_edge=False,
        initialization=REF.sbs.DumbNormalInitialization(0.5),
        cos_sin_squared=False,
        input_multiplier=1.0,
    ).double().eval()
    pt = str(tmp_path / "mnist.pt")
    torch.save(m.state_dict(), pt)

    params = conv_sbs_params_from_state_dict(load_torch_state_dict(pt))
    cfg = ConvSBSModelConfig(
        num_sbs_layers=2, bond_dim_size=2, cos_sin_squared=False,
        input_multiplier=1.0,
    )
    rng = np.random.default_rng(11)
    x = rng.uniform(0.0, 1.0, (3, 7, 7))
    ref_out = m(torch.from_numpy(x[:, None]))
    got = conv_sbs_model_forward(params, cfg, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), _np(ref_out), rtol=1e-12, atol=1e-14)

    # reverse: back into a fresh reference model, strict + bitwise
    torch.manual_seed(8)
    m2 = ref_mnist.DCTNMnistModel(
        num_sbs_layers=2,
        bond_dim_size=2,
        trace_edge=False,
        initialization=REF.sbs.DumbNormalInitialization(0.5),
        cos_sin_squared=False,
        input_multiplier=1.0,
    ).double().eval()
    m2.load_state_dict(state_dict_from_conv_sbs_params(params), strict=True)
    np.testing.assert_array_equal(
        _np(m(torch.from_numpy(x[:, None]))), _np(m2(torch.from_numpy(x[:, None])))
    )


def test_runner_trains_from_pt(tmp_path):
    """--load-model-state accepts a reference ``.pt`` directly and the
    loaded values survive into training (new_runner.py:432-433 parity)."""
    from dctn_tpu.cli.runner import run

    specs = ((2, 3), (2, 4))
    m = _make_reference_epl(28, specs, seed=3)  # synthetic images are 28x28
    pt = str(tmp_path / "init.pt")
    torch.save(m.state_dict(), pt)

    st = run(
        experiments_dir=str(tmp_path / "exp"),
        ds_type="mnist",
        ds_path="synthetic",
        epses_specs=specs,
        batch_size=16,
        optimizer_name="adam",
        lr=1e-3,
        init_epses_composition_unit_theoretical_output_std=True,
        eval_schedule=((None, 4),),
        keep_last_models=1,
        synthetic_sizes=(64, 32, 32),
        patience=50,
        max_num_iters=4,
        load_model_state=pt,
    )
    assert st.num_iters_done == 4
    assert all(
        np.all(np.isfinite(np.asarray(x)))
        for x in jax.tree_util.tree_leaves(st.params)
    )


def test_runner_rejects_mismatched_pt(tmp_path):
    """A ``.pt`` whose architecture doesn't match the run's specs fails
    loudly, not with a silent shape accident."""
    from dctn_tpu.cli.runner import run

    m = _make_reference_epl(6, ((2, 3), (2, 4)), seed=4)  # wrong image size
    pt = str(tmp_path / "wrong.pt")
    torch.save(m.state_dict(), pt)
    with pytest.raises(ValueError, match="does not match"):
        run(
            experiments_dir=str(tmp_path / "exp"),
            ds_type="mnist",
            ds_path="synthetic",
            epses_specs=((3, 6),),  # different architecture too
            batch_size=16,
            optimizer_name="adam",
            lr=1e-3,
            init_epses_composition_unit_theoretical_output_std=True,
            eval_schedule=((None, 4),),
            keep_last_models=1,
            synthetic_sizes=(64, 32, 32),
            patience=50,
            max_num_iters=4,
            load_model_state=pt,
        )


def test_legacy_runner_inits_from_pt(tmp_path):
    """--init-load-file accepts a reference DCTNMnistModel ``.pt``
    (mnist.py:455-456 parity)."""
    ref_mnist = _import_reference_mnist()
    from dctn_tpu.cli.legacy_runner import run as legacy_run

    torch.manual_seed(9)
    m = ref_mnist.DCTNMnistModel(
        num_sbs_layers=2,
        bond_dim_size=2,
        trace_edge=False,
        initialization=REF.sbs.DumbNormalInitialization(0.5),
        cos_sin_squared=False,
        input_multiplier=1.0,
    )
    pt = str(tmp_path / "mnist_init.pt")
    torch.save(m.state_dict(), pt)

    p, _ = legacy_run(
        models_dir=str(tmp_path / "models"),
        epochs=1,
        ds_path="synthetic",
        num_sbs_layers=2,
        bond_dim_size=2,
        initialization="khrulkov-normal",
        learning_rate=1e-3,
        optimizer_type="sgd",
        batch_size=16,
        warmup_num_epochs=0,
        synthetic_sizes=(32, 32),
        seed=0,
        tb_log_every_n_epochs=0,
        init_load_file=pt,
    )
    assert all(
        np.all(np.isfinite(np.asarray(x))) for x in jax.tree_util.tree_leaves(p)
    )


def test_torch_convert_cli_both_directions(tmp_path):
    """``python -m dctn_tpu.cli.torch_convert`` converts .pt → .npz (loadable
    by load_pytree) and .npz → .pt (strict-loadable by the reference)."""
    from click.testing import CliRunner

    from dctn_tpu.cli.torch_convert import main
    from dctn_tpu.train.checkpoint import load_pytree

    m = _make_reference_epl(6, ((2, 3), (2, 4)), seed=6)
    pt = str(tmp_path / "a.pt")
    npz = str(tmp_path / "a.npz")
    pt2 = str(tmp_path / "b.pt")
    torch.save(m.state_dict(), pt)

    runner = CliRunner()
    res = runner.invoke(main, [pt, npz], catch_exceptions=False)
    assert res.exit_code == 0

    template = eps_plus_linear_params_from_state_dict(
        {k: v.numpy() for k, v in m.state_dict().items()}
    )
    loaded = load_pytree(template, npz)
    for a, b in zip(
        jax.tree_util.tree_leaves(loaded), jax.tree_util.tree_leaves(template)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    res = runner.invoke(main, [npz, pt2], catch_exceptions=False)
    assert res.exit_code == 0
    m2 = _make_reference_epl(6, ((2, 3), (2, 4)), seed=12).eval()
    m2.load_state_dict(torch.load(pt2, weights_only=True), strict=True)
    x = torch.from_numpy(np.random.default_rng(2).uniform(0, 1, (1, 3, 6, 6, 2)))
    np.testing.assert_array_equal(_np(m.eval()(x)), _np(m2(x)))
