"""Performance-fallback visibility (VERDICT r3 #6): a Pallas→XLA drop is a
~5× step-time cliff and must log one warning + reach the run's provenance
sink — never pass silently."""

import logging

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dctn_tpu.ops import eps as E
from dctn_tpu.ops import sbs as S
from dctn_tpu.utils import fallbacks


@pytest.fixture(autouse=True)
def _clean_registry():
    fallbacks.reset()
    yield
    fallbacks.reset()


def test_eps_pallas_dtype_gate_warns_and_records(rng, caplog):
    """backend="pallas" with a non-f32 core runs the XLA path — with one
    warning and a registry event (ops/eps.py VMEM/dtype gate)."""
    k1, k2 = jax.random.split(rng)
    core = jax.random.normal(k1, E.eps_shape(2, 1, 2, 3), jnp.float64)
    x = jax.random.uniform(k2, (1, 2, 5, 5, 2), jnp.float64)
    with caplog.at_level(logging.WARNING, logger="dctn_tpu.utils.fallbacks"):
        out = E.eps(core, x, backend="pallas_interpret")
    assert out.shape == (2, 4, 4, 3)
    assert any("performance fallback" in r.message for r in caplog.records)
    assert any("XLA path" in e for e in fallbacks.events())


def test_eps_xla_backend_does_not_record(rng):
    """The default XLA backend is a CHOICE, not a fallback — no event."""
    k1, k2 = jax.random.split(rng)
    core = jax.random.normal(k1, E.eps_shape(2, 1, 2, 3), jnp.float32)
    x = jax.random.uniform(k2, (1, 2, 5, 5, 2), jnp.float32)
    E.eps(core, x, backend="xla")
    assert fallbacks.events() == ()


def test_conv_sbs_out_of_scope_spec_warns_and_records(rng, caplog):
    """A pallas-requested ConvSBS string outside kernel scope (here:
    non-f32 cores) runs the XLA bond fold — with one deduplicated warning
    (two calls, one event)."""
    spec = S.SBSSpecString(
        cores=(
            S.SBSSpecCore(S.Pos2D(0, 0), 2),
            S.SBSSpecCore(S.Pos2D(0, 1), 2),
        ),
        bond_sizes=(1, 3),
        in_num_channels=1,
        in_quantum_dim_size=2,
    )
    keys = jax.random.split(rng, 3)
    cores = tuple(
        jax.random.normal(k, s.as_tuple(), jnp.float64)
        for k, s in zip(keys[:2], spec.shapes)
    )
    x = jax.random.uniform(keys[2], (1, 2, 4, 4, 2), jnp.float64)
    with caplog.at_level(logging.WARNING, logger="dctn_tpu.utils.fallbacks"):
        S.conv_sbs(spec, cores, x, backend="pallas_interpret")
        S.conv_sbs(spec, cores, x, backend="pallas_interpret")
    assert sum("ConvSBS" in e for e in fallbacks.events()) == 1
    assert any("non-f32" in e for e in fallbacks.events())


def test_sink_receives_events(tmp_path):
    """The runner's provenance sink pattern: every new distinct reason is
    appended once."""
    path = tmp_path / "run_info.txt"
    fallbacks.add_sink(
        lambda reason: open(path, "a").write(f"performance_fallback: {reason}\n")
    )
    fallbacks.record("thing A happened")
    fallbacks.record("thing A happened")
    fallbacks.record("thing B happened")
    lines = path.read_text().splitlines()
    assert lines == [
        "performance_fallback: thing A happened",
        "performance_fallback: thing B happened",
    ]
