"""Load / save the reference's torch ``state_dict`` checkpoints.

The reference persists models as raw ``state_dict()`` pickles
(``torch.save(st_x["model"].state_dict(), ...)``, dctn/training.py:120-121)
and reloads them with ``model.load_state_dict(torch.load(...))``
(new_runner.py:432-433 for EPSesPlusLinear, mnist.py:455-456 for
DCTNMnistModel). A reference user migrating here therefore holds ``.pt``
files with these key layouts:

- ``EPSesPlusLinear`` (dctn/eps_plus_linear.py:85-97):
  ``epses.{i}`` (the EPS cores, identical axis order to ours) and
  ``linear.weight`` / ``linear.bias`` — torch ``nn.Linear`` stores the
  weight as ``(out_features, in_features)`` while this repo's forward
  computes ``h @ w + b`` with ``w: (in, out)``, so the weight TRANSPOSES
  on the way through.

- ``DCTNMnistModel`` (mnist.py:224-253): ``conv_sbses.{layer}.strings.
  {string}.cores.{core}`` — TT cores, identical axis order to ours
  (``models/conv_sbs_model.py`` params are ``tuple(layers) of
  tuple(strings) of tuple(cores)``).

Both directions are pure key/axis translation — parity of the underlying
math is proven separately (tests/test_reference_parity.py); these
converters are tested by round-tripping state through the ACTUAL reference
modules (tests/test_torch_interop.py).

torch is an optional dependency of this module only (it is baked into the
training image; serving hosts that never touch ``.pt`` files don't need it).
"""

from __future__ import annotations

import re
import zipfile
from typing import Any, Dict, Mapping, Tuple

import numpy as np

__all__ = [
    "is_torch_checkpoint",
    "load_torch_state_dict",
    "eps_plus_linear_params_from_state_dict",
    "state_dict_from_eps_plus_linear_params",
    "conv_sbs_params_from_state_dict",
    "state_dict_from_conv_sbs_params",
    "load_params_from_torch_checkpoint",
]


def is_torch_checkpoint(path: str) -> bool:
    """True if ``path`` is a torch checkpoint rather than this repo's npz.

    Both formats are (usually) zip files: ``np.savez`` archives hold
    ``*.npy`` members; torch>=1.6 archives hold a ``data.pkl`` member.
    Legacy (pre-zip) torch saves are plain pickles — not zips at all —
    while our npz files always are, so non-zip resolves to torch.
    """
    try:
        with zipfile.ZipFile(path) as z:
            names = z.namelist()
    except zipfile.BadZipFile:
        return True
    if any(n.endswith("data.pkl") for n in names):
        return True
    return not any(n.endswith(".npy") for n in names)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch-saved ``state_dict`` into ``{key: np.ndarray}``.

    Accepts the raw ``state_dict`` the reference saves, and (for
    convenience) trainer checkpoints that wrap it under a ``state_dict``
    or ``model`` key.
    """
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # weights_only rejects pickles with non-tensor payloads (e.g. a
        # wrapped trainer checkpoint); retry permissively — the file is
        # user-supplied either way.
        obj = torch.load(path, map_location="cpu", weights_only=False)
    for wrapper_key in ("state_dict", "model"):
        if (
            isinstance(obj, dict)
            and wrapper_key in obj
            and isinstance(obj[wrapper_key], dict)
            and not isinstance(obj.get(wrapper_key), torch.Tensor)
        ):
            inner = obj[wrapper_key]
            if all(isinstance(v, torch.Tensor) for v in inner.values()):
                obj = inner
                break
    if not isinstance(obj, dict) or not all(
        isinstance(v, torch.Tensor) for v in obj.values()
    ):
        raise ValueError(
            f"{path} does not contain a torch state_dict "
            f"(got {type(obj).__name__})"
        )
    return {k: v.detach().cpu().numpy() for k, v in obj.items()}


def _indexed(sd: Mapping[str, np.ndarray], pattern: str) -> Dict[Tuple[int, ...], np.ndarray]:
    rx = re.compile(pattern)
    out: Dict[Tuple[int, ...], np.ndarray] = {}
    for k, v in sd.items():
        m = rx.fullmatch(k)
        if m:
            out[tuple(int(g) for g in m.groups())] = v
    return out


def eps_plus_linear_params_from_state_dict(
    sd: Mapping[str, np.ndarray], dtype: Any = None
) -> dict:
    """Reference ``EPSesPlusLinear.state_dict()`` → this repo's
    (reference-layout) params tree ``{"epses": (...), "linear": {"w","b"}}``.

    ``linear.weight`` transposes: torch ``(out, in)`` → ours ``(in, out)``.
    """
    import jax.numpy as jnp

    cores = _indexed(sd, r"epses\.(\d+)")
    if not cores or "linear.weight" not in sd or "linear.bias" not in sd:
        raise ValueError(
            "state_dict is not an EPSesPlusLinear checkpoint (expected "
            "'epses.{i}' + 'linear.weight'/'linear.bias' keys; got "
            f"{sorted(sd)[:6]}...)"
        )
    n = max(i for (i,) in cores) + 1
    missing = [i for i in range(n) if (i,) not in cores]
    if missing:
        raise ValueError(f"state_dict missing epses indices {missing}")
    return {
        "epses": tuple(jnp.asarray(cores[(i,)], dtype) for i in range(n)),
        "linear": {
            "w": jnp.asarray(np.ascontiguousarray(sd["linear.weight"].T), dtype),
            "b": jnp.asarray(sd["linear.bias"], dtype),
        },
    }


def state_dict_from_eps_plus_linear_params(
    params: dict, dropout_p: float = 1.0
) -> "Dict[str, Any]":
    """This repo's (reference-layout) EPSesPlusLinear params → a
    ``state_dict`` loadable by the reference module (torch tensors).

    ``dropout_p`` fills the reference's ``p`` keep-probability buffer
    (eps_plus_linear.py:136) so strict ``load_state_dict`` finds every key.
    """
    import torch

    sd = {
        f"epses.{i}": torch.from_numpy(np.asarray(c).copy())
        for i, c in enumerate(params["epses"])
    }
    sd["linear.weight"] = torch.from_numpy(
        np.ascontiguousarray(np.asarray(params["linear"]["w"]).T)
    )
    sd["linear.bias"] = torch.from_numpy(np.asarray(params["linear"]["b"]).copy())
    sd["p"] = torch.tensor(dropout_p, dtype=sd["linear.bias"].dtype)
    return sd


def conv_sbs_params_from_state_dict(
    sd: Mapping[str, np.ndarray], dtype: Any = None
) -> tuple:
    """Reference ``DCTNMnistModel.state_dict()`` → this repo's legacy
    ConvSBS params: ``tuple(layers) of tuple(strings) of tuple(cores)``."""
    import jax.numpy as jnp

    cores = _indexed(sd, r"conv_sbses\.(\d+)\.strings\.(\d+)\.cores\.(\d+)")
    if not cores:
        raise ValueError(
            "state_dict is not a DCTNMnistModel checkpoint (expected "
            "'conv_sbses.{l}.strings.{s}.cores.{c}' keys; got "
            f"{sorted(sd)[:6]}...)"
        )
    n_layers = max(l for l, _, _ in cores) + 1
    layers = []
    for l in range(n_layers):
        n_strings = max(s for ll, s, _ in cores if ll == l) + 1
        strings = []
        for s in range(n_strings):
            n_cores = max(c for ll, ss, c in cores if ll == l and ss == s) + 1
            strings.append(
                tuple(jnp.asarray(cores[(l, s, c)], dtype) for c in range(n_cores))
            )
        layers.append(tuple(strings))
    return tuple(layers)


def state_dict_from_conv_sbs_params(params) -> "Dict[str, Any]":
    """This repo's legacy ConvSBS params → a ``state_dict`` loadable by the
    reference ``DCTNMnistModel``."""
    import torch

    sd = {}
    for l, layer in enumerate(params):
        for s, string in enumerate(layer):
            for c, core in enumerate(string):
                sd[f"conv_sbses.{l}.strings.{s}.cores.{c}"] = torch.from_numpy(
                    np.asarray(core).copy()
                )
    return sd


def _check_against_template(loaded, template, family: str):
    import jax

    got = jax.tree_util.tree_leaves(loaded)
    want = jax.tree_util.tree_leaves(template)
    if len(got) != len(want) or any(
        np.shape(g) != np.shape(w) for g, w in zip(got, want)
    ):
        raise ValueError(
            f"torch checkpoint does not match this run's {family} "
            f"architecture: checkpoint leaves "
            f"{[np.shape(g) for g in got]} vs model "
            f"{[np.shape(w) for w in want]}"
        )


def load_params_from_torch_checkpoint(path: str, template, family: str):
    """Load a reference ``.pt`` checkpoint as params shaped like
    ``template`` (also fixes dtypes to the template's).

    ``family`` is ``"eps_plus_linear"`` or ``"conv_sbs"``.
    """
    import jax

    sd = load_torch_state_dict(path)
    if family == "eps_plus_linear":
        loaded = eps_plus_linear_params_from_state_dict(sd)
    elif family == "conv_sbs":
        loaded = conv_sbs_params_from_state_dict(sd)
    else:
        raise ValueError(f"unknown model family {family!r}")
    _check_against_template(loaded, template, family)
    return jax.tree_util.tree_map(
        lambda g, w: g.astype(w.dtype) if hasattr(w, "dtype") else g,
        loaded,
        template,
    )
