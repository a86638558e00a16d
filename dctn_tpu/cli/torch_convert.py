"""Convert model checkpoints between the reference's torch format and ours.

A reference user holds ``.pt`` files written by
``torch.save(model.state_dict(), ...)`` (dctn/training.py:120-121); this repo
writes npz pytrees (train/checkpoint.py). One command moves either way:

    python -m dctn_tpu.cli.torch_convert model.pt model.npz   # torch → ours
    python -m dctn_tpu.cli.torch_convert model.npz model.pt   # ours → torch

The model family (EPSesPlusLinear vs the legacy ConvSBS DCTNMnistModel) is
inferred from the checkpoint's keys; ``--family`` overrides. The converted
npz loads with ``--load-model-state`` / ``--init-load-file`` (which also
accept ``.pt`` directly); the converted ``.pt`` loads into the reference
module with ``model.load_state_dict(torch.load(...))``.
"""

from __future__ import annotations

import logging

import click
import numpy as np

from ..interop import (
    is_torch_checkpoint,
    load_torch_state_dict,
    eps_plus_linear_params_from_state_dict,
    state_dict_from_eps_plus_linear_params,
    conv_sbs_params_from_state_dict,
    state_dict_from_conv_sbs_params,
)
from ..train.checkpoint import save_pytree

logger = logging.getLogger(__name__)


def _infer_family_from_state_dict(sd) -> str:
    if any(k.startswith("epses.") for k in sd):
        return "eps_plus_linear"
    if any(k.startswith("conv_sbses.") for k in sd):
        return "conv_sbs"
    raise click.ClickException(
        f"cannot infer model family from state_dict keys {sorted(sd)[:6]}..."
    )


def _npz_to_params(path: str, family: str | None):
    """Rebuild the params pytree from a save_pytree npz's path keys."""
    with np.load(path) as d:
        data = {k: d[k] for k in d.files}
    if family is None:
        if "linear/w" in data:
            family = "eps_plus_linear"
        elif all(p.isdigit() for k in data for p in k.split("/")):
            family = "conv_sbs"
        else:
            raise click.ClickException(
                f"cannot infer model family from npz keys {sorted(data)[:6]}..."
            )
    if family == "eps_plus_linear":
        n = 1 + max(
            int(k.split("/")[1]) for k in data if k.startswith("epses/")
        )
        params = {
            "epses": tuple(data[f"epses/{i}"] for i in range(n)),
            "linear": {"w": data["linear/w"], "b": data["linear/b"]},
        }
    else:
        idx = sorted(tuple(int(p) for p in k.split("/")) for k in data)
        n_layers = 1 + max(i[0] for i in idx)
        params = tuple(
            tuple(
                tuple(
                    data[f"{l}/{s}/{c}"]
                    for c in range(1 + max(i[2] for i in idx if i[:2] == (l, s)))
                )
                for s in range(1 + max(i[1] for i in idx if i[0] == l))
            )
            for l in range(n_layers)
        )
    return params, family


@click.command()
@click.argument("src", type=click.Path(exists=True, dir_okay=False))
@click.argument("dst", type=click.Path(dir_okay=False, writable=True))
@click.option(
    "--family",
    type=click.Choice(["eps_plus_linear", "conv_sbs"]),
    default=None,
    help="model family; inferred from the checkpoint keys when omitted",
)
def main(src: str, dst: str, family: str | None) -> None:
    logging.basicConfig(level=logging.INFO)
    import torch

    if is_torch_checkpoint(src):
        sd = load_torch_state_dict(src)
        fam = family or _infer_family_from_state_dict(sd)
        if fam == "eps_plus_linear":
            params = eps_plus_linear_params_from_state_dict(sd)
        else:
            params = conv_sbs_params_from_state_dict(sd)
        save_pytree(params, dst)
        logger.info("converted torch %s checkpoint %s -> npz %s", fam, src, dst)
    else:
        params, fam = _npz_to_params(src, family)
        if fam == "eps_plus_linear":
            sd = state_dict_from_eps_plus_linear_params(params)
        else:
            sd = state_dict_from_conv_sbs_params(params)
        torch.save(sd, dst)
        logger.info("converted npz %s checkpoint %s -> torch %s", fam, src, dst)


if __name__ == "__main__":
    main()
