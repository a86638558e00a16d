"""Score a saved checkpoint on val + test — the pre-publication evaluation
flow (reference small_experiments/pre_publishing_test_evaluation/*.py).

Usage:
  python experiments/evaluate_checkpoint.py CKPT.npz --ds-type fashionmnist \
      --ds-path /data/fashionmnist --epses-specs "(4,4),(3,6)" \
      --phi-multiplier 1.45646 [--batch-size 32]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import click
import jax
import jax.numpy as jnp

from dctn_tpu.cli.runner import parse_epses_specs
from dctn_tpu.data import load_dataset
from dctn_tpu.models import EPSesPlusLinearConfig, init_eps_plus_linear
from dctn_tpu.train import make_score_fn, load_pytree


@click.command()
@click.argument("checkpoint", type=click.Path(exists=True, dir_okay=False))
@click.option("--ds-type", required=True)
@click.option("--ds-path", required=True)
@click.option("--epses-specs", type=parse_epses_specs, required=True)
@click.option("--phi-multiplier", type=float, default=None)
@click.option("--batch-size", type=int, default=32)
@click.option("--include-train", is_flag=True, help="also score the train split")
def main(checkpoint, ds_type, ds_path, epses_specs, phi_multiplier, batch_size,
         include_train):
    splits = load_dataset(
        ds_type, ds_path, phi_multiplier=phi_multiplier,
        autoscale_kernel_size=None if phi_multiplier else epses_specs[0][0],
    )
    image_size = splits.train.x.shape[2]
    q0 = splits.train.x.shape[-1]
    cfg = EPSesPlusLinearConfig(epses_specs=epses_specs, image_size=image_size, q0=q0)
    template = init_eps_plus_linear(jax.random.PRNGKey(0), cfg)
    params = load_pytree(template, checkpoint)
    score = make_score_fn(cfg, batch_size)
    if include_train:
        trm, tra = score(params, jnp.asarray(splits.train.x), jnp.asarray(splits.train.y))
        print(f"train: mean_ce={float(trm):.5f} acc={float(tra):.2%}")
    for name, split in (("val", splits.val), ("test", splits.test)):
        mce, acc = score(params, jnp.asarray(split.x), jnp.asarray(split.y))
        print(f"{name}: mean_ce={float(mce):.5f} acc={float(acc):.2%}")


if __name__ == "__main__":
    main()
