"""Optimizers via optax, matching the reference's torch semantics.

The reference uses torch.optim.Adam / SGD with ``weight_decay`` implemented as
L2-added-to-gradient BEFORE the moment updates (new_runner.py:505-507) — i.e.
classic L2 regularization, NOT decoupled AdamW — so we chain
``add_decayed_weights`` ahead of the moment transform.
"""

from __future__ import annotations

import optax


def make_optimizer(
    name: str, lr: float, weight_decay: float = 0.0
) -> optax.GradientTransformation:
    name = name.lower()
    if name == "adam":
        core = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    elif name == "sgd":
        core = optax.identity()
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    steps = []
    if weight_decay:
        steps.append(optax.add_decayed_weights(weight_decay))
    steps.append(core)
    steps.append(optax.scale(-lr))
    return optax.chain(*steps)
