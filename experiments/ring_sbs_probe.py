"""Ring-SBS (trace_edge) bn probe — VERDICT r3 #5.

The trace_edge ring runs 8.97 ms at bs 100 vs 2.61 ms open strings
(docs/performance.md). Two candidate causes: (a) the algorithmic b0 factor
— a bond-4 ring's fold state and per-fold work are ×b0=4 the open string's
(the trace needs all b0 boundary conditions carried through the chain), so
~3.4× is near the flop floor; (b) the ×b0 STATE additionally pushes
`_pick_bn` from 2048 to 1024 under the 56 MB default budget — maybe the
smaller tile costs extra grid overhead that a raised budget would recover
(the r3 budget lift was worth +124% on this exact config).

This probe measures the legacy 2-layer bond-4 trace_edge train step at the
default budget vs raised budgets (bn 1024 → 2048), on the real chip, with
honest long-window fencing. Appends to ring_sbs_probe_results.json.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/ring_sbs_probe.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

RESULTS = os.path.join(
    os.path.dirname(__file__), "ring_sbs_probe_results.json"
)


def measure(budget_mb, bs=100, steps=256):
    os.environ["DCTN_TPU_VMEM_BUDGET_MB"] = str(budget_mb)
    # the budget is read at import/plan time — re-import the module fresh
    for m in list(sys.modules):
        if m.startswith("dctn_tpu"):
            del sys.modules[m]
    import jax
    import jax.numpy as jnp
    import optax

    from dctn_tpu.models.conv_sbs_model import (
        ConvSBSModelConfig,
        init_conv_sbs_model,
        conv_sbs_model_forward,
    )
    from dctn_tpu.pallas import sbs_pallas
    from dctn_tpu.train import make_optimizer

    cfg = ConvSBSModelConfig(
        num_sbs_layers=2, bond_dim_size=4, backend="pallas", trace_edge=True,
    )
    params = init_conv_sbs_model(jax.random.PRNGKey(0), cfg)
    # report the bn the plan picks for layer 0's first string
    specs = cfg.layer_specs()
    olr, qc, supported = sbs_pallas.sbs_plan(specs[0][0])
    npix = bs * 26 * 26
    bn = sbs_pallas._pick_bn(olr, qc, npix)

    opt = make_optimizer("adam", 1e-3)
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

    x = jax.random.uniform(jax.random.PRNGKey(1), (bs, 28, 28), jnp.float32)
    y = jax.random.randint(jax.random.PRNGKey(2), (bs,), 0, 10)
    p, o = params, opt_state
    for _ in range(3):
        p, o, l = step(p, o, x, y)
    float(l)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            p, o, l = step(p, o, x, y)
        float(l)
        best = min(best, time.perf_counter() - t0)
    row = {
        "budget_mb": budget_mb,
        "supported": bool(supported),
        "bn": int(bn),
        "batch_size": bs,
        "steps": steps,
        "step_ms": round(best / steps * 1e3, 3),
        "images_per_sec": round(bs * steps / best, 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    rows = []
    for budget in [int(a) for a in sys.argv[1:]] or [56, 110]:
        rows.append(measure(budget))
    existing = json.load(open(RESULTS)) if os.path.exists(RESULTS) else []
    json.dump(existing + rows, open(RESULTS, "w"), indent=1)
    print(f"wrote {RESULTS}")


if __name__ == "__main__":
    main()
