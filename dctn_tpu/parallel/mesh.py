"""Device-mesh construction and multi-host initialization.

The communication layer the reference never had (SURVEY §2.3): a 1-D ``data``
mesh over all chips (ICI-connected within a slice); gradients are reduced with
``jax.lax.psum`` inside ``shard_map`` — XLA lowers that to an ICI all-reduce.
Multi-host (DCN) setups call ``initialize_distributed`` first, after which
``jax.devices()`` spans the whole pod and the same mesh code applies.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None, axis_name: str = "data"
) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices (all by
    default)."""
    devices = jax.devices()
    if n_devices is not None:
        assert n_devices <= len(devices), (
            f"requested {n_devices} devices, have {len(devices)}"
        )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def data_axis_size(mesh: Mesh, axis_name: str = "data") -> int:
    return mesh.shape[axis_name]


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up over DCN (jax.distributed). No-op on single host.

    On TPU pods the arguments are auto-detected from the environment; pass
    them explicitly elsewhere. On CPU backends (the multi-host test tier:
    tests/test_multihost.py runs a REAL 2-process DP training job over
    loopback) cross-process collectives need the gloo implementation —
    selected here before the backend initializes."""
    if num_processes is not None and num_processes <= 1:
        return
    try:
        platforms = jax.config.jax_platforms or ""
        if platforms.split(",")[0] == "cpu":
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass  # older jax without the knob; TPU pods never take this branch
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
