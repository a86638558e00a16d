"""Sliding-window extraction by shifted static slicing.

TPU-first design note: instead of a gather / unfold (which XLA lowers poorly),
every kernel position (δh, δw) is a *statically sliced view* of the input —
``x[c, :, δh : δh+H', δw : δw+W', :]``. Zipped over positions these views
enumerate all K×K windows in raster order, so the K²·C shifted views are the
rank-one factors of every window at once. Under jit the slices are free
(static offsets), and XLA fuses them into downstream elementwise work.

Capability parity: reference ``dctn/align.py`` (align, align_with_positions,
make_windows). Input layout: (channels, batch, height, width, quantum).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

from ..utils.pos2d import Pos2D, raster_positions
from .rank_one import RankOneTensorsBatch


def out_spatial(height: int, width: int, kernel_size: int) -> Tuple[int, int]:
    """Output spatial dims of a K×K sliding window with stride 1, no padding."""
    return height - kernel_size + 1, width - kernel_size + 1


def window_views_at_positions(x, positions: Sequence[Pos2D]):
    """For each position then each channel, yield the shifted view of ``x``.

    ``x``: array of shape (C, B, H, W, Q) (or a tuple of C arrays (B, H, W, Q)).
    Returns a tuple of len(positions)·C arrays of shape (B, H', W', Q) where
    H' = H - max_h, W' = W - max_w. Raster order: position-major, channel-minor
    (same enumeration as the reference's align_with_positions, align.py:11-46).
    """
    num_channels = len(x)
    max_h = max(p.h for p in positions)
    max_w = max(p.w for p in positions)
    if min(p.h for p in positions) != 0 or min(p.w for p in positions) != 0:
        raise ValueError("positions must start at (0, 0)")
    _, height, width, _ = x[0].shape
    out_h, out_w = height - max_h, width - max_w
    views = []
    for pos in positions:
        for c in range(num_channels):
            views.append(x[c][:, pos.h : pos.h + out_h, pos.w : pos.w + out_w, :])
    return tuple(views)


def window_views(x, kernel_size: int):
    """Shifted views for the full K×K raster grid (align.py:35-46 analog)."""
    return window_views_at_positions(x, raster_positions(kernel_size))


def make_windows(x, kernel_size: int) -> RankOneTensorsBatch:
    """Stack the K²·C shifted views into a RankOneTensorsBatch for statistics.

    ``x``: (C, B, H, W, Q). Result array shape: (K²·C, B, H', W', Q) with
    factors_dim=0 and coordinates_dim=4 (parity: align.py:49-61). Unlike the
    reference there is no host-side 128-chunking — on TPU the stack is a single
    fused XLA op.
    """
    return RankOneTensorsBatch(
        array=jnp.stack(window_views(x, kernel_size), axis=0),
        factors_dim=0,
        coordinates_dim=4,
    )
