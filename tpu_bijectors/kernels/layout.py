"""Shared lane-layout helpers for the Pallas kernels: batch rides the
128-wide LANE axis, the (small) event axis rides SUBLANES."""

from __future__ import annotations

import jax.numpy as jnp

LANES = 128


def pad_to(x, n, axis):
    """Zero-pad `x` to size `n` along `axis` (no-op when already >= n)."""
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def padded_batch(b: int) -> int:
    """Round the batch up to a whole number of 128-lane tiles."""
    return ((b + LANES - 1) // LANES) * LANES


BLOCK_LANES = 2048  # lane width per grid step: 16 lane-tiles, so per-step
# grid overhead amortizes (128-wide blocks made a 131072 batch take a
# 1024-step grid; slope-timed measurement showed the overhead dominating)


def block_lanes(bp: int) -> int:
    """Widest power-of-two lane block (<= BLOCK_LANES) dividing the padded
    batch `bp` (which is always a multiple of 128)."""
    w = BLOCK_LANES
    while w > LANES and bp % w:
        w //= 2
    return w
