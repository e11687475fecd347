"""Shared edge-clamped roll helpers for the Pallas stencil kernels.

`pltpu.roll` is the one lane/sublane shift primitive Mosaic vectorizes well
(slice+concat lowers to lane shuffles; CLAUDE.md kernel gotchas); these wrap
it with the edge-clamp masks every stencil kernel needs.  Imported by
ops/pallas/jacobi.py and ops/pallas/stencil.py -- fixes to the masking (or
the roll shift >= 0 constraint) live in exactly one place.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu


def shift_lane_clamped(q, offset, hi=None):
    """Edge-clamped +-1 shift along the lane axis (full-width X).

    `hi` overrides the +edge clamp position (the LOGICAL lane count on the
    padded storage layout, core/padding.py): the +1 fetch at lane hi-1
    reads itself, so ghost lanes beyond never couple into the interior.
    Same op count as the compact clamp -- the threshold is a constant."""
    n = q.shape[-1]
    rolled = pltpu.roll(q, (n - offset) % n, q.ndim - 1)
    ids = jax.lax.broadcasted_iota(jnp.int32, q.shape, q.ndim - 1)
    if offset > 0:
        return jnp.where(ids == (n if hi is None else hi) - 1, q, rolled)
    return jnp.where(ids == 0, q, rolled)


def shift_sublane_clamped(q, offset, hi=None):
    """Edge-clamped +-1 shift along the sublane axis (full-height Y).

    `hi` moves the +edge clamp to the LOGICAL sublane count on padded
    storage layouts, exactly like shift_lane_clamped's `hi`."""
    n = q.shape[-2]
    rolled = pltpu.roll(q, (n - offset) % n, q.ndim - 2)
    ids = jax.lax.broadcasted_iota(jnp.int32, q.shape, q.ndim - 2)
    if offset > 0:
        return jnp.where(ids == (n if hi is None else hi) - 1, q, rolled)
    return jnp.where(ids == 0, q, rolled)


def shift_sublane_global(q, offset, gy0, ny):
    """+-1 shift along Y clamped at *global* rows 0 and ny-1 only (buffer
    rows are a halo'd window starting at global row gy0)."""
    n = q.shape[-2]
    rolled = pltpu.roll(q, (n - offset) % n, q.ndim - 2)
    gids = jax.lax.broadcasted_iota(jnp.int32, q.shape, q.ndim - 2) + gy0
    if offset > 0:
        return jnp.where(gids == ny - 1, q, rolled)
    return jnp.where(gids == 0, q, rolled)
