"""Padded HBM storage layout for non-roll-clean grids (the FluidGI preset).

Every lateral Pallas kernel in ops/pallas requires Mosaic-roll-clean dims
(lanes a multiple of 128, sublanes of 8; the z-pass wants 16-plane slabs).
The reference's own shipped FluidGI config is 150^3 (Bin/FluidGI.bat:1) --
padding each tap temporary in VMEM inflates the live set ~1.7x and blew the
16 MB scoped stack (round 4), so the whole frame used to drop to the XLA
twins (72.5 ms/step vs 5.2 ms at 128^3).

Instead the STATE lives permanently padded in HBM: the logical (Z, Y, X)
volume sits at the origin of a (Zp, Yp, Xp) roll-clean array and the ghost
region beyond it is never semantically read:

- advection absorbs edge-clamp addressing into the displacement
  (ops/pallas/advect._clamp_disp_inbounds) -- clamping against the LOGICAL
  extent gives out-of-logical taps exactly zero weight, so ghost values are
  never sampled with nonzero weight (ghost-agnostic, exact);
- the projection runs logically-masked neighbor fetches (sim/padded.py):
  one extra select per +axis fetch at the logical edge reproduces the
  compact clamp stencil exactly, whatever the ghosts hold;
- render passes consume a cropped compact view (crop_to_logical).

Ghost cells therefore only need to stay FINITE (zero-weight taps still
multiply by the ghost value; 0 * inf = nan).  They start at zero and every
pass writes bounded ghost outputs (resampled interior values / attenuated
garbage), so no per-frame ghost maintenance exists anywhere.

Padding only engages where it can help: 3D grids large enough for the
Pallas kernels (x >= 96 pads to >= 128 lanes) whose dims are not already
roll-clean.  The flagship 128^3 / 256^3 paths are untouched.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def padded_zyx(config) -> Optional[Tuple[int, int, int]]:
    """Storage dims (Zp, Yp, Xp) when this grid needs padding, else None.

    Z and Y round to 16 (z-pass slabs are 16-plane multiples; the extra Y
    headroom beyond the minimum 8 keeps room for mirror-ghost smoother
    variants), X to the 128-lane tile.
    """
    if not config.is_3d:
        return None
    z, y, x = config.zyx
    if x % 128 == 0 and y % 8 == 0 and z % 16 == 0:
        return None
    if x < 96:
        # Below ~128 lanes the Pallas kernels never engage anyway; keep the
        # compact layout (and the exact mirror-sampler XLA twins).
        return None
    return (_round_up(z, 16), _round_up(y, 16), _round_up(x, 128))


def storage_zyx(config) -> Tuple[int, int, int]:
    """The (Z, Y, X) dims state arrays are allocated with."""
    return padded_zyx(config) or config.zyx


def is_padded(arr: jax.Array, config) -> bool:
    """True when `arr`'s trailing spatial dims are the padded storage dims
    (i.e. larger than the logical grid)."""
    return tuple(arr.shape[-3:]) != tuple(config.zyx)


def crop_to_logical(arr: jax.Array, config) -> jax.Array:
    """(..., Zp, Yp, Xp) -> (..., Z, Y, X) logical view (origin-anchored)."""
    z, y, x = config.zyx
    return arr[..., :z, :y, :x]


def pad_to_storage(arr: jax.Array, config) -> jax.Array:
    """(..., Z, Y, X) -> (..., Zp, Yp, Xp), ghosts zero-filled."""
    import jax.numpy as jnp

    zyx = storage_zyx(config)
    if tuple(arr.shape[-3:]) == tuple(zyx):
        return arr
    z, y, x = config.zyx
    pad = [(0, 0)] * (arr.ndim - 3) + [
        (0, zyx[0] - z), (0, zyx[1] - y), (0, zyx[2] - x)]
    return jnp.pad(arr, pad)
