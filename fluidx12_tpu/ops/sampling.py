"""Texture-style sampling primitives for grid fields.

TPUs have no texture units, so the reference's `SampleLevel(g_smpLinear, uvw, 0)`
calls (CSAdvect.hlsl:50-54, RayMarch.hlsli:63-67) become explicit 8-corner
gathers with software address modes:

- CLAMP  == D3D12 LINEAR_CLAMP  (render-path sampler, Fluid.cpp:475)
- MIRROR == D3D12 LINEAR_MIRROR (advection sampler, Fluid.cpp:452)

Fields are stored channel-leading as (C, Z, Y, X); uvw coordinates follow the
D3D texture convention: uvw in [0,1]^3 with u along X, v along Y, w along Z,
texel centers at (i + 0.5) / size.

The gathers flatten the volume and use jnp.take on linearized indices, which
XLA lowers to a dynamic-gather; the Pallas kernels in ops/pallas specialize
the hot paths (advection backtrace, ray-march sampling) where this generic
form is bandwidth-limited.
"""

from __future__ import annotations

import enum

import jax
import jax.numpy as jnp


class AddressMode(enum.Enum):
    CLAMP = "clamp"
    MIRROR = "mirror"


def _resolve_axis(idx: jax.Array, size: int, mode: AddressMode) -> jax.Array:
    """Map (possibly out-of-range) integer texel indices into [0, size)."""
    if mode == AddressMode.CLAMP:
        return jnp.clip(idx, 0, size - 1)
    # Mirror-repeat with period 2*size: 0..size-1, then size-1..0, ...
    m = jnp.remainder(idx, 2 * size)
    return jnp.where(m >= size, 2 * size - 1 - m, m)


def sample_at_cells(field: jax.Array, iz: jax.Array, iy: jax.Array, ix: jax.Array) -> jax.Array:
    """Point-fetch field[..., iz, iy, ix] for integer index arrays of equal shape.

    field: (C, Z, Y, X) or (Z, Y, X). Returns (C, *idx.shape) or idx.shape.
    Indices must already be in range.
    """
    squeeze = field.ndim == 3
    if squeeze:
        field = field[None]
    c, z, y, x = field.shape
    flat = field.reshape(c, z * y * x)
    lin = (iz * y + iy) * x + ix
    out = jnp.take(flat, lin.reshape(-1), axis=1).reshape((c,) + lin.shape)
    return out[0] if squeeze else out


def trilinear_sample(
    field: jax.Array,
    uvw: jax.Array,
    mode: AddressMode = AddressMode.CLAMP,
) -> jax.Array:
    """Trilinearly sample `field` (C, Z, Y, X) at texture coords `uvw` (..., 3).

    Returns (C, ...) samples. Matches D3D linear filtering with the given
    address mode (border behavior: CLAMP repeats edge texels; MIRROR reflects).
    """
    squeeze = field.ndim == 3
    if squeeze:
        field = field[None]
    c, z, y, x = field.shape
    sizes = jnp.asarray([x, y, z], dtype=uvw.dtype)

    # Texel-space continuous coordinates (texel centers at integer positions).
    t = uvw * sizes - 0.5
    t0 = jnp.floor(t)
    frac = t - t0
    t0 = t0.astype(jnp.int32)

    ix0 = _resolve_axis(t0[..., 0], x, mode)
    iy0 = _resolve_axis(t0[..., 1], y, mode)
    iz0 = _resolve_axis(t0[..., 2], z, mode)
    ix1 = _resolve_axis(t0[..., 0] + 1, x, mode)
    iy1 = _resolve_axis(t0[..., 1] + 1, y, mode)
    iz1 = _resolve_axis(t0[..., 2] + 1, z, mode)

    fx = frac[..., 0]
    fy = frac[..., 1]
    fz = frac[..., 2]

    flat = field.reshape(c, z * y * x)

    def fetch(izz, iyy, ixx):
        lin = (izz * y + iyy) * x + ixx
        return jnp.take(flat, lin.reshape(-1), axis=1).reshape((c,) + lin.shape)

    c000 = fetch(iz0, iy0, ix0)
    c001 = fetch(iz0, iy0, ix1)
    c010 = fetch(iz0, iy1, ix0)
    c011 = fetch(iz0, iy1, ix1)
    c100 = fetch(iz1, iy0, ix0)
    c101 = fetch(iz1, iy0, ix1)
    c110 = fetch(iz1, iy1, ix0)
    c111 = fetch(iz1, iy1, ix1)

    c00 = c000 + (c001 - c000) * fx
    c01 = c010 + (c011 - c010) * fx
    c10 = c100 + (c101 - c100) * fx
    c11 = c110 + (c111 - c110) * fx
    c0 = c00 + (c01 - c00) * fy
    c1 = c10 + (c11 - c10) * fy
    out = c0 + (c1 - c0) * fz
    return out[0] if squeeze else out


def neighbor_shift(field: jax.Array, axis: int, offset: int) -> jax.Array:
    """Edge-clamped neighbor fetch along a spatial axis.

    Equivalent to the reference's `max(DTid, 1) - 1` / `min(DTid + 1, size - 1)`
    neighbor indexing (CSProject3D.hlsl:80-88): out[i] = field[clamp(i + offset)].
    Implemented as a slice+concat so XLA fuses it into the stencil instead of
    emitting a gather.
    """
    size = field.shape[axis]
    if offset == 0:
        return field
    idx = [slice(None)] * field.ndim
    if offset > 0:
        idx[axis] = slice(offset, size)
        body = field[tuple(idx)]
        idx[axis] = slice(size - 1, size)
        edge = field[tuple(idx)]
        reps = [1] * field.ndim
        parts = [body] + [edge] * offset
    else:
        idx[axis] = slice(0, size + offset)
        body = field[tuple(idx)]
        idx[axis] = slice(0, 1)
        edge = field[tuple(idx)]
        parts = [edge] * (-offset) + [body]
    return jnp.concatenate(parts, axis=axis)
