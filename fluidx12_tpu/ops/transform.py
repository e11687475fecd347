"""Homogeneous point/vector transforms as explicit VPU arithmetic.

Per-pixel `(x, y, z, 1) @ M` products must NOT lower to TPU matmuls: the MXU's
default bf16 passes catastrophically cancel the tiny homogeneous w of
far-plane unprojections (w ~ 1/z_far), producing inf/NaN rays.  These helpers
expand the product into broadcast multiply-adds, which stay on the VPU in
full float32 regardless of the platform's matmul precision default.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def transform_point_h(p: jax.Array, m: jax.Array) -> jax.Array:
    """(p, 1) @ M without perspective divide. p: (..., 3), m: (4, 4) -> (..., 4)."""
    return (
        p[..., 0:1] * m[0]
        + p[..., 1:2] * m[1]
        + p[..., 2:3] * m[2]
        + m[3]
    )


def transform_point(p: jax.Array, m: jax.Array) -> jax.Array:
    """(p, 1) @ M with perspective divide -> (..., 3)."""
    h = transform_point_h(p, m)
    return h[..., :3] / h[..., 3:4]


def transform_ndc(ndc: jax.Array, z, m: jax.Array) -> jax.Array:
    """(x, y, z, 1) @ M for 2-component ndc and scalar/array z -> (..., 3) after divide."""
    z = jnp.broadcast_to(jnp.asarray(z, ndc.dtype), ndc.shape[:-1] + (1,))
    h = ndc[..., 0:1] * m[0] + ndc[..., 1:2] * m[1] + z * m[2] + m[3]
    return h[..., :3] / h[..., 3:4]


def transform_vector(v: jax.Array, m: jax.Array) -> jax.Array:
    """v @ upper3x3(M). v: (..., 3)."""
    return (
        v[..., 0:1] * m[0, :3]
        + v[..., 1:2] * m[1, :3]
        + v[..., 2:3] * m[2, :3]
    )
