"""Semi-Lagrangian advection with impulse injection, forces and dissipation.

TPU-native re-expression of CSAdvect.hlsl (ref: Content/Shaders/CSAdvect.hlsl):
one dense pass over the grid that

1. backtraces each voxel center through the velocity field (`pos - u * dt`)
   and trilinearly resamples velocity + color there (mirror addressing, like
   the reference's LINEAR_MIRROR sampler, Fluid.cpp:452),
2. injects a Gaussian impulse of buoyant force + dye near `impulse_pos`
   (Impulse.hlsli; constant up-force, x4 plus a vortex swirl in 3D),
3. applies dissipation `max(1 - 0.2 dt, 0)` to both fields.

Velocity and color are advected in a single 7-channel gather so the 8 corner
fetches are shared between the two fields.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from fluidx12_tpu.core.config import FluidConfig
from fluidx12_tpu.ops.sampling import AddressMode, trilinear_sample


def _voxel_centers(config: FluidConfig, dtype) -> jax.Array:
    """Simulation-space voxel centers (Z, Y, X, 3) = (index + 0.5)/gridSize.

    Mirrors GridToSimulationSpace (Simulation.hlsli:7-10); the last axis is
    (x, y, z) to match uvw texture-coordinate order.
    """
    z, y, x = config.zyx
    gx = (jnp.arange(x, dtype=dtype) + 0.5) / x
    gy = (jnp.arange(y, dtype=dtype) + 0.5) / y
    gz = (jnp.arange(z, dtype=dtype) + 0.5) / z
    cz, cy, cx = jnp.meshgrid(gz, gy, gx, indexing="ij")
    return jnp.stack([cx, cy, cz], axis=-1)


def apply_impulse_forces(
    u_new: jax.Array,  # (Z, Y, X, 3)
    c_new: jax.Array,  # (4, Z, Y, X)
    time_step: jax.Array,
    config: FluidConfig,
) -> Tuple[jax.Array, jax.Array]:
    """Impulse injection + forces + saturation + dissipation, shared by both
    advection implementations (CSAdvect.hlsl:57-78, Impulse.hlsli).

    Returns (velocity (3, Z, Y, X), color (4, Z, Y, X)), attenuated.
    """
    dtype = c_new.dtype
    dt = jnp.asarray(time_step, dtype)
    pos = _voxel_centers(config, dtype)  # (Z, Y, X, 3)

    disp = pos - jnp.asarray(config.impulse_pos, dtype)
    radius = config.impulse_radius if config.is_3d else config.impulse_radius * 0.5
    d2 = jnp.sum(disp * disp, axis=-1)
    basis = jnp.exp(-4.0 * d2 / (radius * radius))
    in_impulse = basis >= jnp.exp(jnp.asarray(-4.0, dtype))

    ext = jnp.asarray(config.ext_force, dtype) * basis[..., None]
    if config.is_3d:
        vort = (
            jnp.stack([-disp[..., 2], jnp.zeros_like(d2), disp[..., 0]], axis=-1)
            * config.vort_scale
        )
        ext = ext * config.force_scale_3d + vort
    u_new = u_new + jnp.where(in_impulse[..., None], ext * dt, 0.0)

    impulse_rgba = (
        jnp.asarray((*config.impulse_color, 1.0), dtype) * config.impulse_density
    )
    dye = impulse_rgba[:, None, None, None] * (basis * dt)[None]
    c_new = jnp.clip(c_new + jnp.where(in_impulse[None], dye, 0.0), 0.0, 1.0)

    if not config.pre_multiplied:
        # Un-premultiplied storage (ref: CSAdvect.hlsl:70-72).
        a = c_new[3:4]
        c_new = c_new.at[:3].set(jnp.where(a > 0.0, c_new[:3] / a, c_new[:3]))

    atten = jnp.maximum(1.0 - config.dissipation * dt, 0.0)
    u_out = jnp.moveaxis(u_new, -1, 0) * atten  # (3, Z, Y, X)
    c_out = c_new * atten
    return u_out.astype(dtype), c_out.astype(dtype)


def advect(
    velocity: jax.Array,
    color: jax.Array,
    time_step: jax.Array,
    config: FluidConfig,
) -> Tuple[jax.Array, jax.Array]:
    """One advection step. velocity (3, Z, Y, X), color (4, Z, Y, X)."""
    dtype = velocity.dtype
    dt = jnp.asarray(time_step, dtype)
    pos = _voxel_centers(config, dtype)  # (Z, Y, X, 3)

    # Backtrace and resample both fields with one shared 8-corner gather.
    u = jnp.moveaxis(velocity, 0, -1)  # (Z, Y, X, 3) as (x, y, z) components
    adv = pos - u * dt
    both = jnp.concatenate([velocity, color], axis=0)  # (7, Z, Y, X)
    sampled = trilinear_sample(both, adv, mode=AddressMode.MIRROR)
    u_new = jnp.moveaxis(sampled[:3], 0, -1)  # (Z, Y, X, 3)
    c_new = sampled[3:]                       # (4, Z, Y, X)

    return apply_impulse_forces(u_new, c_new, time_step, config)
