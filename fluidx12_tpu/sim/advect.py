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
    u_new: jax.Array,  # (3, Z, Y, X)
    c_new: jax.Array,  # (4, Z, Y, X)
    time_step: jax.Array,
    config: FluidConfig,
) -> Tuple[jax.Array, jax.Array]:
    """Impulse injection + forces + saturation + dissipation, shared by both
    advection implementations (CSAdvect.hlsl:57-78, Impulse.hlsli).

    Channel-leading layout throughout: a (Z, Y, X, 3) trailing-component
    array tiles terribly on TPU (the last two dims carry the (8, 128)
    layout, so a 3-wide minor dim pads ~42x if it ever materializes).

    Returns (velocity (3, Z, Y, X), color (4, Z, Y, X)), attenuated, in the
    input dtype.  Arithmetic always runs in f32 (a bf16 add would drop the
    per-frame dye/force increments entirely: dt/grid ~ 2^-7 against values
    near 1.0); with half-precision storage the single rounding happens here,
    the same quantization point as before -- but XLA now fuses the
    upcast-compute-downcast into one streaming pass instead of
    materializing f32 copies of the 7-channel volume (~1.7 ms at 256^3).
    """
    store = c_new.dtype
    dtype = jnp.float32
    u_new = u_new.astype(dtype)
    c_new = c_new.astype(dtype)
    dt = jnp.asarray(time_step, dtype)
    z, y, x = config.zyx
    # Broadcastable per-axis simulation-space coordinates (index + 0.5)/size,
    # mirroring GridToSimulationSpace (Simulation.hlsli:7-10).  Array dims
    # may exceed the logical grid on the padded storage layout
    # (core/padding.py); normalization stays LOGICAL, so ghost cells land
    # beyond 1.0 where the Gaussian impulse never reaches.
    zp, yp, xp = c_new.shape[-3:]
    cx = ((jnp.arange(xp, dtype=dtype) + 0.5) / x).reshape(1, 1, xp)
    cy = ((jnp.arange(yp, dtype=dtype) + 0.5) / y).reshape(1, yp, 1)
    cz = ((jnp.arange(zp, dtype=dtype) + 0.5) / z).reshape(zp, 1, 1)
    ip = jnp.asarray(config.impulse_pos, dtype)
    dx, dy, dz = cx - ip[0], cy - ip[1], cz - ip[2]

    radius = config.impulse_radius if config.is_3d else config.impulse_radius * 0.5
    d2 = dx * dx + dy * dy + dz * dz  # (Z, Y, X) by broadcast
    basis = jnp.exp(-4.0 * d2 / (radius * radius))
    in_impulse = basis >= jnp.exp(jnp.asarray(-4.0, dtype))

    force = jnp.asarray(config.ext_force, dtype)
    if config.is_3d:
        fs = config.force_scale_3d
        ext = [
            force[0] * fs * basis + (-dz) * config.vort_scale,
            force[1] * fs * basis,
            force[2] * fs * basis + dx * config.vort_scale,
        ]
    else:
        ext = [force[0] * basis, force[1] * basis, force[2] * basis]
    zero = jnp.asarray(0.0, dtype)
    u_new = jnp.stack(
        [u_new[i] + jnp.where(in_impulse, ext[i] * dt, zero) for i in range(3)],
        axis=0,
    )

    impulse_rgba = (
        jnp.asarray((*config.impulse_color, 1.0), dtype) * config.impulse_density
    )
    dye_t = jnp.where(in_impulse, basis * dt, zero)
    c_new = jnp.clip(c_new + impulse_rgba[:, None, None, None] * dye_t[None],
                     0.0, 1.0)

    if not config.pre_multiplied:
        # Un-premultiplied storage (ref: CSAdvect.hlsl:70-72).
        a = c_new[3:4]
        c_new = jnp.concatenate(
            [jnp.where(a > 0.0, c_new[:3] / a, c_new[:3]), a], axis=0)

    atten = jnp.maximum(1.0 - config.dissipation * dt, 0.0)
    return (u_new * atten).astype(store), (c_new * atten).astype(store)


def advect(
    velocity: jax.Array,
    color: jax.Array,
    time_step: jax.Array,
    config: FluidConfig,
) -> Tuple[jax.Array, jax.Array]:
    """One advection step. velocity (3, Z, Y, X), color (4, Z, Y, X).

    Computes in f32 whatever the storage dtype (the reference samples
    RGBA16F textures with fp32 ALU math)."""
    velocity = velocity.astype(jnp.float32)
    color = color.astype(jnp.float32)
    dtype = velocity.dtype
    dt = jnp.asarray(time_step, dtype)
    pos = _voxel_centers(config, dtype)  # (Z, Y, X, 3)

    # Backtrace and resample both fields with one shared 8-corner gather.
    u = jnp.moveaxis(velocity, 0, -1)  # (Z, Y, X, 3) as (x, y, z) components
    adv = pos - u * dt
    both = jnp.concatenate([velocity, color], axis=0)  # (7, Z, Y, X)
    sampled = trilinear_sample(both, adv, mode=AddressMode.MIRROR)
    return apply_impulse_forces(sampled[:3], sampled[3:], time_step, config)
