"""Light-space ray marching: per-voxel incident light (ref: CSRayMarchL.hlsl).

For every voxel of the light map (volume-coupled, same extents as the grid):
cast a shadow ray toward the directional light, optionally add SH-probe
irradiance along the negative density gradient attenuated by an AO ray, and
store `shadow * lightColor + ambient` (CSRayMarchL.hlsl:44-79).

The reference dispatches 4x4x4 groups over the voxels; here the whole volume
is one batched march whose rays advance in lock step with liveness masks.
Voxels below the density threshold skip the marches entirely in the reference
(CSRayMarchL.hlsl:43); on TPU they are masked to dead rays so they cost only
lane occupancy.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from fluidx12_tpu.core.config import FluidConfig
from fluidx12_tpu.core.state import SceneParams
from fluidx12_tpu.gi.sh import evaluate_sh_irradiance
from fluidx12_tpu.ops.sampling import trilinear_sample
from fluidx12_tpu.ops.transform import transform_vector
from fluidx12_tpu.render.raymarch_core import (
    MAX_DIST,
    cast_light_ray,
    density_gradient,
    local_to_tex,
    make_light_env,
)


def render_light_map(
    grid: jax.Array,
    params: SceneParams,
    config: FluidConfig,
    sh_coeffs: Optional[jax.Array] = None,
    shadow_map: Optional[jax.Array] = None,
    shadow_view_proj: Optional[jax.Array] = None,
) -> jax.Array:
    """Compute the (3, Z, Y, X) light map from the RGBA grid (4, Z, Y, X).

    A shadow map seeds each voxel's shadow-ray transmittance with the
    comparison result at the voxel's world position (`_HAS_SHADOW_MAP_`,
    CSRayMarchL.hlsl:28-33 -- dormant in the reference app)."""
    env = make_light_env(params, sh_coeffs, config,
                         shadow_map=shadow_map, shadow_view_proj=shadow_view_proj)
    z, y, x = config.zyx
    dtype = config.render_dtype
    grid = grid.astype(dtype)  # storage may be f16

    # Voxel centers in local space [-1, 1] (CSRayMarchL.hlsl:20-22).
    gx = ((jnp.arange(x, dtype=dtype) + 0.5) / x) * 2.0 - 1.0
    gy = ((jnp.arange(y, dtype=dtype) + 0.5) / y) * 2.0 - 1.0
    gz = ((jnp.arange(z, dtype=dtype) + 0.5) / z) * 2.0 - 1.0
    cz, cy, cx = jnp.meshgrid(gz, gy, gx, indexing="ij")
    pos = jnp.stack([cx, cy, cz], axis=-1)  # (Z, Y, X, 3)

    density = grid[-1:]
    uvw = local_to_tex(pos)
    d_here = trilinear_sample(density, uvw)[0]
    dense = d_here >= config.zero_threshold

    num = params.num_light_samples
    step = MAX_DIST / num.astype(dtype)

    # Shadow ray toward the light; result ignored where the voxel is empty
    # (the reference skips the march there, CSRayMarchL.hlsl:43).
    from fluidx12_tpu.render.raymarch_core import light_direction_at, shadow_test

    shadow0 = jnp.ones_like(d_here)
    if shadow_map is not None:
        from fluidx12_tpu.ops.transform import transform_point_h

        world_pos = transform_point_h(pos, env.world44)[..., :3]
        shadow0 = shadow_test(world_pos, shadow_map, shadow_view_proj)
    shadow = cast_light_ray(
        density, shadow0, pos, light_direction_at(env, pos), step,
        config.max_light_samples, num, config,
    )
    shadow = jnp.where(dense, shadow, shadow0)

    if env.has_probe:
        grad = -density_gradient(grid, uvw)
        degenerate = jnp.all(grad == 0.0, axis=-1, keepdims=True)
        grad = jnp.where(degenerate, pos, grad)
        world_dir = transform_vector(grad, env.world3x3)
        world_dir = world_dir / jnp.maximum(
            jnp.linalg.norm(world_dir, axis=-1, keepdims=True), 1e-12
        )
        irradiance = jnp.where(
            dense[..., None], evaluate_sh_irradiance(env.sh_coeffs, world_dir), 0.0
        )
        grad_n = grad / jnp.maximum(jnp.linalg.norm(grad, axis=-1, keepdims=True), 1e-12)
        ao = cast_light_ray(
            density, jnp.ones_like(d_here), pos, grad_n, step,
            config.max_light_samples, num, config,
        )
        ao = jnp.where(dense, ao, 1.0)
        ambient = irradiance * ao[..., None]
    else:
        ambient = jnp.broadcast_to(env.ambient, pos.shape)

    light = env.light_color * shadow[..., None] + ambient  # (Z, Y, X, 3)
    return jnp.moveaxis(light, -1, 0).astype(dtype)
