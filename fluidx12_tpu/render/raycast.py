"""Direct screen-space ray marching (ref: PSRayCast.hlsl / PSRayCastV.hlsl).

The baseline the paper compares against: for every viewport pixel, unproject
to the near plane, clip the eye ray to the volume box, and run the shared
march loop at viewport resolution.  The `V` variant samples the precomputed
light map instead of casting per-sample shadow rays.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from fluidx12_tpu.core.config import FluidConfig
from fluidx12_tpu.core.state import SceneParams
from fluidx12_tpu.ops.transform import transform_ndc, transform_point_h
from fluidx12_tpu.render.raymarch_core import (
    compute_ray_origin,
    make_light_env,
    view_march,
)


def ray_cast_direct(
    grid: jax.Array,
    params: SceneParams,
    config: FluidConfig,
    light_map: Optional[jax.Array] = None,
    sh_coeffs: Optional[jax.Array] = None,
    depth_map: Optional[jax.Array] = None,
    shadow_map: Optional[jax.Array] = None,
    shadow_view_proj: Optional[jax.Array] = None,
) -> jax.Array:
    """March the volume directly to the viewport; returns (H, W, 4) RGBA.

    light_map selects the separate-light variant (PSRayCastV); sample count is
    `max_ray_samples` for the merged path (rayCastDirect binds m_maxRaySamples,
    Fluid.cpp:943) and the LOD-clamped count for the V path (Fluid.cpp:968).

    depth_map (H, W clip-space z) bounds each ray at scene geometry
    (`_HAS_DEPTH_MAP_`: GetClipPos + GetTMax, PSRayCast.hlsl:30-35, :52-56);
    shadow_map (+ its world->light-clip matrix) darkens the merged path's
    shadow rays (`_HAS_SHADOW_MAP_`).  Both are dormant in the reference app
    but fully wired in its shader library.
    """
    h, w = config.viewport[1], config.viewport[0]
    dtype = config.render_dtype
    grid = grid.astype(dtype)  # storage may be f16; march math in render dtype
    env = make_light_env(params, sh_coeffs, config,
                         shadow_map=shadow_map, shadow_view_proj=shadow_view_proj)

    ju = (jnp.arange(w, dtype=dtype) + 0.5) / w
    jv = (jnp.arange(h, dtype=dtype) + 0.5) / h
    vv, uu = jnp.meshgrid(jv, ju, indexing="ij")
    xy = jnp.stack([uu * 2.0 - 1.0, -(vv * 2.0 - 1.0)], axis=-1)
    near_pt = transform_ndc(xy, 0.0, params.world_view_proj_i).astype(dtype)

    local_eye = transform_point_h(params.eye_pt, params.world_i)[:3].astype(dtype)
    ray_dir = near_pt - local_eye
    ray_dir = ray_dir / jnp.linalg.norm(ray_dir, axis=-1, keepdims=True)

    origin, hit = compute_ray_origin(near_pt, ray_dir)

    num = params.num_samples if light_map is not None else jnp.int32(config.max_ray_samples)
    if depth_map is not None:
        from fluidx12_tpu.render.raymarch_core import get_t_max

        t_max = get_t_max(xy, depth_map.astype(dtype), origin, ray_dir, params)
    else:
        t_max = jnp.full(origin.shape[:-1], jnp.inf, dtype)
    return view_march(
        grid,
        origin,
        ray_dir,
        t_max,
        num,
        env,
        config,
        light_map=light_map,
        num_light_samples=params.num_light_samples,
        active=hit,
    )
