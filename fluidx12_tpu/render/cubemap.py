"""Cube-map-space view ray marching -- the paper's core pass (ref: CSRayMarch.hlsl).

For every texel of every *visible* cube-map face (at the LOD-selected
resolution), march from the eye ray's box entry toward that texel's position
on the box surface, accumulating premultiplied in-scattered radiance
front-to-back.  Lighting is either fetched from the precomputed light map
(`_LIGHT_PASS_` variant, CSRayMarchV.hlsl) or computed per sample (merged).

The reference dispatches 8x8 groups per face with per-thread early-outs; here
all 6*R*R rays march as one batch.  Invisible faces (host-computed visibility
mask, _CPU_CUBE_FACE_CULL_ == 1) are masked off and written as zeros --
deterministic, unlike the reference which leaves stale texels that are never
sampled by the resolve.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from fluidx12_tpu.core.config import FaceCullMode, FluidConfig
from fluidx12_tpu.core.state import SceneParams
from fluidx12_tpu.ops.cubemap import face_texel_local_positions
from fluidx12_tpu.ops.transform import transform_point_h
from fluidx12_tpu.render.raymarch_core import (
    compute_ray_origin,
    face_visibility_in_graph,
    compute_target_hit,
    make_light_env,
    view_march,
)
from fluidx12_tpu.utils.image import quantize_unorm8


def ray_march_cube(
    grid: jax.Array,
    params: SceneParams,
    config: FluidConfig,
    lod: int = 0,
    light_map: Optional[jax.Array] = None,
    sh_coeffs: Optional[jax.Array] = None,
    depth_map: Optional[jax.Array] = None,
    shadow_map: Optional[jax.Array] = None,
    shadow_view_proj: Optional[jax.Array] = None,
):
    """March the volume into a (6, R, R, 4) cube map, R = cube_map_size >> lod.

    depth_map (H, W clip z) bounds each texel ray at scene geometry and the
    function then returns (cube, cube_depth) with cube_depth (6, R, R) = the
    clip z sampled along each ray, for the depth-aware resolve
    (`_HAS_DEPTH_MAP_`: GetClipPos + GetTMax + g_rwCubeDepth,
    CSRayMarch.hlsl:79-93, :121-125; dormant in the reference app).
    shadow_map darkens merged-mode shadow rays (`_HAS_SHADOW_MAP_`)."""
    size = max(config.cube_map_size >> lod, 1)
    dtype = config.render_dtype
    grid = grid.astype(dtype)  # storage may be f16; march math in render dtype
    env = make_light_env(params, sh_coeffs, config,
                         shadow_map=shadow_map, shadow_view_proj=shadow_view_proj)

    # Local-space eye (CSRayMarch.hlsl:104: mul(eyePt, worldI)).
    local_eye = transform_point_h(params.eye_pt, params.world_i)[:3].astype(dtype)

    targets = face_texel_local_positions(size, dtype)  # (6, R, R, 3)
    ray_dir = targets - local_eye
    ray_dir = ray_dir / jnp.linalg.norm(ray_dir, axis=-1, keepdims=True)

    origin = jnp.broadcast_to(local_eye, targets.shape)
    origin, hit = compute_ray_origin(origin, ray_dir)
    t_max = compute_target_hit(origin, targets, ray_dir)

    cube_depth = None
    if depth_map is not None:
        # GetClipPos (CSRayMarch.hlsl:79-93): project a point just inside
        # the box entry to screen uv, point-sample the scene depth there,
        # and clamp the march at its unprojection (GetTMax, :121-125).
        from fluidx12_tpu.ops.transform import transform_point
        from fluidx12_tpu.render.raymarch_core import get_t_max

        h, w = depth_map.shape
        hp = transform_point(origin + 0.01 * ray_dir, params.world_view_proj)
        clip_xy = hp[..., :2]
        iu = jnp.clip(((clip_xy[..., 0] * 0.5 + 0.5) * w).astype(jnp.int32), 0, w - 1)
        iv = jnp.clip(((1.0 - (clip_xy[..., 1] * 0.5 + 0.5)) * h).astype(jnp.int32), 0, h - 1)
        z = jnp.take(depth_map.reshape(-1), (iv * w + iu).reshape(-1),
                     axis=0).reshape(iu.shape).astype(dtype)
        t_max = jnp.minimum(t_max, get_t_max(clip_xy, z, origin, ray_dir, params))
        cube_depth = z  # g_rwCubeDepth[DTid] = pos.z (CSRayMarch.hlsl:124)

    # Face visibility: host-computed mask bit (cull modes 1/2) or the
    # in-graph eye-side test (mode 0); CSRayMarch.hlsl:100-112.
    if config.face_cull == FaceCullMode.NONE:
        visible = face_visibility_in_graph(local_eye)
    else:
        face_ids = jnp.arange(6, dtype=jnp.int32)
        visible = ((params.visibility_mask >> face_ids) & 1) > 0
    active = hit & visible[:, None, None]

    scatter = view_march(
        grid,
        origin,
        ray_dir,
        t_max,
        params.num_samples,
        env,
        config,
        light_map=light_map,
        num_light_samples=params.num_light_samples,
        active=active,
    )
    if config.quantize_cube_map:
        scatter = quantize_unorm8(scatter)
    if cube_depth is not None:
        return scatter, cube_depth
    return scatter
