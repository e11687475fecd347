"""The ONE render-dispatch definition shared by the engine and SmokeModel.

The per-frame pipeline after `simulate` -- 2D visualize vs the four 3D
render methods, fast vs faithful stacks, light-map staging, scissor rect,
environment background -- used to be duplicated between
engine/fluidx.py::_build_program and models/smoke.py::SmokeModel.step, and
the copies drifted (the library API silently lacked the point-light gate,
the fast-DIRECT plane spec, the scissor rect and the env-bg cache;
VERDICT r4 item 6).  `render_frame` is now the single branching site; both
callers are cross-checked for identical output in tests/test_models.py.

Ref: the dispatch mirrors FluidX12::PopulateCommandList's method switch
(FluidX12.cpp:435-588) + Fluid::Render (Fluid.cpp:825-906).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from fluidx12_tpu.core.config import FluidConfig, RenderMethod
from fluidx12_tpu.core.state import SceneParams
from fluidx12_tpu.render.cubemap import ray_march_cube
from fluidx12_tpu.render.lightmap import render_light_map
from fluidx12_tpu.render.lightmap_sweep import render_light_map_fast
from fluidx12_tpu.render.raycast import ray_cast_direct
from fluidx12_tpu.render.resolve import resolve_cube
from fluidx12_tpu.render.screencomp import ray_cast_direct_fast
from fluidx12_tpu.render.slicecomp import ray_march_cube_fast
from fluidx12_tpu.render.visualize2d import visualize_color_2d
from fluidx12_tpu.utils.image import composite_premultiplied


def point_light_ok(config: FluidConfig) -> bool:
    """Host-side gate: can the fast stack serve this config's point light?
    (The projective sweep needs an exterior light; an in-volume point light
    falls back to the faithful per-ray paths.)"""
    if not config.point_light:
        return True
    from fluidx12_tpu.render.lightmap_sweep import point_sweep_supported

    return point_sweep_supported(config)


def render_frame(
    grid: jax.Array,
    params: SceneParams,
    config: FluidConfig,
    method: RenderMethod,
    sh_coeffs: Optional[jax.Array] = None,
    *,
    lod: int = 0,
    vis_mask: Optional[int] = None,
    plane_spec=None,
    rect=None,
    env_bg: Optional[jax.Array] = None,
    point_ok: bool = True,
) -> jax.Array:
    """Render one frame from the (4, Z, Y, X) color grid (already cropped
    to the logical volume on padded layouts) and return the composited
    (H, W, 3) image in [0, 1].

    Static arguments (part of the caller's jit cache key): `method`, `lod`
    (mip level), `vis_mask` (face-cull bitmask or None for the in-graph
    test), `plane_spec` (fast-DIRECT base plane, None = faithful direct),
    `rect` (host-static scissor bbox), `point_ok` (host-evaluated
    point_light_ok; callers warn on the fallback).  Traced: `grid`,
    `params`, `sh_coeffs`, `env_bg`.
    """
    cfg = config
    if not cfg.is_3d:
        rgba = visualize_color_2d(grid, cfg)
    else:
        # Fast rendering covers both cube-map methods: with the sweep,
        # per-sample shadows (merged) and the precomputed light map
        # (separate) coincide at full volume resolution, so the merged
        # method rides the same fast pipeline.  Faithful paths keep the
        # reference's distinction (fast_render=False).
        #
        # Point lights (_POINT_LIGHT_, RayMarch.hlsli:40) ride the
        # projective sweep (lightmap_sweep.point_transmittance) at full
        # speed when the light sits outside the volume; only an in-volume
        # point light falls back to the faithful per-ray paths (point_ok).
        fast = cfg.fast_render and point_ok
        # Fast DIRECT methods need the base-plane spec (None when the eye
        # is inside the volume -> faithful fallback).
        fast_direct = fast and not method.uses_cube_map and plane_spec is not None
        light_map = None
        if method.separate_light_pass or (fast and method.uses_cube_map) or fast_direct:
            if fast:
                light_map = render_light_map_fast(grid, params, cfg, sh_coeffs)
            else:
                light_map = render_light_map(grid, params, cfg, sh_coeffs)
        if method.uses_cube_map:
            if fast:
                cube = ray_march_cube_fast(grid, params, cfg, light_map,
                                           lod=lod, static_mask=vis_mask)
            else:
                cube = ray_march_cube(
                    grid, params, cfg, lod=lod,
                    light_map=light_map, sh_coeffs=sh_coeffs,
                )
            rgba = resolve_cube(cube, params, cfg, rect=rect)
        elif fast_direct:
            # Perspective shear-warp (render/screencomp.py).  Sample count
            # binding mirrors the reference: merged binds the max
            # (Fluid.cpp:943), separate the LOD-clamped count
            # (Fluid.cpp:968).
            num = (params.num_samples if method.separate_light_pass
                   else jnp.int32(cfg.max_ray_samples))
            rgba = ray_cast_direct_fast(grid, params, cfg, light_map,
                                        plane_spec, num, rect=rect)
        else:
            rgba = ray_cast_direct(
                grid, params, cfg,
                light_map=light_map, sh_coeffs=sh_coeffs,
            )

    # Background: clear color, then environment sky if present
    # (FluidX12.cpp:469-484), then premultiplied composite.  The sky
    # depends only on the camera pose + radiance, so callers render it
    # once per pose change and pass the (H, W, 3) image in.
    bg = jnp.broadcast_to(
        jnp.asarray(cfg.clear_color[:3], rgba.dtype), rgba.shape[:-1] + (3,)
    )
    if env_bg is not None and cfg.is_3d:
        bg = env_bg.astype(rgba.dtype)
    image = composite_premultiplied(rgba, bg)
    return jnp.clip(image, 0.0, 1.0)
