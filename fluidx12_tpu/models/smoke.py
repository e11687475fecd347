"""The flagship "model": the full FluidX12 smoke pipeline as one callable.

Bundles state, per-frame parameters and the fused step into a functional
model object -- the form in which the rest of the framework (bench,
entry points, multi-chip dry runs) consumes the pipeline.  `FluidXEngine`
(engine/fluidx.py) remains the interactive application wrapper; SmokeModel
is the library-level API:

    model = SmokeModel(FluidConfig())
    state = model.init()
    state, image = jax.jit(model.step, donate_argnums=(0,))(state, model.default_params())
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from fluidx12_tpu.core import math3d as m3
from fluidx12_tpu.core.camera import OrbitCamera
from fluidx12_tpu.core.config import FluidConfig, RenderMethod
from fluidx12_tpu.core.state import (
    FluidState,
    SceneParams,
    default_scene_params,
    make_initial_state,
)
from fluidx12_tpu.render.cubemap import ray_march_cube
from fluidx12_tpu.render.lightmap import render_light_map
from fluidx12_tpu.render.lightmap_sweep import render_light_map_fast
from fluidx12_tpu.render.raycast import ray_cast_direct
from fluidx12_tpu.render.resolve import resolve_cube
from fluidx12_tpu.render.slicecomp import ray_march_cube_fast
from fluidx12_tpu.render.visualize2d import visualize_color_2d
from fluidx12_tpu.sim.step import simulate
from fluidx12_tpu.utils.image import composite_premultiplied


class SmokeModel:
    """Functional sim+render pipeline for one configuration."""

    def __init__(
        self,
        config: FluidConfig,
        method: RenderMethod = RenderMethod.RAY_MARCH_SEPARATE,
        sh_coeffs: Optional[jax.Array] = None,
        lod: int = 0,
    ):
        self.config = config.validate()
        self.method = method
        self.sh_coeffs = sh_coeffs
        self.lod = lod

    def init(self) -> FluidState:
        return make_initial_state(self.config)

    def default_params(self) -> SceneParams:
        """SceneParams for the default camera (the app's startup view)."""
        cfg = self.config
        camera = OrbitCamera(width=cfg.viewport[0], height=cfg.viewport[1],
                             fov_y=cfg.fov_y, z_near=cfg.z_near, z_far=cfg.z_far)
        world = m3.scaling(cfg.volume_scale)
        wvp = world @ camera.view_proj
        return default_scene_params(cfg)._replace(
            eye_pt=jnp.asarray(camera.eye),
            world=jnp.asarray(world),
            world_i=jnp.asarray(m3.inverse(world)),
            world_view_proj=jnp.asarray(wvp),
            world_view_proj_i=jnp.asarray(m3.inverse(wvp)),
            screen_to_world=jnp.asarray(m3.inverse(camera.view_proj)),
        )

    def step(self, state: FluidState, params: SceneParams) -> Tuple[FluidState, jax.Array]:
        """One fused sim+render step; returns (state, (H, W, 3) image)."""
        cfg = self.config
        method = self.method
        state = simulate(state, params.time_step, cfg)
        grid = state.color
        if cfg.is_3d and tuple(grid.shape[-3:]) != tuple(cfg.zyx):
            from fluidx12_tpu.core.padding import crop_to_logical

            grid = crop_to_logical(grid, cfg)

        if not cfg.is_3d:
            rgba = visualize_color_2d(grid, cfg)
        else:
            # Fast rendering covers both cube-map methods: with the sweep,
            # per-sample shadows (merged) and the precomputed light map
            # (separate) coincide at full volume resolution, so the merged
            # method rides the same fast pipeline.  Faithful paths keep the
            # reference's distinction (fast_render=False).
            fast = cfg.fast_render and (
                method.separate_light_pass or method.uses_cube_map
            )
            light_map = None
            if method.separate_light_pass or (fast and method.uses_cube_map):
                if fast:
                    light_map = render_light_map_fast(grid, params, cfg, self.sh_coeffs)
                else:
                    light_map = render_light_map(grid, params, cfg, self.sh_coeffs)
            if method.uses_cube_map:
                if fast:
                    cube = ray_march_cube_fast(grid, params, cfg, light_map, lod=self.lod)
                else:
                    cube = ray_march_cube(grid, params, cfg, lod=self.lod,
                                          light_map=light_map, sh_coeffs=self.sh_coeffs)
                rgba = resolve_cube(cube, params, cfg)
            else:
                rgba = ray_cast_direct(grid, params, cfg,
                                       light_map=light_map, sh_coeffs=self.sh_coeffs)

        bg = jnp.broadcast_to(
            jnp.asarray(cfg.clear_color[:3], rgba.dtype), rgba.shape[:-1] + (3,)
        )
        image = composite_premultiplied(rgba, bg)
        return state, jnp.clip(image, 0.0, 1.0)
