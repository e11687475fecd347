"""The flagship "model": the full FluidX12 smoke pipeline as one callable.

Bundles state, per-frame parameters and the fused step into a functional
model object -- the form in which the rest of the framework (bench,
entry points, multi-chip dry runs) consumes the pipeline.  `FluidXEngine`
(engine/fluidx.py) remains the interactive application wrapper; SmokeModel
is the library-level API:

    model = SmokeModel(FluidConfig())
    state = model.init()
    state, image = jax.jit(model.step, donate_argnums=(0,))(state, model.default_params())

The render dispatch is render/pipeline.render_frame -- the SAME branching
site the engine compiles, so the library renders exactly what the app does
(cross-checked per method in tests/test_models.py).  The engine's
host-static per-pose extras (fast-DIRECT plane spec, scissor rect, face
visibility mask) are precomputed here for the default camera; pass
`camera=` to recompute them for another pose.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fluidx12_tpu.core import math3d as m3
from fluidx12_tpu.core.camera import OrbitCamera
from fluidx12_tpu.core.config import FaceCullMode, FluidConfig, RenderMethod
from fluidx12_tpu.core.state import (
    FluidState,
    SceneParams,
    default_scene_params,
    make_initial_state,
)
from fluidx12_tpu.render.pipeline import point_light_ok, render_frame
from fluidx12_tpu.sim.step import simulate


class SmokeModel:
    """Functional sim+render pipeline for one configuration."""

    def __init__(
        self,
        config: FluidConfig,
        method: RenderMethod = RenderMethod.RAY_MARCH_SEPARATE,
        sh_coeffs: Optional[jax.Array] = None,
        lod: int = 0,
        camera: Optional[OrbitCamera] = None,
    ):
        self.config = config.validate()
        self.method = method
        self.sh_coeffs = sh_coeffs
        self.lod = lod
        cfg = self.config
        self.camera = camera or OrbitCamera(
            width=cfg.viewport[0], height=cfg.viewport[1],
            fov_y=cfg.fov_y, z_near=cfg.z_near, z_far=cfg.z_far)
        self.world = m3.scaling(cfg.volume_scale)
        self.world_i = m3.inverse(self.world)
        self.point_ok = point_light_ok(cfg)

        # Host-static per-pose extras, mirroring the engine's caches
        # (engine/fluidx.py:_screen_rect/_direct_plane_spec/update_frame):
        # they are part of the jit specialization, valid for THIS camera.
        self.rect = None
        self.vis_mask = None
        self.plane_spec = None
        if cfg.is_3d:
            from fluidx12_tpu.core.lod import gen_visibility_mask, screen_bbox

            wvp = self.world @ self.camera.view_proj
            self.rect = screen_bbox(wvp, cfg.viewport)
            if cfg.face_cull != FaceCullMode.NONE:
                self.vis_mask = gen_visibility_mask(self.world_i,
                                                    self.camera.eye)
            if (cfg.fast_render and self.point_ok
                    and not method.uses_cube_map):
                from fluidx12_tpu.render.screencomp import direct_plane_spec

                local_eye = (np.append(
                    np.asarray(self.camera.eye, np.float64), 1.0)
                    @ self.world_i)[:3]
                self.plane_spec = direct_plane_spec(
                    local_eye, wvp, cfg.viewport, cfg,
                    density_scale=1.0 / (1 << lod))

    def init(self) -> FluidState:
        return make_initial_state(self.config)

    def default_params(self) -> SceneParams:
        """SceneParams for the model's camera (the app's startup view)."""
        cfg = self.config
        wvp = self.world @ self.camera.view_proj
        return default_scene_params(cfg)._replace(
            eye_pt=jnp.asarray(self.camera.eye),
            world=jnp.asarray(self.world),
            world_i=jnp.asarray(self.world_i),
            world_view_proj=jnp.asarray(wvp),
            world_view_proj_i=jnp.asarray(m3.inverse(wvp)),
            screen_to_world=jnp.asarray(m3.inverse(self.camera.view_proj)),
        )

    def step(self, state: FluidState, params: SceneParams) -> Tuple[FluidState, jax.Array]:
        """One fused sim+render step; returns (state, (H, W, 3) image)."""
        cfg = self.config
        state = simulate(state, params.time_step, cfg)
        grid = state.color
        if cfg.is_3d and tuple(grid.shape[-3:]) != tuple(cfg.zyx):
            from fluidx12_tpu.core.padding import crop_to_logical

            grid = crop_to_logical(grid, cfg)

        image = render_frame(grid, params, cfg, self.method, self.sh_coeffs,
                             lod=self.lod, vis_mask=self.vis_mask,
                             plane_spec=self.plane_spec, rect=self.rect,
                             point_ok=self.point_ok)
        return state, image
