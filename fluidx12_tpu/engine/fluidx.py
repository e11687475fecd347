"""The application engine: per-frame host math + one fused device program.

Mirrors the reference frame (SURVEY.md section 3): FluidX::OnUpdate computes
camera/LOD scalars on the CPU (FluidX12.cpp:257-285, Fluid::UpdateFrame,
Fluid.cpp:283-346), then PopulateCommandList records simulate + render
(FluidX12.cpp:435-588).  Here "record + execute" is a single jitted, donated
`_step_and_render` call per frame; JAX async dispatch provides the
triple-buffered frames-in-flight behavior (the host never blocks until it
touches the output image).

The jit cache keyed on (render method, LOD) is the analog of the reference's
PipelineLib PSO cache: at most 4 methods x 5 mips variants, compiled on first
use.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fluidx12_tpu.core import math3d as m3
from fluidx12_tpu.core.camera import OrbitCamera
from fluidx12_tpu.core.config import FaceCullMode, FluidConfig, RenderMethod
from fluidx12_tpu.core.lod import estimate_cube_map_lod, gen_visibility_mask
from fluidx12_tpu.core.state import (
    FluidState,
    make_initial_state,
    pack_scene_params_host,
    unpack_scene_params,
)
from fluidx12_tpu.gi.sh import project_cubemap_sh
from fluidx12_tpu.render.environment import render_environment
from fluidx12_tpu.render.pipeline import point_light_ok, render_frame
from fluidx12_tpu.sim.step import simulate


class FluidXEngine:
    """Owns config, camera, state and the compiled step/render programs."""

    def __init__(self, config: FluidConfig, radiance: Optional[np.ndarray] = None):
        self.config = config.validate()
        self.camera = OrbitCamera(
            width=config.viewport[0],
            height=config.viewport[1],
            fov_y=config.fov_y,
            z_near=config.z_near,
            z_far=config.z_far,
        )
        self.world = m3.scaling(config.volume_scale)
        self.world_i = m3.inverse(self.world)
        self.state = make_initial_state(config)
        self.render_method = RenderMethod.RAY_MARCH_SEPARATE
        self.is_paused = False
        self.frame_index = 0

        # Light probe: DDS radiance -> SH coefficients, once at startup
        # (ref: TransformSH on the first frame, FluidX12.cpp:455-461).
        self.radiance = None
        self.sh_coeffs = None
        if radiance is not None and config.has_light_probe:
            self.radiance = jnp.asarray(radiance, dtype=jnp.float32)
            self.sh_coeffs = project_cubemap_sh(self.radiance, order=3)[:9]

        self._programs: Dict[Tuple[RenderMethod, int], callable] = {}
        # Host-side per-frame caches (VERDICT r2 item 8: the repeated
        # matrix/LOD math + params re-upload cost ~1.2 ms/frame at 128^3).
        # Keyed on camera pose + pause state: a static camera re-uses the
        # packed device params and the plane spec; any orbit/dolly/pause
        # invalidates.  CAVEAT: the packed upload includes BaseSeed, so a
        # static camera FREEZES the seed at its first-frame value.  That is
        # harmless only while no kernel consumes BaseSeed (parity-only
        # field, core/state.py); a kernel that starts using it must exclude
        # the seed slot from this cache (e.g. pass it as a separate scalar).
        self._frame_key = None
        self._frame_cache: Optional[Tuple[jax.Array, int, Optional[int]]] = None
        self._plane_key = None
        self._plane_cache = None
        self._rect_key = None
        self._rect_cache = None
        self._env_key = None
        self._env_cache = None
        self._env_prog = None

    # ------------------------------------------------------------------
    # Host-side per-frame update (the CB upload analog)
    # ------------------------------------------------------------------
    def update_frame(self) -> Tuple[jax.Array, int, Optional[int]]:
        """Packed per-frame params + cube-map LOD + static visibility mask;
        ref Fluid::UpdateFrame.  The mask is None under FaceCullMode.NONE
        (in-graph visibility test) and otherwise keys the jit cache so
        culled faces are never traced (ref skips their dispatches,
        Fluid.cpp:880-887)."""
        cfg = self.config
        dt = 0.0 if self.is_paused else cfg.time_step
        pose = (dt, self.camera.view.tobytes(), self.camera.proj.tobytes())
        if pose == self._frame_key and self._frame_cache is not None:
            return self._frame_cache
        wvp = self.world @ self.camera.view_proj
        wvp_i = m3.inverse(wvp)
        screen_to_world = m3.inverse(self.camera.view_proj)

        lod, ray_samples = 0, cfg.max_ray_samples
        mask = 0b111111
        if cfg.is_3d:
            lod, ray_samples = estimate_cube_map_lod(
                cfg.max_ray_samples, cfg.num_cube_mips, float(cfg.cube_map_size),
                wvp, cfg.viewport,
            )
            mask = gen_visibility_mask(self.world_i, self.camera.eye)

        # One packed f32 array = one host->device transfer per frame (the
        # analog of the reference's single CB upload, Fluid.cpp:288-321).
        flat = pack_scene_params_host(
            dt, (self.frame_index * 2654435761) % (1 << 24),
            np.asarray(self.camera.eye, np.float32),
            np.array(cfg.light_pos, np.float32),
            np.array(cfg.light_color, np.float32),
            np.array(cfg.ambient, np.float32),
            self.world, self.world_i, wvp, wvp_i, screen_to_world,
            ray_samples, cfg.max_light_samples, mask,
        )
        vis_mask = None if cfg.face_cull == FaceCullMode.NONE else mask
        self._frame_key = pose
        self._frame_cache = (jnp.asarray(flat), lod, vis_mask)
        return self._frame_cache

    # ------------------------------------------------------------------
    # Device-side fused step (jitted per method x lod)
    # ------------------------------------------------------------------
    def _build_program(self, method: RenderMethod, lod: int,
                       vis_mask: Optional[int] = None,
                       plane_spec=None, rect=None, batch: int = 1):
        cfg = self.config

        # Host-evaluated gates, warned once at build: the traced dispatch
        # itself lives in render/pipeline.render_frame (the ONE branching
        # site shared with SmokeModel).
        point_ok = point_light_ok(cfg)
        if cfg.fast_render and not point_ok:
            import warnings

            warnings.warn(
                "point_light with the light inside the volume: the "
                "projective sweep needs an exterior light; using "
                "the faithful per-ray paths.",
                stacklevel=2,
            )

        def step_and_render(state: FluidState, packed_params,
                            sh_coeffs, env_bg):
            params = unpack_scene_params(packed_params)
            state = simulate(state, params.time_step, cfg)
            grid = state.color
            if cfg.is_3d and tuple(grid.shape[-3:]) != tuple(cfg.zyx):
                # Padded storage layout (core/padding.py): render passes
                # consume the compact logical volume (one ~0.1 ms slice).
                from fluidx12_tpu.core.padding import crop_to_logical

                grid = crop_to_logical(grid, cfg)

            # The env background is a host-side per-pose cache (_env_bg,
            # like the packed CB / scissor rect): a static camera never
            # re-fetches the cube map (VERDICT r3 item 2).
            image = render_frame(grid, params, cfg, method, sh_coeffs,
                                 lod=lod, vis_mask=vis_mask,
                                 plane_spec=plane_spec, rect=rect,
                                 env_bg=env_bg, point_ok=point_ok)
            return state, image

        if batch == 1:
            return jax.jit(step_and_render, donate_argnums=(0,))

        # Throughput mode: `batch` whole frames under one lax.scan, ONE
        # device dispatch.  The axon/PCIe dispatch+sync overhead (~1-2 ms,
        # variable) amortizes across the batch -- the TPU analog of the
        # reference recording several frames' command lists before a single
        # ExecuteCommandLists.  Per-frame params are loop-invariant by
        # construction (a static camera reuses the packed upload and
        # base_seed is a parity-only field), so the scan is EXACTLY `batch`
        # sequential frames; every frame's image is computed and returned
        # as a stacked (batch, H, W, 3) array.
        def step_and_render_batched(state: FluidState, packed_params,
                                    sh_coeffs, env_bg):
            def body(carry, _):
                carry, image = step_and_render(carry, packed_params,
                                               sh_coeffs, env_bg)
                return carry, image

            state, images = jax.lax.scan(body, state, None, length=batch)
            return state, images

        return jax.jit(step_and_render_batched, donate_argnums=(0,))

    def _program(self, method: RenderMethod, lod: int,
                 vis_mask: Optional[int] = None, plane_spec=None, rect=None,
                 batch: int = 1):
        key = (method, lod, vis_mask, plane_spec, rect, batch)
        if key not in self._programs:
            self._programs[key] = self._build_program(method, lod, vis_mask,
                                                      plane_spec, rect, batch)
        return self._programs[key]

    def _screen_rect(self):
        """Host-static screen bbox of the volume (core.lod.screen_bbox),
        cached on the camera pose; part of the jit-cache key (the analog of
        the reference's scissor from rasterizing only the cube's faces)."""
        if not self.config.is_3d:
            return None
        pose = (self.camera.view.tobytes(), self.camera.proj.tobytes())
        if pose == self._rect_key:
            return self._rect_cache
        from fluidx12_tpu.core.lod import screen_bbox

        self._rect_key = pose
        self._rect_cache = screen_bbox(self.world @ self.camera.view_proj,
                                       self.config.viewport)
        return self._rect_cache

    def _direct_plane_spec(self, lod: int = 0):
        """Static base-plane geometry for the fast DIRECT methods, or None
        (eye inside the volume / fast path off).  Host math; quantized, so
        an orbiting camera retraces only at coarse thresholds.  The LOD
        controller halves the base-plane texel density per mip level --
        the DIRECT analog of the cube path marching at mip resolution
        (ref: the LOD-clamped sample count binding, Fluid.cpp:968)."""
        cfg = self.config
        if not (cfg.fast_render and cfg.is_3d):
            return None
        if cfg.point_light:
            from fluidx12_tpu.render.lightmap_sweep import point_sweep_supported

            if not point_sweep_supported(cfg):
                return None
        pose = (self.camera.view.tobytes(), self.camera.proj.tobytes(), lod)
        if pose == self._plane_key:
            return self._plane_cache
        from fluidx12_tpu.render.screencomp import direct_plane_spec

        local_eye = (np.append(np.asarray(self.camera.eye, np.float64), 1.0)
                     @ self.world_i)[:3]
        wvp = self.world @ self.camera.view_proj
        self._plane_key = pose
        self._plane_cache = direct_plane_spec(
            local_eye, wvp, cfg.viewport, cfg,
            density_scale=1.0 / (1 << lod))
        return self._plane_cache

    def _env_bg(self, packed_params) -> Optional[jax.Array]:
        """The environment-sky background, rendered once per camera pose.

        The sky (render_environment: a per-pixel cube-map record gather at
        viewport resolution) depends only on the pose and the radiance map,
        NOT on the sim state -- so like the packed CB and the scissor rect
        it is a host-side cache: a static camera pays it once, not per
        frame (ref FluidX12.cpp:469-484 re-rasterizes it per frame because
        a GPU raster pass is ~free there; the TPU analog is a gather pass
        worth caching)."""
        if self.radiance is None or not self.config.is_3d:
            return None
        pose = (self.camera.view.tobytes(), self.camera.proj.tobytes())
        if pose == self._env_key:
            return self._env_cache
        if self._env_prog is None:
            cfg = self.config

            def env(radiance, packed):
                return render_environment(
                    radiance, unpack_scene_params(packed), cfg)

            self._env_prog = jax.jit(env)
        self._env_key = pose
        self._env_cache = self._env_prog(self.radiance, packed_params)
        return self._env_cache

    # ------------------------------------------------------------------
    def step_frame(self) -> jax.Array:
        """One full frame; returns the (H, W, 3) float image (device array)."""
        params, lod, vis_mask = self.update_frame()
        plane_spec = (self._direct_plane_spec(lod)
                      if not self.render_method.uses_cube_map else None)
        program = self._program(self.render_method, lod, vis_mask, plane_spec,
                                self._screen_rect())
        self.state, image = program(self.state, params, self.sh_coeffs,
                                    self._env_bg(params))
        self.frame_index += 1
        return image

    def step_frames(self, k: int) -> jax.Array:
        """`k` frames in ONE device dispatch; returns (k, H, W, 3) images.

        Scan-batched throughput mode (see _build_program): identical frame
        semantics to `k` step_frame() calls with a static camera, minus
        `k - 1` host round-trips.  Use for headless / offline rendering;
        the interactive loop keeps k=1 so hotkeys act between frames."""
        if k <= 1:
            return self.step_frame()[None]
        params, lod, vis_mask = self.update_frame()
        plane_spec = (self._direct_plane_spec(lod)
                      if not self.render_method.uses_cube_map else None)
        program = self._program(self.render_method, lod, vis_mask, plane_spec,
                                self._screen_rect(), batch=k)
        self.state, images = program(self.state, params, self.sh_coeffs,
                                     self._env_bg(params))
        self.frame_index += k
        return images

    # -- hotkey analogs (ref: FluidX12.cpp:311-334) ---------------------
    def toggle_pause(self):
        self.is_paused = not self.is_paused

    def next_method(self):
        self.render_method = self.render_method.next()

    def prev_method(self):
        self.render_method = self.render_method.prev()

    def toggle_ez(self) -> bool:
        """Switch between the fast and faithful implementation stacks.

        The analog of the reference's 'X' hotkey (FluidX12.cpp:330-332),
        which flips m_useEZ between the Core and EZ code paths at runtime.
        Here the two stacks are faithful (reference semantics) vs fast
        (TPU-native reformulations); flipping invalidates the compiled
        program cache so the next frame re-traces with the new stack.
        Returns the new fast-stack state."""
        import dataclasses

        fast = not self.config.fast_render
        self.config = dataclasses.replace(
            self.config, fast_render=fast, fast_sim=fast)
        self._programs.clear()
        return fast
