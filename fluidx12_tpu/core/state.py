"""Simulation state pytree and per-frame scene parameters.

The reference's GPU resources (SURVEY.md section 2.4, Fluid.cpp:189-270) map to:

    m_velocities[2] (RGBA16F ping-pong)  -> FluidState.velocity (3, Z, Y, X)
    m_colors[2]     (RGBA16F ping-pong)  -> FluidState.color    (4, Z, Y, X)
    m_incompress    (R32F, warm start)   -> FluidState.pressure (Z, Y, X)
    m_cbSimulation/PerFrame/PerObject    -> SceneParams (one small host->device
                                            transfer per frame)
    m_coeffSH                            -> FluidState.sh_coeffs (9, 3)

Ping-pong buffers and m_frameParity disappear: functional updates plus
`donate_argnums` give double-buffering for free.  The cube map and light map
are recomputed every frame, so they are pass outputs, not state.

Array layout is (channel, Z, Y, X): X is the fastest axis and lands on the
TPU 128-lane dimension, Y on sublanes; channels lead so each component is a
contiguous, well-tiled (Z, Y, X) volume.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from fluidx12_tpu.core.config import FluidConfig


class FluidState(NamedTuple):
    """Persistent simulation state (everything that survives a frame)."""

    velocity: jax.Array  # (3, Z, Y, X) sim-space velocity (x, y, z components)
    color: jax.Array     # (4, Z, Y, X) premultiplied RGBA smoke color
    pressure: jax.Array  # (Z, Y, X) Poisson scratch, persistent for warm start


class SceneParams(NamedTuple):
    """Per-frame dynamic inputs (the analog of the reference's constant buffers).

    All matrices are row-vector convention: point transforms are `(p, 1) @ M`
    (the reference stores them transposed for HLSL's `mul(v, M)`; we keep the
    natural row-vector layout end to end).
    """

    time_step: jax.Array          # () f32, 0 when paused (CBSimulation.TimeStep)
    base_seed: jax.Array          # () u32 (CBSimulation.BaseSeed; unused by kernels, kept for parity)
    eye_pt: jax.Array             # (3,) world-space eye (CBPerFrame.EyePos)
    light_pt: jax.Array           # (3,) world-space light point/direction anchor
    light_color: jax.Array        # (4,) rgb + intensity
    ambient: jax.Array            # (4,) rgb + intensity
    world: jax.Array              # (4, 4)  volume -> world
    world_i: jax.Array            # (4, 4)  world -> volume
    world_view_proj: jax.Array    # (4, 4)  volume -> clip
    world_view_proj_i: jax.Array  # (4, 4)  clip -> volume
    screen_to_world: jax.Array    # (4, 4)  clip -> world (for the environment pass)
    num_samples: jax.Array        # () i32 LOD-clamped view-ray sample count
    num_light_samples: jax.Array  # () i32 light-ray sample count
    visibility_mask: jax.Array    # () i32 bitmask of visible cube faces (bit f = face f)


def make_initial_state(config: FluidConfig) -> FluidState:
    """All-zero fields, like freshly created D3D12 committed resources."""
    z, y, x = config.zyx
    dt = config.sim_dtype
    return FluidState(
        velocity=jnp.zeros((3, z, y, x), dtype=dt),
        color=jnp.zeros((4, z, y, x), dtype=dt),
        pressure=jnp.zeros((z, y, x), dtype=jnp.float32),
    )


def default_scene_params(config: FluidConfig) -> SceneParams:
    """Host-side convenience: identity matrices, default light, full visibility."""
    eye = np.zeros(3, np.float32)
    ident = np.eye(4, dtype=np.float32)
    return SceneParams(
        time_step=jnp.float32(config.time_step),
        base_seed=jnp.uint32(0),
        eye_pt=jnp.asarray(eye),
        light_pt=jnp.asarray(np.array(config.light_pos, np.float32)),
        light_color=jnp.asarray(np.array(config.light_color, np.float32)),
        ambient=jnp.asarray(np.array(config.ambient, np.float32)),
        world=jnp.asarray(ident),
        world_i=jnp.asarray(ident),
        world_view_proj=jnp.asarray(ident),
        world_view_proj_i=jnp.asarray(ident),
        screen_to_world=jnp.asarray(ident),
        num_samples=jnp.int32(config.max_ray_samples),
        num_light_samples=jnp.int32(config.max_light_samples),
        visibility_mask=jnp.int32(0b111111),
    )
