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
    """Persistent simulation state (everything that survives a frame).

    Velocity and color live in ONE combined (7, Z, Y, X) array: the whole
    advection chain streams all 7 channels together (ops/pallas/advect.py),
    and keeping them separate forced a 7-channel concatenate+split per step
    (~2 ms of pure HBM copy at 256^3, measured round 3).  The reference's
    separate RGBA16F textures (Fluid.cpp:204-216) are a D3D12 resource
    artifact, not a semantic one; `velocity`/`color` remain as views.
    """

    fields: jax.Array    # (7, Z, Y, X): [0:3] velocity xyz, [3:7] premult RGBA
    pressure: jax.Array  # (Z, Y, X) Poisson scratch, persistent for warm start

    @property
    def velocity(self) -> jax.Array:
        """(3, Z, Y, X) sim-space velocity view (x, y, z components)."""
        return self.fields[:3]

    @property
    def color(self) -> jax.Array:
        """(4, Z, Y, X) premultiplied RGBA smoke color view."""
        return self.fields[3:]

    @classmethod
    def from_parts(cls, velocity: jax.Array, color: jax.Array,
                   pressure: jax.Array) -> "FluidState":
        return cls(fields=jnp.concatenate([velocity, color], axis=0),
                   pressure=pressure)

    def with_velocity(self, velocity: jax.Array) -> "FluidState":
        return self._replace(
            fields=jnp.concatenate([velocity, self.fields[3:]], axis=0))

    def with_color(self, color: jax.Array) -> "FluidState":
        return self._replace(
            fields=jnp.concatenate([self.fields[:3], color], axis=0))


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


def make_initial_state(config: FluidConfig, pad: bool = True) -> FluidState:
    """All-zero fields, like freshly created D3D12 committed resources.

    Non-roll-clean grids (the FluidGI 150^3 preset) allocate the padded
    storage layout (core/padding.py): the logical volume sits at the origin
    of a roll-clean (Zp, Yp, Xp) array so every Pallas kernel tiles it.
    pad=False forces the compact logical layout (the multi-chip Z-slab
    decomposition defines its own layout; parallel/domain.shard_state)."""
    from fluidx12_tpu.core.padding import storage_zyx

    z, y, x = storage_zyx(config) if pad else config.zyx
    dt = config.sim_dtype
    return FluidState(
        fields=jnp.zeros((7, z, y, x), dtype=dt),
        pressure=jnp.zeros((z, y, x), dtype=jnp.float32),
    )


_PACKED_SIZE = 99


def pack_scene_params_host(
    time_step, base_seed, eye_pt, light_pt, light_color, ambient,
    world, world_i, world_view_proj, world_view_proj_i, screen_to_world,
    num_samples, num_light_samples, visibility_mask,
) -> np.ndarray:
    """Flatten all per-frame scalars/matrices into ONE f32 array (host side).

    The per-frame host->device upload then costs a single transfer instead of
    ~14 small ones -- the analog of the reference's single mapped CB write
    per frame (Fluid.cpp:288-321).  Integer fields ride as exact small
    floats.
    """
    out = np.empty(_PACKED_SIZE, np.float32)
    out[0] = time_step
    out[1] = float(int(base_seed) % (1 << 24))
    out[2:5] = eye_pt
    out[5:8] = light_pt
    out[8:12] = light_color
    out[12:16] = ambient
    out[16:32] = np.asarray(world, np.float32).ravel()
    out[32:48] = np.asarray(world_i, np.float32).ravel()
    out[48:64] = np.asarray(world_view_proj, np.float32).ravel()
    out[64:80] = np.asarray(world_view_proj_i, np.float32).ravel()
    out[80:96] = np.asarray(screen_to_world, np.float32).ravel()
    out[96] = float(num_samples)
    out[97] = float(num_light_samples)
    out[98] = float(visibility_mask)
    return out


def unpack_scene_params(flat: jax.Array) -> SceneParams:
    """In-graph inverse of pack_scene_params_host."""
    return SceneParams(
        time_step=flat[0],
        base_seed=flat[1].astype(jnp.uint32),
        eye_pt=flat[2:5],
        light_pt=flat[5:8],
        light_color=flat[8:12],
        ambient=flat[12:16],
        world=flat[16:32].reshape(4, 4),
        world_i=flat[32:48].reshape(4, 4),
        world_view_proj=flat[48:64].reshape(4, 4),
        world_view_proj_i=flat[64:80].reshape(4, 4),
        screen_to_world=flat[80:96].reshape(4, 4),
        num_samples=flat[96].astype(jnp.int32),
        num_light_samples=flat[97].astype(jnp.int32),
        visibility_mask=flat[98].astype(jnp.int32),
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
