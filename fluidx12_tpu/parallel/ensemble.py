"""Data-parallel ensembles of independent smoke simulations.

The spatial decomposition (parallel/domain.py, parallel/render.py) scales
ONE simulation across the mesh; this module scales MANY independent
simulations -- parameter sweeps, per-client camera views, variance
studies, batch offline rendering -- as one jitted program: the whole
sim+render pipeline (models/smoke.SmokeModel.step) vmaps over a leading
member axis, and the member dim is sharded across the mesh, so XLA
partitions every op along it with ZERO collectives (pure data
parallelism; each device runs batch/n full pipelines).

This is a new capability relative to the reference (a single-GPU
interactive app, /root/reference/FluidX12/FluidX12.cpp): the TPU-native
analog of running N app instances is one program over a (B, ...) state
pytree -- bigger, better-shaped MXU/VPU batches at small grid sizes, one
dispatch per frame for the whole fleet.

Members share the static config (grid size, impulse source, render
method); they diverge through their initial conditions (`init` seeds
distinct small velocity/dye noise per member) and/or per-member
SceneParams (each member can have its own camera, light, or pause state
-- every leaf of the stacked params carries a leading member axis).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fluidx12_tpu.core.config import FluidConfig, RenderMethod
from fluidx12_tpu.core.state import FluidState, SceneParams
from fluidx12_tpu.models.smoke import SmokeModel
from fluidx12_tpu.parallel.mesh import Z_AXIS

MEMBER_AXIS = "m"


class SmokeEnsemble:
    """B independent sim+render pipelines as one vmapped program.

    Usage (the members-sharded form; works identically without a mesh):

        ens = SmokeEnsemble(FluidConfig(), batch=8, mesh=make_grid_mesh())
        states, params = ens.shard(ens.init(seed=0)), ens.shard(ens.default_params())
        step = jax.jit(ens.step, donate_argnums=(0,))
        states, images = step(states, params)   # images: (B, H, W, 3)
    """

    def __init__(
        self,
        config: FluidConfig,
        batch: int,
        mesh: Optional[Mesh] = None,
        method: RenderMethod = RenderMethod.RAY_MARCH_SEPARATE,
        sh_coeffs: Optional[jax.Array] = None,
    ):
        if batch < 1:
            raise ValueError(f"batch must be >= 1, got {batch}")
        if mesh is not None and batch % mesh.devices.size:
            raise ValueError(
                f"batch {batch} must divide evenly over the "
                f"{mesh.devices.size}-device mesh (pure data parallelism)")
        self.model = SmokeModel(config, method, sh_coeffs)
        self.batch = batch
        self.mesh = mesh

    # ------------------------------------------------------------------
    def init(self, seed: int = 0, noise: float = 0.05) -> FluidState:
        """(B, ...) initial states with per-member velocity/dye noise.

        The impulse source is shared static config, so identical initial
        states would stay identical forever; small distinct perturbations
        make the buoyant plumes diverge (the chaotic advection amplifies
        them), which is the point of an ensemble."""
        cfg = self.model.config
        z, y, x = cfg.zyx
        key_v, key_c = jax.random.split(jax.random.PRNGKey(seed))
        dt = cfg.sim_dtype
        fields = jnp.zeros((self.batch, 7, z, y, x), dtype=dt)
        if noise:
            vel = noise * jax.random.normal(key_v, (self.batch, 3, z, y, x))
            dye = (0.5 * noise
                   * jax.random.uniform(key_c, (self.batch, 4, z, y, x)))
            fields = jnp.concatenate(
                [vel.astype(dt), dye.astype(dt)], axis=1)
        return FluidState(
            fields=fields,
            pressure=jnp.zeros((self.batch, z, y, x), dtype=jnp.float32),
        )

    def default_params(self) -> SceneParams:
        """The default single-member params stacked B times; callers may
        replace any leaf with genuinely per-member values (e.g. one camera
        per member) as long as the leading axis stays B."""
        p = self.model.default_params()
        return jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a[None], (self.batch,) + a.shape), p)

    def shard(self, tree):
        """Lay a (B, ...) pytree out member-sharded over the mesh (leading
        axis split, everything else replicated); identity without a mesh."""
        if self.mesh is None:
            return tree
        axis = self.mesh.axis_names[0]
        return jax.device_put(tree, NamedSharding(self.mesh, P(axis)))

    def step(self, states: FluidState,
             params: SceneParams) -> Tuple[FluidState, jax.Array]:
        """One frame for every member; returns (states, (B, H, W, 3))."""
        return jax.vmap(self.model.step)(states, params)


# ----------------------------------------------------------------------
# Composed data x spatial parallelism (2D mesh: members x Z-slabs)
# ----------------------------------------------------------------------

def make_ensemble_mesh(n_members: int, n_slabs: int,
                       devices: Optional[Sequence] = None) -> Mesh:
    """2D mesh (MEMBER_AXIS, Z_AXIS): ensemble members across rows, each
    member's grid Z-decomposed across the row's columns."""
    if devices is None:
        devices = jax.devices()
    need = n_members * n_slabs
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    return Mesh(np.array(devices[:need]).reshape(n_members, n_slabs),
                (MEMBER_AXIS, Z_AXIS))


def sharded_ensemble_simulate(states: FluidState, time_step,
                              config: FluidConfig, mesh: Mesh) -> FluidState:
    """One sim step for a (B, ...) ensemble on a (members x slabs) mesh.

    Composes the two scaling modes: the member axis is pure data
    parallelism (zero collectives) and each member's grid runs the spatial
    Z-slab decomposition (parallel/domain.py) within its mesh row -- the
    domain kernels are plain functions whose `ppermute`/halo collectives
    name Z_AXIS, so `jax.vmap` over the local member dim batches them
    unchanged.  This is the production topology for sweeping a grid too
    big for one chip: B x n sharded sims, one program."""

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(MEMBER_AXIS, None, Z_AXIS, None, None),
                  P(MEMBER_AXIS, Z_AXIS, None, None), P()),
        out_specs=(P(MEMBER_AXIS, None, Z_AXIS, None, None),
                   P(MEMBER_AXIS, Z_AXIS, None, None)),
    )
    def step(fields, pressure, dt):
        from fluidx12_tpu.parallel.domain import (
            _sharded_advect,
            _sharded_project,
        )

        dt = dt.reshape(())
        store = fields.dtype

        def one(f, q):
            # Single-member body == parallel/domain.sharded_simulate's:
            # f32 arithmetic, quantize once at the state boundary.
            vel, col = _sharded_advect(f[:3].astype(jnp.float32),
                                       f[3:].astype(jnp.float32), dt, config)
            vel, q = _sharded_project(vel, q, dt, config)
            return jnp.concatenate([vel, col], axis=0).astype(store), q

        return jax.vmap(one)(fields, pressure)

    dt_arr = jnp.asarray(time_step, jnp.float32).reshape(1)
    fields, pressure = step(states.fields, states.pressure, dt_arr)
    return FluidState(fields=fields, pressure=pressure)


def sharded_ensemble_render(grids: jax.Array, params: SceneParams,
                            config: FluidConfig, mesh: Mesh,
                            sh_coeffs=None) -> jax.Array:
    """Render (B, H, W, 4) premultiplied frames from (B, 4, Z, Y, X)
    member color grids on a (members x slabs) mesh.

    The per-shard render body (parallel/render._render_local: decomposed
    light sweep + slice-parallel/psum-split cube march + resolve) names
    only Z_AXIS in its collectives, so vmap over the local member dim
    batches it unchanged -- same composition rule as
    sharded_ensemble_simulate.  Each member may carry its own SceneParams
    (camera, light, sample budgets)."""
    from fluidx12_tpu.parallel.light import sharded_light_supported
    from fluidx12_tpu.parallel.render import (
        _render_local,
        slice_parallel_render_supported,
    )

    n_slabs = dict(zip(mesh.axis_names, mesh.devices.shape))[Z_AXIS]
    if not slice_parallel_render_supported(config, n_slabs):
        raise ValueError(
            f"grid {config.grid_size} does not slice-parallelize over "
            f"{n_slabs} Z-slabs (the 1D path would fall back to a gathered "
            "render; on the composed mesh, use a supported shape)")
    x, y, z = config.grid_size
    sizes = (x, y, z)
    cap = max(config.max_ray_samples, 1)
    strides = {a: max(-(-sizes[a] // cap), 1) for a in range(3)}
    zl = z // n_slabs
    light_sharded = sharded_light_supported(config, n_slabs)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(MEMBER_AXIS, None, Z_AXIS, None, None), P(MEMBER_AXIS)),
        out_specs=P(MEMBER_AXIS),
        check_vma=False,
    )
    def render(grids_local, params_local):
        def one(g, p):
            return _render_local(g, p, config, sh_coeffs, sizes=sizes,
                                 strides=strides, zl=zl,
                                 light_sharded=light_sharded)

        return jax.vmap(one)(grids_local, params_local)

    return render(grids, params)
