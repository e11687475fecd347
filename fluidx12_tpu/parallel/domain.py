"""Sharded simulation step: spatial domain decomposition with ICI halo exchange.

The grid is split along Z across a 1D `Mesh` (parallel/mesh.py); every
stencil/sampling pass runs under `shard_map` with explicit neighbor halo
exchange over `lax.ppermute` (SURVEY.md section 5.7: "ring-style neighbor
exchange over ICI for the 1-cell stencil halo"):

- advection exchanges an `ADVECT_HALO`-slab halo once and clamps the
  backtrace to it (semi-Lagrangian displacement is CFL-bounded in practice;
  `|u_z| * dt * Z <= ADVECT_HALO` voxels holds by a wide margin for the
  reference forcing, where |u| stays O(1) in sim units and dt = 2/N),
- the Jacobi pressure solve is halo-depth batched: one k-plane exchange buys
  k local sweeps with redundant halo recompute (8 exchanges per 64-sweep
  solve instead of 64 -- per-sweep 1-plane messages are ICI latency poison),
- divergence/gradient/boundary passes are local after a 1-plane exchange.

This is the simulation analog of sequence parallelism: the state never
materializes on one chip.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fluidx12_tpu.core.config import FluidConfig
from fluidx12_tpu.core.state import FluidState
from fluidx12_tpu.ops.sampling import AddressMode, trilinear_sample, neighbor_shift
from fluidx12_tpu.parallel.mesh import Z_AXIS

ADVECT_HALO = 4  # z-slabs exchanged for the semi-Lagrangian backtrace


def shard_state(state: FluidState, mesh: Mesh,
                config: FluidConfig = None) -> FluidState:
    """Place the state with Z sharded across the mesh.

    Pass `config` when the state may carry the single-chip padded storage
    layout (core/padding.py, e.g. a restored 150^3 checkpoint): the
    Z-slab decomposition defines its own layout, so padded states are
    cropped to the logical volume first."""
    if config is not None:
        from fluidx12_tpu.core.padding import crop_to_logical, is_padded

        if is_padded(state.fields, config):
            state = FluidState(
                fields=crop_to_logical(state.fields, config),
                pressure=crop_to_logical(state.pressure, config))
    s4 = NamedSharding(mesh, P(None, Z_AXIS, None, None))
    s3 = NamedSharding(mesh, P(Z_AXIS, None, None))
    return FluidState(
        fields=jax.device_put(state.fields, s4),
        pressure=jax.device_put(state.pressure, s3),
    )


def _exchange_z_halo(x: jax.Array, halo: int, axis: int) -> jax.Array:
    """Append `halo` planes from both z-neighbors (edge-clamped at the ends).

    x: local block with z on `axis`. Returns x extended by 2*halo planes.
    """
    n = jax.lax.axis_size(Z_AXIS)
    idx = jax.lax.axis_index(Z_AXIS)

    def take(a, sl):
        ix = [slice(None)] * a.ndim
        ix[axis] = sl
        return a[tuple(ix)]

    lo_slab = take(x, slice(0, halo))            # my lowest planes -> right... (sent down)
    hi_slab = take(x, slice(x.shape[axis] - halo, x.shape[axis]))

    if n > 1:
        # neighbor i+1 receives my high slab as its lower halo, etc.
        fwd = [(i, i + 1) for i in range(n - 1)]
        bwd = [(i + 1, i) for i in range(n - 1)]
        lower_halo = jax.lax.ppermute(hi_slab, Z_AXIS, fwd)   # from idx-1
        upper_halo = jax.lax.ppermute(lo_slab, Z_AXIS, bwd)   # from idx+1
    else:
        lower_halo = hi_slab
        upper_halo = lo_slab

    # Global edges: replicate own edge plane (the clamp addressing of the
    # single-chip stencils, CSProject3D.hlsl:77-88).
    edge_lo = jnp.repeat(take(x, slice(0, 1)), halo, axis=axis)
    edge_hi = jnp.repeat(take(x, slice(x.shape[axis] - 1, x.shape[axis])), halo, axis=axis)
    lower_halo = jnp.where(idx == 0, edge_lo, lower_halo)
    upper_halo = jnp.where(idx == n - 1, edge_hi, upper_halo)
    return jnp.concatenate([lower_halo, x, upper_halo], axis=axis)


def _sharded_advect(velocity, color, time_step, config: FluidConfig):
    """Local advection over a halo-extended block (see sim/advect.py for the
    physics; cites CSAdvect.hlsl)."""
    dtype = velocity.dtype
    dt = jnp.asarray(time_step, dtype)
    zg, yg, xg = config.zyx  # global extents
    n = jax.lax.axis_size(Z_AXIS)
    idx = jax.lax.axis_index(Z_AXIS)
    zl = velocity.shape[1]  # local z extent
    # Halo cannot exceed the local slab (single-plane neighbor exchange);
    # the backtrace clamp below keeps semantics correct either way.
    h = min(ADVECT_HALO, zl)

    both = jnp.concatenate([velocity, color], axis=0)  # (7, zl, y, x)
    ext = _exchange_z_halo(both, h, axis=1)            # (7, zl + 2h, y, x)

    # Voxel centers in *global* simulation space.
    z0 = idx * zl
    gx = (jnp.arange(xg, dtype=dtype) + 0.5) / xg
    gy = (jnp.arange(yg, dtype=dtype) + 0.5) / yg
    gz = (z0 + jnp.arange(zl, dtype=dtype) + 0.5) / zg
    cz, cy, cx = jnp.meshgrid(gz, gy, gx, indexing="ij")
    pos = jnp.stack([cx, cy, cz], axis=-1)

    u = jnp.moveaxis(velocity, 0, -1)
    adv = pos - u * dt

    # Convert the global z texture coordinate into the halo-extended local
    # frame and clamp to the exchanged range.
    local_z_tex = adv[..., 2] * zg - z0 + h  # texel-space z in ext block
    local_z_tex = jnp.clip(local_z_tex, 0.5, zl + 2 * h - 0.5)
    adv_local = jnp.stack(
        [adv[..., 0], adv[..., 1], local_z_tex / (zl + 2 * h)], axis=-1
    )
    sampled = trilinear_sample(ext, adv_local, mode=AddressMode.MIRROR)
    u_new = jnp.moveaxis(sampled[:3], 0, -1)
    c_new = sampled[3:]

    # Impulse + forces (Impulse.hlsli / CSAdvect.hlsl:57-68).
    disp = pos - jnp.asarray(config.impulse_pos, dtype)
    radius = config.impulse_radius if config.is_3d else config.impulse_radius * 0.5
    d2 = jnp.sum(disp * disp, axis=-1)
    basis = jnp.exp(-4.0 * d2 / (radius * radius))
    in_impulse = basis >= jnp.exp(jnp.asarray(-4.0, dtype))
    ext_force = jnp.asarray(config.ext_force, dtype) * basis[..., None]
    if config.is_3d:
        vort = jnp.stack([-disp[..., 2], jnp.zeros_like(d2), disp[..., 0]], axis=-1) * config.vort_scale
        ext_force = ext_force * config.force_scale_3d + vort
    u_new = u_new + jnp.where(in_impulse[..., None], ext_force * dt, 0.0)

    impulse_rgba = jnp.asarray((*config.impulse_color, 1.0), dtype) * config.impulse_density
    dye = impulse_rgba[:, None, None, None] * (basis * dt)[None]
    c_new = jnp.clip(c_new + jnp.where(in_impulse[None], dye, 0.0), 0.0, 1.0)

    atten = jnp.maximum(1.0 - config.dissipation * dt, 0.0)
    return jnp.moveaxis(u_new, -1, 0) * atten, c_new * atten


def _halo_shift_z(q_ext, offset):
    """Neighbor fetch along halo-extended z: q_ext has 1 extra plane each side."""
    zl = q_ext.shape[0] - 2
    return jax.lax.dynamic_slice_in_dim(q_ext, 1 + offset, zl, axis=0)


# Fine-level halo depth: planes exchanged per round on the Jacobi path.
# Each ICI round trip buys `k` local sweeps (redundant halo recompute), so
# exchanges per 64-sweep solve drop 64 -> 8 -- per-sweep 1-plane exchanges
# are pure latency poison on real ICI (VERDICT r3 item 3; the single-chip
# plane-sweep kernel's `inner`-sweeps windows prove the same trick,
# ops/pallas/jacobi.py).
_SWEEP_HALO = 8


def _sharded_sweeps(q, div, iters: int, is_3d: bool,
                    halo_depth: int = _SWEEP_HALO):
    """`iters` Jacobi sweeps, halo-depth batched (3D).

    Per round: exchange `k` z-planes once (the FIRST round piggybacks the
    rhs in the same message), then run `k` sweeps on the halo-extended
    block.  A sweep contaminates one plane inward from the extended edge,
    so after k sweeps exactly the center is intact -- bit-identical to
    per-sweep exchange.  The global-edge clamp (CSProject3D.hlsl:77-88)
    rides a global-z mask, so edge shards never read their replicate-filled
    halos.  Rounds are a static Python loop: the jaxpr's ppermute count IS
    the per-solve exchange count (asserted in tests/test_parallel.py).
    """
    njac = 6.0 if is_3d else 4.0

    if not is_3d:
        def sweep2d(_, qq):
            s = (neighbor_shift(qq, 2, +1) + neighbor_shift(qq, 2, -1)
                 + neighbor_shift(qq, 1, +1) + neighbor_shift(qq, 1, -1))
            return (s - div) / njac

        return jax.lax.fori_loop(0, iters, sweep2d, q)

    zl = q.shape[0]
    k = max(1, min(halo_depth, zl, iters))
    n = jax.lax.axis_size(Z_AXIS)
    idx = jax.lax.axis_index(Z_AXIS)
    nzg = n * zl
    # Global plane ids of the halo-extended block (edge shards' out-of-range
    # halo planes are replicate-filled and never read: the masks below
    # substitute the clamp BEFORE the neighbor fetch reaches them).
    gz = (idx * zl - k + jnp.arange(zl + 2 * k))[:, None, None]

    # Round 1 exchanges q and the rhs in ONE message (the rhs is constant
    # across sweeps, so later rounds re-exchange q only).
    ext2 = _exchange_z_halo(jnp.stack([q, div]), k, axis=1)
    div_ext = ext2[1]

    def sweep_ext(_, e):
        s = (neighbor_shift(e, 2, +1) + neighbor_shift(e, 2, -1)
             + neighbor_shift(e, 1, +1) + neighbor_shift(e, 1, -1))
        zm = jnp.concatenate([e[:1], e[:-1]], axis=0)
        zp = jnp.concatenate([e[1:], e[-1:]], axis=0)
        zm = jnp.where(gz == 0, e, zm)
        zp = jnp.where(gz == nzg - 1, e, zp)
        return (s + zm + zp - div_ext) / njac

    def run_round(ext, m):
        ext = jax.lax.fori_loop(0, m, sweep_ext, ext)
        return ext[k:k + zl]

    q = run_round(ext2[0], min(k, iters))
    done = min(k, iters)
    while done < iters:
        m = min(k, iters - done)
        q = run_round(_exchange_z_halo(q, k, axis=0), m)
        done += m
    return q


def _sharded_residual(q, div):
    """r = div - (sum(nb) - 6q) with a 1-plane z-halo exchange (3D)."""
    q_ext = _exchange_z_halo(q, 1, axis=0)
    s = (neighbor_shift(q, 2, +1) + neighbor_shift(q, 2, -1)
         + neighbor_shift(q, 1, +1) + neighbor_shift(q, 1, -1)
         + _halo_shift_z(q_ext, +1) + _halo_shift_z(q_ext, -1))
    return div - (s - 6.0 * q)


def _sharded_mg(q, div, pre=None, post=None, coarse_iters=None):
    """Z-sharded 2-level V-cycle (the multi-chip twin of sim/mg.mg_solve).

    Grid transfers are shard-LOCAL except one coarse-plane halo exchange in
    the z prolongation: x/y run the same pooling/interp matmuls as the
    single-device solver, and the z box-average pairs planes within a shard
    (the caller guarantees an even local z).  All smoothing is halo-depth
    batched (VERDICT r3 item 3): pre-smooth + residual ride ONE
    (pre + 1)-deep exchange (fresh-ring trick), the coarse sweeps batch 11
    per round trip, the post-smooth takes one `post`-deep exchange --
    6 exchanges per V-cycle total (vs 64 for the per-sweep Jacobi
    schedule), asserted from the jaxpr in tests/test_parallel.py.
    """
    from fluidx12_tpu.sim.mg import (
        MG_COARSE_ITERS,
        MG_POST,
        MG_PRE,
        _prolong_matrix,
        _restrict_matrix,
    )

    pre = MG_PRE if pre is None else pre
    post = MG_POST if post is None else post
    coarse_iters = MG_COARSE_ITERS if coarse_iters is None else coarse_iters
    zl, ny, nx = q.shape

    def restrict(r):
        r = jnp.einsum("zyx,xm->zym", r, jnp.asarray(_restrict_matrix(nx)))
        r = jnp.einsum("zym,yn->znm", r, jnp.asarray(_restrict_matrix(ny)))
        return r.reshape(zl // 2, 2, ny // 2, nx // 2).mean(axis=1)

    def prolong(e):
        e = jnp.einsum("zyx,xm->zym", e, jnp.asarray(_prolong_matrix(nx // 2)))
        e = jnp.einsum("zym,yn->znm", e, jnp.asarray(_prolong_matrix(ny // 2)))
        # z: cell-centered lerp; the +-1 coarse neighbor planes come from
        # the adjacent shards (edge-clamped at the global boundary, matching
        # the single-device clamp in sim/mg._prolong).
        ext = _exchange_z_halo(e, 1, axis=0)
        even = 0.25 * ext[:-2] + 0.75 * e
        odd = 0.75 * e + 0.25 * ext[2:]
        return jnp.stack([even, odd], axis=1).reshape(zl, ny, nx)

    # Pre-smooth + residual off ONE exchange: with a (pre + 1)-deep halo,
    # the extended block still holds one fresh halo ring after `pre` sweeps
    # (staleness frontier moves 1 plane/sweep), which is exactly what the
    # residual's z-stencil needs -- the same fresh-ring trick as the
    # single-chip rr kernel (ops/pallas/jacobi.py).  The rhs rides the same
    # message.  Works when the local block holds pre + 1 planes; thinner
    # shards fall back to batched sweeps + a 1-plane residual exchange.
    zl = q.shape[0]
    n = jax.lax.axis_size(Z_AXIS)
    idx = jax.lax.axis_index(Z_AXIS)
    nzg = n * zl
    if zl >= pre + 1:
        k = pre + 1
        gz = (idx * zl - k + jnp.arange(zl + 2 * k))[:, None, None]
        ext2 = _exchange_z_halo(jnp.stack([q, div]), k, axis=1)
        div_ext = ext2[1]

        def zfetch(e):
            zm = jnp.concatenate([e[:1], e[:-1]], axis=0)
            zp = jnp.concatenate([e[1:], e[-1:]], axis=0)
            return (jnp.where(gz == 0, e, zm), jnp.where(gz == nzg - 1, e, zp))

        def sweep_ext(_, e):
            s = (neighbor_shift(e, 2, +1) + neighbor_shift(e, 2, -1)
                 + neighbor_shift(e, 1, +1) + neighbor_shift(e, 1, -1))
            zm, zp = zfetch(e)
            return (s + zm + zp - div_ext) / 6.0

        ext = jax.lax.fori_loop(0, pre, sweep_ext, ext2[0])
        q = ext[k:k + zl]
        zm, zp = zfetch(ext)
        s_ext = (neighbor_shift(ext, 2, +1) + neighbor_shift(ext, 2, -1)
                 + neighbor_shift(ext, 1, +1) + neighbor_shift(ext, 1, -1)
                 + zm + zp)
        r = (div_ext - (s_ext - 6.0 * ext))[k:k + zl]
    else:
        q = _sharded_sweeps(q, div, pre, True)
        r = _sharded_residual(q, div)
    r_c = restrict(r) * 4.0
    e_c = _sharded_sweeps(jnp.zeros_like(r_c), r_c, coarse_iters, True,
                          halo_depth=11)
    q = q + prolong(e_c)
    return _sharded_sweeps(q, div, post, True, halo_depth=post)


def _sharded_project(velocity, pressure, time_step, config: FluidConfig):
    """Projection with per-sweep 1-plane halo exchange (see sim/project.py);
    the multigrid fast solver takes over on the same grids as the
    single-device path (config.mg_min_plane or more plane cells) when the
    local z splits evenly."""
    is_3d = config.is_3d
    rho = config.fluid_density_3d if is_3d else config.fluid_density_2d

    def run(args):
        vel, q = args
        # Divergence with 1-plane halo.
        vel_ext = _exchange_z_halo(vel, 1, axis=1)
        ux, uy = vel[0], vel[1]
        div = 0.5 * (
            (neighbor_shift(ux, 2, +1) - neighbor_shift(ux, 2, -1))
            + (neighbor_shift(uy, 1, +1) - neighbor_shift(uy, 1, -1))
        )
        if is_3d:
            uz_ext = vel_ext[2]
            div = div + 0.5 * (_halo_shift_z(uz_ext, +1) - _halo_shift_z(uz_ext, -1))
        div = div.astype(jnp.float32)

        from fluidx12_tpu.sim.mg import mg_supported

        zl, ny, nx = q.shape
        # Same gate as the single-device path (GLOBAL dims via config.zyx,
        # so multi-chip and single-device runs always pick the same
        # solver), plus an even LOCAL z for the shard-local restriction.
        use_mg = (config.fast_sim and config.mg_pressure and is_3d
                  and ny * nx >= config.mg_min_plane
                  and mg_supported(config.zyx) and zl % 2 == 0)
        if use_mg:
            q = _sharded_mg(q, div)
        else:
            q = _sharded_sweeps(q, div, config.num_pressure_iters, is_3d)

        # Gradient subtraction.
        gx = 0.5 * (neighbor_shift(q, 2, +1) - neighbor_shift(q, 2, -1)) / rho
        gy = 0.5 * (neighbor_shift(q, 1, +1) - neighbor_shift(q, 1, -1)) / rho
        vel = vel.at[0].add(-gx.astype(vel.dtype))
        vel = vel.at[1].add(-gy.astype(vel.dtype))
        if is_3d:
            q_ext = _exchange_z_halo(q, 1, axis=0)
            gz = 0.5 * (_halo_shift_z(q_ext, +1) - _halo_shift_z(q_ext, -1)) / rho
            vel = vel.at[2].add(-gz.astype(vel.dtype))

        # Boundary damping with global z coordinates (CSProject3D.hlsl:104-108).
        zg, yg, xg = config.zyx
        idx = jax.lax.axis_index(Z_AXIS)
        zl = vel.shape[1]
        dtype = vel.dtype
        px = (((jnp.arange(xg, dtype=dtype) + 0.5) / xg) * 2.0 - 1.0).reshape(1, 1, xg)
        py = (((jnp.arange(yg, dtype=dtype) + 0.5) / yg) * 2.0 - 1.0).reshape(1, yg, 1)
        pz = (((idx * zl + jnp.arange(zl, dtype=dtype) + 0.5) / zg) * 2.0 - 1.0).reshape(zl, 1, 1)

        def damp(u, p):
            scale = jnp.clip((0.97 - jnp.abs(p)) / 0.03, -1.0, 1.0)
            return jnp.where(u * p > 0.0, u * scale, u)

        vel = vel.at[0].set(damp(vel[0], px))
        vel = vel.at[1].set(damp(vel[1], py))
        if is_3d:
            vel = vel.at[2].set(damp(vel[2], pz))
        return vel, q

    return jax.lax.cond(time_step > 0.0, run, lambda a: a, (velocity, pressure))


def sharded_simulate(state: FluidState, time_step, config: FluidConfig, mesh: Mesh) -> FluidState:
    """One sim step under shard_map over the Z axis of the grid."""

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, Z_AXIS, None, None), P(None, Z_AXIS, None, None),
                  P(Z_AXIS, None, None), P()),
        out_specs=(P(None, Z_AXIS, None, None), P(None, Z_AXIS, None, None),
                   P(Z_AXIS, None, None)),
    )
    def step(velocity, color, pressure, dt):
        dt = dt.reshape(())
        store = velocity.dtype
        # Match the single-device semantics (sim/step.py): f32 arithmetic
        # whatever the storage dtype, quantize once at the state boundary.
        vel, col = _sharded_advect(velocity.astype(jnp.float32),
                                   color.astype(jnp.float32), dt, config)
        vel, q = _sharded_project(vel, pressure, dt, config)
        return vel.astype(store), col.astype(store), q

    dt_arr = jnp.asarray(time_step, jnp.float32).reshape(1)
    vel, col, q = step(state.velocity, state.color, state.pressure, dt_arr)
    return FluidState.from_parts(velocity=vel, color=col, pressure=q)
