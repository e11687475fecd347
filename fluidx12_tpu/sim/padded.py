"""Pressure projection on the padded storage layout (core/padding.py).

The compact projection's neighbor fetches are edge-clamped shifts
(CSProject3D.hlsl:77-88 via ops/sampling.neighbor_shift).  On a padded
array the low edges of the storage ARE the logical edges (the volume is
origin-anchored), so the -1 fetches clamp correctly for free; only the +1
fetches need one select at the logical edge to read the edge cell instead
of the first ghost.  With that mask, every interior cell computes exactly
the compact stencil -- ghost values never propagate inward, whatever they
hold, for any number of sweeps (tests/test_padding.py asserts bit-equality
against the compact twin).

The multigrid V-cycle (sim/mg.py schedule) carries the same masking through
all levels; the restriction/prolongation matrices are built over the padded
extent with the prolongation's coarse reads clamped at the LOGICAL coarse
edge, matching the compact twin's edge clamp.

Smoothing rides the Pallas window kernels with their +edge clamp
thresholds moved to the logical extents (ops/pallas/jacobi.py
`logical_zyx` -- a constant change, zero extra ops) whenever the storage
shape tiles; transfers, residual, divergence and gradient stay XLA on
roll-clean padded shapes, which stream at full tile efficiency -- unlike
the compact 150-lane layout whose materialized shifts relayout-crawl
(measured 5.3 ms masked-XLA mg at 160x160x256 before the kernel routing).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from fluidx12_tpu.core.config import FluidConfig
from fluidx12_tpu.ops.sampling import neighbor_shift
from fluidx12_tpu.sim import mg as mgm

_AX_Z, _AX_Y, _AX_X = 0, 1, 2


def _shift_logical(q: jax.Array, axis: int, offset: int, n_log: int) -> jax.Array:
    """Edge-clamped neighbor fetch against the LOGICAL extent `n_log` of a
    padded axis: out[i] = q[clamp(i + offset, 0, n_log - 1)] for i < n_log
    (ghost rows i >= n_log get unmasked shifts; their values are never
    consumed).  offset must be +-1."""
    s = neighbor_shift(q, axis, offset)
    if offset < 0 or q.shape[axis] == n_log:
        return s  # low edge == array edge: the plain clamp is already right
    ids = jax.lax.broadcasted_iota(jnp.int32, q.shape, axis)
    return jnp.where(ids == n_log - 1, q, s)


def _nbr_sum_masked(q: jax.Array, zyx: Tuple[int, int, int]) -> jax.Array:
    lz, ly, lx = zyx
    return (
        _shift_logical(q, _AX_X, +1, lx) + neighbor_shift(q, _AX_X, -1)
        + _shift_logical(q, _AX_Y, +1, ly) + neighbor_shift(q, _AX_Y, -1)
        + _shift_logical(q, _AX_Z, +1, lz) + neighbor_shift(q, _AX_Z, -1)
    )


def jacobi_sweeps_masked(pressure: jax.Array, div: jax.Array, iters: int,
                         zyx: Tuple[int, int, int]) -> jax.Array:
    """`iters` synchronous Jacobi sweeps with logically-masked fetches; the
    padded-exact twin of sim/project.jacobi_sweeps (3D only)."""

    def body(_, q):
        return (_nbr_sum_masked(q, zyx) - div) / 6.0

    return jax.lax.fori_loop(0, iters, body, pressure)


def _smooth_masked(q: jax.Array, b: jax.Array, iters: int, zyx,
                   use_pallas: bool = True) -> jax.Array:
    """Masked smoothing via the Pallas window kernels when the storage
    shape tiles (their +edge clamp thresholds move to the logical extents,
    ops/pallas/jacobi.py `logical_zyx` -- same stencil, VMEM-blocked
    traffic), the XLA masked twin otherwise."""
    if use_pallas and jax.default_backend() == "tpu":
        from fluidx12_tpu.ops.pallas.jacobi import jacobi_pallas, jacobi_tuning

        tuning = jacobi_tuning(q.shape, iters)
        if tuning is not None:
            return jacobi_pallas(q, b, iters, *tuning, logical_zyx=zyx)
    return jacobi_sweeps_masked(q, b, iters, zyx)


def divergence_masked(velocity: jax.Array, zyx) -> jax.Array:
    """Central-difference divergence with logically-masked clamp fetches
    (padded-exact twin of sim/project.divergence, 3D)."""
    lz, ly, lx = zyx
    ux, uy, uz = velocity[0], velocity[1], velocity[2]
    # Association order matches sim/project.divergence exactly (the 2D sum
    # first, then the z term) so results are bit-equal to the compact twin.
    div = 0.5 * (
        (_shift_logical(ux, _AX_X, +1, lx) - neighbor_shift(ux, _AX_X, -1))
        + (_shift_logical(uy, _AX_Y, +1, ly) - neighbor_shift(uy, _AX_Y, -1))
    )
    return div + 0.5 * (
        _shift_logical(uz, _AX_Z, +1, lz) - neighbor_shift(uz, _AX_Z, -1))


def _logical_mask(shape, zyx):
    lz, ly, lx = zyx
    return ((jax.lax.broadcasted_iota(jnp.int32, shape, 0) < lz)
            & (jax.lax.broadcasted_iota(jnp.int32, shape, 1) < ly)
            & (jax.lax.broadcasted_iota(jnp.int32, shape, 2) < lx))


def subtract_gradient_masked(velocity: jax.Array, pressure: jax.Array,
                             rho: float, zyx) -> jax.Array:
    """Velocity -= grad(pressure)/rho with logically-masked fetches; ghost
    cells are written ZERO, (re-)establishing the zero-ghost-velocity
    invariant every frame.  The invariant is a PERFORMANCE property, not a
    correctness one (out-of-logical taps are zero-weight regardless): with
    u = 0 in the ghosts, every advect pass's in-block displacement is
    exactly 0 there, so the Pallas tap-tier predicates (calm/mid/heavy,
    per-chunk z bounds) follow the logical flow instead of being forced
    heavy by ghost garbage -- measured 6.0 -> ~2.6 ms advect at the FluidGI
    160x160x256 storage.  Self-healing: whatever garbage a restore or a
    future pass leaves in ghost velocity lasts at most one projection."""
    lz, ly, lx = zyx
    dtype = velocity.dtype
    mask = _logical_mask(velocity.shape[-3:], zyx)
    g = lambda ax, n: 0.5 * (_shift_logical(pressure, ax, +1, n)
                             - neighbor_shift(pressure, ax, -1)) / rho
    return jnp.stack([
        jnp.where(mask, velocity[0] - g(_AX_X, lx).astype(dtype), 0),
        jnp.where(mask, velocity[1] - g(_AX_Y, ly).astype(dtype), 0),
        jnp.where(mask, velocity[2] - g(_AX_Z, lz).astype(dtype), 0),
    ], axis=0)


def boundary_damp_padded(velocity: jax.Array, config: FluidConfig) -> jax.Array:
    """Boundary damp with LOGICAL-extent positions over the padded array
    (padded twin of sim/project.boundary_damp; ghost rows land at |p| > 1
    where the scale clamps to -1 -- harmless, they are ghosts)."""
    lz, ly, lx = config.zyx
    pz_, py_, px_ = velocity.shape[-3:]
    dtype = velocity.dtype

    def pos(n_pad, n_log):
        return ((jnp.arange(n_pad, dtype=dtype) + 0.5) / n_log) * 2.0 - 1.0

    px = pos(px_, lx).reshape(1, 1, px_)
    py = pos(py_, ly).reshape(1, py_, 1)
    pz = pos(pz_, lz).reshape(pz_, 1, 1)

    def damp(u, p):
        scale = jnp.clip((0.97 - jnp.abs(p)) / 0.03, -1.0, 1.0)
        return jnp.where(u * p > 0.0, u * scale, u)

    return jnp.stack([damp(velocity[0], px), damp(velocity[1], py),
                      damp(velocity[2], pz)], axis=0)


def _coarse_zyx(zyx):
    return tuple((n + 1) // 2 for n in zyx)


def _restrict_padded(r: jax.Array) -> jax.Array:
    """2x box-average restriction of the full padded volume (even dims by
    construction).  Coarse logical cells only ever average fine logical
    cells when the logical extent is even (150 -> 75), which
    config.validate + the padding gate guarantee for the grids that reach
    here (x == y, both even, z even)."""
    nz, ny, nx = r.shape
    r = jnp.einsum("zyx,xm->zym", r, jnp.asarray(mgm._restrict_matrix(nx)))
    r = jnp.einsum("zym,yn->znm", r, jnp.asarray(mgm._restrict_matrix(ny)))
    return r.reshape(nz // 2, 2, ny // 2, nx // 2).mean(axis=1)


def _prolong_matrix_logical(n_c_pad: int, n_c_log: int) -> np.ndarray:
    """(n_c_pad, 2*n_c_pad) prolongation whose coarse reads clamp at the
    LOGICAL coarse edge (the compact twin clamps there); fine ghost columns
    interpolate whatever -- never consumed."""
    n_f = 2 * n_c_pad
    m = np.zeros((n_c_pad, n_f), np.float32)
    for i in range(n_f):
        c = i / 2.0 - 0.25
        c0 = int(np.floor(c))
        f = c - c0
        m[np.clip(c0, 0, n_c_log - 1), i] += 1.0 - f
        m[np.clip(c0 + 1, 0, n_c_log - 1), i] += f
    return m


def _prolong_padded(e: jax.Array, coarse_log) -> jax.Array:
    lz, ly, lx = coarse_log
    nz, ny, nx = e.shape
    e = jnp.einsum("zyx,xm->zym", e, jnp.asarray(_prolong_matrix_logical(nx, lx)))
    e = jnp.einsum("zym,yn->znm", e, jnp.asarray(_prolong_matrix_logical(ny, ly)))
    # z: cell-centered lerp with the neighbor read clamped at the logical
    # coarse edge (plane lz-1), like the compact twin's edge clamp.
    ids = jnp.arange(nz)[:, None, None]
    lo = jnp.concatenate([e[:1], e], axis=0)[:-1]
    hi_plain = jnp.concatenate([e, e[-1:]], axis=0)[1:]
    hi = jnp.where(ids == lz - 1, e, hi_plain)
    even = 0.25 * lo + 0.75 * e
    odd = 0.75 * e + 0.25 * hi
    return jnp.stack([even, odd], axis=1).reshape(2 * nz, 2 * ny, 2 * nx)


def _residual_masked(q, b, zyx):
    return b - (_nbr_sum_masked(q, zyx) - 6.0 * q)


def _stencil_kernels_ok(storage_zyx_, use_pallas: bool) -> bool:
    """True when the streaming stencil kernels (ops/pallas/stencil.py with
    `logical_zyx` clamps) should serve the padded projection: the XLA
    masked twins materialize every edge-clamped shift as a full relayout
    copy, while the kernels stream the volume once through VMEM."""
    if not (use_pallas and jax.default_backend() == "tpu"):
        return False
    from fluidx12_tpu.ops.pallas.stencil import stencil_pallas_supported

    return stencil_pallas_supported(storage_zyx_)


def mg_solve_padded(q: jax.Array, b: jax.Array, zyx,
                    pre: int = mgm.MG_PRE, post: int = mgm.MG_POST,
                    coarse_iters: int = mgm.MG_COARSE_ITERS,
                    use_pallas: bool = True) -> jax.Array:
    """One V(pre, post) cycle on the padded layout, logically masked at
    every level; interior-exact twin of sim/mg.mg_solve's XLA path.
    Smoothing rides the logically-clamped Pallas window kernels where the
    storage shape tiles (_smooth_masked); residual and the prolong-correct
    ride the streaming stencil kernels with logical clamps on TPU (the XLA
    masked twins otherwise); restriction stays XLA (two MXU einsums + one
    reshape-mean, already one-pass)."""
    q = _smooth_masked(q, b, pre, zyx, use_pallas)
    c_log = _coarse_zyx(zyx)
    if _stencil_kernels_ok(q.shape, use_pallas):
        from fluidx12_tpu.ops.pallas.stencil import (
            prolong_pallas_supported,
            residual_pallas,
        )

        r = residual_pallas(q, b, logical_zyx=zyx)
        r_c = _restrict_padded(r) * 4.0
        e_c = _smooth_masked(jnp.zeros_like(r_c), r_c, coarse_iters, c_log,
                             use_pallas)
        if prolong_pallas_supported(q.shape):
            from fluidx12_tpu.ops.pallas.stencil import prolong_correct_pallas

            q = prolong_correct_pallas(q, e_c, logical_czyx=c_log)
        else:
            q = q + _prolong_padded(e_c, c_log)
    else:
        r = _residual_masked(q, b, zyx)
        r_c = _restrict_padded(r) * 4.0
        e_c = _smooth_masked(jnp.zeros_like(r_c), r_c, coarse_iters, c_log,
                             use_pallas)
        q = q + _prolong_padded(e_c, c_log)
    return _smooth_masked(q, b, post, zyx, use_pallas)


def project_padded(fields: jax.Array, pressure: jax.Array, time_step,
                   config: FluidConfig):
    """Full projection on the padded storage layout; same contract as
    sim/project.project (3D only -- 2D grids never pad).  Interior results
    match the compact XLA twin exactly; ghost outputs are bounded garbage.
    Ref: CSProject3D.hlsl:39-108 + CSPoisson.hlsli:8-26."""
    zyx = config.zyx
    rho = config.fluid_density_3d
    use_mg = (config.fast_sim and config.mg_pressure
              and zyx[1] * zyx[2] >= config.mg_min_plane
              and mgm.mg_supported(zyx))
    use_stencil = _stencil_kernels_ok(fields.shape[-3:], config.use_pallas)

    def run(args):
        # Arithmetic/dtype ordering mirrors sim/project.project's XLA twin
        # exactly (divergence in the storage dtype then cast, per-component
        # gradient casts) so the interior is BIT-equal to the compact path.
        # On TPU the streaming stencil kernels serve divergence and the
        # fused grad+damp with their clamps at the logical extents (same
        # twin relationship as the compact path's use_stencil route).
        flds, q = args
        if use_stencil:
            from fluidx12_tpu.ops.pallas.stencil import divergence_pallas

            b = divergence_pallas(flds, logical_zyx=zyx)
        else:
            b = divergence_masked(flds, zyx).astype(jnp.float32)
        if use_mg:
            q = mg_solve_padded(q, b, zyx, use_pallas=config.use_pallas)
        else:
            q = _smooth_masked(q, b, config.num_pressure_iters, zyx,
                               config.use_pallas)
        if use_stencil:
            from fluidx12_tpu.ops.pallas.stencil import grad_damp_pallas

            return grad_damp_pallas(flds, q, rho, logical_zyx=zyx), q
        vel = subtract_gradient_masked(flds, q, rho, zyx)
        vel = boundary_damp_padded(vel, config).astype(flds.dtype)
        return jnp.concatenate([vel, flds[3:]], axis=0), q

    def skip(args):
        return args

    return jax.lax.cond(time_step > 0.0, run, skip, (fields, pressure))
