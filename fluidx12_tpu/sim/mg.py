"""Two-level geometric multigrid for the pressure Poisson solve (fast twin).

The reference relaxes 64 plain-Jacobi sweeps per frame (CSPoisson.hlsli:8-26,
ITER=64 with a racy per-thread early-out).  Jacobi only damps high-frequency
error; at 256^3 the 64 sweeps cost ~15 ms on v5e and still leave the smooth
error modes untouched.  A V-cycle does strictly better on both axes:

    pre-smooth (4 sweeps, fine)            - kills high-frequency error
    residual -> restrict (2x box average)  - smooth error is visible at h/2
    32 sweeps on the half grid             - 1/8 the voxels: ~free
    prolongate (trilinear) + correct
    post-smooth (4 sweeps, fine)

Fine-level work drops from 64 sweeps to 8 (+ one residual pass), while the
coarse correction removes low-frequency error plain Jacobi cannot -- the
post-projection divergence is *lower* than the reference schedule's
(cross-checked in tests/test_sim.py).

All pieces are TPU-native: smoothing reuses the Pallas Jacobi kernels,
residuals the streaming stencil kernel, and the grid transfers are pooling /
interpolation matrices applied as MXU einsums on the trailing (lane/sublane)
dims -- a reshape-based 2x box filter on the trailing dims would pay the
(8, 128) tile-padding relayout (CLAUDE.md, XLA:TPU layout gotchas).

Engaged by sim/project.py on grids with at least 128x128-cell planes
(config.mg_min_plane) -- the flagship 128^3 included: V(4,4)+32 measured a
LOWER residual than the 64-sweep schedule there too (rms 0.0145 vs 0.0174
on a plume-like rhs) at ~4x less fine-level work.  The reference-faithful
fixed-iteration path remains below the threshold and on `fast_sim=False`.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _restrict_matrix(n: int) -> np.ndarray:
    """(n, n/2) box-average restriction along one trailing dim."""
    m = np.zeros((n, n // 2), np.float32)
    m[np.arange(n), np.arange(n) // 2] = 0.5
    return m


def _prolong_matrix(n_c: int) -> np.ndarray:
    """(n_c, 2*n_c) cell-centered trilinear prolongation along one dim.

    Fine center i sits at coarse coordinate i/2 - 0.25: even fine cells mix
    (0.25, 0.75) of coarse cells (m-1, m), odd cells (0.75, 0.25) of
    (m, m+1); edges clamp.
    """
    n_f = 2 * n_c
    m = np.zeros((n_c, n_f), np.float32)
    for i in range(n_f):
        c = i / 2.0 - 0.25
        c0 = int(np.floor(c))
        f = c - c0
        m[np.clip(c0, 0, n_c - 1), i] += 1.0 - f
        m[np.clip(c0 + 1, 0, n_c - 1), i] += f
    return m


def _restrict(r: jax.Array) -> jax.Array:
    """(Z, Y, X) -> (Z/2, Y/2, X/2) box average."""
    nz, ny, nx = r.shape
    # Trailing dims via MXU pooling; leading (z) via a safe reshape-mean.
    r = jnp.einsum("zyx,xm->zym", r, jnp.asarray(_restrict_matrix(nx)))
    r = jnp.einsum("zym,yn->znm", r, jnp.asarray(_restrict_matrix(ny)))
    return r.reshape(nz // 2, 2, ny // 2, nx // 2).mean(axis=1)


def _prolong(e: jax.Array) -> jax.Array:
    """(Zc, Yc, Xc) -> (2Zc, 2Yc, 2Xc) trilinear interpolation."""
    nz, ny, nx = e.shape
    e = jnp.einsum("zyx,xm->zym", e, jnp.asarray(_prolong_matrix(nx)))
    e = jnp.einsum("zym,yn->znm", e, jnp.asarray(_prolong_matrix(ny)))
    # z: cell-centered lerp of neighbor planes (leading dim: plain slices).
    lo = jnp.concatenate([e[:1], e], axis=0)      # clamp
    hi = jnp.concatenate([e, e[-1:]], axis=0)
    even = 0.25 * lo[:-1] + 0.75 * e              # fine 2m
    odd = 0.75 * e + 0.25 * hi[1:]                # fine 2m+1
    return jnp.stack([even, odd], axis=1).reshape(2 * nz, 2 * ny, 2 * nx)


def _smooth(q: jax.Array, b: jax.Array, iters: int,
            use_pallas: bool = True) -> jax.Array:
    """Jacobi sweeps: Pallas kernels when the shape/backend supports them
    (and the config's master switch allows), the XLA twin otherwise
    (identical update rule)."""
    from fluidx12_tpu.ops.pallas.jacobi import (
        jacobi_packed_pallas,
        jacobi_packed_supported,
        jacobi_pallas,
        jacobi_tuning,
    )
    from fluidx12_tpu.sim.project import jacobi_sweeps

    on_tpu = use_pallas and jax.default_backend() == "tpu"
    tuning = jacobi_tuning(q.shape, iters) if on_tpu else None
    if tuning is not None:
        return jacobi_pallas(q, b, iters, *tuning)
    if on_tpu and jacobi_packed_supported(q.shape):
        # nx = 64 coarse level (fine grid 128^3): whole volume in VMEM.
        return jacobi_packed_pallas(q, b, iters)
    return jacobi_sweeps(q, b, iters, is_3d=True)


def _residual(q: jax.Array, b: jax.Array, use_pallas: bool = True) -> jax.Array:
    from fluidx12_tpu.ops.pallas.stencil import (
        residual_pallas,
        stencil_pallas_supported,
    )

    if (use_pallas and jax.default_backend() == "tpu"
            and stencil_pallas_supported(q.shape)):
        return residual_pallas(q, b)
    from fluidx12_tpu.ops.sampling import neighbor_shift

    s = (neighbor_shift(q, 2, +1) + neighbor_shift(q, 2, -1)
         + neighbor_shift(q, 1, +1) + neighbor_shift(q, 1, -1)
         + neighbor_shift(q, 0, +1) + neighbor_shift(q, 0, -1))
    return b - (s - 6.0 * q)


# The V-cycle schedule; the Z-sharded twin (parallel/domain._sharded_mg)
# imports these so both solvers always run the same cycle.
MG_PRE = 4
MG_POST = 4
MG_COARSE_ITERS = 32


def mg_supported(zyx) -> bool:
    """2-level V-cycle needs even dims and a coarse level >= 8 per axis."""
    nz, ny, nx = zyx
    return all(n % 2 == 0 and n >= 16 for n in (nz, ny, nx))


def mg_fused_supported(zyx, vel_bytes: int = 2) -> bool:
    """True when the FULLY fused projection (mg_project_fused) can run this
    volume on TPU: divergence rides the pre-smoother prologue, grad+damp
    the post-smoother epilogue (VERDICT r3 item 1)."""
    from fluidx12_tpu.ops.pallas.jacobi import (
        jacobi_divrr_supported,
        jacobi_grad_supported,
    )
    from fluidx12_tpu.ops.pallas.stencil import prolong_pallas_supported

    return (mg_supported(zyx)
            and jacobi_divrr_supported(zyx, MG_PRE, vel_bytes)
            and jacobi_grad_supported(zyx, MG_POST, vel_bytes)
            and prolong_pallas_supported(zyx))


def mg_project_fused(fields: jax.Array, q: jax.Array, rho: float):
    """The WHOLE projection as one fused V-cycle: divergence never runs as
    a standalone pass (computed in the pre-smoother's windows, its exact
    center written once for the post-smoother), and gradient-subtract +
    boundary damp ride the post-smoother's epilogue on the velocity
    channels in place.  Returns (fields', q').  Two full volume round
    trips (b read+write, standalone grad's pressure re-read) disappear vs
    the unfused path; semantics match it exactly (tests/test_pallas.py,
    tests/test_sim.py).  Ref: CSProject3D.hlsl:39-108 (the projection's
    three dispatches) + CSPoisson.hlsli:8-26."""
    from fluidx12_tpu.ops.pallas.jacobi import (
        jacobi_pallas_divrr,
        jacobi_pallas_grad,
    )
    from fluidx12_tpu.ops.pallas.stencil import prolong_correct_pallas

    q, b, r_c = jacobi_pallas_divrr(fields, q, MG_PRE, scale=4.0)
    e_c = _smooth(jnp.zeros_like(r_c), r_c, MG_COARSE_ITERS, use_pallas=True)
    q = prolong_correct_pallas(q, e_c)
    q, fields = jacobi_pallas_grad(q, b, fields, MG_POST, rho)
    return fields, q


def mg_solve(q: jax.Array, b: jax.Array, pre: int = MG_PRE,
             post: int = MG_POST, coarse_iters: int = MG_COARSE_ITERS,
             use_pallas: bool = True) -> jax.Array:
    """One V(pre, post) cycle with `coarse_iters` half-grid sweeps.

    The A-operator is the reference's unit-coefficient 6-point form
    (sum(nb) - 6q = b, h^2 absorbed into b), so the restricted residual
    scales by 4 (= (2h/h)^2) to stay in the same form on the coarse grid.
    use_pallas=False forces the XLA twins throughout (the config's master
    switch, core/config.py).
    """
    from fluidx12_tpu.ops.pallas.jacobi import (
        jacobi_pallas_rr,
        jacobi_rr_supported,
    )

    if (use_pallas and jax.default_backend() == "tpu"
            and jacobi_rr_supported(q.shape, pre)):
        # Fused fine pass: the pre-smoother's windows already hold q and b
        # in VMEM, so the residual + 2x restrict ride its epilogue and the
        # full-res residual never exists in HBM (ops/pallas/jacobi.py).
        q, r_c = jacobi_pallas_rr(q, b, pre, scale=4.0)
    else:
        q = _smooth(q, b, pre, use_pallas)
        r = _residual(q, b, use_pallas)
        r_c = _restrict(r) * 4.0
    e_c = _smooth(jnp.zeros_like(r_c), r_c, coarse_iters, use_pallas)
    from fluidx12_tpu.ops.pallas.stencil import (
        prolong_correct_pallas,
        prolong_pallas_supported,
    )

    if (use_pallas and jax.default_backend() == "tpu"
            and prolong_pallas_supported(q.shape)):
        q = prolong_correct_pallas(q, e_c)
    else:
        q = q + _prolong(e_c)
    return _smooth(q, b, post, use_pallas)
