"""Pallas TPU kernel for the Jacobi pressure relaxation.

The XLA formulation (sim/project.py) materializes six shifted copies of the
pressure volume per sweep: 64 sweeps x ~6 volume reads ~ 6 GB of HBM traffic
at 128^3 (measured ~33 ms on v5e).  This kernel blocks the volume into
z-slabs held in VMEM and runs `inner` sweeps per HBM round trip with an
`inner`-wide halo (iteration blocking / temporal tiling):

    traffic ~= (iters / inner) * 3 volumes  ->  ~0.8 GB for 64 sweeps,
    with all sweep arithmetic on VPU registers/VMEM.

Halo cells recompute redundantly ((inner + halo overlap) extra rows per
slab); for slab=16, halo=8 at 128^3 that's ~2x compute for ~8x less traffic
-- the right trade on a bandwidth-bound stencil.

Semantics match sim/project.jacobi_sweeps exactly: edge-clamped 6-neighbor
stencil, x_new = (sum(neighbors) - b) / 6, fixed iteration count (the
reference's racy in-dispatch loop, CSPoisson.hlsli:8-26, replaced by a
deterministic schedule).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _clamped_shift_yx(q, axis, offset):
    """Edge-clamped +-1 shift along Y (axis -2) or X (axis -1) in VMEM.

    Uses pltpu.roll (cheap vector rotate) + an iota edge fix instead of
    slice+concatenate, which lowers to slow lane shuffles in Mosaic.
    """
    n = q.shape[axis]
    ax = axis % q.ndim
    # out[i] = q[i + offset] (circular); pltpu.roll requires shift >= 0.
    rolled = pltpu.roll(q, (n - offset) % n, ax)
    ids = jax.lax.broadcasted_iota(jnp.int32, q.shape, ax)
    if offset > 0:
        return jnp.where(ids == n - 1, q, rolled)
    return jnp.where(ids == 0, q, rolled)


def _jacobi_kernel(q_hbm, b_hbm, out_hbm, *, slab: int, halo: int, inner: int,
                   nz: int):
    """Grid dim 0 = z-slab index. One slab per program; DMA in a halo'd slab,
    run `inner` clamped sweeps in VMEM, DMA out the center."""
    zi = pl.program_id(0)
    z0 = zi * slab
    size = slab + 2 * halo  # static VMEM slab extent

    # Halo'd source window [lo, lo + size), shifted (not shrunk) to stay in
    # bounds at the first/last slabs; requires nz >= size.
    lo = jnp.clip(z0 - halo, 0, nz - size)

    def body(q_buf, b_buf, sem_q, sem_b, sem_o):
        cp_q = pltpu.make_async_copy(
            q_hbm.at[pl.ds(lo, size)], q_buf, sem_q)
        cp_b = pltpu.make_async_copy(
            b_hbm.at[pl.ds(lo, size)], b_buf, sem_b)
        cp_q.start()
        cp_b.start()
        cp_q.wait()
        cp_b.wait()

        q = q_buf[...]
        b = b_buf[...]

        # Buffer plane p holds global z = lo + p.
        ids = jax.lax.broadcasted_iota(jnp.int32, (size, 1, 1), 0)

        def sweep(_, q):
            up = _clamped_shift_yx(q, -2, +1)
            dn = _clamped_shift_yx(q, -2, -1)
            rt = _clamped_shift_yx(q, -1, +1)
            lt = _clamped_shift_yx(q, -1, -1)
            # z neighbors via static shifts with edge clamp relative to the
            # *global* volume: the buffer's plane p corresponds to global
            # z = lo + p; clamp at global 0 and nz-1.
            zf = jnp.concatenate([q[1:], q[-1:]], axis=0)
            zb = jnp.concatenate([q[:1], q[:-1]], axis=0)
            gz = ids[:, 0, 0] + lo
            at_top = (gz == 0)[:, None, None]
            at_bot = (gz == nz - 1)[:, None, None]
            zb = jnp.where(at_top, q, zb)
            zf = jnp.where(at_bot, q, zf)
            return (up + dn + rt + lt + zf + zb - b) / 6.0

        q = jax.lax.fori_loop(0, inner, sweep, q)
        q_buf[...] = q

        cp_o = pltpu.make_async_copy(
            q_buf.at[pl.ds(z0 - lo, slab)],
            out_hbm.at[pl.ds(z0, slab)],
            sem_o,
        )
        cp_o.start()
        cp_o.wait()

    pl.run_scoped(
        body,
        q_buf=pltpu.VMEM((slab + 2 * halo,) + q_hbm.shape[1:], jnp.float32),
        b_buf=pltpu.VMEM((slab + 2 * halo,) + q_hbm.shape[1:], jnp.float32),
        sem_q=pltpu.SemaphoreType.DMA,
        sem_b=pltpu.SemaphoreType.DMA,
        sem_o=pltpu.SemaphoreType.DMA,
    )


def jacobi_pallas(pressure: jax.Array, div: jax.Array, iters: int,
                  slab: int = 16, inner: int = 8) -> jax.Array:
    """Run `iters` Jacobi sweeps (3D only). pressure/div: (Z, Y, X) f32."""
    nz = pressure.shape[0]
    if iters % inner:
        raise ValueError("iters must be a multiple of inner")
    if nz % slab:
        slab = next(s for s in range(slab, 0, -1) if nz % s == 0)
    halo = inner
    if nz < slab + 2 * halo:
        raise ValueError(
            f"volume too small for slab blocking: nz={nz} < {slab + 2 * halo}"
        )

    call = pl.pallas_call(
        functools.partial(
            _jacobi_kernel, slab=slab, halo=halo, inner=inner, nz=nz),
        interpret=(jax.default_backend() == "cpu"),
        out_shape=jax.ShapeDtypeStruct(pressure.shape, jnp.float32),
        grid=(nz // slab,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
    )

    q = pressure
    for _ in range(iters // inner):
        q = call(q, div)
    return q
