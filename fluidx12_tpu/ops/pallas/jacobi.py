"""Pallas TPU kernel for the Jacobi pressure relaxation.

The XLA formulation (sim/project.py) materializes six shifted copies of the
pressure volume per sweep: 64 sweeps x ~6 volume reads (measured ~5.5 ms at
128^3, ~98 ms at 256^3 on v5e).  This kernel blocks the volume into halo'd
(z-slab x y-strip) windows held in VMEM and runs `inner` sweeps per HBM round
trip (iteration blocking / temporal tiling):

    traffic ~= (iters / inner) * 3 volumes, with all sweep arithmetic in VMEM.

Halo cells recompute redundantly (halo = inner on each side); the y-strip
dimension only tiles when a full plane would blow Mosaic's ~16 MB scoped-VMEM
stack (planes > 128 x 128).

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


def _shift_lane_clamped(q, offset):
    """Edge-clamped +-1 shift along the lane axis (full-width X)."""
    n = q.shape[-1]
    rolled = pltpu.roll(q, (n - offset) % n, q.ndim - 1)
    ids = jax.lax.broadcasted_iota(jnp.int32, q.shape, q.ndim - 1)
    if offset > 0:
        return jnp.where(ids == n - 1, q, rolled)
    return jnp.where(ids == 0, q, rolled)


def _shift_sublane_global(q, offset, gy0, ny):
    """+-1 shift along Y with clamping at *global* rows 0 and ny-1 only
    (buffer rows are a halo'd window starting at global row gy0)."""
    n = q.shape[-2]
    rolled = pltpu.roll(q, (n - offset) % n, q.ndim - 2)
    gids = jax.lax.broadcasted_iota(jnp.int32, q.shape, q.ndim - 2) + gy0
    if offset > 0:
        return jnp.where(gids == ny - 1, q, rolled)
    return jnp.where(gids == 0, q, rolled)


def _jacobi_kernel(q_hbm, b_hbm, out_hbm, *, slab: int, ytile: int, halo: int,
                   inner: int, nz: int, ny: int):
    """Grid = (z-slab, y-strip). DMA in a halo'd window, run `inner` clamped
    sweeps in VMEM, DMA out the center."""
    zi = pl.program_id(0)
    yi = pl.program_id(1)
    z0 = zi * slab
    y0 = yi * ytile
    size_z = slab + 2 * halo
    size_y = min(ytile + 2 * halo, ny)

    # Halo'd windows, shifted (not shrunk) to stay in bounds.  Y offsets are
    # multiples of the 8-row sublane tiling (ytile and halo are); the hint
    # lets Mosaic prove the DMA slices are tile-aligned.  Z (dim 0) has no
    # tiling constraint.
    lo_z = jnp.clip(z0 - halo, 0, nz - size_z)
    lo_y = pl.multiple_of(jnp.clip(y0 - halo, 0, ny - size_y), 8)

    def body(q_buf, b_buf, sem_q, sem_b, sem_o):
        cp_q = pltpu.make_async_copy(
            q_hbm.at[pl.ds(lo_z, size_z), pl.ds(lo_y, size_y)], q_buf, sem_q)
        cp_b = pltpu.make_async_copy(
            b_hbm.at[pl.ds(lo_z, size_z), pl.ds(lo_y, size_y)], b_buf, sem_b)
        cp_q.start()
        cp_b.start()
        cp_q.wait()
        cp_b.wait()

        q = q_buf[...]
        b = b_buf[...]

        ids_z = jax.lax.broadcasted_iota(jnp.int32, (size_z, 1, 1), 0)

        def sweep(_, q):
            up = _shift_sublane_global(q, +1, lo_y, ny)
            dn = _shift_sublane_global(q, -1, lo_y, ny)
            rt = _shift_lane_clamped(q, +1)
            lt = _shift_lane_clamped(q, -1)
            # z neighbors: shift buffer planes, clamp at global 0 / nz-1.
            zf = jnp.concatenate([q[1:], q[-1:]], axis=0)
            zb = jnp.concatenate([q[:1], q[:-1]], axis=0)
            gz = ids_z[:, 0, 0] + lo_z
            at_top = (gz == 0)[:, None, None]
            at_bot = (gz == nz - 1)[:, None, None]
            zb = jnp.where(at_top, q, zb)
            zf = jnp.where(at_bot, q, zf)
            return (up + dn + rt + lt + zf + zb - b) / 6.0

        q = jax.lax.fori_loop(0, inner, sweep, q)
        q_buf[...] = q

        cp_o = pltpu.make_async_copy(
            q_buf.at[pl.ds(z0 - lo_z, slab),
                     pl.ds(pl.multiple_of(y0 - lo_y, 8), ytile)],
            out_hbm.at[pl.ds(z0, slab),
                       pl.ds(pl.multiple_of(y0, 8), ytile)],
            sem_o,
        )
        cp_o.start()
        cp_o.wait()

    nx = q_hbm.shape[2]
    pl.run_scoped(
        body,
        q_buf=pltpu.VMEM((size_z, size_y, nx), jnp.float32),
        b_buf=pltpu.VMEM((size_z, size_y, nx), jnp.float32),
        sem_q=pltpu.SemaphoreType.DMA,
        sem_b=pltpu.SemaphoreType.DMA,
        sem_o=pltpu.SemaphoreType.DMA,
    )


def _plan(shape, slab: int, inner: int):
    """Choose (slab, ytile) for a (Z, Y, X) volume; None if unsupported."""
    nz, ny, nx = shape
    halo = inner
    while slab > 1 and nz % slab:
        slab //= 2
    if nz % slab or nz < slab + 2 * halo:
        return None
    if ny * nx <= 128 * 128:
        return slab, ny  # full planes fit comfortably
    # Tiled Y windows start at y0 - halo; the pl.multiple_of(lo_y, 8) hint
    # that lets Mosaic prove the DMA is sublane-aligned is only TRUE when
    # the halo is a multiple of 8 (wrong results otherwise, not an error).
    if halo % 8:
        return None
    # Tile Y into strips; keep the halo'd buffer ~<= 1.5 MB so the ~6 live
    # sweep temporaries stay inside the scoped-VMEM stack.
    ytile = 32
    while ytile > 8 and ny % ytile:
        ytile //= 2
    if ny % ytile or ny < ytile + 2 * halo:
        return None
    if (slab + 2 * halo) * (ytile + 2 * halo) * nx * 4 > 2 * 1024 * 1024:
        slab = max(slab // 2, 1)
        if nz % slab or nz < slab + 2 * halo:
            return None
    return slab, ytile


def jacobi_tuning(shape, iters: int):
    """Best measured (slab, inner) for this volume, or None if unsupported.

    Full-plane volumes (plane <= 128x128) relax fastest with shallow halos
    and tall slabs (v5e, 64 sweeps at 128^3: slab=32/inner=4 2.8 ms vs
    slab=16/inner=8 3.2 ms); y-tiled volumes need halo % 8 == 0 (see _plan)
    so they stay at inner=8 (256^3: 25 ms).
    """
    nz, ny, nx = shape
    candidates = ((32, 4), (16, 8)) if ny * nx <= 128 * 128 else ((16, 8),)
    for slab, inner in candidates:
        if iters % inner == 0 and _plan(shape, slab, inner) is not None:
            return slab, inner
    return None


def jacobi_pallas_supported(shape, iters: int, slab: int = 16, inner: int = 8) -> bool:
    return iters % inner == 0 and _plan(shape, slab, inner) is not None


def jacobi_pallas(pressure: jax.Array, div: jax.Array, iters: int,
                  slab: int = 16, inner: int = 8) -> jax.Array:
    """Run `iters` Jacobi sweeps (3D only). pressure/div: (Z, Y, X) f32."""
    if iters % inner:
        raise ValueError("iters must be a multiple of inner")
    plan = _plan(pressure.shape, slab, inner)
    if plan is None:
        raise ValueError(f"unsupported volume shape {pressure.shape}")
    slab, ytile = plan
    nz, ny, _ = pressure.shape

    call = pl.pallas_call(
        functools.partial(
            _jacobi_kernel, slab=slab, ytile=ytile, halo=inner, inner=inner,
            nz=nz, ny=ny),
        interpret=(jax.default_backend() == "cpu"),
        out_shape=jax.ShapeDtypeStruct(pressure.shape, jnp.float32),
        grid=(nz // slab, ny // ytile),
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
