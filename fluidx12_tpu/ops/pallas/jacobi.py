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


from fluidx12_tpu.ops.pallas.shifts import (
    shift_lane_clamped as _shift_lane_clamped,
    shift_sublane_global as _shift_sublane_global,
)


def _window_sweeps(q_hbm, b_hbm, out_hbm, zi, yi, *, slab: int, ytile: int,
                   halo: int, inner: int, nz: int, ny: int, lgl=None):
    """DMA in one halo'd (z-slab x y-strip) window from q_hbm, run `inner`
    clamped sweeps in VMEM, DMA the center back to out_hbm; one window of
    one round of the fused multi-round kernel (_jacobi_fused_kernel).

    `lgl` = (lz, ly, lx) LOGICAL extents on the padded storage layout
    (core/padding.py): the +edge clamps move to the logical boundary --
    bit-identical stencil on the interior, same op count (the clamp
    selects' thresholds are constants), ghost values never couple in."""
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

        lz, ly, lx = lgl or (nz, ny, q_hbm.shape[2])
        ids_z = jax.lax.broadcasted_iota(jnp.int32, (size_z, 1, 1), 0)

        def sweep(_, q):
            up = _shift_sublane_global(q, +1, lo_y, ly)
            dn = _shift_sublane_global(q, -1, lo_y, ny)
            rt = _shift_lane_clamped(q, +1, hi=lx)
            lt = _shift_lane_clamped(q, -1)
            # z neighbors: shift buffer planes, clamp at global 0 / lz-1.
            zf = jnp.concatenate([q[1:], q[-1:]], axis=0)
            zb = jnp.concatenate([q[:1], q[:-1]], axis=0)
            gz = ids_z[:, 0, 0] + lo_z
            at_top = (gz == 0)[:, None, None]
            at_bot = (gz == lz - 1)[:, None, None]
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


def _jacobi_fused_kernel(qa_in, b_hbm, qa, qb, *, slab: int, ytile: int,
                         halo: int, inner: int, nz: int, ny: int, lgl=None):
    """ALL rounds in one call: grid = (round, z-slab, y-strip) with the
    round dim outermost (TPU grids iterate sequentially on one core, so
    every window of round r completes before round r+1 starts -- the same
    synchronization the per-call form bought with kernel launches).  Rounds
    ping-pong between the two full-volume outputs; qa aliases the input
    (input_output_aliases), so round 0 reads the caller's pressure from qa.
    The caller takes qa for an even round count, qb for odd.  In-program
    throughput matches the per-call form (launches overlap inside one
    executable); the win is structural: one op, no Python call loop.
    """
    del qa_in  # aliased to qa: same buffer
    r = pl.program_id(0)
    zi = pl.program_id(1)
    yi = pl.program_id(2)
    kw = dict(slab=slab, ytile=ytile, halo=halo, inner=inner, nz=nz, ny=ny,
              lgl=lgl)

    @pl.when(r % 2 == 0)
    def _():
        _window_sweeps(qa, b_hbm, qb, zi, yi, **kw)

    @pl.when(r % 2 == 1)
    def _():
        _window_sweeps(qb, b_hbm, qa, zi, yi, **kw)


def _planewise_window(q_hbm, b_hbm, out_hbm, zi, yi, *, slab: int,
                      ytile: int, halo: int, inner: int, nz: int, ny: int,
                      chunk: int = 8, rr=None, div=None, grad=None,
                      lgl=None):
    """Plane-sweep variant for big volumes (planes > 128x128).

    The whole-window kernel (_jacobi_kernel) keeps ~8 window-sized sweep
    temporaries live on Mosaic's scoped-VMEM stack, capping windows at
    ~1.5 MB and forcing 3x halo recompute at 256^3.  Here each sweep walks
    the window plane-by-plane in z (temporaries are plane-sized), so the
    window can grow to ~4 MB: (slab, ytile) = (32, 64) with halo 8 is
    1.875x redundancy instead of 3x.  Jacobi reads only old values, so the
    sweep ping-pongs between two VMEM window buffers.

    Within-window z indexing is clamped at the window edge; those edge
    planes are halo planes whose values are stale after the first sweep
    anyway (halo >= inner), except at the true volume boundary where the
    clamp IS the boundary condition.

    `div` = (fields_hbm, out_b_hbm): PROLOGUE -- instead of reading b from
    HBM, DMA the three velocity-channel windows of the combined state and
    compute b = divergence(v) in VMEM (the projection's first pass,
    CSProject3D.hlsl:40-53, fused into the pre-smoother; VERDICT r3 item
    1).  b is wrong only on the window's outermost halo ring (the roll
    wraps there); `inner` sweeps propagate that at most `inner - 1` cells,
    so with halo > inner the center (and the rr epilogue's center-ring
    residual reads) never see it.  The exact center rows/planes are
    written to out_b_hbm for the post-smoother.

    `grad` = (fields_hbm, out_f_hbm, mc_ref, mdy_ref, sel, rho): EPILOGUE
    -- after the sweeps, compute the pressure gradient of the final window
    and apply velocity -= 0.5 * grad / rho plus the 3% boundary damp
    (CSProject3D.hlsl:92-108) to the three velocity-channel CENTERS,
    writing them back through the aliased out_f_hbm (centers are disjoint
    across windows, so the in-place update is hazard-free).  Center-row
    selection and the y-gradient ride one-hot MXU matrices (mc/mdy,
    variant picked by `sel`) because traced dynamic-slice starts are
    illegal on the sublane dim.
    """
    z0 = zi * slab
    y0 = yi * ytile
    size_z = slab + 2 * halo
    size_y = min(ytile + 2 * halo, ny)

    lo_z = jnp.clip(z0 - halo, 0, nz - size_z)
    lo_y = pl.multiple_of(jnp.clip(y0 - halo, 0, ny - size_y), 8)

    def body(qa, qb, b_buf, sem_q, sem_b, sem_o, rc_buf=None, sem_rc=None,
             v_buf=None, sem_v=None, u_buf=None, sem_u=None):
        f32 = jnp.float32
        cp_q = pltpu.make_async_copy(
            q_hbm.at[pl.ds(lo_z, size_z), pl.ds(lo_y, size_y)], qa, sem_q)
        cp_q.start()
        if div is None:
            cp_b = pltpu.make_async_copy(
                b_hbm.at[pl.ds(lo_z, size_z), pl.ds(lo_y, size_y)], b_buf,
                sem_b)
            cp_b.start()
        else:
            fields_hbm, _ = div
            cps_v = [pltpu.make_async_copy(
                fields_hbm.at[c, pl.ds(lo_z, size_z), pl.ds(lo_y, size_y)],
                v_buf.at[c], sem_v) for c in range(3)]
            for cp in cps_v:
                cp.start()
        cp_q.wait()

        nx = qa.shape[2]
        # Edge masks, computed once: rows/lanes clamped at *global* edges
        # (LOGICAL edges on the padded storage layout: same op count, the
        # thresholds are constants; see _window_sweeps).
        lz, ly, lx = lgl or (nz, ny, nx)
        gy = jax.lax.broadcasted_iota(jnp.int32, (1, size_y, nx), 1) + lo_y
        top_y = gy == 0
        bot_y = gy == ly - 1
        ix = jax.lax.broadcasted_iota(jnp.int32, (1, size_y, nx), 2)
        first_x = ix == 0
        last_x = ix == lx - 1
        n_chunks = size_z // chunk

        if div is None:
            cp_b.wait()
        else:
            _, out_b_hbm = div
            for cp in cps_v:
                cp.wait()

            def dchunk(ci, _):
                z = ci * chunk
                ux = v_buf[0, pl.ds(z, chunk)].astype(f32)
                uy = v_buf[1, pl.ds(z, chunk)].astype(f32)
                uz = v_buf[2, pl.ds(z, chunk)].astype(f32)
                dx = (jnp.where(last_x, ux, pltpu.roll(ux, nx - 1, 2))
                      - jnp.where(first_x, ux, pltpu.roll(ux, 1, 2)))
                dy = (jnp.where(bot_y, uy, pltpu.roll(uy, size_y - 1, 1))
                      - jnp.where(top_y, uy, pltpu.roll(uy, 1, 1)))
                zm = jnp.concatenate(
                    [v_buf[2, pl.ds(jnp.maximum(z - 1, 0), 1)].astype(f32),
                     uz[:-1]], axis=0)
                zp = jnp.concatenate(
                    [uz[1:],
                     v_buf[2, pl.ds(jnp.minimum(z + chunk, size_z - 1),
                                    1)].astype(f32)], axis=0)
                gz = (jax.lax.broadcasted_iota(jnp.int32, (chunk, 1, 1), 0)
                      + z + lo_z)
                zm = jnp.where(gz == 0, uz, zm)
                zp = jnp.where(gz == lz - 1, uz, zp)
                b_buf[pl.ds(z, chunk)] = 0.5 * (dx + dy + (zp - zm))
                return 0

            jax.lax.fori_loop(0, n_chunks, dchunk, 0)
            # The exact center block feeds the post-smoother from HBM.
            cp_bo = pltpu.make_async_copy(
                b_buf.at[pl.ds(z0 - lo_z, slab),
                         pl.ds(pl.multiple_of(y0 - lo_y, 8), ytile)],
                out_b_hbm.at[pl.ds(z0, slab),
                             pl.ds(pl.multiple_of(y0, 8), ytile)],
                sem_b,
            )
            cp_bo.start()

        def sweep(src, dst):
            # Walk the window `chunk` z-planes at a time: temporaries are
            # chunk-sized (not window-sized), and the z-loop trip count
            # stays low enough that scalar-core loop overhead is amortized.
            def step(ci, _):
                z = ci * chunk
                q = src[pl.ds(z, chunk)]
                up = jnp.where(bot_y, q, pltpu.roll(q, size_y - 1, 1))
                dn = jnp.where(top_y, q, pltpu.roll(q, 1, 1))
                rt = jnp.where(last_x, q, pltpu.roll(q, nx - 1, 2))
                lt = jnp.where(first_x, q, pltpu.roll(q, 1, 2))
                # z neighbors: in-chunk shift plus one plane from the
                # adjacent chunk, clamped at the window edge (those are
                # stale halo planes) and overridden at the global boundary.
                zm = jnp.concatenate(
                    [src[pl.ds(jnp.maximum(z - 1, 0), 1)], q[:-1]], axis=0)
                zp = jnp.concatenate(
                    [q[1:], src[pl.ds(jnp.minimum(z + chunk, size_z - 1), 1)]],
                    axis=0)
                gz = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1, 1), 0) + z + lo_z
                zm = jnp.where(gz == 0, q, zm)
                zp = jnp.where(gz == lz - 1, q, zp)
                dst[pl.ds(z, chunk)] = (
                    up + dn + rt + lt + zm + zp - b_buf[pl.ds(z, chunk)]
                ) / 6.0
                return 0

            jax.lax.fori_loop(0, n_chunks, step, 0)

        for s in range(inner):
            sweep(qa, qb) if s % 2 == 0 else sweep(qb, qa)

        final = qa if inner % 2 == 0 else qb
        cp_o = pltpu.make_async_copy(
            final.at[pl.ds(z0 - lo_z, slab),
                     pl.ds(pl.multiple_of(y0 - lo_y, 8), ytile)],
            out_hbm.at[pl.ds(z0, slab),
                       pl.ds(pl.multiple_of(y0, 8), ytile)],
            sem_o,
        )
        cp_o.start()

        if rr is not None:
            # Fused residual + 2x restrict epilogue (the multigrid's next
            # two passes, sim/mg.py): the final window already holds q AND
            # b in VMEM with one valid halo ring (halo - inner >= 1 fresh
            # planes/rows), so r = b - A q on the center needs no HBM
            # reads, and the 2x box pooling writes the COARSE volume
            # straight out -- the full-resolution residual never exists in
            # HBM (saves ~4 volume moves per V-cycle at 256^3).  Pooling
            # matches mg._restrict: trailing dims contract with 0.5
            # matrices on the MXU (the x matrix carries the caller's
            # scale), z pairs average on the leading dim.
            rc_hbm, my_ref, px_ref, sel = rr
            my = my_ref[sel]           # (ytile/2, size_y) center-row pool
            zc0 = z0 - lo_z
            c2 = chunk // 2

            def rchunk(ci, _):
                z = zc0 + ci * chunk
                q = final[pl.ds(z, chunk)]
                up = jnp.where(bot_y, q, pltpu.roll(q, size_y - 1, 1))
                dn = jnp.where(top_y, q, pltpu.roll(q, 1, 1))
                rt = jnp.where(last_x, q, pltpu.roll(q, nx - 1, 2))
                lt = jnp.where(first_x, q, pltpu.roll(q, 1, 2))
                zm = jnp.concatenate(
                    [final[pl.ds(jnp.maximum(z - 1, 0), 1)], q[:-1]], axis=0)
                zp = jnp.concatenate(
                    [q[1:], final[pl.ds(jnp.minimum(z + chunk, size_z - 1), 1)]],
                    axis=0)
                gz = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1, 1), 0) + z + lo_z
                zm = jnp.where(gz == 0, q, zm)
                zp = jnp.where(gz == lz - 1, q, zp)
                res = b_buf[pl.ds(z, chunk)] - (
                    up + dn + rt + lt + zm + zp - 6.0 * q)
                # x-pool (MXU) -> z-pair mean (leading dim) -> y center
                # pool (MXU); all f32.  precision=HIGHEST: default-precision
                # MXU passes round f32 operands to bf16 (measured 1.5e-3
                # relative drift in r_c at 256^3); these dots are a trivial
                # FLOP fraction, so the 3-pass form is ~free.
                hi = jax.lax.Precision.HIGHEST
                xz = [jnp.dot(res[2 * j] + res[2 * j + 1], px_ref[...],
                              precision=hi,
                              preferred_element_type=jnp.float32) * 0.5
                      for j in range(c2)]
                rows = [jnp.dot(my, xz[j], precision=hi,
                                preferred_element_type=jnp.float32)
                        for j in range(c2)]
                rc_buf[pl.ds(ci * c2, c2)] = jnp.stack(rows, axis=0)
                return 0

            jax.lax.fori_loop(0, slab // chunk, rchunk, 0)
            cp_rc = pltpu.make_async_copy(
                rc_buf,
                rc_hbm.at[pl.ds(z0 // 2, slab // 2),
                          pl.ds(pl.multiple_of(y0 // 2, 8), ytile // 2)],
                sem_rc,
            )
            cp_rc.start()
            cp_rc.wait()

        if grad is not None:
            fields_hbm, out_f_hbm, mc_ref, mdy_ref, sel, rho = grad
            s = 0.5 / rho
            mc = mc_ref[sel]       # (ytile, size_y) one-hot center rows
            mdy = mdy_ref[sel]     # (ytile, size_y) = M(y+1) - M(y-1)
            cps_u = [pltpu.make_async_copy(
                fields_hbm.at[c, pl.ds(z0, slab),
                              pl.ds(pl.multiple_of(y0, 8), ytile)],
                u_buf.at[c], sem_u) for c in range(3)]
            for cp in cps_u:
                cp.start()
            for cp in cps_u:
                cp.wait()
            hi = jax.lax.Precision.HIGHEST
            zc0 = z0 - lo_z
            ixc = jax.lax.broadcasted_iota(jnp.int32, (1, ytile, nx), 2)
            first_xc = ixc == 0
            last_xc = ixc == nx - 1
            pxc = ((ixc.astype(f32) + 0.5) / nx) * 2.0 - 1.0
            iyc = jax.lax.broadcasted_iota(jnp.int32, (1, ytile, 1), 1) + y0
            pyc = ((iyc.astype(f32) + 0.5) / ny) * 2.0 - 1.0

            def damp(u, pv):
                # 3% boundary band: outward components scale down/reflect.
                scale = jnp.clip((0.97 - jnp.abs(pv)) / 0.03, -1.0, 1.0)
                return jnp.where(u * pv > 0.0, u * scale, u)

            def sel_rows(plane):
                return jnp.dot(mc, plane, precision=hi,
                               preferred_element_type=f32)

            def gchunk(ci, _):
                z = zc0 + ci * chunk
                qw = final[pl.ds(z, chunk)]
                qc = jnp.stack([sel_rows(qw[j]) for j in range(chunk)], 0)
                gyv = jnp.stack(
                    [jnp.dot(mdy, qw[j], precision=hi,
                             preferred_element_type=f32)
                     for j in range(chunk)], 0) * s
                gxv = (jnp.where(last_xc, qc, pltpu.roll(qc, nx - 1, 2))
                       - jnp.where(first_xc, qc, pltpu.roll(qc, 1, 2))) * s
                qm = sel_rows(final[pl.ds(jnp.maximum(z - 1, 0), 1)][0])
                qp = sel_rows(
                    final[pl.ds(jnp.minimum(z + chunk, size_z - 1), 1)][0])
                qcm = jnp.concatenate([qm[None], qc[:-1]], axis=0)
                qcp = jnp.concatenate([qc[1:], qp[None]], axis=0)
                gzi = (jax.lax.broadcasted_iota(jnp.int32, (chunk, 1, 1), 0)
                       + z0 + ci * chunk)
                qcm = jnp.where(gzi == 0, qc, qcm)
                qcp = jnp.where(gzi == nz - 1, qc, qcp)
                gzv = (qcp - qcm) * s
                pzc = ((gzi.astype(f32) + 0.5) / nz) * 2.0 - 1.0
                for c, g, pv in ((0, gxv, pxc), (1, gyv, pyc), (2, gzv, pzc)):
                    u = u_buf[c, pl.ds(ci * chunk, chunk)].astype(f32)
                    u_buf[c, pl.ds(ci * chunk, chunk)] = (
                        damp(u - g, pv).astype(u_buf.dtype))
                return 0

            jax.lax.fori_loop(0, slab // chunk, gchunk, 0)
            cps_uo = [pltpu.make_async_copy(
                u_buf.at[c],
                out_f_hbm.at[c, pl.ds(z0, slab),
                             pl.ds(pl.multiple_of(y0, 8), ytile)],
                sem_u) for c in range(3)]
            for cp in cps_uo:
                cp.start()
            for cp in cps_uo:
                cp.wait()

        if div is not None:
            cp_bo.wait()
        cp_o.wait()

    nx = q_hbm.shape[2]
    scoped = dict(
        qa=pltpu.VMEM((size_z, size_y, nx), jnp.float32),
        qb=pltpu.VMEM((size_z, size_y, nx), jnp.float32),
        b_buf=pltpu.VMEM((size_z, size_y, nx), jnp.float32),
        sem_q=pltpu.SemaphoreType.DMA,
        sem_b=pltpu.SemaphoreType.DMA,
        sem_o=pltpu.SemaphoreType.DMA,
    )
    if rr is not None:
        scoped.update(
            rc_buf=pltpu.VMEM((slab // 2, ytile // 2, nx // 2), jnp.float32),
            sem_rc=pltpu.SemaphoreType.DMA)
    if div is not None:
        scoped.update(
            v_buf=pltpu.VMEM((3, size_z, size_y, nx), div[0].dtype),
            sem_v=pltpu.SemaphoreType.DMA)
    if grad is not None:
        scoped.update(
            u_buf=pltpu.VMEM((3, slab, ytile, nx), grad[0].dtype),
            sem_u=pltpu.SemaphoreType.DMA)
    pl.run_scoped(body, **scoped)


def _planewise_fused_kernel(qa_in, b_hbm, qa, qb, *, slab: int, ytile: int,
                            halo: int, inner: int, nz: int, ny: int,
                            lgl=None):
    """All rounds in one call (see _jacobi_fused_kernel)."""
    del qa_in
    r = pl.program_id(0)
    zi = pl.program_id(1)
    yi = pl.program_id(2)
    kw = dict(slab=slab, ytile=ytile, halo=halo, inner=inner, nz=nz, ny=ny,
              lgl=lgl)

    @pl.when(r % 2 == 0)
    def _():
        _planewise_window(qa, b_hbm, qb, zi, yi, **kw)

    @pl.when(r % 2 == 1)
    def _():
        _planewise_window(qb, b_hbm, qa, zi, yi, **kw)


def _planewise_rr_kernel(q_hbm, b_hbm, my3, px, out_q, out_rc, *, slab: int,
                         ytile: int, halo: int, inner: int, nz: int, ny: int):
    """One smoothing round + fused residual/restrict epilogue (see
    _planewise_window's rr branch).  sel picks the center-row pooling
    matrix for this window's y-shift (windows shift, not shrink, at the
    volume edges: interior windows start halo rows early, the bottom
    window at 0, the top one 2*halo early)."""
    zi = pl.program_id(0)
    yi = pl.program_id(1)
    n_yt = ny // ytile
    sel = jnp.where(yi == 0, 0, jnp.where(yi == n_yt - 1, 2, 1))
    _planewise_window(q_hbm, b_hbm, out_q, zi, yi, slab=slab, ytile=ytile,
                      halo=halo, inner=inner, nz=nz, ny=ny,
                      rr=(out_rc, my3, px, sel))


def jacobi_rr_supported(shape, iters: int) -> bool:
    """True when jacobi_pallas_rr can run this volume: the plane-sweep
    planner fits (iters in ONE round) and the window tiling pools cleanly
    (even dims; coarse y-offsets stay sublane-aligned)."""
    nz, ny, nx = shape
    if nx % 128 or nz % 2 or ny % 2 or nx % 2:
        return False
    if ny * nx <= 128 * 128:
        return False  # mg takes the whole-window kernels there
    pw = _plan_planewise(shape, iters)
    if pw is None:
        return False
    _, ytile, halo = pw
    # ytile >= 16 keeps the coarse DMA y-offsets sublane-aligned; halo >
    # iters leaves at least one FRESH halo ring for the residual stencil;
    # ytile >= halo keeps interior windows exactly `halo` rows in (the
    # 3-variant one-hot my3 matrices assume it).
    return ytile >= 16 and ytile >= halo and halo > iters


def jacobi_pallas_rr(pressure: jax.Array, div: jax.Array, iters: int,
                     scale: float = 1.0):
    """`iters` Jacobi sweeps PLUS the multigrid's next two passes fused in:
    returns (q, r_c) with r_c = restrict(b - A q) * scale at half
    resolution -- the full-resolution residual never touches HBM.
    Semantics match jacobi_sweeps + mg._residual + mg._restrict * scale
    (1-ulp pooling-order differences); cross-checked in tests/test_pallas.py.
    """
    import numpy as np

    nz, ny, nx = pressure.shape
    pw = _plan_planewise(pressure.shape, iters)
    slab, ytile, halo = pw
    size_y = min(ytile + 2 * halo, ny)
    yt2 = ytile // 2

    # Three center-row pooling matrices (transposed: (ytile/2, size_y)),
    # one per window y-shift; rows outside the center carry zero weight.
    my3 = np.zeros((3, yt2, size_y), np.float32)
    for v, yc0 in enumerate((0, halo, 2 * halo)):
        o = min(yc0, size_y - ytile)
        my3[v, np.arange(ytile) // 2, o + np.arange(ytile)] = 0.5
    px = np.zeros((nx, nx // 2), np.float32)
    px[np.arange(nx), np.arange(nx) // 2] = 0.5 * scale

    kernel = functools.partial(
        _planewise_rr_kernel, slab=slab, ytile=ytile, halo=halo,
        inner=iters, nz=nz, ny=ny)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        interpret=(jax.default_backend() == "cpu"),
        out_shape=(jax.ShapeDtypeStruct(pressure.shape, jnp.float32),
                   jax.ShapeDtypeStruct((nz // 2, ny // 2, nx // 2),
                                        jnp.float32)),
        grid=(nz // slab, ny // ytile),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            vmem((3, yt2, size_y), lambda zi, yi: (0, 0, 0)),
            vmem((nx, nx // 2), lambda zi, yi: (0, 0)),
        ],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
    )(pressure, div, jnp.asarray(my3), jnp.asarray(px))


def _planewise_divrr_kernel(q_hbm, fields, my3, px, out_q, out_b, out_rc, *,
                            slab: int, ytile: int, halo: int, inner: int,
                            nz: int, ny: int):
    """Pre-smoother with BOTH ends fused: divergence prologue (b computed
    in VMEM from the combined state's velocity channels, exact center
    written out once for the post-smoother) + residual/restrict epilogue.
    See _planewise_window's `div` and `rr` hooks."""
    zi = pl.program_id(0)
    yi = pl.program_id(1)
    n_yt = ny // ytile
    sel = jnp.where(yi == 0, 0, jnp.where(yi == n_yt - 1, 2, 1))
    _planewise_window(q_hbm, None, out_q, zi, yi, slab=slab, ytile=ytile,
                      halo=halo, inner=inner, nz=nz, ny=ny,
                      rr=(out_rc, my3, px, sel), div=(fields, out_b))


def _planewise_grad_kernel(q_hbm, b_hbm, fields, mc3, mdy3, out_q, out_f, *,
                           slab: int, ytile: int, halo: int, inner: int,
                           nz: int, ny: int, rho: float):
    """Post-smoother with the projection's tail fused in: after the sweeps,
    velocity -= 0.5 * grad(q) / rho + boundary damp on the center blocks of
    the combined state (out_f aliases fields).  See _planewise_window's
    `grad` hook."""
    zi = pl.program_id(0)
    yi = pl.program_id(1)
    n_yt = ny // ytile
    sel = jnp.where(yi == 0, 0, jnp.where(yi == n_yt - 1, 2, 1))
    _planewise_window(q_hbm, b_hbm, out_q, zi, yi, slab=slab, ytile=ytile,
                      halo=halo, inner=inner, nz=nz, ny=ny,
                      grad=(fields, out_f, mc3, mdy3, sel, rho))


def _fuse_extra(vel_bytes: int) -> float:
    """f32-window-equivalents the 3 velocity-channel window buffers add."""
    return 3.0 * vel_bytes / 4.0


def jacobi_divrr_supported(shape, iters: int, vel_bytes: int = 2) -> bool:
    """Gate for jacobi_pallas_divrr: the rr constraints (ytile >= 16 keeps
    the coarse DMA offsets sublane-aligned, halo > iters leaves fresh halo
    rings for the residual) plus VMEM room for the velocity windows."""
    nz, ny, nx = shape
    if nx % 128 or nz % 2 or ny % 2 or nx % 2:
        return False
    if ny * nx <= 128 * 128:
        return False  # mg takes the whole-window kernels there
    pw = _plan_planewise(shape, iters, extra_window=_fuse_extra(vel_bytes))
    if pw is None:
        return False
    _, ytile, halo = pw
    # ytile >= halo keeps interior windows exactly `halo` rows in, the
    # assumption the 3-variant one-hot matrices (_center_row_matrices /
    # my3) bake in; thinner tiles would clamp lo_y to a different offset
    # and silently select wrong rows (tests/test_pallas.py gate tests).
    return ytile >= 16 and ytile >= halo and halo > iters


def jacobi_grad_supported(shape, iters: int, vel_bytes: int = 2) -> bool:
    """Gate for jacobi_pallas_grad: halo > iters leaves the fresh q ring
    the gradient stencil reads at the center edge; velocity center buffers
    charge `extra_center` against the VMEM budget."""
    nz, ny, nx = shape
    if nx % 128 or nz % 2 or ny % 2 or nx % 2:
        return False
    if ny * nx <= 128 * 128:
        return False
    pw = _plan_planewise(shape, iters, extra_center=_fuse_extra(vel_bytes))
    if pw is None:
        return False
    _, ytile, halo = pw
    # ytile >= halo: same one-hot-matrix window-offset assumption as
    # jacobi_divrr_supported above.
    return ytile >= 8 and ytile >= halo and halo > iters


def _center_row_matrices(ytile: int, size_y: int, halo: int, ny: int):
    """(mc3, mdy3): per-window-shift one-hot center-row selection and
    y-gradient (M(y+1) - M(y-1), globally edge-clamped) matrices, shape
    (3, ytile, size_y).  Variant 0 = window at the global bottom (lo_y=0),
    1 = interior, 2 = global top; a full-width window (ytile == ny) clamps
    both ends and uses variant 0."""
    import numpy as np

    mc3 = np.zeros((3, ytile, size_y), np.float32)
    mdy3 = np.zeros((3, ytile, size_y), np.float32)
    full = ytile == ny
    for v, yc0 in enumerate((0, halo, 2 * halo)):
        o = min(yc0, size_y - ytile)
        for i in range(ytile):
            mc3[v, i, o + i] = 1.0
            up = o + i + 1
            dn = o + i - 1
            if full:
                up = min(up, size_y - 1)
                dn = max(dn, 0)
            else:
                if v == 0 and i == 0:
                    dn = o + i  # global bottom row clamps
                if v == 2 and o + i == size_y - 1:
                    up = o + i  # global top row clamps
            mdy3[v, i, up] += 1.0
            mdy3[v, i, dn] -= 1.0
    return mc3, mdy3


def jacobi_pallas_divrr(fields: jax.Array, pressure: jax.Array, iters: int,
                        scale: float = 1.0):
    """`iters` pre-smoother sweeps with the projection's head AND the
    multigrid's next two passes fused in: returns (q, b, r_c) where
    b = divergence(fields[:3]) (computed in VMEM from the velocity windows,
    written once for the post-smoother) and r_c = restrict(b - A q) * scale.
    Semantics match divergence_pallas + jacobi_sweeps + mg._residual +
    mg._restrict * scale; cross-checked in tests/test_pallas.py.
    VERDICT r3 item 1 (ref: CSProject3D.hlsl:40-53 + CSPoisson.hlsli:8-26).
    """
    import numpy as np

    nz, ny, nx = pressure.shape
    vb = fields.dtype.itemsize
    pw = _plan_planewise(pressure.shape, iters,
                         extra_window=_fuse_extra(vb))
    slab, ytile, halo = pw
    size_y = min(ytile + 2 * halo, ny)
    yt2 = ytile // 2

    my3 = np.zeros((3, yt2, size_y), np.float32)
    for v, yc0 in enumerate((0, halo, 2 * halo)):
        o = min(yc0, size_y - ytile)
        my3[v, np.arange(ytile) // 2, o + np.arange(ytile)] = 0.5
    px = np.zeros((nx, nx // 2), np.float32)
    px[np.arange(nx), np.arange(nx) // 2] = 0.5 * scale

    kernel = functools.partial(
        _planewise_divrr_kernel, slab=slab, ytile=ytile, halo=halo,
        inner=iters, nz=nz, ny=ny)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    f32 = jnp.float32
    return pl.pallas_call(
        kernel,
        interpret=(jax.default_backend() == "cpu"),
        out_shape=(jax.ShapeDtypeStruct(pressure.shape, f32),
                   jax.ShapeDtypeStruct(pressure.shape, f32),
                   jax.ShapeDtypeStruct((nz // 2, ny // 2, nx // 2), f32)),
        grid=(nz // slab, ny // ytile),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            vmem((3, yt2, size_y), lambda zi, yi: (0, 0, 0)),
            vmem((nx, nx // 2), lambda zi, yi: (0, 0)),
        ],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
    )(pressure, fields, jnp.asarray(my3), jnp.asarray(px))


def jacobi_pallas_grad(pressure: jax.Array, div: jax.Array,
                       fields: jax.Array, iters: int, rho: float):
    """`iters` post-smoother sweeps with the projection's tail fused in:
    returns (q, fields') where fields' velocity channels carry
    v - 0.5 * grad(q_final) / rho with the 3% boundary damp, applied IN
    PLACE (out aliases fields; color channels untouched, zero traffic).
    Semantics match jacobi_sweeps + grad_damp_pallas; cross-checked in
    tests/test_pallas.py.  VERDICT r3 item 1 (ref: CSProject3D.hlsl:92-108).
    """
    nz, ny, nx = pressure.shape
    vb = fields.dtype.itemsize
    pw = _plan_planewise(pressure.shape, iters,
                         extra_center=_fuse_extra(vb))
    slab, ytile, halo = pw
    size_y = min(ytile + 2 * halo, ny)
    mc3, mdy3 = _center_row_matrices(ytile, size_y, halo, ny)

    kernel = functools.partial(
        _planewise_grad_kernel, slab=slab, ytile=ytile, halo=halo,
        inner=iters, nz=nz, ny=ny, rho=rho)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        interpret=(jax.default_backend() == "cpu"),
        out_shape=(jax.ShapeDtypeStruct(pressure.shape, jnp.float32),
                   jax.ShapeDtypeStruct(fields.shape, fields.dtype)),
        grid=(nz // slab, ny // ytile),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            vmem((3, ytile, size_y), lambda zi, yi: (0, 0, 0)),
            vmem((3, ytile, size_y), lambda zi, yi: (0, 0, 0)),
        ],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        input_output_aliases={2: 1},
    )(pressure, div, fields, jnp.asarray(mc3), jnp.asarray(mdy3))


def _jacobi2d_kernel(q_ref, b_ref, out_ref, *, iters: int):
    """All `iters` 2D sweeps in one call: a 512^2 f32 plane is 1 MB, so the
    whole field lives in VMEM and the relaxation runs with ZERO intermediate
    HBM round trips (the XLA form re-streams the plane every sweep;
    CSProject2D.hlsl's 4-neighbor update, rho handled by the caller)."""
    from fluidx12_tpu.ops.pallas.shifts import (
        shift_lane_clamped,
        shift_sublane_clamped,
    )

    q = q_ref[...]
    b = b_ref[...]

    def sweep(_, q):
        s = (shift_sublane_clamped(q, +1) + shift_sublane_clamped(q, -1)
             + shift_lane_clamped(q, +1) + shift_lane_clamped(q, -1))
        return (s - b) / 4.0

    out_ref[...] = jax.lax.fori_loop(0, iters, sweep, q)


def jacobi2d_pallas_supported(shape) -> bool:
    """(Y, X) plane must be lane/sublane aligned and fit VMEM with the
    ~6 live sweep temporaries."""
    ny, nx = shape
    return (nx % 128 == 0 and ny % 8 == 0
            and ny * nx * 4 * 8 <= 12 * 1024 * 1024)


def jacobi2d_pallas(pressure: jax.Array, div: jax.Array, iters: int) -> jax.Array:
    """Run `iters` 2D Jacobi sweeps; pressure/div (Y, X) f32."""
    return pl.pallas_call(
        functools.partial(_jacobi2d_kernel, iters=iters),
        interpret=(jax.default_backend() == "cpu"),
        out_shape=jax.ShapeDtypeStruct(pressure.shape, jnp.float32),
    )(pressure, div)


def _jacobi_packed_kernel(q_ref, b_ref, out_ref, *, iters: int):
    """All `iters` sweeps of a (Z, Y, 64) volume packed as (Z, Y/2, 128).

    nx = 64 volumes (the multigrid's coarse level under a 128^3 fine grid)
    miss the 128-lane alignment every windowed kernel needs, so the coarse
    relaxation fell back to XLA sweeps (each materializes its shifted
    reads).  The whole coarse volume is ~1 MB: pack lane l = (y % 2) * 64
    + x -- a PURE reshape, no relayout -- hold everything in VMEM, and run
    the full sweep loop with zero HBM round trips.

    Neighbor fetches in packed space (all static 32-bit rolls):
      x+-1   in-half lane roll, edge-clamped at x = 0 / 63 of each half
      y+-1   the other half (lane XOR 64 == roll by 64); odd->even also
             steps one sublane row, edge-clamped at y = 0 / ny-1
      z+-1   leading-dim shifts, edge-clamped
    Update and clamp semantics match sim/project.jacobi_sweeps exactly.
    """
    q = q_ref[...]
    b = b_ref[...]
    nz, nr, nl = q.shape  # nl == 128, two 64-lane halves
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nl), 2)
    row = jax.lax.broadcasted_iota(jnp.int32, (1, nr, 1), 1)
    x_hi = lane % 64 == 63
    x_lo = lane % 64 == 0
    h0 = lane < 64       # even y (y = 2r); odd y (y = 2r + 1) otherwise
    top = row == 0
    bot = row == nr - 1

    def sweep(_, q):
        # Accumulate taps SEQUENTIALLY (same left-to-right association as
        # rt+lt+yp+ym+zp+zm, so bit-identical) instead of binding all nine
        # neighbor volumes at once: Mosaic's scoped-VMEM stack keeps
        # python-level temporaries live, and the named-taps form peaked at
        # ~11 simultaneous full-volume values vs ~5 here (q, b, acc, sw,
        # one expression temp).
        acc = jnp.where(x_hi, q, pltpu.roll(q, nl - 1, 2))        # x + 1
        acc = acc + jnp.where(x_lo, q, pltpu.roll(q, 1, 2))       # x - 1
        sw = pltpu.roll(q, 64, 2)                 # other half, same row
        acc = acc + jnp.where(                    # y + 1
            h0, sw, jnp.where(bot, q, pltpu.roll(sw, nr - 1, 1)))
        acc = acc + jnp.where(                    # y - 1
            h0, jnp.where(top, q, pltpu.roll(sw, 1, 1)), sw)
        acc = acc + jnp.concatenate([q[1:], q[-1:]], axis=0)      # z + 1
        acc = acc + jnp.concatenate([q[:1], q[:-1]], axis=0)      # z - 1
        return (acc - b) / 6.0

    out_ref[...] = jax.lax.fori_loop(0, iters, sweep, q)


def jacobi_packed_supported(shape) -> bool:
    """(Z, Y, 64) f32 volumes whose packed form fits VMEM.  The budget
    model charges 12 full-volume values against a 12 MiB bound; the sweep
    body's true high-water is ~5 (sequential accumulation, see
    _jacobi_packed_kernel) plus the 3 in/out block buffers and the
    fori_loop carry, so the model carries >=3 volumes of headroom plus the
    4 MiB to the real 16 MiB scoped stack (kernel VMEM models here have
    underestimated before -- residual_pallas measured 16.19 MB against a
    smaller model).  nx = 64 exactly (the two-half lane packing), and the
    packed row count ny/2 must be a multiple of the 8-row sublane tile --
    every hardware-proven sublane roll in this codebase runs on
    multiple-of-8 sizes, and interpret mode would not catch a Mosaic
    lowering failure."""
    nz, ny, nx = shape
    return (nx == 64 and ny % 16 == 0 and nz >= 2
            and nz * ny * nx * 4 * 12 <= 12 * 1024 * 1024)


def jacobi_packed_pallas(pressure: jax.Array, div: jax.Array,
                         iters: int) -> jax.Array:
    """`iters` Jacobi sweeps of a (Z, Y, 64) f32 volume, whole-VMEM (see
    _jacobi_packed_kernel)."""
    nz, ny, nx = pressure.shape
    qp = pressure.reshape(nz, ny // 2, 2 * nx)
    bp = div.reshape(nz, ny // 2, 2 * nx)
    out = pl.pallas_call(
        functools.partial(_jacobi_packed_kernel, iters=iters),
        interpret=(jax.default_backend() == "cpu"),
        out_shape=jax.ShapeDtypeStruct(qp.shape, jnp.float32),
    )(qp, bp)
    return out.reshape(nz, ny, nx)


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


_CHUNK = 8  # z-planes per sweep step; keeps fori_loop trip counts low


def _plan_planewise(shape, inner: int, extra_window: float = 0.0,
                    extra_center: float = 0.0):
    """(slab, ytile, halo) for the plane-sweep kernel, or None.

    halo is max(inner, 8) rounded to a multiple of 8 (the lo_y DMA
    alignment hint requires it).  VMEM: the window triple-buffer
    (q ping-pong + b) plus ~8 chunk-sized sweep temporaries must fit under
    Mosaic's ~16 MB scoped stack.  extra_window / extra_center charge
    additional f32-window-equivalents against the budget, scaled by the
    full window depth / the center slab depth respectively (the fused
    div-prologue / grad-epilogue variants carry velocity buffers).
    """
    nz, ny, nx = shape
    halo = -(-max(inner, 8) // 8) * 8
    budget = 15 * 1024 * 1024
    best = None
    for slab in (64, 32, 16, 8):
        size_z = slab + 2 * halo
        if nz % slab or nz < size_z or size_z % _CHUNK:
            continue
        for ytile in (256, 128, 64, 32, 16, 8):
            # ytile == ny is the full-width window (no lateral halo).
            if ny % ytile or (ytile != ny and ny < ytile + 2 * halo):
                continue
            size_y = min(ytile + 2 * halo, ny)
            size = int((size_z * (3 + extra_window) + slab * extra_center
                        + _CHUNK * 8) * size_y * nx * 4)
            if size > budget:
                continue
            # Tie-break toward wide y-windows: the sweep loops over z-chunks,
            # so fewer/larger (size_y, X) planes amortize loop overhead.
            y_red = 1.0 if ytile == ny else 1 + 2 * halo / ytile
            key = (round((1 + 2 * halo / slab) * y_red, 4), -ytile)
            if best is None or key < best[0]:
                best = (key, slab, ytile, halo)
    if best is None:
        return None
    return best[1], best[2], best[3]


def jacobi_tuning(shape, iters: int):
    """Best measured (slab, inner) for this volume, or None if unsupported.

    Full-plane volumes (plane <= 128x128) relax fastest with shallow halos
    and tall slabs in the whole-window kernel; bigger planes use the
    plane-sweep kernel with inner=8 windows.  Measured IN-PROGRAM (the only
    honest comparison on this relay -- standalone timings reversed the
    verdict twice): 64 sweeps at 128^3 inside the sim step, whole-window
    (32,4) 3.38 ms vs plane-sweep (32,8) 3.82 ms; at 256^3 the plane-sweep
    windows are ~5x faster than y-tiled whole-window.
    """
    nz, ny, nx = shape
    if nx % 128:
        # Both kernels window the volume with manual DMA slices, which
        # Mosaic requires to be 128-lane aligned (fails at e.g. 24^3 on
        # hardware; interpret mode does not enforce it).  Unaligned grids
        # take the XLA sweeps -- they are small enough not to matter.
        return None
    if ny * nx <= 128 * 128:
        for slab, inner in ((32, 4), (16, 8)):
            if iters % inner == 0 and _plan(shape, slab, inner) is not None:
                return slab, inner
    for inner in (8, 4):
        if iters % inner == 0 and _plan_planewise(shape, inner) is not None:
            return _plan_planewise(shape, inner)[0], inner
    for slab, inner in ((32, 4), (16, 8)):
        if iters % inner == 0 and _plan(shape, slab, inner) is not None:
            return slab, inner
    return None


def jacobi_pallas_supported(shape, iters: int, slab: int = 16, inner: int = 8) -> bool:
    return iters % inner == 0 and _plan(shape, slab, inner) is not None


def jacobi_pallas(pressure: jax.Array, div: jax.Array, iters: int,
                  slab: int = 16, inner: int = 8,
                  logical_zyx=None) -> jax.Array:
    """Run `iters` Jacobi sweeps (3D only). pressure/div: (Z, Y, X) f32.

    Plane <= 128x128 volumes use the whole-window kernel; larger planes the
    plane-sweep kernel (see _planewise_window) when its plan fits, falling
    back to the y-tiled whole-window kernel.  All rounds run in ONE
    pallas_call (round-outermost grid, ping-pong full-volume outputs, input
    aliased to the first; see _jacobi_fused_kernel).

    `logical_zyx`: logical extents on the padded storage layout
    (core/padding.py) -- the +edge clamps move to the logical boundary,
    making the interior bit-identical to compact sweeps at the logical
    shape (the masked twin sim/padded.jacobi_sweeps_masked); ghost cells
    relax bounded garbage that never couples inward.
    """
    if iters % inner:
        raise ValueError("iters must be a multiple of inner")
    nz, ny, nx = pressure.shape
    lgl = tuple(logical_zyx) if logical_zyx is not None else None

    pw = _plan_planewise(pressure.shape, inner) if ny * nx > 128 * 128 else None
    if pw is not None:
        slab, ytile, halo = pw
        kernel = functools.partial(
            _planewise_fused_kernel, slab=slab, ytile=ytile, halo=halo,
            inner=inner, nz=nz, ny=ny, lgl=lgl)
    else:
        plan = _plan(pressure.shape, slab, inner)
        if plan is None:
            raise ValueError(f"unsupported volume shape {pressure.shape}")
        slab, ytile = plan
        kernel = functools.partial(
            _jacobi_fused_kernel, slab=slab, ytile=ytile, halo=inner,
            inner=inner, nz=nz, ny=ny, lgl=lgl)

    rounds = iters // inner
    shape = jax.ShapeDtypeStruct(pressure.shape, jnp.float32)
    qa, qb = pl.pallas_call(
        kernel,
        interpret=(jax.default_backend() == "cpu"),
        out_shape=(shape, shape),
        grid=(rounds, nz // slab, ny // ytile),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        input_output_aliases={0: 0},
    )(pressure, div)
    return qa if rounds % 2 == 0 else qb
