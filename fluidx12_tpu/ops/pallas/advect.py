"""Pallas TPU kernels for the dense-shift semi-Lagrangian backtrace.

The XLA form (sim/advect_fast.py) emits ~26 separate pad+multiply kernels per
axis pass, re-reading the 7-channel volume each time (~18 ms at 128^3).
These kernels keep a block in VMEM and evaluate all taps as vector rolls.

Structure (round 3):

- pass x rolls lanes, pass y rolls sublanes; each computes its displacement
  IN-BLOCK from the velocity channel it needs (pass x from u_x, pass y from
  the x-advected u_y -- path-following splitting, same as the XLA twin), so
  no HBM displacement arrays exist.  All-channel blocks share the tap
  weights when the tiling fits (_pass_kernel_fused_d); otherwise
  per-channel blocks with a channel-pinned displacement input
  (_pass_kernel_fused_d1).
- pass z is a leading-dim window kernel (taps are slab slices: no
  transposes, no rolls), with the impulse/forces/dissipation epilogue fused
  into its output write and gated by a block/impulse-sphere test.
- edge-clamp addressing is absorbed into the displacement
  (_clamp_disp_inbounds): no per-tap selects anywhere.
- blocks are sized for Mosaic's 16 MB scoped-VMEM stack (each unrolled
  tap's rolled temporary stays live).

Boundary addressing is CLAMP (Mosaic has no reverse primitive for the mirror
the reference sampler uses); see _resample_axis for why the difference is
negligible here.  The XLA twin keeps exact mirror semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_DISP = 12  # voxels; keep in sync with sim/advect_fast.MAX_DISP

# Calm-tier weight-cache dtype (fused x+y kernel): f32.  bf16 was measured
# as the round-5 VPU experiment -- see CLAUDE.md round-5 notes.
_WCACHE_DTYPE = jnp.float32


# Blocks whose displacements all fit this many voxels take the short tap
# path (see _pass_kernel); most of the volume is quiescent -- the plume is
# localized -- so most blocks do 6 taps instead of 26.
_CALM_DISP = 2


def _clamp_disp_inbounds(d, axis_ids_f, n, ghost_zero: bool = False):
    """Absorb edge-clamp addressing into the displacement itself.

    out[i] = lerp(q[clamp(i+floor(d))], q[clamp(i+floor(d)+1)]) is exactly
    equivalent to clamping d to [-i, n-1-i] first and then sampling with NO
    address clamp: fully-out-of-range backtraces land on the edge value with
    weight 1, partial overhangs collapse to the edge value too (both taps
    clamp to the same cell, (1-f)+f = 1).  This replaces two jnp.where
    selects PER TAP PER CHANNEL (the round-2 kernels' biggest VPU cost) with
    one clip on the channel-free displacement.  Taps outside the clamped
    range carry exactly zero weight, so wrapped roll values are harmless.

    `n` is the LOGICAL axis extent: on the padded storage layout
    (core/padding.py) it is smaller than the array dim, which makes every
    out-of-logical tap zero-weight -- ghost values are never sampled, and
    the interior exactly reproduces the compact clamp semantics.  With
    `ghost_zero` (padded call sites), ghost cells themselves (i >= n) get
    displacement ZERO (self-copy) instead of the in-bounds-manufactured
    d <= n-1-i: those large negative values forced the HEAVY tap tier on
    every block containing ghost lanes/rows/planes (measured 6.0 vs ~2.6 ms
    advect at the FluidGI 160x160x256 storage); with d = 0 the tier
    predicates follow the logical flow only.  Compact call sites skip the
    extra select (ids never exceed n-1 there).
    """
    clipped = jnp.clip(d, -axis_ids_f, (n - 1.0) - axis_ids_f)
    if ghost_zero:
        return jnp.where(axis_ids_f > (n - 1.0), 0.0, clipped)
    return clipped


_MID_DISP = 6  # middle displacement tier (z-pass): 14 static taps


def _resample_clamped(q, d, axis, lo: int, hi: int):
    """Static unrolled resample: taps lo..hi (inclusive), independent
    static rolls of q (the fastest tap shape: no serial chain, taps
    overlap on the VPU).  d must be pre-clamped in-bounds
    (_clamp_disp_inbounds), so there are NO per-tap edge selects and
    wrapped roll values carry exactly zero weight -- ~40% less VPU work
    per tap than the round-2 form.  Every tap temporary stays live on the
    scoped-VMEM stack, so callers bound block sizes accordingly.

    (A fori_loop "roll chain" -- one dynamic start + static shift-by-1 of
    the carry -- was tried for an adaptive trip count with ~3 live
    temporaries; Mosaic takes unbounded time compiling it.  Dynamic
    per-tap rolls measured ~5x slower and do not exist for 16-bit data.)
    """
    n = q.shape[axis]
    f32 = jnp.float32
    qf = q.astype(f32)  # rolls lower via tpu.dynamic_rotate: 32-bit only
    out = jnp.zeros_like(qf)
    for a in range(lo, hi + 1):
        w = jnp.maximum(1.0 - jnp.abs(d - float(a)), 0.0)
        out = out + pltpu.roll(qf, (n - a) % n, axis) * w[None]
    return out


def _resample_axis(q: jax.Array, d: jax.Array, axis: int,
                   max_disp: int = MAX_DISP) -> jax.Array:
    """Variable-shift linear resample along `axis` of a VMEM-resident array.

    q: block; d: per-element displacement broadcastable to q's shape with
    the channel dim removed (already clipped to [-max_disp, max_disp]).
    out[i] = lerp(q[clamp(i + floor(d))], q[clamp(i + floor(d) + 1)]).

    Boundary addressing is CLAMP (edge broadcast); the reference sampler is
    MIRROR, but the two only differ for backtraces that leave the volume --
    which the projection's boundary damping (CSProject3D.hlsl:104-108) keeps
    rare and shallow.
    """
    n = q.shape[axis]
    q = q.astype(jnp.float32)  # storage may be f16; tap math runs in f32
    ids = jax.lax.broadcasted_iota(
        jnp.int32, d.shape, axis if q.ndim == d.ndim else axis - 1
    )
    lo_edge = jax.lax.slice_in_dim(q, 0, 1, axis=axis)
    hi_edge = jax.lax.slice_in_dim(q, n - 1, n, axis=axis)

    def bc(m):
        return m[None] if q.ndim == d.ndim + 1 else m

    # Unrolled static-shift taps: static pltpu.roll is ~2x faster than the
    # dynamic-shift fori_loop form (measured 5.7 vs 12 ms at 128^3); the
    # price is that every tap temporary stays live on the scoped-VMEM stack,
    # so blocks must stay small (see _BLOCK_BUDGET_ELEMS).
    out = jnp.zeros_like(q)
    for a in range(-max_disp, max_disp + 2):
        w = jnp.maximum(1.0 - jnp.abs(d - a), 0.0)
        rolled = pltpu.roll(q, (n - a) % n, axis)
        val = jnp.where(bc(ids + a < 0), lo_edge, rolled)
        val = jnp.where(bc(ids + a >= n), hi_edge, val)
        out = out + val * bc(w)
    return out


def _pass_kernel(vol_ref, d_ref, out_ref, *, axis: int):
    """One resample pass over a (C, slab, A, B) block; d (slab, A, B).

    All channels ride in one block: the tap weights depend only on the
    displacement, so evaluating them once per tap (instead of once per
    channel per tap, the earlier per-channel-grid form) cuts ~1/3 of the
    VPU work -- _resample_axis broadcasts the (slab, A, B) weights over C.

    Adaptive tap count (the TPU analog of the reference's adaptive step,
    RayMarch.hlsli:200-210, applied to advection): blocks whose
    displacements all fit _CALM_DISP voxels take a 6-tap path instead of
    the full 26 -- bit-identical output, since the skipped taps carry
    exactly zero weight there.  pl.when predication skips the heavy branch
    at runtime; both branches' temporaries are scoped per branch, so the
    VMEM high-water mark is unchanged.
    """
    q = vol_ref[...]
    d = d_ref[...]
    calm = jnp.max(jnp.abs(d)) <= float(_CALM_DISP)

    @pl.when(calm)
    def _():
        out_ref[...] = _resample_axis(
            q, d, axis=axis, max_disp=_CALM_DISP).astype(out_ref.dtype)

    @pl.when(jnp.logical_not(calm))
    def _():
        out_ref[...] = _resample_axis(q, d, axis=axis).astype(out_ref.dtype)


def _pass_kernel_fused_d(vol_ref, scale_ref, out_ref, *, axis: int,
                         disp_ch: int, n_log: int = 0):
    """All-channel resample pass computing the displacement IN-BLOCK:
    d = clip(-u[disp_ch] * scale) needs no separate XLA pass or
    HBM-resident displacement array (saves one volume-sized read+write per
    pass).  scale = dt * grid_extent rides in SMEM (dt is traced).

    Two-tier taps: calm blocks (the majority at this granularity) unroll
    6 static rolls, fast-flow blocks the full 26 (_resample_clamped); both
    are bit-identical and select-free (edge clamping rides in the
    displacement).  n_log: logical extent of the resampled axis on the
    padded layout (0 = compact, use the block dim).
    """
    q = vol_ref[...]
    f32 = jnp.float32
    n = q.shape[axis]
    d = jnp.clip(-q[disp_ch].astype(f32) * scale_ref[0],
                 -float(MAX_DISP), float(MAX_DISP))
    ids = jax.lax.broadcasted_iota(jnp.int32, d.shape, axis - 1).astype(f32)
    d = _clamp_disp_inbounds(d, ids, n_log or n,
                             ghost_zero=bool(n_log))
    calm = jnp.max(jnp.abs(d)) <= float(_CALM_DISP)

    @pl.when(calm)
    def _():
        out_ref[...] = _resample_clamped(
            q, d, axis, -_CALM_DISP, _CALM_DISP + 1).astype(out_ref.dtype)

    @pl.when(jnp.logical_not(calm))
    def _():
        out_ref[...] = _resample_clamped(
            q, d, axis, -MAX_DISP, MAX_DISP + 1).astype(out_ref.dtype)


# Per-tap temporaries stay live on Mosaic's 16 MB scoped-VMEM stack, so the
# block must satisfy ~26 * block_bytes well under it.  256 KB per-channel
# blocks keep the tap set ~7 MB; all-channel blocks may go up to 460 KB
# (taps ~12 MB) because the weight amortization is worth the tighter fit.
_BLOCK_BUDGET_ELEMS = 64 * 1024       # f32 elements per block (256 KB)
_CBLOCK_BUDGET_ELEMS = 115 * 1024     # budget when all channels share a block


def _pick_tiles(z: int, lat: int, res: int, gran: int,
                budget: int = _BLOCK_BUDGET_ELEMS):
    """Choose (slab_z, lat_tile) so slab*lat_tile*res fits the budget.

    `lat` is the tileable lateral dim (not resampled; tiles must stay a
    multiple of `gran` -- 8 for sublanes, 128 for lanes -- per Mosaic's block
    divisibility rule), `res` the resampled full-width dim.  Returns None if
    no valid tiling exists.
    """
    lat_tile = lat
    while (lat_tile * res > budget
           and lat_tile % 2 == 0 and lat_tile // 2 >= gran
           and lat_tile // 2 % gran == 0):
        lat_tile //= 2
    if lat % lat_tile or lat_tile * res > budget:
        return None
    slab = max(budget // (lat_tile * res), 1)
    while slab > 1 and (z % slab or slab * lat_tile * res > budget):
        slab //= 2
    if z % slab:
        return None
    return slab, lat_tile


def _pass_kernel_fused_d1(vol_ref, dsrc_ref, scale_ref, out_ref, w_ref, *,
                          axis: int, n_log: int = 0):
    """Per-channel variant of _pass_kernel_fused_d: the block holds ONE
    channel, and the displacement channel's block rides a second
    channel-pinned input (fetched once per (z, lat) step -- the channel
    grid dim is innermost).  Used when the all-channel tiling cannot fit
    (e.g. the y pass at 256^3, whose minimum 128-lane tile x 7 channels
    would put the heavy tier's 26 tap temporaries past the VMEM stack).

    The tap weights depend only on the (channel-free) displacement, so the
    channel 0 step writes all 26 of them into a VMEM scratch that persists
    across the channel-innermost grid steps; channels 1..6 reuse them --
    per-tap work drops from weight(4 ops) + roll*w(3 ops) to roll*w alone,
    which measured ~35-45%% of the per-channel pass.  Only the calm
    predicate's displacement is recomputed per channel (2 ops + a reduce).
    """
    ci = pl.program_id(2)
    q = vol_ref[...]
    f32 = jnp.float32
    n = q.shape[axis]
    d = jnp.clip(-dsrc_ref[0].astype(f32) * scale_ref[0],
                 -float(MAX_DISP), float(MAX_DISP))
    ids = jax.lax.broadcasted_iota(jnp.int32, d.shape, axis - 1).astype(f32)
    d = _clamp_disp_inbounds(d, ids, n_log or n,
                             ghost_zero=bool(n_log))
    calm = jnp.max(jnp.abs(d)) <= float(_CALM_DISP)

    @pl.when(ci == 0)
    def _():
        for t, a in enumerate(range(-MAX_DISP, MAX_DISP + 2)):
            w_ref[t] = jnp.maximum(1.0 - jnp.abs(d - float(a)), 0.0)

    qf = q.astype(f32)  # rolls lower via tpu.dynamic_rotate: 32-bit only

    def taps(lo: int, hi: int):
        out = jnp.zeros_like(qf)
        for a in range(lo, hi + 1):
            w = w_ref[a + MAX_DISP]
            out = out + pltpu.roll(qf, (n - a) % n, axis) * w[None]
        return out

    @pl.when(calm)
    def _():
        out_ref[...] = taps(-_CALM_DISP, _CALM_DISP + 1).astype(out_ref.dtype)

    @pl.when(jnp.logical_not(calm))
    def _():
        out_ref[...] = taps(-MAX_DISP, MAX_DISP + 1).astype(out_ref.dtype)


def _run_pass_fused(vol: jax.Array, axis: int, interpret: bool,
                    disp_ch: int, scale, n_log: int = 0) -> jax.Array:
    """Resample pass with the displacement computed in-block
    (_pass_kernel_fused_d): all channels share a block when the tiling
    fits, else per-channel blocks with a channel-pinned displacement input
    (_pass_kernel_fused_d1).  Returns None when neither tiling fits (the
    caller falls back to the precomputed-displacement / XLA forms)."""
    c, z, a, b = vol.shape
    lat, res, gran = (a, b, 8) if axis == 3 else (b, a, 128)
    # Roll-clean resampled dim on hardware, exactly as fused_xy_supported
    # requires: a non-multiple pads in VMEM (lanes to 128, sublanes to 8 --
    # 150 lanes pad 1.7x), which silently multiplies every live tap
    # temporary and blew the 16 MB scoped-VMEM stack at 150^3 (the FluidGI
    # preset; caught by the bench suite row).  Odd grids ride the XLA twin.
    if not interpret and res % (128 if axis == 3 else 8):
        return None
    scale_arr = jnp.asarray(scale, jnp.float32).reshape(1)

    tiles = _pick_tiles(z, lat, res * c, gran, _CBLOCK_BUDGET_ELEMS)
    if tiles is not None:
        slab, lat_t = tiles
        if axis == 3:
            block = (c, slab, lat_t, b)
            vol_map = lambda zi, li: (0, zi, li, 0)
        else:
            block = (c, slab, a, lat_t)
            vol_map = lambda zi, li: (0, zi, 0, li)
        return pl.pallas_call(
            functools.partial(_pass_kernel_fused_d, axis=axis,
                              disp_ch=disp_ch, n_log=n_log),
            out_shape=jax.ShapeDtypeStruct(vol.shape, vol.dtype),
            grid=(z // slab, lat // lat_t),
            in_specs=[
                pl.BlockSpec(block, vol_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((1,), lambda zi, li: (0,), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(block, vol_map, memory_space=pltpu.VMEM),
            interpret=interpret,
        )(vol, scale_arr)

    tiles = _pick_tiles(z, lat, res, gran, _BLOCK_BUDGET_ELEMS)
    if tiles is None:
        return None
    slab, lat_t = tiles
    # Channel INNERMOST: the displacement channel's block index ignores ci,
    # so Mosaic fetches it once per (z, lat) step; likewise the tap-weight
    # scratch written at ci == 0 stays valid across the ci steps (the TPU
    # grid iterates sequentially, last dim fastest).
    if axis == 3:
        block = (1, slab, lat_t, b)
        vol_map = lambda zi, li, ci: (ci, zi, li, 0)
        d_map = lambda zi, li, ci, dc=disp_ch: (dc, zi, li, 0)
    else:
        block = (1, slab, a, lat_t)
        vol_map = lambda zi, li, ci: (ci, zi, 0, li)
        d_map = lambda zi, li, ci, dc=disp_ch: (dc, zi, 0, li)
    return pl.pallas_call(
        functools.partial(_pass_kernel_fused_d1, axis=axis, n_log=n_log),
        out_shape=jax.ShapeDtypeStruct(vol.shape, vol.dtype),
        grid=(z // slab, lat // lat_t, c),
        in_specs=[
            pl.BlockSpec(block, vol_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(block, d_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1,), lambda zi, li, ci: (0,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(block, vol_map, memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2 * MAX_DISP + 2,) + block[1:], jnp.float32)],
        interpret=interpret,
    )(vol, vol, scale_arr)


def _pass_kernel_fused_xy(vol_ref, dsrc_ref, sx_ref, sy_ref, out_ref,
                          acc_ref, dx_ref, dy_ref, wx_ref, wy_ref, *,
                          nx_log: int = 0, ny_log: int = 0):
    """Both lateral passes (x then y) in ONE kernel visit per channel block.

    The two-pass form streams the full 7-channel volume through HBM twice
    (read+write per pass); here a (1, slab, Y, X) full-plane block is read
    once, x-resampled into a f32 VMEM accumulator, quantized through the
    storage dtype (bit-matching the two-pass HBM round trip), y-resampled,
    and written once -- the intermediate never exists in HBM.  At 256^3
    that cuts the x+y traffic from 4 to ~2.14 volume trips (the channel-0
    displacement source block re-fetches once per z step).

    Channel order rides the index map: channel 1 (u_y) goes FIRST so the
    x-advected u_y exists when the y displacement is derived at ci == 0;
    both displacement fields persist in VMEM scratch across the
    channel-innermost grid steps (same persistence contract as
    _pass_kernel_fused_d1's weight scratch).

    This kernel is VPU-tap-bound, not HBM-bound (measured at 256^3: the
    lateral floor is ~0.6 ms while the pass costs several), so two tap
    optimizations carry it:

    - CALM-TIER WEIGHT CACHING: tap weights depend only on the (channel-
      free) displacement; the ci == 0 step writes the 6 calm-tier weight
      planes per axis into scratch, and channels 1..6 skip the 4-op weight
      recomputation per tap (~45%% of the calm tap work, and calm planes
      are ~90%% of a developed 256^3 volume).
    - FOUR TIERS (1 / 2 / 6 / 12 voxels): steady-state displacement stats
      (CLAUDE.md round-4) show x/z never exceed ~3 and y rarely exceeds 6,
      so the mid tier (14 taps) replaces the full 26 on most non-calm
      planes, and a very-calm 4-tap base carries the majority of planes
      (max|d| <= 1).  Bit-identical output in every tier: taps outside a
      tier's clamped displacement range carry exactly zero weight.

    VMEM shape: the calm 6-tap resample runs in the main body; the mid/
    heavy tiers ADD 8 / 12 outer taps under pl.when (branch stacks add
    their high-water marks).  The outer taps join the accumulator after
    the calm partial sum, so tiered sums associate (calm) + (mid) + (heavy)
    rather than strictly left-to-right -- within f32 rounding of the
    two-pass form (the cross-check tolerance already covers XLA-vs-Mosaic
    reassociation).
    """
    ci = pl.program_id(1)
    q = vol_ref[0]                       # (slab, Y, X), storage dtype
    f32 = jnp.float32
    _, ny, nx = q.shape

    @pl.when(ci == 0)
    def _():
        dx = jnp.clip(-dsrc_ref[0].astype(f32) * sx_ref[0],
                      -float(MAX_DISP), float(MAX_DISP))
        ids = jax.lax.broadcasted_iota(jnp.int32, dx.shape, 2).astype(f32)
        dx = _clamp_disp_inbounds(dx, ids, nx_log or nx,
                                  ghost_zero=bool(nx_log))
        dx_ref[...] = dx
        for t, a in enumerate(range(-_CALM_DISP, _CALM_DISP + 2)):
            wx_ref[t] = jnp.maximum(1.0 - jnp.abs(dx - float(a)),
                                    0.0).astype(wx_ref.dtype)

    dx = dx_ref[...]
    mx = jnp.max(jnp.abs(dx))
    qf = q.astype(f32)  # rolls lower via tpu.dynamic_rotate: 32-bit only

    # Both tap chains seed from the first product instead of a zeros
    # accumulator (bit-identical: 0 + x is exact in f32) -- the kernel is
    # VPU-op-bound, so the dropped init/add per chain is measurable.
    def taps(src, d, axis, lo, hi):
        n = src.shape[axis]
        out = None
        for a in range(lo, hi + 1):
            w = jnp.maximum(1.0 - jnp.abs(d - float(a)), 0.0)
            term = pltpu.roll(src, (n - a) % n, axis) * w
            out = term if out is None else out + term
        return out

    def taps_cached(src, w_ref, axis, t_lo, t_hi):
        """Cached-weight taps for tap indices [t_lo, t_hi] (tap t samples
        offset a = t - _CALM_DISP)."""
        n = src.shape[axis]
        out = None
        for t in range(t_lo, t_hi + 1):
            a = t - _CALM_DISP
            term = pltpu.roll(src, (n - a) % n, axis) * w_ref[t].astype(f32)
            out = term if out is None else out + term
        return out

    # Very-calm base tier: most developed planes have max|d| <= 1, where
    # only the 4 taps a in [-1, 2] carry nonzero weight -- the outer calm
    # taps (a = -2, 3) join under pl.when, same zero-weight exactness
    # argument as the mid/heavy tiers.
    acc_ref[...] = taps_cached(qf, wx_ref, 2, 1, 2 * _CALM_DISP)

    @pl.when(mx > 1.0)
    def _():
        acc_ref[...] = (acc_ref[...]
                        + taps_cached(qf, wx_ref, 2, 0, 0)
                        + taps_cached(qf, wx_ref, 2,
                                      2 * _CALM_DISP + 1, 2 * _CALM_DISP + 1))

    @pl.when(mx > float(_CALM_DISP))
    def _():
        acc_ref[...] = (acc_ref[...]
                        + taps(qf, dx, 2, -_MID_DISP, -_CALM_DISP - 1)
                        + taps(qf, dx, 2, _CALM_DISP + 2, _MID_DISP + 1))

    @pl.when(mx > float(_MID_DISP))
    def _():
        acc_ref[...] = (acc_ref[...]
                        + taps(qf, dx, 2, -MAX_DISP, -_MID_DISP - 1)
                        + taps(qf, dx, 2, _MID_DISP + 2, MAX_DISP + 1))

    # Quantize through the storage dtype: the two-pass path's intermediate
    # lives in HBM at storage precision, and the y displacement below must
    # derive from the SAME quantized u_y.
    txq = acc_ref[...].astype(out_ref.dtype).astype(f32)

    @pl.when(ci == 0)
    def _():
        # vol block at step 0 IS channel 1 (u_y), already x-advected above.
        dy = jnp.clip(-txq * sy_ref[0], -float(MAX_DISP), float(MAX_DISP))
        ids = jax.lax.broadcasted_iota(jnp.int32, dy.shape, 1).astype(f32)
        dy = _clamp_disp_inbounds(dy, ids, ny_log or ny,
                                  ghost_zero=bool(ny_log))
        dy_ref[...] = dy
        for t, a in enumerate(range(-_CALM_DISP, _CALM_DISP + 2)):
            wy_ref[t] = jnp.maximum(1.0 - jnp.abs(dy - float(a)),
                                    0.0).astype(wy_ref.dtype)

    dy = dy_ref[...]
    my = jnp.max(jnp.abs(dy))

    acc_ref[...] = taps_cached(txq, wy_ref, 1, 1, 2 * _CALM_DISP)

    @pl.when(my > 1.0)
    def _():
        acc_ref[...] = (acc_ref[...]
                        + taps_cached(txq, wy_ref, 1, 0, 0)
                        + taps_cached(txq, wy_ref, 1,
                                      2 * _CALM_DISP + 1, 2 * _CALM_DISP + 1))

    @pl.when(my > float(_CALM_DISP))
    def _():
        acc_ref[...] = (acc_ref[...]
                        + taps(txq, dy, 1, -_MID_DISP, -_CALM_DISP - 1)
                        + taps(txq, dy, 1, _CALM_DISP + 2, _MID_DISP + 1))

    @pl.when(my > float(_MID_DISP))
    def _():
        acc_ref[...] = (acc_ref[...]
                        + taps(txq, dy, 1, -MAX_DISP, -_MID_DISP - 1)
                        + taps(txq, dy, 1, _MID_DISP + 2, MAX_DISP + 1))

    out_ref[0] = acc_ref[...].astype(out_ref.dtype)


def fused_xy_supported(zyx, interpret: bool = False) -> bool:
    """Full-plane blocks: both lateral dims are resampled, so the block
    must hold the whole (Y, X) plane inside the per-channel tap budget.
    On hardware the plane must also be Mosaic-roll clean (lanes a multiple
    of 128, sublanes of 8 -- every proven roll in this codebase runs on
    such sizes; interpret mode would not catch a lowering failure)."""
    nz, ny, nx = zyx
    if ny * nx > _BLOCK_BUDGET_ELEMS or nz < 1:
        return False
    if not interpret and (nx % 128 or ny % 8):
        return False
    return True


def _run_pass_fused_xy(vol: jax.Array, interpret: bool,
                       scale_x, scale_y, nx_log: int = 0,
                       ny_log: int = 0) -> jax.Array:
    """Fused x+y resample of the (7, Z, Y, X) combined field
    (_pass_kernel_fused_xy), or None when the plane cannot fit a
    full-plane block (caller runs the two-pass form)."""
    c, z, ny, nx = vol.shape
    if not fused_xy_supported((z, ny, nx), interpret):
        return None
    slab = max(_BLOCK_BUDGET_ELEMS // (ny * nx), 1)
    while slab > 1 and z % slab:
        slab //= 2
    if z % slab:
        slab = 1
    block = (1, slab, ny, nx)

    def swap01(ci):
        # Channel visit order (1, 0, 2, ..): u_y first (see kernel doc).
        return ci + (ci == 0).astype(ci.dtype) - (ci == 1).astype(ci.dtype)

    vol_map = lambda zi, ci: (swap01(ci), zi, 0, 0)
    d_map = lambda zi, ci: (0, zi, 0, 0)
    sx = jnp.asarray(scale_x, jnp.float32).reshape(1)
    sy = jnp.asarray(scale_y, jnp.float32).reshape(1)
    return pl.pallas_call(
        functools.partial(_pass_kernel_fused_xy, nx_log=nx_log,
                          ny_log=ny_log),
        out_shape=jax.ShapeDtypeStruct(vol.shape, vol.dtype),
        grid=(z // slab, c),
        in_specs=[
            pl.BlockSpec(block, vol_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(block, d_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1,), lambda zi, ci: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda zi, ci: (0,), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(block, vol_map, memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((slab, ny, nx), jnp.float32),   # acc
            pltpu.VMEM((slab, ny, nx), jnp.float32),   # dx
            pltpu.VMEM((slab, ny, nx), jnp.float32),   # dy
            # Calm-tier tap weights, cached across the channel-innermost
            # grid steps (computed once at ci == 0 per z step).
            pltpu.VMEM((2 * _CALM_DISP + 2, slab, ny, nx), _WCACHE_DTYPE),
            pltpu.VMEM((2 * _CALM_DISP + 2, slab, ny, nx), _WCACHE_DTYPE),
        ],
        interpret=interpret,
    )(vol, vol, sx, sy)


def _run_pass(vol: jax.Array, disp: jax.Array, axis: int, interpret: bool):
    """vol (7, Z, A, B); disp (Z, A, B) pre-clipped; axis 2 (resample
    sublanes, tile B) or 3 (resample lanes, tile A).  Returns None when no
    valid tiling exists (caller falls back to XLA)."""
    c, z, a, b = vol.shape
    lat, res, gran = (a, b, 8) if axis == 3 else (b, a, 128)
    if not interpret and res % (128 if axis == 3 else 8):
        return None  # non-roll-clean dim: padded tap temporaries (see
        # _run_pass_fused); odd grids ride the XLA twin
    for c_blk in (c, 1) if c > 1 else (1,):
        budget = _CBLOCK_BUDGET_ELEMS if c_blk > 1 else _BLOCK_BUDGET_ELEMS
        tiles = _pick_tiles(z, lat, res * c_blk, gran, budget)
        if tiles is None:
            continue
        slab, lat_t = tiles
        if axis == 3:
            block = (c_blk, slab, lat_t, b)
            d_block = (slab, lat_t, b)
        else:
            block = (c_blk, slab, a, lat_t)
            d_block = (slab, a, lat_t)
        if c_blk > 1:
            grid = (z // slab, lat // lat_t)
            if axis == 3:
                vol_map = lambda zi, li: (0, zi, li, 0)
                d_map = lambda zi, li: (zi, li, 0)
            else:
                vol_map = lambda zi, li: (0, zi, 0, li)
                d_map = lambda zi, li: (zi, 0, li)
        else:
            grid = (c, z // slab, lat // lat_t)
            if axis == 3:
                vol_map = lambda ci, zi, li: (ci, zi, li, 0)
                d_map = lambda ci, zi, li: (zi, li, 0)
            else:
                vol_map = lambda ci, zi, li: (ci, zi, 0, li)
                d_map = lambda ci, zi, li: (zi, 0, li)
        return pl.pallas_call(
            functools.partial(_pass_kernel, axis=axis),
            out_shape=jax.ShapeDtypeStruct(vol.shape, vol.dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec(block, vol_map, memory_space=pltpu.VMEM),
                pl.BlockSpec(d_block, d_map, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(block, vol_map, memory_space=pltpu.VMEM),
            interpret=interpret,
        )(vol, disp)
    return None


_ZHALO = MAX_DISP + 1   # taps span [-MAX_DISP, MAX_DISP + 1]
_ZHBLK = 16             # halo block planes (smallest multiple of 8 >= _ZHALO)


def _zpass_kernel(prev_ref, cur_ref, next_ref, uz_ref, scale_ref, out_ref,
                  win_ref, *, slab: int, nz: int, epilogue=None,
                  ghost_zero: bool = False):
    """Resample the leading (z) axis of one channel's slab.

    The x/y passes resample the lane/sublane axes with vector rolls; z is a
    leading (untiled) dim, so its taps are offset slab slices of a
    (prev-halo | cur | next-halo) window assembled in a scratch ref -- no
    470 MB lane transposes (measured 2x 3.4 ms at 256^3) and no per-tap
    roll work.  The halo neighbors ride ordinary pipelined BlockSpecs sized
    _ZHBLK planes (index maps clamped at the volume edges), so DMA overlaps
    compute and read redundancy is only (slab + 2*_ZHBLK)/slab.

    The displacement is computed IN-KERNEL from the u_z channel's center
    block (uz_ref rides a channel-pinned BlockSpec, so Mosaic fetches it
    once per (z, y) across the channel-innermost grid steps) -- no HBM
    displacement array.  Edge-clamp addressing is absorbed into the
    displacement (_clamp_disp_inbounds): out-of-volume window reads then
    carry exactly zero weight (the halo scratch holds finite garbage at the
    two boundary slabs, which 0-weights erase), so there are NO per-tap
    masks and NO interior/edge branches.  Taps run a dynamic-bounds
    fori_loop (see _dyn_resample): calm slabs do ~2-3 taps.
    """
    zi = pl.program_id(0)
    z0 = zi * slab
    f32 = jnp.float32  # storage may be half; window/tap math runs in f32
    win_ref[: _ZHALO] = prev_ref[0, _ZHBLK - _ZHALO:].astype(f32)
    win_ref[pl.ds(_ZHALO, slab)] = cur_ref[0].astype(f32)
    win_ref[pl.ds(_ZHALO + slab, _ZHALO)] = next_ref[0, :_ZHALO].astype(f32)

    # Dynamic-bounds fori over exactly the taps each CHUNK of z-planes
    # needs (z taps are WINDOW SLICES: leading-dim dynamic starts are
    # address math, not lane shuffles, so unlike the lateral passes there
    # is no static-shift advantage to chase).  Bounds are per 8-plane
    # chunk, not per block: with slab-tall blocks a single fast region
    # anywhere in the slab would force its tap span on ALL planes
    # (measured 4.66 ms/visit at 256^3 with block-level bounds), while the
    # flow's z-extent per 8 planes is tiny almost everywhere.  The chunk's
    # displacement derives from a per-chunk ref read (a value-level
    # dynamic_slice does not lower in Mosaic).  Single un-branched path:
    # pl.when tiers do not share scoped-VMEM stack space, so branching
    # multiplies the high-water mark for no win here.
    zchunk = 8
    n_ch = slab // zchunk

    def chunk_body(ci, _):
        zc = ci * zchunk
        uzc = uz_ref[0, pl.ds(zc, zchunk)].astype(f32)
        dch = jnp.clip(-uzc * scale_ref[0],
                       -float(MAX_DISP), float(MAX_DISP))
        ids = (jax.lax.broadcasted_iota(jnp.int32, dch.shape, 0)
               + z0 + zc)  # global z of this chunk's planes
        dch = _clamp_disp_inbounds(dch, ids.astype(f32), nz,
                                   ghost_zero=ghost_zero)
        lo = jnp.floor(jnp.min(dch)).astype(jnp.int32)
        hi = jnp.floor(jnp.max(dch)).astype(jnp.int32) + 1

        def tap(a, out):
            w = jnp.maximum(1.0 - jnp.abs(dch - a.astype(f32)), 0.0)
            return out + win_ref[pl.ds(_ZHALO + zc + a, zchunk)] * w

        out = jax.lax.fori_loop(lo, hi + 1, tap, jnp.zeros_like(dch))
        # An epilogue writes out_ref itself (it may branch with pl.when,
        # which cannot return values); the plain path stores directly.
        if epilogue is not None:
            epilogue(out, ids, zc)
        else:
            out_ref[0, pl.ds(zc, zchunk)] = out.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_ch, chunk_body, 0)


def _zpass_forces_kernel(prev_ref, cur_ref, next_ref, uz_ref, scale_ref,
                         dt_ref, fc_ref, out_ref, win_ref, *, slab: int,
                         nz: int, ny: int, nx: int, ytile: int,
                         cfg_consts: tuple, ghost_zero: bool = False):
    """z-resample + fused impulse/forces epilogue (the last advect pass
    writes the FORCED state directly, saving a full 7-channel HBM round
    trip over a separate force pass; semantics identical to
    sim/advect.apply_impulse_forces, same single rounding at the storage
    write).  Per-channel coefficients ride in an SMEM table fc (7, 5) =
    [A_basis, B_negdz, B_dx, clip_lo, clip_hi]; dt is a (1,) SMEM scalar.
    Channel math: out' = clip(out + in_impulse * (A*basis + B_negdz*(-dz)
    + B_dx*dx) * dt, lo, hi) * max(1 - dissipation*dt, 0).
    """
    ip_x, ip_y, ip_z, radius, dissipation = cfg_consts
    zi = pl.program_id(0)
    yi = pl.program_id(1)
    ci = pl.program_id(2)
    f32 = jnp.float32

    # Scalar block-AABB vs impulse-sphere test, hoisted out of the tier
    # branches: the Gaussian impulse only reaches where basis >= exp(-4),
    # i.e. |pos - impulse_pos| <= radius -- ~0.2% of the volume.  Blocks
    # outside it skip the exp() entirely (a transcendental per voxel per
    # channel was a real cost; VPU transcendentals are expensive,
    # CLAUDE.md).  x spans the full block, so only z/y distance matters.
    z_lo = (zi * slab + 0.5) / nz
    z_hi = (zi * slab + slab - 0.5) / nz
    y_lo = (yi * ytile + 0.5) / ny
    y_hi = (yi * ytile + ytile - 0.5) / ny
    dzb = jnp.clip(ip_z, z_lo, z_hi) - ip_z
    dyb = jnp.clip(ip_y, y_lo, y_hi) - ip_y
    hit = dzb * dzb + dyb * dyb <= radius * radius

    def epilogue(out, gz_ids, zc):
        # Per-chunk form (see _zpass_kernel's chunk loop): `out` holds
        # `zchunk` resampled planes, written to out_ref at offset zc.
        dt = dt_ref[0]
        atten = jnp.maximum(1.0 - dissipation * dt, 0.0)

        @pl.when(hit)
        def _():
            # Simulation-space voxel centers (GridToSimulationSpace).
            cz = (gz_ids.astype(f32) + 0.5) / nz
            cy = ((jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
                   + yi * ytile).astype(f32) + 0.5) / ny
            cx = (jax.lax.broadcasted_iota(jnp.int32, out.shape, 2)
                  .astype(f32) + 0.5) / nx
            dx_ = cx - ip_x
            dy_ = cy - ip_y
            dz_ = cz - ip_z
            d2 = dx_ * dx_ + dy_ * dy_ + dz_ * dz_
            basis = jnp.exp(-4.0 * d2 / (radius * radius))
            in_imp = (basis >= 0.01831563889245799).astype(f32)  # exp(-4)
            ext = (fc_ref[ci, 0] * basis + fc_ref[ci, 1] * (-dz_)
                   + fc_ref[ci, 2] * dx_)
            forced = jnp.clip(out + in_imp * ext * dt,
                              fc_ref[ci, 3], fc_ref[ci, 4])
            out_ref[0, pl.ds(zc, out.shape[0])] = (
                forced * atten).astype(out_ref.dtype)

        @pl.when(jnp.logical_not(hit))
        def _():
            # No impulse reach: clip (exact same saturation point) + decay.
            clipped = jnp.clip(out, fc_ref[ci, 3], fc_ref[ci, 4])
            out_ref[0, pl.ds(zc, out.shape[0])] = (
                clipped * atten).astype(out_ref.dtype)

    _zpass_body(prev_ref, cur_ref, next_ref, uz_ref, scale_ref, out_ref,
                win_ref, slab=slab, nz=nz, epilogue=epilogue,
                ghost_zero=ghost_zero)


# The plain kernel shares the body; keep one traced implementation.
_zpass_body = _zpass_kernel


def _zpass_plan(nz: int, ny: int, nx: int, slab_max: int = 128):
    """(slab, ytile) for the z-pass window kernel, or None."""
    if nx % 128:
        # Lane dim below/unaligned to the 128-lane tile: the in-kernel
        # window slices fail Mosaic's alignment rule (seen at 24^3 on
        # hardware -- interpret mode does not enforce it).
        return None
    # Taller slabs cut the halo-block read redundancy ((slab + 2*_ZHBLK) /
    # slab: 1.5 at slab 64 -> 1.25 at 128); the y tile shrinks to keep the
    # block inside the budget, and the slab halves if even ytile=8 cannot.
    # 512K-element budget (f32 window ~2.6 MB): the z kernel's taps are
    # window SLICES with no per-tap liveness, so unlike the lateral
    # kernels its VMEM need is just the window + a chunk accumulator --
    # wider y tiles halve the block count (DMA pipelining) for free.
    budget = 512 * 1024
    slab = slab_max
    while slab > 1 and nz % slab:
        slab //= 2
    ytile = 32
    while ytile > 8 and (ny % ytile or slab * ytile * nx > budget):
        ytile //= 2
    while slab > _ZHBLK and slab * ytile * nx > budget:
        slab //= 2
    if nz % slab or ny % ytile or slab < _ZHBLK or slab % _ZHBLK:
        return None
    return slab, ytile


def _forces_table(config):
    """(7, 5) per-channel [A_basis, B_negdz, B_dx, clip_lo, clip_hi]
    (Impulse.hlsli / CSAdvect.hlsl:57-68 constants)."""
    import numpy as np

    big = 3.0e38
    fc = np.zeros((7, 5), np.float32)
    fs = config.force_scale_3d
    f = np.asarray(config.ext_force, np.float32)
    fc[0] = [f[0] * fs, config.vort_scale, 0.0, -big, big]
    fc[1] = [f[1] * fs, 0.0, 0.0, -big, big]
    fc[2] = [f[2] * fs, 0.0, config.vort_scale, -big, big]
    rgba = np.asarray((*config.impulse_color, 1.0), np.float32) * config.impulse_density
    for j in range(4):
        fc[3 + j] = [rgba[j], 0.0, 0.0, 0.0, 1.0]
    return fc


def _run_zpass(vol: jax.Array, scale, interpret: bool,
               slab_max: int = 128, forces_cfg=None, forces_dt=None,
               logical_zyx=None):
    """vol (C, Z, Y, X): resample z with displacement -u_z * scale computed
    in-kernel from channel 2 (see _zpass_kernel).

    Grid is (z-slab, y-tile, channel) with channel innermost so the shared
    u_z center block keeps the same index across the channel steps and is
    fetched once per (z, y).  Returns None if the shape doesn't tile.
    With forces_cfg/forces_dt, the impulse+force+dissipation pass fuses
    into the output write (see _zpass_forces_kernel).  logical_zyx: the
    logical grid extents on the padded layout (tiling always follows the
    array dims; displacement clamps and force coordinates follow the
    logical ones).
    """
    c, nz, ny, nx = vol.shape
    plan = _zpass_plan(nz, ny, nx, slab_max)
    if plan is None:
        return None
    lz, ly, lx = logical_zyx or (nz, ny, nx)
    slab, ytile = plan
    n_slabs = nz // slab
    hb = slab // _ZHBLK      # halo blocks per slab
    n_hblks = nz // _ZHBLK

    grid = (n_slabs, ny // ytile, c)
    blk = (1, slab, ytile, nx)
    hblk = (1, _ZHBLK, ytile, nx)
    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    in_specs = [
        # prev halo: last _ZHBLK planes of slab zi-1 (clamped at 0)
        pl.BlockSpec(hblk,
                     lambda zi, yi, ci, hb=hb: (ci, jnp.maximum(zi * hb - 1, 0), yi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(blk, lambda zi, yi, ci: (ci, zi, yi, 0),
                     memory_space=pltpu.VMEM),
        # next halo: first _ZHBLK planes of slab zi+1 (clamped at end)
        pl.BlockSpec(hblk,
                     lambda zi, yi, ci, hb=hb, n=n_hblks: (ci, jnp.minimum((zi + 1) * hb, n - 1), yi, 0),
                     memory_space=pltpu.VMEM),
        # u_z center block (channel pinned to 2; constant across ci steps)
        pl.BlockSpec(blk, lambda zi, yi, ci: (2, zi, yi, 0),
                     memory_space=pltpu.VMEM),
        smem((1,), lambda zi, yi, ci: (0,)),
    ]
    if forces_cfg is not None:
        cfg = forces_cfg
        kernel = functools.partial(
            _zpass_forces_kernel, slab=slab, nz=lz, ny=ly, nx=lx, ytile=ytile,
            cfg_consts=(float(cfg.impulse_pos[0]), float(cfg.impulse_pos[1]),
                        float(cfg.impulse_pos[2]), float(cfg.impulse_radius),
                        float(cfg.dissipation)),
            ghost_zero=logical_zyx is not None)
        in_specs = in_specs + [smem((1,), lambda zi, yi, ci: (0,)),
                               smem((7, 5), lambda zi, yi, ci: (0, 0))]
        extra = (jnp.asarray(forces_dt, jnp.float32).reshape(1),
                 jnp.asarray(_forces_table(cfg)))
    else:
        kernel = functools.partial(_zpass_kernel, slab=slab, nz=lz,
                                   ghost_zero=logical_zyx is not None)
        extra = ()
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(vol.shape, vol.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(blk, lambda zi, yi, ci: (ci, zi, yi, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((slab + 2 * _ZHALO, ytile, nx), jnp.float32)],
        interpret=interpret,
    )(vol, vol, vol, vol, jnp.asarray(scale, jnp.float32).reshape(1), *extra)


def zpass_forces_supported(config) -> bool:
    """True when the z-pass kernel tiles this grid AND may fuse the forces
    epilogue (premultiplied color only: un-premultiplied storage divides
    rgb by alpha, a cross-channel op the per-channel grid cannot express).
    Tiling is judged on the STORAGE dims (padded layouts tile even when the
    logical grid would not, core/padding.py)."""
    from fluidx12_tpu.core.padding import storage_zyx

    z, y, x = storage_zyx(config)
    return (config.is_3d and config.pre_multiplied
            and _zpass_plan(z, y, x) is not None)


def backtrace_pallas(both: jax.Array, dt, config, forces_dt=None) -> jax.Array:
    """Full 3-pass split backtrace of the (7, Z, Y, X) combined field.

    Any pass without a valid tiling falls back to its XLA twin for that pass.
    forces_dt (only valid when zpass_forces_supported) fuses the
    impulse/forces/dissipation pass into the z-pass output write.

    On the padded storage layout (core/padding.py) `both` carries the
    roll-clean storage dims while config.zyx stays logical: displacement
    scales and in-bounds clamps use the logical extents, so out-of-logical
    taps are zero-weight and the interior matches the compact kernels
    exactly.  The padded path only runs pass forms whose edge handling is
    displacement-absorbed (fused/zpass kernels + the clamped XLA twin); the
    legacy precomputed-displacement form keeps compact-only edge selects.
    """
    from fluidx12_tpu.sim.advect_fast import _advect_1d, _advect_1d_clamped

    z, y, x = config.zyx
    padded = tuple(both.shape[-3:]) != (z, y, x)
    interpret = jax.default_backend() == "cpu"

    def clip_disp(u, scale):
        # Displacements are always f32, whatever the storage dtype.
        return jnp.clip(-u.astype(jnp.float32) * scale,
                        -float(MAX_DISP), float(MAX_DISP))

    def xla_1d(vol, d, axis, n_log):
        # XLA-twin fallback computes in f32 and restores the storage dtype.
        vol32 = vol.astype(jnp.float32)
        out = (_advect_1d_clamped(vol32, d, axis, n_log) if padded
               else _advect_1d(vol32, d, axis))
        return out.astype(vol.dtype)

    # Fused x+y: both lateral passes in one kernel visit when the plane
    # fits a full-plane block (the intermediate never exists in HBM).
    out = None
    if config.advect_fuse_xy:
        out = _run_pass_fused_xy(both, interpret, dt * x, dt * y,
                                 nx_log=x if padded else 0,
                                 ny_log=y if padded else 0)

    if out is None:
        # Pass x (lanes) then pass y (sublanes), each an all-channel
        # two-tier kernel with the displacement computed in-block (pass y
        # reads the x-advected u_y from its own input block -- no HBM
        # displacement arrays anywhere).
        out = _run_pass_fused(both, axis=3, interpret=interpret,
                              disp_ch=0, scale=dt * x,
                              n_log=x if padded else 0)
        if out is None and not padded:
            out = _run_pass(both, clip_disp(both[0], dt * x), axis=3,
                            interpret=interpret)
        if out is None:
            out = xla_1d(both, clip_disp(both[0], dt * x), axis=3, n_log=x)
        out2 = _run_pass_fused(out, axis=2, interpret=interpret,
                               disp_ch=1, scale=dt * y,
                               n_log=y if padded else 0)
        if out2 is None and not padded:
            out2 = _run_pass(out, clip_disp(out[1], dt * y), axis=2,
                             interpret=interpret)
        if out2 is None:
            out2 = xla_1d(out, clip_disp(out[1], dt * y), axis=2, n_log=y)
        out = out2
    if not config.is_3d:
        return out

    # Pass z: leading-dim window kernel (no transposes; displacement
    # computed in-kernel from u_z).
    out_z = _run_zpass(out, dt * z, interpret=interpret,
                       forces_cfg=config if forces_dt is not None else None,
                       forces_dt=forces_dt,
                       logical_zyx=(z, y, x) if padded else None)
    if out_z is not None:
        return out_z

    if padded:
        return xla_1d(out, clip_disp(out[2], dt * z), axis=1, n_log=z)

    # Fallback: transpose z onto lanes, resample, transpose back.
    zt = jnp.transpose(out, (0, 3, 2, 1))  # (7, X, Y, Z)
    dz_t = jnp.transpose(clip_disp(out[2], dt * z), (2, 1, 0))  # (X, Y, Z)
    out_t = _run_pass(zt, dz_t, axis=3, interpret=interpret)
    if out_t is None:
        return xla_1d(out, clip_disp(out[2], dt * z), axis=1, n_log=z)
    return jnp.transpose(out_t, (0, 3, 2, 1))
