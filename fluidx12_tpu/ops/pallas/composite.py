"""Pallas TPU kernel for front-to-back slice compositing.

The slice marchers (render/slicecomp.py, render/screencomp.py) composite
their resampled slice stacks with an XLA chain of elementwise passes
(alpha -> exclusive cumprod -> weights -> weighted reductions), each
materializing an (n_s, R, R) temporary in HBM -- several full-stack round
trips per face.  This kernel streams the stack once: the grid iterates
lateral tiles x slice blocks (slice innermost), carrying the running
transmittance and the rgb/alpha accumulators in VMEM scratch across the
slice steps, so HBM traffic is exactly one read of the (4, n_s, R, R)
resampled stack plus one (4, R, R) write.

Semantics match the XLA chain bit-for-bit in structure (same clamps, same
per-slice alpha = 1 - (1 - d*absorption)^n_steps, same w/density scatter
rate; CSRayMarch.hlsl:141-193 normalization), marching front-to-back in
ascending slice order for + faces and descending for - faces (the `flip`
flag folds the direction into the slice-block index map and an in-block
reversal).  Cross-checked against the XLA chain in tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS_ALPHA = 1e-6


def _composite_kernel(dens_ref, prod_ref, nsteps_ref, out_ref,
                      t_scr, rgb_scr, a_scr, *,
                      bs: int, absorption: float, flip: bool, n_blocks: int):
    """One (slice-block, lateral-tile) step of the running composite."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        t_scr[...] = jnp.ones_like(t_scr)
        rgb_scr[...] = jnp.zeros_like(rgb_scr)
        a_scr[...] = jnp.zeros_like(a_scr)

    n_steps = nsteps_ref[...]
    t = t_scr[...]
    rgb = rgb_scr[...]
    a = a_scr[...]
    for i in range(bs):
        j = bs - 1 - i if flip else i
        dens = jnp.clip(dens_ref[j].astype(jnp.float32), 0.0, 1.0)
        a_ref_ = jnp.clip(dens * absorption, 0.0, 0.999)
        alpha = 1.0 - jnp.exp(n_steps * jnp.log1p(-a_ref_))
        alpha = jnp.clip(alpha, 0.0, 1.0 - _EPS_ALPHA)
        w = alpha * t
        w_rate = jnp.where(dens > 0.0, w / jnp.maximum(dens, 1e-6), 0.0)
        rgb = rgb + prod_ref[:, j].astype(jnp.float32) * w_rate[None]
        a = a + w
        t = t * (1.0 - alpha)
    t_scr[...] = t
    rgb_scr[...] = rgb
    a_scr[...] = a

    @pl.when(k == n_blocks - 1)
    def _():
        out_ref[0] = a
        out_ref[1:] = rgb


def composite_supported(n_s: int, r_rows: int, r_cols: int) -> bool:
    """Lateral dims must tile (sublane/lane granularity) and slices must
    split into equal blocks."""
    return (r_cols % 128 == 0 and r_rows % 8 == 0
            and n_s % _pick_bs(n_s) == 0 and n_s >= 8)


def _pick_bs(n_s: int) -> int:
    bs = 16
    while bs > 1 and n_s % bs:
        bs //= 2
    return bs


def _pick_tile(r_rows: int, r_cols: int, bs: int):
    """Lateral tile sized so the (4, bs, tr, tc) half blocks + f32 scratch
    stay well inside VMEM with double buffering."""
    tr, tc = r_rows, r_cols
    # bytes ~ 2(dbl-buf) * 4ch * bs * tr * tc * 2(bf16) + 5 * tr * tc * 4
    while tr * tc * (16 * bs + 20) > 8 * 1024 * 1024 and tr % 16 == 0 and tr > 8:
        tr //= 2
    while tr * tc * (16 * bs + 20) > 8 * 1024 * 1024 and tc % 256 == 0 and tc > 128:
        tc //= 2
    if r_rows % tr or r_cols % tc:
        return None
    return tr, tc


def _resample_weights(h, n_src: int, zero_outside: bool, tile: int,
                      n_log: int = 0):
    """In-kernel dense lerp-weight build: h (T, 1) f32 source coords ->
    (T, n_src) bf16 row weights.  Bit-matches render/slicecomp.
    _interp_weights (same clamp, floor, one-hot sums; edge texels where
    i0 == i1 accumulate (1-f)+f = 1).

    `n_log`: LOGICAL extent when the source rides the padded storage
    layout (core/padding.py) -- coords clamp at the logical edge while the
    one-hot columns span the padded width, so ghost columns never carry
    weight (0 = compact, clamp at n_src)."""
    lim = float((n_log or n_src) - 1)
    # int32 iota + cast: tpu.iota only exists for integer element types.
    ids = jax.lax.broadcasted_iota(
        jnp.int32, (tile, n_src), 1).astype(jnp.float32)
    c = jnp.clip(h, 0.0, lim)
    i0 = jnp.floor(c)
    frac = c - i0
    i1 = jnp.minimum(i0 + 1.0, lim)
    w = ((ids == i0).astype(jnp.float32) * (1.0 - frac)
         + (ids == i1).astype(jnp.float32) * frac)
    if zero_outside:
        inside = (h >= -0.5) & (h <= lim + 0.5)
        w = w * inside.astype(jnp.float32)
    return w.astype(jnp.bfloat16)


def _composite_resample_kernel(vol_ref, hr_ref, hc_ref, valid_ref,
                               nsteps_ref, out_ref, t_scr, rgb_scr, a_scr, *,
                               absorption: float, flip: bool, n_s: int,
                               tr: int, r2: int, a_dim: int, b_dim: int,
                               zero_outside: bool, a_log: int = 0,
                               b_log: int = 0):
    """One (row-tile, slice) step: resample the slice IN-KERNEL (two MXU
    dots against one-hot lerp weights built from the coordinate vectors)
    and fold it straight into the running composite -- the (4, n_s, R1, R2)
    resampled stack never exists in HBM (VERDICT r4 item 2; the semantics
    both twins implement: CSRayMarch.hlsl:141-193)."""
    k = pl.program_id(1)
    sl = (n_s - 1 - k) if flip else k

    @pl.when(k == 0)
    def _():
        t_scr[...] = jnp.ones_like(t_scr)
        rgb_scr[...] = jnp.zeros_like(rgb_scr)
        a_scr[...] = jnp.zeros_like(a_scr)

    # This slice's coordinate columns, selected with a one-hot reduce (the
    # (T, 1) column blocks Mosaic would need are not (8, 128)-tileable, and
    # traced dynamic_slice starts are illegal on the lane dim; the h
    # matrices are VMEM-resident constants across the grid, so the reduce
    # is a few K VPU ops per slice).
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, n_s), 1)
              == sl).astype(jnp.float32)
    hr = jnp.sum(hr_ref[...] * onehot, axis=1, keepdims=True)   # (tr, 1)
    hc = jnp.sum(hc_ref[...] * onehot, axis=1, keepdims=True)   # (R2, 1)
    w_r = _resample_weights(hr, a_dim, zero_outside, tr, a_log)  # (tr, A)
    w_c = _resample_weights(hc, b_dim, zero_outside, r2, b_log)  # (R2, B)

    res = []
    for c in range(4):
        # (tr, A) @ (A, B) -> (tr, B); then contract B against the column
        # weights -> (tr, R2).  f32 accumulation, bf16 re-cast between the
        # dots -- the same quantization points as the XLA einsum chain.
        t1 = jax.lax.dot_general(
            w_r, vol_ref[c, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        r = jax.lax.dot_general(
            t1, w_c, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        res.append(r)

    v = valid_ref[sl]
    n_steps = nsteps_ref[...]
    t = t_scr[...]
    dens = jnp.clip(res[0].astype(jnp.float32), 0.0, 1.0)
    a_ref_ = jnp.clip(dens * absorption, 0.0, 0.999)
    alpha = 1.0 - jnp.exp(n_steps * jnp.log1p(-a_ref_))
    alpha = jnp.clip(alpha, 0.0, 1.0 - _EPS_ALPHA) * v
    w = alpha * t
    w_rate = jnp.where(dens > 0.0, w / jnp.maximum(dens, 1e-6), 0.0)
    for c in range(3):
        rgb_scr[c] = rgb_scr[c] + res[1 + c].astype(jnp.float32) * w_rate
    a_scr[...] = a_scr[...] + w
    t_scr[...] = t * (1.0 - alpha)

    @pl.when(k == n_s - 1)
    def _():
        out_ref[0] = a_scr[...]
        out_ref[1:] = rgb_scr[...]


def _pick_rows_tile(r1: int, r2: int, a: int, b: int, n_s: int):
    """Largest row tile (divisor of r1, multiple of 8) whose per-step VMEM
    high-water mark stays within budget: the resident coordinate matrices,
    weight builds (f32+bf16), the four channels' dot temporaries,
    compositing temps, accumulators and the double-buffered (4, 1, A, B)
    volume slice."""

    def budget(tr):
        fixed = (r2 * b * 6            # w_c f32 + bf16
                 + r2 * n_s * 4        # h_cols resident
                 + 2 * 4 * a * b * 2)  # vol slice, double-buffered
        per_row = (a * 6               # w_r
                   + n_s * 4           # h_rows tile
                   + 4 * (b * 6 + r2 * 6)   # t1 + res per channel
                   + 4 * r2 * 4        # dens/alpha/w/w_rate
                   + 5 * r2 * 4        # t/rgb/a scratch
                   + 2 * r2 * 4)       # n_steps + out tile
        return fixed + tr * per_row

    tr = r1
    while tr > 8:
        if budget(tr) <= 10 * 1024 * 1024:
            break
        if r1 % (tr // 2) or (tr // 2) % 8:
            break
        tr //= 2
    if budget(tr) > 12 * 1024 * 1024:
        return None
    if tr != r1 and tr % 8:
        # Row-tiled blocks need 8-sublane alignment; the full-plane tile
        # (tr == r1) is exempt ("block equal to the array dim").
        return None
    return tr


def composite_resample_supported(n_s: int, a: int, b: int,
                                 r1: int, r2: int) -> bool:
    """Gate for composite_resample_pallas.

    The lateral VMEM block dims are always the FULL array dims, which
    Mosaic exempts from the (8, 128) divisibility rule, and non-aligned
    lane dims in kernel VALUES (r2 = 150, b = 160 etc.) are legal, just
    tile-padded.  The a % 8 / b % 16 floor matches what actually flows
    here -- padded storage layouts (core/padding.py: Z/Y round to 16, X to
    128) and roll-clean compact grids -- and keeps wilder shapes on the
    measured einsum twin.  The OUTPUT plane dims are unconstrained when
    the row tile is the full plane; row-TILED plans additionally need
    r1-divisor tiles that are 8-multiples (handled in _pick_rows_tile)."""
    if a % 8 or b % 16 or n_s < 2:
        return False
    return _pick_rows_tile(r1, r2, a, b, n_s) is not None


def composite_resample_pallas(volf: jax.Array, h_rows: jax.Array,
                              h_cols: jax.Array, valid: jax.Array,
                              n_steps: jax.Array, absorption: float,
                              flip: bool, zero_outside: bool = False,
                              a_log: int = 0, b_log: int = 0) -> jax.Array:
    """Fused per-slice resample + front-to-back composite.

    volf (4, n_s, A, B) bf16 axis-major volume; h_rows (n_s, R1) f32 source
    coords of output rows into A; h_cols (n_s, R2) into B; valid (n_s,) f32
    0/1 per-slice mask; n_steps (R1, R2) f32.  Returns (4, R1, R2) f32:
    channel 0 accumulated alpha, 1:4 rgb (pre 1/2pi).  HBM traffic is one
    volume read per row tile + the coordinate vectors -- neither the lerp
    weight matrices nor the resampled stack ever exist in HBM.

    a_log/b_log: logical lateral extents when volf rides the padded
    storage layout (core/padding.py) -- weights clamp at the logical edge
    and ghost columns never carry weight (0 = compact)."""
    _, n_s, a_dim, b_dim = volf.shape
    r1 = h_rows.shape[1]
    r2 = h_cols.shape[1]
    tr = _pick_rows_tile(r1, r2, a_dim, b_dim, n_s)
    if tr is None:
        raise ValueError(f"untileable fused-march shape {(n_s, a_dim, b_dim, r1, r2)}")

    hr_t = h_rows.astype(jnp.float32).T  # (R1, n_s): rows on sublanes
    hc_t = h_cols.astype(jnp.float32).T  # (R2, n_s)

    def sl_idx(ri, k):
        return (n_s - 1 - k) if flip else k

    return pl.pallas_call(
        functools.partial(
            _composite_resample_kernel, absorption=absorption, flip=flip,
            n_s=n_s, tr=tr, r2=r2, a_dim=a_dim, b_dim=b_dim,
            zero_outside=zero_outside, a_log=a_log, b_log=b_log),
        interpret=(jax.default_backend() == "cpu"),
        out_shape=jax.ShapeDtypeStruct((4, r1, r2), jnp.float32),
        grid=(r1 // tr, n_s),
        in_specs=[
            pl.BlockSpec((4, 1, a_dim, b_dim),
                         lambda ri, k: (0, sl_idx(ri, k), 0, 0)),
            pl.BlockSpec((tr, n_s), lambda ri, k: (ri, 0)),
            pl.BlockSpec((r2, n_s), lambda ri, k: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tr, r2), lambda ri, k: (ri, 0)),
        ],
        out_specs=pl.BlockSpec((4, tr, r2), lambda ri, k: (0, ri, 0)),
        scratch_shapes=[
            pltpu.VMEM((tr, r2), jnp.float32),
            pltpu.VMEM((3, tr, r2), jnp.float32),
            pltpu.VMEM((tr, r2), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(volf.astype(jnp.bfloat16), hr_t, hc_t,
      valid.astype(jnp.float32), n_steps)


def composite_pallas(dens: jax.Array, prod: jax.Array, n_steps: jax.Array,
                     absorption: float, flip: bool) -> jax.Array:
    """dens (n_s, R1, R2) premasked density; prod (3, n_s, R1, R2)
    premultiplied rgb*light; n_steps (R1, R2) f32.  Returns (4, R1, R2) f32:
    channel 0 = accumulated alpha, 1:4 = accumulated rgb (pre 1/2pi).

    flip=False marches slices in ascending order (toward a + face),
    flip=True descending (- face).
    """
    n_s, r1, r2 = dens.shape
    bs = _pick_bs(n_s)
    tile = _pick_tile(r1, r2, bs)
    if tile is None:
        raise ValueError(f"untileable composite shape {dens.shape}")
    tr, tc = tile
    n_blocks = n_s // bs

    def sl_idx(ri, ci, k):
        return (n_blocks - 1 - k) if flip else k

    grid = (r1 // tr, r2 // tc, n_blocks)
    return pl.pallas_call(
        functools.partial(_composite_kernel, bs=bs, absorption=absorption,
                          flip=flip, n_blocks=n_blocks),
        interpret=(jax.default_backend() == "cpu"),
        out_shape=jax.ShapeDtypeStruct((4, r1, r2), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bs, tr, tc),
                         lambda ri, ci, k: (sl_idx(ri, ci, k), ri, ci)),
            pl.BlockSpec((3, bs, tr, tc),
                         lambda ri, ci, k: (0, sl_idx(ri, ci, k), ri, ci)),
            pl.BlockSpec((tr, tc), lambda ri, ci, k: (ri, ci)),
        ],
        out_specs=pl.BlockSpec((4, tr, tc), lambda ri, ci, k: (0, ri, ci)),
        scratch_shapes=[
            pltpu.VMEM((tr, tc), jnp.float32),
            pltpu.VMEM((3, tr, tc), jnp.float32),
            pltpu.VMEM((tr, tc), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
    )(dens, prod, n_steps)
