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
