"""Pallas TPU kernel for the directional light sweep's shear scan.

The fast light map (render/lightmap_sweep.py::_sweep_pooled; ref
CSRayMarchL's per-voxel light march, RayMarch.hlsli:214-241) factors the
per-voxel optical depth into shear -> exclusive-cumsum -> unshear.  The XLA
form materializes the (m, 2n_a, 2n_b) sheared frame in HBM (4x the pooled
volume), builds dense (m, W, n) resample-weight tensors for the shear and
unshear matmuls, and pays the cumsum's extra round trips.

This kernel streams the pooled slices once, light-to-far, carrying the
running SHEARED optical-depth plane (W_a, W_b) in VMEM scratch:

    step k:  out[k]  = unshear_k(carry)          # exclusive: before add
             carry  += shear_k(log_att[k])

Both shear_k and unshear_k are fractional lateral translations by
shift = pad + k * slope, expressed as two cyclic rolls + a lerp per axis
(pltpu.roll with a traced shift; the zero-padded W = 2n frame makes the
rolls wrap-free because shift stays in [0, n] -- the same sign-dependent
pad as the XLA form).  Out-of-range lateral samples carry zero optical
depth in both forms (rays exit the volume unattenuated).

HBM traffic: one f32 read of (m, n_a, n_b) + one f32 write -- the sheared
frame and the weight tensors never exist.  The f32 carry also beats the
XLA chain's storage-dtype cumsum on accumulation precision.  Exactness vs
the einsum form is 2-tap-identical (same weights, same zero boundaries);
only summation order/precision differs.  Cross-checked in
tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sweep_scan_supported(n_s: int, n_a: int, n_b: int) -> bool:
    """Lateral dims must be Mosaic-roll clean (the kernel rolls sublanes
    and lanes of the (2n_a, 2n_b) carry); tiny sweeps keep the XLA form."""
    return n_a % 8 == 0 and n_b % 128 == 0 and n_a >= 8 and n_s >= 2


def _sweep_kernel(x_ref, s_ref, out_ref, carry_ref, *, n_a: int, n_b: int):
    w_a, w_b = 2 * n_a, 2 * n_b
    f32 = jnp.float32
    i = pl.program_id(0)  # hoisted: cannot be called inside pl.when

    @pl.when(i == 0)
    def _():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    # shift = pad + k * slope, clamped to the wrap-free [0, n] span the
    # W = 2n frame guarantees (the XLA weights are zero past it anyway).
    k = i.astype(f32)
    sha = jnp.clip(s_ref[2] + k * s_ref[0], 0.0, float(n_a))
    shb = jnp.clip(s_ref[3] + k * s_ref[1], 0.0, float(n_b))
    sa = jnp.floor(sha)
    fa = sha - sa
    sb = jnp.floor(shb)
    fb = shb - sb
    sai = sa.astype(jnp.int32)
    sbi = sb.astype(jnp.int32)

    # Exclusive output first: D[k, p] = carry[p + shift] (2-tap lerp per
    # axis; roll(y, W - s)[p] = y[p + s] cyclically, in-range by the pad).
    e = carry_ref[...]
    ea = ((1.0 - fa) * pltpu.roll(e, w_a - sai, 0)
          + fa * pltpu.roll(e, w_a - 1 - sai, 0))
    eb = ((1.0 - fb) * pltpu.roll(ea, w_b - sbi, 1)
          + fb * pltpu.roll(ea, w_b - 1 - sbi, 1))
    out_ref[0] = eb[:n_a, :n_b]

    # Accumulate this slice into the sheared frame:
    # G[w] = x[w - shift] = (1-f) * roll(x, s)[w] + f * roll(x, s+1)[w].
    xp = jnp.pad(x_ref[0].astype(f32), ((0, n_a), (0, n_b)))
    ga = ((1.0 - fa) * pltpu.roll(xp, sai, 0)
          + fa * pltpu.roll(xp, sai + 1, 0))
    gb = ((1.0 - fb) * pltpu.roll(ga, sbi, 1)
          + fb * pltpu.roll(ga, sbi + 1, 1))
    carry_ref[...] = e + gb


def shear_scan_pallas(log_att: jax.Array, slope_a, slope_b,
                      pad_a, pad_b) -> jax.Array:
    """Exclusive sheared optical-depth scan of (n_s, n_a, n_b) log_att
    (light-to-far slice order).  Returns (n_s, n_a, n_b) f32 log
    transmittance sums D[k, p] = sum_{j<k} log_att[j, p + (k-j)*slope].
    Slopes/pads are per pooled slice step, as _sweep_pooled computes them.
    """
    n_s, n_a, n_b = log_att.shape
    s = jnp.stack([jnp.asarray(slope_a, jnp.float32),
                   jnp.asarray(slope_b, jnp.float32),
                   jnp.asarray(pad_a, jnp.float32),
                   jnp.asarray(pad_b, jnp.float32)])
    return pl.pallas_call(
        functools.partial(_sweep_kernel, n_a=n_a, n_b=n_b),
        interpret=(jax.default_backend() == "cpu"),
        out_shape=jax.ShapeDtypeStruct((n_s, n_a, n_b), jnp.float32),
        grid=(n_s,),
        in_specs=[
            pl.BlockSpec((1, n_a, n_b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, n_a, n_b), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2 * n_a, 2 * n_b), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(log_att.astype(jnp.float32), s)
