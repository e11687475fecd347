"""Pallas TPU kernels for the dense-shift semi-Lagrangian backtrace.

The XLA form (sim/advect_fast.py) emits ~26 separate pad+multiply kernels per
axis pass, re-reading the 7-channel volume each time (~18 ms at 128^3).
These kernels keep the block in VMEM and evaluate all taps as vector rolls:

- x/y passes fuse into one kernel (both axes live entirely inside a
  (7, slab, Y, X) block; lane rolls for x, sublane rolls for y),
- the z pass transposes z onto the lane axis (XLA tiled transpose) and runs
  the same lane resample -- the whole axis fits in-block, so no halos.

Boundary addressing is CLAMP (Mosaic has no reverse primitive for the mirror
the reference sampler uses); see _resample_axis for why the difference is
negligible here.  The XLA twin keeps exact mirror semantics.

Per-pass displacement semantics match sim/advect_fast.py exactly: pass x uses
u_x at the output voxel, pass y the x-advected u_y, pass z the xy-advected
u_z (path-following splitting).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_DISP = 12  # voxels; keep in sync with sim/advect_fast.MAX_DISP


def _resample_axis(q: jax.Array, d: jax.Array, axis: int) -> jax.Array:
    """Variable-shift linear resample along `axis` of a VMEM-resident array.

    q: block; d: per-element displacement broadcastable to q's shape with
    the channel dim removed (already clipped to [-MAX_DISP, MAX_DISP]).
    out[i] = lerp(q[clamp(i + floor(d))], q[clamp(i + floor(d) + 1)]).

    Boundary addressing is CLAMP (edge broadcast); the reference sampler is
    MIRROR, but Mosaic has no lane-reverse primitive and the two only differ
    for backtraces that leave the volume -- which the projection's boundary
    damping (CSProject3D.hlsl:104-108) keeps rare and shallow.  The XLA twin
    (sim/advect_fast._advect_1d) keeps exact mirror semantics.
    """
    n = q.shape[axis]
    ids = jax.lax.broadcasted_iota(
        jnp.int32, d.shape, axis if q.ndim == d.ndim else axis - 1
    )
    lo_edge = jax.lax.slice_in_dim(q, 0, 1, axis=axis)
    hi_edge = jax.lax.slice_in_dim(q, n - 1, n, axis=axis)

    def bc(m):
        return m[None] if q.ndim == d.ndim + 1 else m

    out = jnp.zeros_like(q)
    for a in range(-MAX_DISP, MAX_DISP + 2):
        w = jnp.maximum(1.0 - jnp.abs(d - a), 0.0)
        rolled = pltpu.roll(q, (n - a) % n, axis)
        val = jnp.where(bc(ids + a < 0), lo_edge, rolled)
        val = jnp.where(bc(ids + a >= n), hi_edge, val)
        out = out + val * bc(w)
    return out


def _advect_xy_kernel(vol_ref, dx_scale_ref, out_ref):
    """Fused x- then y-pass over a (7, slab, Y, X) block.

    dx_scale_ref: (1, 1) SMEM scalars? -- displacement scale factors are
    baked per call instead; vol channels: 0..2 velocity, 3..6 color.
    """
    sx = dx_scale_ref[0, 0]
    sy = dx_scale_ref[0, 1]
    vol = vol_ref[...]

    dx = jnp.clip(-vol[0] * sx, -MAX_DISP, MAX_DISP)
    vol = _resample_axis(vol, dx, axis=3)
    dy = jnp.clip(-vol[1] * sy, -MAX_DISP, MAX_DISP)
    vol = _resample_axis(vol, dy, axis=2)
    out_ref[...] = vol


def _advect_lane_kernel(vol_ref, scale_ref, out_ref, *, disp_channel: int):
    """Single lane-axis pass over a (7, slab, A, B) block.

    Displacement comes from `disp_channel` of the block itself; used for the
    z pass on a transposed volume (z on the lane axis)."""
    s = scale_ref[0, 0]
    vol = vol_ref[...]
    d = jnp.clip(-vol[disp_channel] * s, -MAX_DISP, MAX_DISP)
    out_ref[...] = _resample_axis(vol, d, axis=3)


def backtrace_pallas(both: jax.Array, dt, config) -> jax.Array:
    """Full 3-pass split backtrace of the (7, Z, Y, X) combined field."""
    z, y, x = config.zyx
    dtype = both.dtype
    interpret = jax.default_backend() == "cpu"

    slab = 8
    while slab > 1 and z % slab:
        slab //= 2
    if z % slab:
        # Odd z: no valid slab blocking; use the XLA path entirely.
        from fluidx12_tpu.sim.advect_fast import _backtrace_split

        return _backtrace_split(both, dt, config)

    # Fused x+y pass.
    scales_xy = jnp.asarray([[dt * x, dt * y]], jnp.float32)
    xy = pl.pallas_call(
        _advect_xy_kernel,
        out_shape=jax.ShapeDtypeStruct(both.shape, dtype),
        grid=(z // slab,),
        in_specs=[
            pl.BlockSpec((7, slab, y, x), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((7, slab, y, x), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(both, scales_xy)

    if not config.is_3d:
        return xy

    # Z pass: put z on the lane axis via an XLA transpose (cheap, tiled) so
    # the whole axis lives in-block -- no halos, no windows.
    zt = jnp.transpose(xy, (0, 3, 2, 1))  # (7, X, Y, Z)
    slab_x = 8
    while slab_x > 1 and x % slab_x:
        slab_x //= 2
    scale_z = jnp.asarray([[dt * z]], jnp.float32)
    out_t = pl.pallas_call(
        functools.partial(_advect_lane_kernel, disp_channel=2),
        out_shape=jax.ShapeDtypeStruct(zt.shape, dtype),
        grid=(x // slab_x,),
        in_specs=[
            pl.BlockSpec((7, slab_x, y, z), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((7, slab_x, y, z), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(zt, scale_z)
    return jnp.transpose(out_t, (0, 3, 2, 1))
