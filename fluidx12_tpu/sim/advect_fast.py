"""TPU-native advection: dimensional-split semi-Lagrangian without gathers.

The faithful advect (sim/advect.py) backtraces with an 8-corner gather, which
XLA lowers to scattered dynamic-gathers (~120 ms at 128^3 on v5e).  The
TPU-native form uses two facts:

1. the semi-Lagrangian displacement is CFL-bounded (|u| * dt * N stays under
   a dozen voxels for the reference forcing), and
2. 1D linear interpolation at bounded displacement is a *dense* weighted sum
   of shifted copies: out = sum_a hat(dx - a) * shift(field, a), a in
   [-K, K+1] -- pure VPU multiply-adds that XLA fuses into one streaming
   pass.

A full trilinear backtrace is factored into three sequential 1D passes
(x, then y, then z; classic dimensional splitting).  This deviates from
direct trilinear interpolation by O(|u dt|^2 * second derivatives); the
cross-check against the faithful path lives in tests/test_fastpath.py.

Displacements beyond K voxels clamp to K (a velocity-limiter: sample count
and stability win over unbounded backtrace; the reference's mirror-sampler
behavior at extreme velocities is not physical anyway).  Edge addressing is
mirror ('symmetric' pad), matching the reference's LINEAR_MIRROR sampler.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from fluidx12_tpu.core.config import FluidConfig
from fluidx12_tpu.sim.advect import apply_impulse_forces

# Maximum per-axis backtrace displacement in voxels.
MAX_DISP = 12


def max_backtrace_disp(velocity: jax.Array, time_step: float,
                       config: FluidConfig) -> jax.Array:
    """Largest per-axis, per-substep backtrace displacement in voxels.

    The fast advect clamps displacements to MAX_DISP (the reference
    backtraces unclamped, CSAdvect.hlsl:50-54, but its forcing keeps the
    CFL well under a dozen voxels).  This is the cheap in-graph guard the
    frame loop's watchdog polls so a user config with stronger forces/dt
    cannot silently diverge from the faithful twin: approaching the clamp
    raises a loud warning instead (tests/test_engine.py).
    """
    from fluidx12_tpu.core.padding import crop_to_logical

    z, y, x = config.zyx
    n_sub = max(int(config.advect_substeps), 1)
    dt_sub = jnp.asarray(time_step, jnp.float32) / n_sub
    # Padded layouts carry bounded ghost garbage beyond the logical extent;
    # the guard only reads the logical interior.
    vel = jnp.abs(crop_to_logical(velocity, config).astype(jnp.float32))
    disp = jnp.maximum(jnp.max(vel[0]) * x, jnp.max(vel[1]) * y)
    if config.is_3d:
        disp = jnp.maximum(disp, jnp.max(vel[2]) * z)
    return disp * dt_sub


def _shift_axis(field: jax.Array, axis: int, offset: int) -> jax.Array:
    """field shifted so out[i] = field[i + offset], mirror-padded at edges."""
    if offset == 0:
        return field
    n = field.shape[axis]
    pad = [(0, 0)] * field.ndim
    idx = [slice(None)] * field.ndim
    if offset > 0:
        pad[axis] = (0, offset)
        idx[axis] = slice(offset, offset + n)
    else:
        pad[axis] = (-offset, 0)
        idx[axis] = slice(0, n)
    return jnp.pad(field, pad, mode="symmetric")[tuple(idx)]


def _advect_1d(field: jax.Array, disp: jax.Array, axis: int) -> jax.Array:
    """Resample `field` (C, Z, Y, X) along `axis` (array axis) at i + disp.

    disp: (Z, Y, X) displacement in voxels (positive = sample from larger
    index), clamped to [-MAX_DISP, MAX_DISP].
    """
    d = jnp.clip(disp, -float(MAX_DISP), float(MAX_DISP))
    out = jnp.zeros_like(field)
    for a in range(-MAX_DISP, MAX_DISP + 2):
        w = jnp.maximum(1.0 - jnp.abs(d - a), 0.0)
        out = out + _shift_axis(field, axis, a) * w[None]
    return out


def _advect_1d_clamped(field: jax.Array, disp: jax.Array, axis: int,
                       n_log: int) -> jax.Array:
    """Clamp-addressed dense resample against the LOGICAL extent `n_log` of
    a (possibly padded) axis -- the XLA twin of the Pallas kernels' clamp
    semantics (ops/pallas/advect._clamp_disp_inbounds): the displacement is
    clamped in-bounds per cell, making out-of-logical taps exactly
    zero-weight, so ghost values beyond n_log are never sampled (circular
    jnp.roll wraps carry zero weight; ghosts only need to stay finite).
    Ghost cells themselves (i >= n_log) self-copy (d = 0), matching the
    Pallas kernels' ghost_zero clamp (ops/pallas/advect.py)."""
    ids = jax.lax.broadcasted_iota(jnp.float32, disp.shape, axis - 1)
    d = jnp.clip(disp, -float(MAX_DISP), float(MAX_DISP))
    d = jnp.where(ids > n_log - 1.0, 0.0,
                  jnp.clip(d, -ids, (n_log - 1.0) - ids))
    out = jnp.zeros_like(field)
    for a in range(-MAX_DISP, MAX_DISP + 2):
        w = jnp.maximum(1.0 - jnp.abs(d - a), 0.0)
        out = out + jnp.roll(field, -a, axis) * w[None]
    return out


def _backtrace_split_clamped(both: jax.Array, dt: jax.Array,
                             config: FluidConfig) -> jax.Array:
    """Dimensional-split backtrace on the PADDED storage layout: the
    padded-exact XLA twin of the Pallas path (clamp edge addressing against
    the logical extents; compact grids keep the mirror twin below)."""
    z, y, x = config.zyx
    dx = -both[0] * dt * x
    sampled = _advect_1d_clamped(both, dx, axis=3, n_log=x)
    dy = -sampled[1] * dt * y
    sampled = _advect_1d_clamped(sampled, dy, axis=2, n_log=y)
    dz = -sampled[2] * dt * z
    return _advect_1d_clamped(sampled, dz, axis=1, n_log=z)


def _backtrace_split(both: jax.Array, dt: jax.Array, config: FluidConfig) -> jax.Array:
    """One dimensional-split backtrace of the combined (7, Z, Y, X) field.

    Each pass uses the velocity component advected by the previous passes,
    so the staircase follows the backtrace path instead of the endpoint's
    axis components (reduces splitting error at large CFL).
    """
    z, y, x = config.zyx
    dx = -both[0] * dt * x
    sampled = _advect_1d(both, dx, axis=3)
    dy = -sampled[1] * dt * y
    sampled = _advect_1d(sampled, dy, axis=2)
    if config.is_3d:
        dz = -sampled[2] * dt * z
        sampled = _advect_1d(sampled, dz, axis=1)
    return sampled


def advect_fields_fast(
    fields: jax.Array,
    time_step: jax.Array,
    config: FluidConfig,
) -> jax.Array:
    """Dense-shift advection of the COMBINED (7, Z, Y, X) state array.

    The backtrace runs in `advect_substeps` sub-steps of dt/n: splitting
    error scales with the square of the per-step displacement, so two
    half-steps roughly halve the deviation from direct trilinear sampling at
    the reference's ~12-voxel CFL.  Operating on the combined array keeps
    the whole chain concat/split-free (sim/step.py).
    """
    n_sub = max(int(config.advect_substeps), 1)
    dt_full = jnp.asarray(time_step, jnp.float32)

    use_kernel = (
        config.use_pallas
        and config.pallas_advect
        and jax.default_backend() == "tpu"
    )
    padded = tuple(fields.shape[-3:]) != tuple(config.zyx)
    both = fields
    if not use_kernel:
        # The XLA twin computes in f32 regardless of storage dtype.
        both = both.astype(jnp.float32)
    # The Pallas kernels stream blocks in the storage dtype (half state =
    # half the pass DMA) and do all tap arithmetic in f32 in VMEM.
    inkernel_forces = False
    if use_kernel:
        from fluidx12_tpu.ops.pallas.advect import (
            backtrace_pallas,
            zpass_forces_supported,
        )

        # The impulse/forces/dissipation pass fuses into the final z-pass
        # output write when the kernel tiles this grid -- one fewer full
        # 7-channel HBM round trip per step.
        inkernel_forces = zpass_forces_supported(config)
    for i in range(n_sub):
        if use_kernel:
            last = i == n_sub - 1
            both = backtrace_pallas(
                both, dt_full / n_sub, config,
                forces_dt=dt_full if (last and inkernel_forces) else None)
        elif padded:
            both = _backtrace_split_clamped(both, dt_full / n_sub, config)
        else:
            both = _backtrace_split(both, dt_full / n_sub, config)
    if inkernel_forces:
        return both
    # Forces stream in the storage dtype (f32 register math inside); the
    # result keeps the storage dtype, so the state write needs no extra cast.
    vel, col = apply_impulse_forces(both[:3], both[3:], dt_full, config)
    return jnp.concatenate([vel, col], axis=0)


def advect_fast(
    velocity: jax.Array,
    color: jax.Array,
    time_step: jax.Array,
    config: FluidConfig,
) -> Tuple[jax.Array, jax.Array]:
    """Dense-shift advection; same contract as sim/advect.advect (the
    separate-array convenience wrapper over advect_fields_fast, used by the
    dual-stack cross-checks)."""
    both = advect_fields_fast(
        jnp.concatenate([velocity, color], axis=0), time_step, config)
    return both[:3], both[3:]
