"""Pressure projection: divergence -> Jacobi relaxation -> gradient subtraction.

TPU-native re-expression of CSProject2D/3D.hlsl + CSPoisson.hlsli.  The
reference runs 64 *chaotic* (racy, tolerance-early-out) Jacobi sweeps inside a
single dispatch over a `globallycoherent` UAV; here that becomes a
deterministic `lax.fori_loop` of synchronous sweeps over a dense stencil
(SURVEY.md section 2.5 maps the race away by design).  The pressure field is
persistent across frames, giving the same warm-start behavior as the
reference's `m_incompress` texture (Fluid.cpp:218-221).

All neighbor fetches are edge-clamped shifts (`max(i,1)-1` / `min(i+1,N-1)`,
CSProject3D.hlsl:77-88), which XLA lowers to fused pad/slice ops -- no gather.

The Jacobi update is x = (sum(neighbors) - b) / N with N = 6 (3D) or 4 (2D);
the velocity correction is u -= 0.5 * grad(q) / rho with rho = 0.48 (3D,
CSProject3D.hlsl:26) or 1.0 (2D, CSProject2D.hlsl:24).  Outward velocities in
a 3%-thick boundary band are damped/reflected (CSProject3D.hlsl:104-108).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from fluidx12_tpu.core.config import FluidConfig
from fluidx12_tpu.ops.sampling import neighbor_shift

# Spatial axes of a (Z, Y, X) volume.
_AX_Z, _AX_Y, _AX_X = 0, 1, 2


def divergence(velocity: jax.Array, is_3d: bool) -> jax.Array:
    """Central-difference divergence with edge-clamped neighbors (..hlsl:40-53)."""
    ux, uy, uz = velocity[0], velocity[1], velocity[2]
    div = 0.5 * (
        (neighbor_shift(ux, _AX_X, +1) - neighbor_shift(ux, _AX_X, -1))
        + (neighbor_shift(uy, _AX_Y, +1) - neighbor_shift(uy, _AX_Y, -1))
    )
    if is_3d:
        div = div + 0.5 * (neighbor_shift(uz, _AX_Z, +1) - neighbor_shift(uz, _AX_Z, -1))
    return div


def jacobi_sweeps(pressure: jax.Array, div: jax.Array, iters: int, is_3d: bool) -> jax.Array:
    """`iters` synchronous Jacobi sweeps of laplace(q) = b (CSPoisson.hlsli:8-26)."""
    n = 6.0 if is_3d else 4.0

    def neighbor_sum(q):
        s = (
            neighbor_shift(q, _AX_X, +1)
            + neighbor_shift(q, _AX_X, -1)
            + neighbor_shift(q, _AX_Y, +1)
            + neighbor_shift(q, _AX_Y, -1)
        )
        if is_3d:
            s = s + neighbor_shift(q, _AX_Z, +1) + neighbor_shift(q, _AX_Z, -1)
        return s

    def body(q, _):
        return (neighbor_sum(q) - div) / n, None

    # lax.scan rather than fori_loop: identical trace (same rolled XLA while
    # loop, no per-iteration outputs) but reverse-mode differentiable, which
    # makes the whole faithful pipeline an adjoint solver -- jax.grad through
    # `simulate` works end-to-end (tests/test_adjoint.py), a capability the
    # DX12 reference cannot express.
    q, _ = jax.lax.scan(body, pressure, None, length=iters)
    return q


def subtract_gradient(velocity: jax.Array, pressure: jax.Array, rho: float, is_3d: bool) -> jax.Array:
    """u -= 0.5 * grad(q) / rho with edge-clamped central differences.

    Built as one stacked expression (not per-channel .at updates, which
    each copy the whole 3-channel volume: 3x ~800 MB of silent traffic at
    256^3 -- measured 5.6 -> ~1 ms)."""
    dtype = velocity.dtype
    gx = 0.5 * (neighbor_shift(pressure, _AX_X, +1) - neighbor_shift(pressure, _AX_X, -1)) / rho
    gy = 0.5 * (neighbor_shift(pressure, _AX_Y, +1) - neighbor_shift(pressure, _AX_Y, -1)) / rho
    comps = [velocity[0] - gx.astype(dtype), velocity[1] - gy.astype(dtype)]
    if is_3d:
        gz = 0.5 * (neighbor_shift(pressure, _AX_Z, +1) - neighbor_shift(pressure, _AX_Z, -1)) / rho
        comps.append(velocity[2] - gz.astype(dtype))
    else:
        comps.append(velocity[2])
    return jnp.stack(comps, axis=0)


def boundary_damp(velocity: jax.Array, config: FluidConfig) -> jax.Array:
    """Damp/reflect outward velocities near the walls (CSProject3D.hlsl:104-108).

    pos = voxel center mapped to [-1, 1]; for each component with u*pos > 0,
    u *= clamp((0.97 - |pos|)/0.03, -1, 1) -- a 3% soft band that reverses the
    outermost cells.  Applied per spatial axis (z is skipped in 2D).
    """
    z, y, x = config.zyx
    dtype = velocity.dtype

    def axis_scale(n, ax_len):
        p = ((jnp.arange(n, dtype=dtype) + 0.5) / n) * 2.0 - 1.0
        return p

    px = axis_scale(x, x).reshape(1, 1, x)
    py = axis_scale(y, y).reshape(1, y, 1)
    pz = axis_scale(z, z).reshape(z, 1, 1)

    def damp(u, p):
        scale = jnp.clip((0.97 - jnp.abs(p)) / 0.03, -1.0, 1.0)
        return jnp.where(u * p > 0.0, u * scale, u)

    # One stacked expression (see subtract_gradient for why not .at[]).
    comps = [damp(velocity[0], px), damp(velocity[1], py)]
    comps.append(damp(velocity[2], pz) if config.is_3d else velocity[2])
    return jnp.stack(comps, axis=0)


def project(
    fields: jax.Array,
    pressure: jax.Array,
    time_step: jax.Array,
    config: FluidConfig,
) -> Tuple[jax.Array, jax.Array]:
    """Full projection pass; identity when time_step == 0 (ref ..hlsl:97 guard).

    `fields` is the combined (C >= 3, Z, Y, X) state array whose channels
    0..2 are velocity; the Pallas path reads/writes the velocity channels
    in place (no slicing copies), the XLA twins slice and re-concatenate
    (CPU / unsupported shapes only).  Returns (fields', pressure')."""
    is_3d = config.is_3d
    rho = config.fluid_density_3d if is_3d else config.fluid_density_2d

    if is_3d and tuple(fields.shape[-3:]) != tuple(config.zyx):
        # Padded storage layout (core/padding.py): the logically-masked
        # stencil twin reproduces the compact clamp semantics exactly on
        # roll-clean padded shapes (sim/padded.py).
        from fluidx12_tpu.sim.padded import project_padded

        return project_padded(fields, pressure, time_step, config)

    tuning = None
    use_stencil = False
    use_mg = False
    use_j2d = False
    if config.use_pallas and config.pallas_jacobi and not is_3d:
        from fluidx12_tpu.ops.pallas.jacobi import jacobi2d_pallas_supported

        use_j2d = (jax.default_backend() == "tpu"
                   and jacobi2d_pallas_supported(config.zyx[1:]))
    if config.use_pallas and config.pallas_jacobi and is_3d:
        from fluidx12_tpu.ops.pallas.jacobi import jacobi_tuning
        from fluidx12_tpu.ops.pallas.stencil import stencil_pallas_supported

        if jax.default_backend() == "tpu":  # CPU runs the XLA twins
            tuning = jacobi_tuning(config.zyx, config.num_pressure_iters)
            # Streaming div / grad+damp kernels: XLA materializes each
            # edge-clamped shift (16+ ms of relayout at 256^3); the kernels
            # do one pass through VMEM (ops/pallas/stencil.py).
            use_stencil = stencil_pallas_supported(config.zyx)
    use_mg_fused = False
    if config.fast_sim and config.mg_pressure and is_3d:
        from fluidx12_tpu.sim.mg import mg_supported

        z, y, x = config.zyx
        # Multigrid fast solver on flagship-and-larger planes (better
        # residual AND ~4x less fine-level work than the 64-sweep schedule,
        # core/config.py mg_min_plane); smaller grids keep the
        # reference-faithful fixed-iteration relaxation.
        use_mg = y * x >= config.mg_min_plane and mg_supported(config.zyx)
        if use_mg and use_stencil and config.mg_project_fused:
            from fluidx12_tpu.sim.mg import mg_fused_supported

            # Fully fused projection (opt-in, config.mg_project_fused):
            # bit-identical to the unfused chain but A/B-measured slower
            # at 256^3 -- the fusion buffers shrink the smoother windows
            # (see core/config.py for the numbers).
            use_mg_fused = mg_fused_supported(
                config.zyx, vel_bytes=fields.dtype.itemsize)

    def run(args):
        flds, q = args
        if use_mg_fused:
            from fluidx12_tpu.sim.mg import mg_project_fused

            return mg_project_fused(flds, q, rho)
        if use_stencil:
            from fluidx12_tpu.ops.pallas.stencil import (
                divergence_pallas,
                grad_damp_pallas,
            )

            # Kernels stream the storage dtype and compute in f32; they
            # read the velocity channels of the combined array directly.
            b = divergence_pallas(flds)
        else:
            # The XLA twin indexes [0]/[1]/[2], so the combined array works.
            b = divergence(flds, is_3d).astype(jnp.float32)
        if use_j2d:
            from fluidx12_tpu.ops.pallas.jacobi import jacobi2d_pallas

            # (1, Y, X) plane: the whole relaxation runs in VMEM.
            q = jacobi2d_pallas(q[0], b[0],
                                config.num_pressure_iters)[None]
        elif use_mg:
            from fluidx12_tpu.sim.mg import mg_solve

            q = mg_solve(q, b, use_pallas=config.use_pallas and config.pallas_jacobi)
        elif tuning is not None:
            from fluidx12_tpu.ops.pallas.jacobi import jacobi_pallas

            q = jacobi_pallas(q, b, config.num_pressure_iters, *tuning)
        else:
            q = jacobi_sweeps(q, b, config.num_pressure_iters, is_3d)
        if use_stencil:
            flds = grad_damp_pallas(flds, q, rho)
        else:
            vel = subtract_gradient(flds, q, rho, is_3d)
            vel = boundary_damp(vel, config).astype(flds.dtype)
            flds = (jnp.concatenate([vel, flds[3:]], axis=0)
                    if flds.shape[0] > 3 else vel)
        return flds, q

    def skip(args):
        return args

    return jax.lax.cond(time_step > 0.0, run, skip, (fields, pressure))
