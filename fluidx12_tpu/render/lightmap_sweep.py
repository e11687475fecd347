"""TPU-native light map: sheared slice sweep instead of per-voxel shadow rays.

The reference's CSRayMarchL casts an independent 64-sample shadow ray per
voxel (O(N^3 * S) gathers).  For a *directional* light the rays are parallel,
so accumulated optical depth along them is -- in a frame sheared by the
light's lateral slope -- an exclusive cumulative sum over slices:

    log T = unshear( cumsum_excl( shear( log att ) ) )

Shear and unshear are per-slice 1D translations, i.e. batched MXU matmuls;
the whole shadow volume is O(N^3) dense work with no gathers and no
sequential scan (the fully-parallel form of the classic half-angle slice
sweep).

Attenuation is normalized to the reference's nominal sample step
(2*sqrt(3)/numLightSamples, RayMarch.hlsli:30-31) via
(1 - d*ABSORPTION)^(step_len/ref_step), so brightness matches the faithful
per-sample marcher; tests/test_fastpath.py quantifies the agreement.

With a light probe, the GI ambient term uses the same machinery: ambient
occlusion is approximated by interpolating six axis-aligned sweeps by the
density-gradient direction (the faithful path's per-voxel AO ray is
unvectorizable; the 6-sweep basis is the standard dense approximation).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from fluidx12_tpu.core.config import FluidConfig
from fluidx12_tpu.core.state import SceneParams
from fluidx12_tpu.ops.transform import transform_vector
from fluidx12_tpu.render.raymarch_core import MAX_DIST


def _resample_weights(coords: jax.Array, n_src: int) -> jax.Array:
    """Linear-interp weights (..., n_out, n_src) for source coords (..., n_out).

    Out-of-range coordinates get all-zero weights -- with *log*-attenuation
    as the payload, zero weight means "no optical depth", the correct
    boundary for rays that leave the volume laterally.
    """
    dtype = coords.dtype
    i0 = jnp.floor(coords)
    frac = coords - i0
    i0i = i0.astype(jnp.int32)
    src = jnp.arange(n_src)
    in0 = (i0i >= 0) & (i0i < n_src)
    in1 = (i0i + 1 >= 0) & (i0i + 1 < n_src)
    m0 = (src == jnp.clip(i0i, 0, n_src - 1)[..., None]).astype(dtype)
    m1 = (src == jnp.clip(i0i + 1, 0, n_src - 1)[..., None]).astype(dtype)
    return m0 * ((1.0 - frac) * in0)[..., None] + m1 * (frac * in1)[..., None]


def directional_transmittance(
    density: jax.Array,       # (Z, Y, X)
    light_dir: jax.Array,     # (3,) unit, local space (x, y, z components)
    major_axis: int,          # static: 0 (x), 1 (y) or 2 (z)
    ref_step: jax.Array,      # reference nominal step (for normalization)
    absorption: float,
    flip: Optional[bool] = None,  # static sign of light_dir[major_axis], if known
    max_slices: int = 128,        # sweep slice budget (callers may lower it)
) -> jax.Array:
    """Per-voxel transmittance toward the light; returns (Z, Y, X).

    Fully parallel shear factorization: the accumulated optical depth along
    parallel rays is, in a frame sheared by the light's lateral slope, an
    exclusive cumulative sum over slices:

        log T = unshear( cumsum_excl( shear( log att ) ) )

    Both shear and unshear are per-slice 1D translations = batched MXU
    matmuls; no sequential scan.  Lateral samples outside the volume carry
    zero optical depth (rays exit unattenuated).
    """
    dtype = density.dtype
    z, y, x = density.shape
    sizes = (x, y, z)
    arr_axis = {0: 2, 1: 1, 2: 0}[major_axis]
    n_m = sizes[major_axis]
    rem = [a for a in (0, 1, 2) if a != arr_axis]
    arr_to_local = {0: 2, 1: 1, 2: 0}
    rem_local = [arr_to_local[a] for a in rem]

    l_m = light_dir[major_axis]
    sign_pos = l_m > 0

    # Cap sweep slices at 2x the light-sample budget (the reference uses at
    # most max_light_samples = 64 shadow samples per ray; the sweep's native
    # resolution would exceed that spec on large grids for no visual gain).
    # The slice-major relayout + box pooling is one matmul contracting the
    # major axis (cf. slicecomp._axis_volume: no full-volume transpose),
    # with the light-to-far ordering folded into the pooling matrix when the
    # major-axis sign is known at trace time (`flip`).
    stride = max(-(-n_m // max_slices), 1)
    n_s = n_m // stride
    pool = jnp.zeros((n_m, n_s), dtype).at[
        jnp.arange(n_s * stride), jnp.repeat(jnp.arange(n_s), stride)
    ].set(1.0 / stride)
    if flip is not None and flip:
        pool = pool[:, ::-1]  # slice 0 = nearest the light (+ side)
    from fluidx12_tpu.render.slicecomp import _mxu16

    mx = _mxu16()
    eq = {0: "zyx,xm->mzy", 1: "zyx,ym->mzx", 2: "zyx,zm->myx"}[major_axis]
    dens_o = jnp.einsum(eq, density.astype(mx), pool.astype(mx),
                        preferred_element_type=jnp.float32).astype(dtype)
    if flip is None:
        dens_o = jnp.where(sign_pos, dens_o[::-1], dens_o)
    n_m_sw = n_s

    n_a = dens_o.shape[1]
    n_b = dens_o.shape[2]
    step_m_local = 2.0 * stride / n_m
    abs_lm = jnp.maximum(jnp.abs(l_m), 0.35)  # major axis => >= 1/sqrt(3)
    # Lateral slope per slice step, in voxels of each remaining dim.  The
    # ray from slice k toward the light crosses slice j (< k) at lateral
    # offset (k - j) * slope.
    slope_a = light_dir[rem_local[0]] / l_m * step_m_local * (sizes[rem_local[0]] / 2.0)
    slope_b = light_dir[rem_local[1]] / l_m * step_m_local * (sizes[rem_local[1]] / 2.0)
    step_len = step_m_local / abs_lm

    n_steps = step_len / ref_step
    att = jnp.clip(1.0 - dens_o * absorption, 1e-6, 1.0)
    log_att = jnp.log(att) * n_steps

    # Derivation.  Voxel at slice k, lateral p needs
    #     D[k, p] = sum_{j<k} logA[j, p + (k - j) * slope].
    # In the sheared coordinate w = p + k*slope + pad this becomes
    #     D[k, p] = sum_{j<k} G[j, w],  G[j, w] = logA[j, w - pad - j*slope]
    # i.e. shear -> exclusive cumsum over slices -> unshear.  |slope| <=
    # n_lat/n_m (major axis), so k*slope spans at most n_lat: W = 2*n_lat
    # suffices with a sign-dependent pad.
    W_a = 2 * n_a
    W_b = 2 * n_b
    pad_a = jnp.where(slope_a < 0, jnp.asarray(n_a, dtype), 0.0)
    pad_b = jnp.where(slope_b < 0, jnp.asarray(n_b, dtype), 0.0)

    k = jnp.arange(n_m_sw, dtype=dtype)

    wa = jnp.arange(W_a, dtype=dtype)
    wb = jnp.arange(W_b, dtype=dtype)
    # Shear weights: G[j, w] = logA[j, w - pad - j*slope].
    sc_a = wa[None, :] - pad_a - k[:, None] * slope_a        # (n_m, W_a)
    sc_b = wb[None, :] - pad_b - k[:, None] * slope_b
    sw_a = _resample_weights(sc_a, n_a)                      # (n_m, W_a, n_a)
    sw_b = _resample_weights(sc_b, n_b)
    sheared = jnp.einsum("kwa,kab->kwb", sw_a, log_att)
    sheared = jnp.einsum("kvb,kwb->kwv", sw_b, sheared)  # (n_m, W_a, W_b)

    excl = jnp.cumsum(sheared, axis=0) - sheared  # exclusive: own slice out
    # (CastLightRay's first sample is one step beyond the voxel,
    # RayMarch.hlsli:227-229.)

    # Unshear: D[k, p] = E[k, p + pad + k*slope].
    pa = jnp.arange(n_a, dtype=dtype)
    pb = jnp.arange(n_b, dtype=dtype)
    uc_a = pa[None, :] + pad_a + k[:, None] * slope_a        # (n_m, n_a)
    uc_b = pb[None, :] + pad_b + k[:, None] * slope_b
    uw_a = _resample_weights(uc_a, W_a)                      # (n_m, n_a, W_a)
    uw_b = _resample_weights(uc_b, W_b)
    out = jnp.einsum("kaw,kwv->kav", uw_a, excl)
    log_t = jnp.einsum("kbv,kav->kab", uw_b, out)

    transm = jnp.exp(jnp.minimum(log_t, 0.0))
    if flip is not None:
        # Upsample (piecewise-constant within a pooled group -- the shadow
        # is an integral quantity; banding is sub-visual at these strides),
        # unflip, and relayout back to (Z, Y, X) in ONE matmul, the
        # transpose of the pooling above.
        up = jnp.zeros((n_s, n_m), dtype).at[
            jnp.repeat(jnp.arange(n_s), stride), jnp.arange(n_s * stride)
        ].set(1.0)
        if n_s * stride < n_m:  # tail voxels extend the last group
            up = up.at[n_s - 1, n_s * stride:].set(1.0)
        if flip:
            up = up[::-1]
        eq_up = {0: "mzy,mx->zyx", 1: "mzx,my->zyx", 2: "myx,mz->zyx"}[major_axis]
        return jnp.einsum(eq_up, transm.astype(mx), up.astype(mx),
                          preferred_element_type=jnp.float32).astype(dtype)
    if stride > 1:
        transm = jnp.repeat(transm, stride, axis=0)
        if transm.shape[0] < n_m:
            pad = n_m - transm.shape[0]
            transm = jnp.concatenate([transm, jnp.repeat(transm[-1:], pad, axis=0)], axis=0)
    transm = jnp.where(sign_pos, transm[::-1], transm)
    return jnp.moveaxis(transm, 0, arr_axis)


_AXIS_SWEEPS = [
    (0, +1), (0, -1), (1, +1), (1, -1), (2, +1), (2, -1),
]


def render_light_map_fast(
    grid: jax.Array,
    params: SceneParams,
    config: FluidConfig,
    sh_coeffs: Optional[jax.Array] = None,
    major_axis: Optional[int] = None,
) -> jax.Array:
    """Drop-in fast replacement for render_light_map (directional light)."""
    dtype = config.render_dtype
    density = grid[3].astype(dtype)

    local_light = transform_vector(params.light_pt, params.world_i)
    light_dir = (local_light / jnp.linalg.norm(local_light)).astype(dtype)
    flip = None
    if major_axis is None:
        # Host-static choice from the config's fixed light (world is a pure
        # scale, so the local direction equals the world direction); the
        # major-axis sign is then static too, letting the sweep fold the
        # light-to-far ordering into its pooling matmul.
        lp = np.asarray(config.light_pos, np.float32)
        major_axis = int(np.argmax(np.abs(lp)))
        flip = bool(lp[major_axis] > 0)

    ref_step = MAX_DIST / params.num_light_samples.astype(dtype)
    shadow = directional_transmittance(
        density, light_dir, major_axis, ref_step, config.absorption, flip=flip
    )

    env3 = (params.light_color[:3] * params.light_color[3])[:, None, None, None]
    dense = density >= config.zero_threshold
    shadow = jnp.where(dense, shadow, 1.0)

    if config.has_light_probe and sh_coeffs is not None:
        # Fully-fused GI kernel when available: gradient -> radial fallback
        # -> rotate -> normalize -> SH irradiance -> mask -> light combine
        # in ONE streaming pass (ops/pallas/stencil.gi_light_pallas); the
        # XLA chain below is its cross-checked twin (tests/test_pallas.py).
        from fluidx12_tpu.ops.pallas.stencil import (
            gi_light_pallas,
            stencil_pallas_supported,
        )

        half_ok = _ao_half_res(density.shape)
        if (config.use_pallas and jax.default_backend() == "tpu"
                and stencil_pallas_supported(density.shape) and half_ok):
            # Half-res AO engages under half_ok, so the full-res gradient is
            # only needed inside the kernel.
            ao = _ambient_occlusion(density, None, None, None, ref_step, config)
            return gi_light_pallas(
                density, shadow, ao, sh_coeffs, params.world[:3, :3],
                params.light_color[:3] * params.light_color[3],
                config.zero_threshold).astype(dtype)

        # Gradient-direction irradiance + 6-sweep AO approximation, all
        # channel-LEADING: a volume-sized (..., 3) array pads its trailing
        # dim to a full (8, 128) tile on TPU, which made this branch ~2x the
        # whole non-GI frame at 256^3 before the relayout was removed.
        gz, gy, gx = _gradient(density, config.use_pallas)
        nx_, ny_, nz_ = -gx, -gy, -gz
        norm2 = nx_ * nx_ + ny_ * ny_ + nz_ * nz_
        degenerate = norm2 < 1e-16
        # fall back to radial direction like the reference (RayMarch.hlsli:279)
        z_n, y_n, x_n = density.shape
        px = ((jnp.arange(x_n, dtype=dtype) + 0.5) / x_n * 2.0 - 1.0).reshape(1, 1, x_n)
        py = ((jnp.arange(y_n, dtype=dtype) + 0.5) / y_n * 2.0 - 1.0).reshape(1, y_n, 1)
        pz = ((jnp.arange(z_n, dtype=dtype) + 0.5) / z_n * 2.0 - 1.0).reshape(z_n, 1, 1)
        nx_ = jnp.where(degenerate, px, nx_)
        ny_ = jnp.where(degenerate, py, ny_)
        nz_ = jnp.where(degenerate, pz, nz_)

        # world rotation (row-vector convention: d_world = d @ W3x3).
        w3 = params.world[:3, :3]
        wx = nx_ * w3[0, 0] + ny_ * w3[1, 0] + nz_ * w3[2, 0]
        wy = nx_ * w3[0, 1] + ny_ * w3[1, 1] + nz_ * w3[2, 1]
        wz = nx_ * w3[0, 2] + ny_ * w3[1, 2] + nz_ * w3[2, 2]
        inv = 1.0 / jnp.sqrt(jnp.maximum(wx * wx + wy * wy + wz * wz, 1e-24))
        from fluidx12_tpu.gi.sh import evaluate_sh_irradiance_planar

        irradiance = evaluate_sh_irradiance_planar(
            sh_coeffs.astype(dtype), wx * inv, wy * inv, wz * inv)  # (3,Z,Y,X)

        ao = _ambient_occlusion(density, nx_, ny_, nz_, ref_step, config)
        ambient = jnp.where(dense[None], irradiance * ao[None], 0.0)
    else:
        ambient = (params.ambient[:3] * params.ambient[3])[:, None, None, None]

    light = env3 * shadow[None] + ambient  # (3, Z, Y, X), never (..., 3)
    return light.astype(dtype)


def _gradient(density, use_pallas: bool = True):
    """(gz, gy, gx) like jnp.gradient, via one streaming Pallas pass on TPU
    (ops/pallas/stencil.py); XLA's three materialized-shift passes on CPU /
    unaligned grids / use_pallas=False (the config master switch)."""
    from fluidx12_tpu.ops.pallas.stencil import (
        gradient3_pallas,
        stencil_pallas_supported,
    )

    if (use_pallas and jax.default_backend() == "tpu"
            and stencil_pallas_supported(density.shape)):
        g = gradient3_pallas(density.astype(jnp.float32)).astype(density.dtype)
        return g[2], g[1], g[0]
    return jnp.gradient(density)


def _ao_half_res(shape) -> bool:
    """True when the AO sweeps may run on a 2x box-downsampled field (the
    single predicate shared by the fused-GI gate and _ambient_occlusion --
    the fused path passes gradient sentinels that are only unused when this
    holds)."""
    return all(n % 2 == 0 and n >= 32 for n in shape)


def _ambient_occlusion(density, nx_, ny_, nz_, ref_step, config):
    """6-sweep AO blended by the (unnormalized) gradient direction.

    Runs at HALF resolution when the grid allows: occlusion is an integral,
    low-frequency quantity, and the six directional sweeps are the dominant
    GI cost (6x the shadow sweep).  A 2x box-down + trilinear-up cuts them
    ~8x; the blend weights also come from the half-res gradient.  Falls back
    to full resolution on odd/small grids.
    """
    dtype = density.dtype
    half = _ao_half_res(density.shape)
    if half:
        from fluidx12_tpu.sim.mg import _prolong, _restrict

        dens_s = _restrict(density.astype(jnp.float32)).astype(dtype)
        gz, gy, gx = _gradient(dens_s, config.use_pallas)
        cx, cy, cz = -gx, -gy, -gz
        # Degenerate-gradient radial fallback, exactly as at full res
        # (RayMarch.hlsli:279) -- without it, uniform-density cores would
        # get all-zero blend weights and ao = 0.
        degenerate = cx * cx + cy * cy + cz * cz < 1e-16
        z_h, y_h, x_h = dens_s.shape
        px = ((jnp.arange(x_h, dtype=dtype) + 0.5) / x_h * 2.0 - 1.0).reshape(1, 1, x_h)
        py = ((jnp.arange(y_h, dtype=dtype) + 0.5) / y_h * 2.0 - 1.0).reshape(1, y_h, 1)
        pz = ((jnp.arange(z_h, dtype=dtype) + 0.5) / z_h * 2.0 - 1.0).reshape(z_h, 1, 1)
        cx = jnp.where(degenerate, px, cx)
        cy = jnp.where(degenerate, py, cy)
        cz = jnp.where(degenerate, pz, cz)
    else:
        dens_s = density
        cx, cy, cz = nx_, ny_, nz_

    sweeps = []
    for ax, sgn in _AXIS_SWEEPS:
        d6 = jnp.zeros(3, dtype).at[ax].set(float(sgn))
        # Occlusion is an integral, low-frequency quantity: a 64-slice
        # budget (on the already half-res field) halves the six sweeps'
        # cost for no visible change.
        sweeps.append(directional_transmittance(
            dens_s, d6, ax, ref_step, config.absorption, flip=sgn > 0,
            max_slices=64))
    comp = [jnp.maximum(cx, 0.0), jnp.maximum(-cx, 0.0),
            jnp.maximum(cy, 0.0), jnp.maximum(-cy, 0.0),
            jnp.maximum(cz, 0.0), jnp.maximum(-cz, 0.0)]
    total = jnp.maximum(sum(comp), 1e-8)
    ao = sum(s * c for s, c in zip(sweeps, comp)) / total
    if half:
        ao = _prolong(ao.astype(jnp.float32)).astype(dtype)
    return ao
