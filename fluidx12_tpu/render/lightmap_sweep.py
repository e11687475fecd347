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


def _sweep_pooled(
    dens_o: jax.Array,        # (m_l, n_a, n_b) pooled, light-to-far ordered
    light_dir: jax.Array,     # (3,) unit, local space
    major_axis: int,          # static 0/1/2
    sizes,                    # GLOBAL grid sizes (x, y, z)
    stride: int,
    ref_step: jax.Array,
    absorption: float,
    k_ids: jax.Array,         # (m_l,) GLOBAL flipped slice indices (f32)
    prefix_fn=None,           # callable(slab_sum (W_a, W_b)) -> prefix
    use_pallas: bool = True,
):
    """Shear -> exclusive-cumsum -> unshear on an already pooled slice-major
    block.  The single-device sweep passes k_ids = arange(n_s) and no
    prefix_fn; the Z-sharded sweep (parallel/light.py) passes its shard's
    global slice indices and a prefix_fn that turns this shard's total
    sheared optical depth into the exclusive sum over earlier shards (one
    collective over (W_a, W_b) planes) -- the cumsum analog of the sharded
    march's OVER composition.  Returns transm (m_l, n_a, n_b).

    Derivation (see directional_transmittance): voxel at slice k, lateral p
    needs D[k, p] = sum_{j<k} logA[j, p + (k - j) * slope]; in the sheared
    coordinate w = p + k*slope + pad this is an exclusive cumsum over
    slices, and the cross-shard term is just the sum over earlier shards'
    slices evaluated in the SAME sheared frame -- so a (W_a, W_b) plane is
    all that crosses shard boundaries.
    """
    dtype = dens_o.dtype
    arr_to_local = {0: 2, 1: 1, 2: 0}
    arr_axis = arr_to_local[major_axis]
    n_m = sizes[major_axis]
    rem = [a for a in (0, 1, 2) if a != arr_axis]
    rem_local = [arr_to_local[a] for a in rem]

    l_m = light_dir[major_axis]
    n_a = dens_o.shape[1]
    n_b = dens_o.shape[2]
    step_m_local = 2.0 * stride / n_m
    abs_lm = jnp.maximum(jnp.abs(l_m), 0.35)  # major axis => >= 1/sqrt(3)
    # Lateral slope per slice step, in voxels of each remaining dim.
    slope_a = light_dir[rem_local[0]] / l_m * step_m_local * (sizes[rem_local[0]] / 2.0)
    slope_b = light_dir[rem_local[1]] / l_m * step_m_local * (sizes[rem_local[1]] / 2.0)
    step_len = step_m_local / abs_lm

    n_steps = step_len / ref_step
    att = jnp.clip(1.0 - dens_o * absorption, 1e-6, 1.0)
    log_att = jnp.log(att) * n_steps

    # |slope| <= n_lat/n_m_pooled over the whole GLOBAL sweep, so k*slope
    # spans at most n_lat: W = 2*n_lat suffices with a sign-dependent pad.
    W_a = 2 * n_a
    W_b = 2 * n_b
    pad_a = jnp.where(slope_a < 0, jnp.asarray(n_a, dtype), 0.0)
    pad_b = jnp.where(slope_b < 0, jnp.asarray(n_b, dtype), 0.0)

    if use_pallas and prefix_fn is None:
        # Streaming shear scan: the (m, W_a, W_b) sheared frame and the
        # dense resample-weight tensors never exist in HBM, and the carry
        # accumulates in f32 (ops/pallas/sweep.py).  The single-device
        # sweep has k_ids = arange, which the kernel's program_id supplies;
        # the sharded sweep (prefix_fn) keeps the einsum form.
        from fluidx12_tpu.ops.pallas.sweep import (
            shear_scan_pallas,
            sweep_scan_supported,
        )

        m_l = dens_o.shape[0]
        if (sweep_scan_supported(m_l, n_a, n_b)
                and jax.default_backend() in ("tpu", "cpu")):
            log_t = shear_scan_pallas(log_att, slope_a, slope_b,
                                      pad_a, pad_b)
            return jnp.exp(jnp.minimum(log_t, 0.0)).astype(dtype)

    k = k_ids.astype(dtype)

    wa = jnp.arange(W_a, dtype=dtype)
    wb = jnp.arange(W_b, dtype=dtype)
    # Shear weights: G[j, w] = logA[j, w - pad - j*slope].
    sc_a = wa[None, :] - pad_a - k[:, None] * slope_a        # (m_l, W_a)
    sc_b = wb[None, :] - pad_b - k[:, None] * slope_b
    sw_a = _resample_weights(sc_a, n_a)                      # (m_l, W_a, n_a)
    sw_b = _resample_weights(sc_b, n_b)
    sheared = jnp.einsum("kwa,kab->kwb", sw_a, log_att)
    sheared = jnp.einsum("kvb,kwb->kwv", sw_b, sheared)  # (m_l, W_a, W_b)

    excl = jnp.cumsum(sheared, axis=0) - sheared  # exclusive: own slice out
    # (CastLightRay's first sample is one step beyond the voxel,
    # RayMarch.hlsli:227-229.)
    if prefix_fn is not None:
        excl = excl + prefix_fn(sheared.sum(axis=0))[None]

    # Unshear: D[k, p] = E[k, p + pad + k*slope].
    pa = jnp.arange(n_a, dtype=dtype)
    pb = jnp.arange(n_b, dtype=dtype)
    uc_a = pa[None, :] + pad_a + k[:, None] * slope_a        # (m_l, n_a)
    uc_b = pb[None, :] + pad_b + k[:, None] * slope_b
    uw_a = _resample_weights(uc_a, W_a)                      # (m_l, n_a, W_a)
    uw_b = _resample_weights(uc_b, W_b)
    out = jnp.einsum("kaw,kwv->kav", uw_a, excl)
    log_t = jnp.einsum("kbv,kav->kab", uw_b, out)

    return jnp.exp(jnp.minimum(log_t, 0.0))


def _sweep_pooled_point(
    dens_o: jax.Array,        # (n_s, n_a, n_b) pooled, light-to-far ordered
    light_local: jax.Array,   # (3,) local-space light POSITION (x, y, z)
    major_axis: int,
    sizes,                    # grid sizes (x, y, z)
    stride: int,
    ref_step: jax.Array,
    absorption: float,
    flip: bool,               # static; light on the + side of the major axis
    k_ids: Optional[jax.Array] = None,  # (m_l,) GLOBAL flipped slice ids
    prefix_fn=None,           # callable(slab_sum (W_a, W_b)) -> prefix
    n_s_global: Optional[int] = None,
):
    """Projective (point-light) shear sweep on a pooled slice-major block.

    The directional sweep's shear generalizes to a point light by
    parametrizing rays with their lateral SLOPE w = (p - pL)/(k - kL)
    (pL/kL = light position in slice/lateral index coordinates): every ray
    from the light has constant w, slice j contributes at the per-slice
    AFFINE coordinate q = pL + w*(j - kL), and the accumulated optical
    depth is again an exclusive cumsum over slices in the w frame --
    the projective analog of `shear -> cumsum -> unshear`, with a per-ray
    step-length factor sqrt(1 + |lateral slope|^2) applied post-shear
    (it is constant along a ray but varies across rays).

    Requires the light OUTSIDE the volume on the near side of the sweep
    (kL < 0 after the flip; point_sweep_supported gates this), so every
    slice denominator k - kL is positive and bounded away from zero.
    Ref: the dormant `_POINT_LIGHT_` mode, RayMarch.hlsli:40,
    CSRayMarch.hlsl:131 (per-voxel direction normalize(light - pos)).

    k_ids / prefix_fn / n_s_global are the Z-sharding hooks (identical
    contract to _sweep_pooled): the w-grid and all projective scalars are
    functions of GLOBAL constants only, so a shard holding slices k_ids of
    the global n_s_global computes its block in the same w frame and the
    cross-shard term is prefix_fn of this shard's total sheared (and
    ds-scaled) optical depth -- one (W_a, W_b) plane.
    """
    dtype = dens_o.dtype
    arr_to_local = {0: 2, 1: 1, 2: 0}
    arr_axis = arr_to_local[major_axis]
    rem = [a for a in (0, 1, 2) if a != arr_axis]
    rem_local = [arr_to_local[a] for a in rem]
    n_m = sizes[major_axis]
    n_s, n_a, n_b = dens_o.shape
    n_sg = n_s if n_s_global is None else n_s_global
    step_m = 2.0 * stride / n_m

    l_m = light_local[major_axis].astype(dtype)
    l_a = light_local[rem_local[0]].astype(dtype)
    l_b = light_local[rem_local[1]].astype(dtype)
    # Light in slice/lateral index coordinates (slice 0 nearest the light).
    s_l = (l_m + 1.0) * 0.5 * n_sg - 0.5
    k_l = (n_sg - 1.0 - s_l) if flip else s_l
    k_l = jnp.minimum(k_l, -0.5)  # guarded by point_sweep_supported
    pl_a = (l_a + 1.0) * 0.5 * n_a - 0.5
    pl_b = (l_b + 1.0) * 0.5 * n_b - 0.5

    k = (jnp.arange(n_s, dtype=dtype) if k_ids is None
         else k_ids.astype(dtype))
    denom = k - k_l               # > 0.5 for every slice

    # w grids spanning every voxel-ray slope.  w = (p - pL)/(k - kL): both
    # extremes of p and of the (positive) denominator matter -- with an
    # oblique light the numerator can be one-signed, putting |w|'s MINIMUM
    # at the far slice (round-3 bug: using only the slice-0 denominator
    # left lower-corner rays outside the grid, whose zero unshear weights
    # silently rendered them unshadowed).
    W_a = 2 * n_a
    W_b = 2 * n_b
    den0 = -k_l
    den1 = (n_sg - 1.0) - k_l

    def w_bounds(pl, n_lat):
        cands = jnp.stack([(0.0 - pl) / den0, (0.0 - pl) / den1,
                           (n_lat - 1.0 - pl) / den0,
                           (n_lat - 1.0 - pl) / den1])
        return jnp.min(cands), jnp.max(cands)

    wa_min, wa_max = w_bounds(pl_a, n_a)
    wb_min, wb_max = w_bounds(pl_b, n_b)
    dwa = (wa_max - wa_min) / (W_a - 1)
    dwb = (wb_max - wb_min) / (W_b - 1)
    wa = wa_min + jnp.arange(W_a, dtype=dtype) * dwa
    wb = wb_min + jnp.arange(W_b, dtype=dtype) * dwb

    att = jnp.clip(1.0 - dens_o * absorption, 1e-6, 1.0)
    log_att = jnp.log(att)

    # Shear: G[j, w] = logA[j, pL + w * (j - kL)].
    sc_a = pl_a + wa[None, :] * denom[:, None]               # (n_s, W_a)
    sc_b = pl_b + wb[None, :] * denom[:, None]
    sw_a = _resample_weights(sc_a, n_a)
    sw_b = _resample_weights(sc_b, n_b)
    sheared = jnp.einsum("kwa,kab->kwb", sw_a, log_att)
    sheared = jnp.einsum("kvb,kwb->kwv", sw_b, sheared)      # (n_s, W_a, W_b)

    # Per-ray samples-per-slice factor: local tangent per slice step is
    # (step_m, w_a * 2/n_a, w_b * 2/n_b).
    ds = jnp.sqrt(step_m * step_m
                  + (wa * (2.0 / n_a))[:, None] ** 2
                  + (wb * (2.0 / n_b))[None, :] ** 2)
    sheared = sheared * (ds / ref_step)[None]

    excl = jnp.cumsum(sheared, axis=0) - sheared
    if prefix_fn is not None:
        excl = excl + prefix_fn(sheared.sum(axis=0))[None]

    # Unshear: D[k, p] = E[k, (p - pL)/(k - kL) mapped onto the w grid].
    pa = jnp.arange(n_a, dtype=dtype)
    pb = jnp.arange(n_b, dtype=dtype)
    uc_a = ((pa[None, :] - pl_a) / denom[:, None] - wa_min) / dwa
    uc_b = ((pb[None, :] - pl_b) / denom[:, None] - wb_min) / dwb
    uw_a = _resample_weights(uc_a, W_a)
    uw_b = _resample_weights(uc_b, W_b)
    out = jnp.einsum("kaw,kwv->kav", uw_a, excl)
    log_t = jnp.einsum("kbv,kav->kab", uw_b, out)
    return jnp.exp(jnp.minimum(log_t, 0.0))


def point_sweep_supported(config: FluidConfig) -> bool:
    """The fast point sweep needs the light strictly outside the volume
    along its dominant axis (projective slice denominators stay positive);
    host-static from the config's fixed light."""
    lp = np.asarray(config.light_pos, np.float32)
    major = int(np.argmax(np.abs(lp)))
    return abs(float(lp[major])) / config.volume_scale > 1.1


def point_transmittance(
    density: jax.Array,       # (Z, Y, X)
    light_local: jax.Array,   # (3,) local-space light position
    major_axis: int,
    ref_step: jax.Array,
    absorption: float,
    flip: bool,
    max_slices: int = 128,
) -> jax.Array:
    """Per-voxel transmittance toward a POINT light; returns (Z, Y, X).
    Pool/unpool mirror directional_transmittance; the core is the
    projective sweep (_sweep_pooled_point)."""
    dtype = density.dtype
    z, y, x = density.shape
    sizes = (x, y, z)
    arr_axis = {0: 2, 1: 1, 2: 0}[major_axis]
    n_m = sizes[major_axis]

    stride = max(-(-n_m // max_slices), 1)
    n_s = n_m // stride
    pool, up = _pool_mats(n_m, n_s, stride, dtype, flip)
    from fluidx12_tpu.render.slicecomp import _mxu16

    mx = _mxu16()
    eq = {0: "zyx,xm->mzy", 1: "zyx,ym->mzx", 2: "zyx,zm->myx"}[major_axis]
    dens_o = jnp.einsum(eq, density.astype(mx), pool.astype(mx),
                        preferred_element_type=jnp.float32).astype(dtype)

    transm = _sweep_pooled_point(
        dens_o, light_local, major_axis, sizes, stride, ref_step,
        absorption, flip)

    eq_up = {0: "mzy,mx->zyx", 1: "mzx,my->zyx", 2: "myx,mz->zyx"}[major_axis]
    return jnp.einsum(eq_up, transm.astype(mx), up.astype(mx),
                      preferred_element_type=jnp.float32).astype(dtype)


def _pool_mats(n_m: int, n_s: int, stride: int, dtype, flip: bool):
    """(pool (n_m, n_s), up (n_s, n_m)) slice-pooling matmul operands with
    the light-to-far flip folded in; tail voxels extend the last group on
    the upsample side.  Shared by the replicated sweeps here and the
    sharded decomposition (parallel/light._sharded_sweep)."""
    pool = jnp.zeros((n_m, n_s), dtype).at[
        jnp.arange(n_s * stride), jnp.repeat(jnp.arange(n_s), stride)
    ].set(1.0 / stride)
    up = jnp.zeros((n_s, n_m), dtype).at[
        jnp.repeat(jnp.arange(n_s), stride), jnp.arange(n_s * stride)
    ].set(1.0)
    if n_s * stride < n_m:  # tail voxels extend the last group
        up = up.at[n_s - 1, n_s * stride:].set(1.0)
    if flip:
        pool = pool[:, ::-1]  # slice 0 = nearest the light (+ side)
        up = up[::-1]
    return pool, up


def directional_transmittance(
    density: jax.Array,       # (Z, Y, X)
    light_dir: jax.Array,     # (3,) unit, local space (x, y, z components)
    major_axis: int,          # static: 0 (x), 1 (y) or 2 (z)
    ref_step: jax.Array,      # reference nominal step (for normalization)
    absorption: float,
    flip: Optional[bool] = None,  # static sign of light_dir[major_axis], if known
    max_slices: int = 128,        # sweep slice budget (callers may lower it)
    axis_aligned: bool = False,   # static: light exactly along the major axis
    use_pallas: bool = True,      # streaming shear-scan kernel when it fits
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
    sign_pos = light_dir[major_axis] > 0

    # Cap sweep slices at 2x the light-sample budget (the reference uses at
    # most max_light_samples = 64 shadow samples per ray; the sweep's native
    # resolution would exceed that spec on large grids for no visual gain).
    # The slice-major relayout + box pooling is one matmul contracting the
    # major axis (cf. slicecomp._axis_volume: no full-volume transpose),
    # with the light-to-far ordering folded into the pooling matrix when the
    # major-axis sign is known at trace time (`flip`).
    stride = max(-(-n_m // max_slices), 1)
    n_s = n_m // stride
    pool, up = _pool_mats(n_m, n_s, stride, dtype, bool(flip))
    from fluidx12_tpu.render.slicecomp import _mxu16

    mx = _mxu16()
    eq = {0: "zyx,xm->mzy", 1: "zyx,ym->mzx", 2: "zyx,zm->myx"}[major_axis]
    dens_o = jnp.einsum(eq, density.astype(mx), pool.astype(mx),
                        preferred_element_type=jnp.float32).astype(dtype)
    if flip is None:
        dens_o = jnp.where(sign_pos, dens_o[::-1], dens_o)

    if axis_aligned:
        # Zero lateral slope: the shear/unshear weights are exact identity
        # one-hots, so the whole (m, 2n_a, 2n_b) sheared frame collapses to
        # a bare exclusive cumsum along the slice axis -- the 6 AO basis
        # sweeps (always axis-aligned) skip 4 einsums each.  Identical
        # result to _sweep_pooled with slope 0 by construction.
        step_len = 2.0 * stride / n_m  # |l_major| == 1
        n_steps = step_len / ref_step
        att = jnp.clip(1.0 - dens_o * absorption, 1e-6, 1.0)
        log_att = jnp.log(att) * n_steps
        excl = jnp.cumsum(log_att, axis=0) - log_att
        transm = jnp.exp(jnp.minimum(excl, 0.0))
    else:
        transm = _sweep_pooled(
            dens_o, light_dir, major_axis, sizes, stride, ref_step, absorption,
            k_ids=jnp.arange(n_s, dtype=dtype), use_pallas=use_pallas)
    if flip is not None:
        # Upsample (piecewise-constant within a pooled group -- the shadow
        # is an integral quantity; banding is sub-visual at these strides),
        # unflip, and relayout back to (Z, Y, X) in ONE matmul, the
        # transpose of the pooling above (`up` from _pool_mats).
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


# Lateral dims at/above this run the shadow sweep at half lateral
# resolution (tests monkeypatch it down to exercise the path).
_LAT_POOL_MIN = 256


def _pool2_lat(vol: jax.Array, arr_axis: int) -> jax.Array:
    """2x box-pool the two non-major array dims of a (Z, Y, X) volume.
    Trailing dims pool via small MXU matmuls (a reshape-mean on a trailing
    dim pays the (8, 128) tile relayout, CLAUDE.md); the leading dim via a
    safe reshape-mean."""
    from fluidx12_tpu.sim.mg import _restrict_matrix

    dt = vol.dtype
    if arr_axis != 2:
        vol = jnp.einsum("zyx,xm->zym", vol,
                         jnp.asarray(_restrict_matrix(vol.shape[2]), dt))
    if arr_axis != 1:
        vol = jnp.einsum("zyx,ym->zmx", vol,
                         jnp.asarray(_restrict_matrix(vol.shape[1]), dt))
    if arr_axis != 0:
        z = vol.shape[0]
        vol = vol.reshape(z // 2, 2, *vol.shape[1:]).mean(axis=1)
    return vol


def _unpool2_lat(vol: jax.Array, arr_axis: int) -> jax.Array:
    """Linear 2x upsample of the two non-major array dims (inverse layout
    of _pool2_lat; cell-centered lerp matching sim/mg._prolong)."""
    from fluidx12_tpu.sim.mg import _prolong_matrix

    dt = vol.dtype
    if arr_axis != 2:
        vol = jnp.einsum("zyx,xm->zym", vol,
                         jnp.asarray(_prolong_matrix(vol.shape[2]), dt))
    if arr_axis != 1:
        vol = jnp.einsum("zyx,ym->zmx", vol,
                         jnp.asarray(_prolong_matrix(vol.shape[1]), dt))
    if arr_axis != 0:
        lo = jnp.concatenate([vol[:1], vol], axis=0)
        hi = jnp.concatenate([vol, vol[-1:]], axis=0)
        even = 0.25 * lo[:-1] + 0.75 * vol
        odd = 0.75 * vol + 0.25 * hi[1:]
        vol = jnp.stack([even, odd], axis=1).reshape(
            2 * vol.shape[0], *vol.shape[1:])
    return vol


def _lat_pooled_ok(shape, arr_axis: int) -> bool:
    lat = [n for d, n in enumerate(shape) if d != arr_axis]
    return all(n % 2 == 0 and n >= _LAT_POOL_MIN for n in lat)


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
    if config.point_light:
        # Projective sweep about the light position (the reference's
        # dormant _POINT_LIGHT_ mode at full sweep speed); the engine
        # gates on point_sweep_supported (light outside the volume).
        from fluidx12_tpu.ops.transform import transform_point_h

        lp = np.asarray(config.light_pos, np.float32)
        p_major = int(np.argmax(np.abs(lp)))
        light_local = transform_point_h(params.light_pt, params.world_i)[:3]
        shadow = point_transmittance(
            density, light_local.astype(dtype), p_major, ref_step,
            config.absorption, flip=bool(lp[p_major] > 0))
    else:
        # Big grids sweep at HALF lateral resolution: shadow is an integral,
        # low-frequency quantity (the same argument as the AO half-res
        # path), and the sweep's (m, 2n_a, 2n_b) sheared intermediate is
        # its whole cost -- lateral pooling cuts the shear-chain traffic
        # 4x (256^3 light map 1.8 -> ~0.9 ms).  The sweep's slope math
        # reads lateral sizes from the array shape, so the pooled call
        # shears in pooled-voxel units automatically.
        arr_axis = {0: 2, 1: 1, 2: 0}[major_axis]
        if flip is not None and _lat_pooled_ok(density.shape, arr_axis):
            shadow = _unpool2_lat(
                directional_transmittance(
                    _pool2_lat(density, arr_axis), light_dir, major_axis,
                    ref_step, config.absorption, flip=flip,
                    use_pallas=config.use_pallas),
                arr_axis)
        else:
            shadow = directional_transmittance(
                density, light_dir, major_axis, ref_step, config.absorption,
                flip=flip, use_pallas=config.use_pallas)

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
        nx_, ny_, nz_ = fallback_normal_dirs(gx, gy, gz, dtype)

        ao = _ambient_occlusion(density, nx_, ny_, nz_, ref_step, config)
        ambient = gi_ambient_from_parts(
            dense, nx_, ny_, nz_, ao, sh_coeffs, params.world[:3, :3], dtype)
    else:
        ambient = (params.ambient[:3] * params.ambient[3])[:, None, None, None]

    light = env3 * shadow[None] + ambient  # (3, Z, Y, X), never (..., 3)
    return light.astype(dtype)


def fallback_normal_dirs(gx, gy, gz, dtype, z0=0, zg=None):
    """-(grad density) with the reference's radial-direction fallback where
    the gradient is degenerate (RayMarch.hlsli:279).  z0/zg give the
    global-z offset/extent when the field is a Z-sharded slab (the radial
    direction is defined in GLOBAL volume coordinates)."""
    nx_, ny_, nz_ = -gx, -gy, -gz
    degenerate = nx_ * nx_ + ny_ * ny_ + nz_ * nz_ < 1e-16
    z_n, y_n, x_n = gx.shape
    zg = z_n if zg is None else zg
    px = ((jnp.arange(x_n, dtype=dtype) + 0.5) / x_n * 2.0 - 1.0).reshape(1, 1, x_n)
    py = ((jnp.arange(y_n, dtype=dtype) + 0.5) / y_n * 2.0 - 1.0).reshape(1, y_n, 1)
    pz = ((z0 + jnp.arange(z_n, dtype=dtype) + 0.5) / zg * 2.0 - 1.0).reshape(z_n, 1, 1)
    return (jnp.where(degenerate, px, nx_),
            jnp.where(degenerate, py, ny_),
            jnp.where(degenerate, pz, nz_))


def gi_ambient_from_parts(dense, nx_, ny_, nz_, ao, sh_coeffs, world3, dtype):
    """GI ambient from precomputed parts: world-rotate + normalize the
    (fallback-resolved) normal direction, evaluate SH irradiance, mask by
    density and modulate by AO (CSRayMarchL.hlsl:44-79 ambient term).

    Shared by the single-device XLA GI branch and the Z-sharded light map
    (parallel/light.py), which supplies shard-local parts -- every input
    here is per-voxel local, so the math needs no communication.
    """
    wx = nx_ * world3[0, 0] + ny_ * world3[1, 0] + nz_ * world3[2, 0]
    wy = nx_ * world3[0, 1] + ny_ * world3[1, 1] + nz_ * world3[2, 1]
    wz = nx_ * world3[0, 2] + ny_ * world3[1, 2] + nz_ * world3[2, 2]
    inv = 1.0 / jnp.sqrt(jnp.maximum(wx * wx + wy * wy + wz * wz, 1e-24))
    from fluidx12_tpu.gi.sh import evaluate_sh_irradiance_planar

    irradiance = evaluate_sh_irradiance_planar(
        sh_coeffs.astype(dtype), wx * inv, wy * inv, wz * inv)  # (3, ...)
    return jnp.where(dense[None], irradiance * ao[None], 0.0)


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


def _ao_levels(shape) -> int:
    """Box-downsample levels for the AO sweeps: 2 (quarter res) on big
    grids, 1 (half res) on medium ones, 0 otherwise.  Occlusion is an
    integral, low-frequency quantity; at 256^3 the six sweeps are the
    dominant GI cost, and a second 2x level cuts them a further ~8x for a
    visually negligible change (bounded in tests/test_render.py).  The
    sharded gate (parallel/light.sharded_light_supported) requires the
    shard-local choice to MATCH this one."""
    if all(n % 4 == 0 and n >= 256 for n in shape):
        return 2
    if _ao_half_res(shape):
        return 1
    return 0


def _ambient_occlusion(density, nx_, ny_, nz_, ref_step, config,
                       levels: Optional[int] = None):
    """6-sweep AO blended by the (unnormalized) gradient direction.

    Runs at HALF or QUARTER resolution when the grid allows (_ao_levels):
    occlusion is an integral, low-frequency quantity, and the six
    directional sweeps are the dominant GI cost (6x the shadow sweep).
    Each 2x box-down + trilinear-up level cuts them ~8x; the blend weights
    also come from the downsampled gradient.  Falls back to full resolution
    on odd/small grids.  `levels` overrides the automatic choice (tests
    bound the quarter-vs-half error with it).
    """
    dtype = density.dtype
    levels = _ao_levels(density.shape) if levels is None else levels
    if levels:
        from fluidx12_tpu.sim.mg import _prolong, _restrict

        dens_s = density.astype(jnp.float32)
        for _ in range(levels):
            dens_s = _restrict(dens_s)
        dens_s = dens_s.astype(dtype)
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
            max_slices=64, axis_aligned=True))
    comp = [jnp.maximum(cx, 0.0), jnp.maximum(-cx, 0.0),
            jnp.maximum(cy, 0.0), jnp.maximum(-cy, 0.0),
            jnp.maximum(cz, 0.0), jnp.maximum(-cz, 0.0)]
    total = jnp.maximum(sum(comp), 1e-8)
    ao = sum(s * c for s, c in zip(sweeps, comp)) / total
    if levels:
        ao = ao.astype(jnp.float32)
        for _ in range(levels):
            ao = _prolong(ao)
        ao = ao.astype(dtype)
    return ao
