"""TPU-native cube-map volume marcher: bulk per-slice resampling + compositing.

This is the performance re-design of CSRayMarch/CSRayMarchV for TPU hardware
(SURVEY.md section 7 "hard parts").  The reference marches each cube-map
texel's ray with per-thread adaptive steps and texture gathers -- the worst
possible shape for a lock-step vector machine with no texture units.  Two
TPU-native observations replace it:

1. **Resampling is matmul.**  Cube-map faces are axis-aligned, so the
   intersection of all face-texel rays with a fixed volume slice is a
   *scale + translate* of the texel grid: per-slice resampling is separable
   into two 1D linear interpolations with per-slice-constant coefficients --
   batched einsums that run on the MXU for *all slices at once*.

2. **Compositing is a prefix sum.**  Front-to-back "over" accumulation
   linearizes in log-transmittance:
       T_k = prod_{j<k} (1 - a_j) = exp(cumsum_excl(log(1 - a)))
   so the whole march is resample -> cumsum -> weighted reduction, with no
   sequential scan at all.

For a face on axis m (e.g. +Z), rays go from the local-space eye E to texel
T = (tx, ty, 1); at slice plane z = z_k the lateral hit is
x = E_x + (tx - E_x) * s_k with s_k = (z_k - E_z)/(1 - E_z) -- affine in tx
with slice-constant scale/offset.  Opacity is normalized by the per-texel
step length so the result matches the reference's per-sample accumulation at
its nominal step (RayMarch.hlsli:29-31).  Output contract (6, R, R, 4) and
the screen-space resolve are unchanged from render/cubemap.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from fluidx12_tpu.core.config import FaceCullMode, FluidConfig
from fluidx12_tpu.core.state import SceneParams
from fluidx12_tpu.ops.transform import transform_point_h
from fluidx12_tpu.render.raymarch_core import MAX_DIST, face_visibility_in_graph
from fluidx12_tpu.utils.image import quantize_unorm8

# Face definitions matching GetLocalPos (CSRayMarch.hlsl:39-64):
# (axis, sign, (u_axis, u_sign), (v_axis, v_sign)); texel (i, j) maps to
# u = 2(j+.5)/R - 1, v = -(2(i+.5)/R - 1).
_FACES = [
    (0, +1, (2, -1), (1, +1)),   # +X: local = ( 1, v, -u)
    (0, -1, (2, +1), (1, +1)),   # -X: local = (-1, v,  u)
    (1, +1, (0, +1), (2, -1)),   # +Y: local = ( u, 1, -v)
    (1, -1, (0, +1), (2, +1)),   # -Y: local = ( u,-1,  v)
    (2, +1, (0, +1), (1, +1)),   # +Z: local = ( u, v,  1)
    (2, -1, (0, -1), (1, +1)),   # -Z: local = (-u, v, -1)
]

_EPS_ALPHA = 1e-6

# Test hook: force the fused march kernel on CPU (interpret mode) so the
# padded-march plumbing can be cross-checked end-to-end off-hardware
# (tests/test_padding.py); production gates stay TPU-only.
_FUSED_ON_CPU = False

# Stack-size floor (slices x rows x cols) for the fused march kernel on
# roll-clean grids.  The round-4 "XLA chain wins at 128^3" verdict was
# about the WEAKER pre-materialized-stack compositor; the FULLY fused
# kernel (in-kernel weights + MXU resample) removes so much more traffic
# that it wins there too -- measured on TPU 2026-08-19: headline 305.5
# (kernel ON at 128^3's 2.1M stacks) vs 225.8 steps/s (XLA chain).
# Below ~1M (96^3 and smaller roll-clean grids) stacks are too small to
# have been measured; they keep the XLA chain (padded layouts engage the
# kernel regardless via pad_lat -- their fallback is far worse).
_FUSE_MIN_STACK = 1024 * 1024


def _mxu16():
    """Half-precision matmul dtype: bf16 on TPU (2x MXU, half HBM), f32 on
    CPU (XLA:CPU's dot thunks reject mixed bf16xbf16->f32)."""
    return jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16


def _interp_weights(coords: jax.Array, n_src: int,
                    zero_outside: bool = False) -> jax.Array:
    """(..., n_out) source-space coords -> (..., n_out, n_src) lerp weights.

    Texel centers at integers; out-of-range clamps to the edge texel
    (LINEAR_CLAMP).  With zero_outside, coordinates more than half a texel
    beyond the edges get zero weight instead (rays passing outside the
    volume on an extended march plane, render/screencomp.py).  Dense
    one-hot construction; consumed by MXU einsums.
    """
    c = jnp.clip(coords, 0.0, n_src - 1.0)
    i0 = jnp.floor(c)
    frac = c - i0
    i0 = i0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, n_src - 1)
    src = jnp.arange(n_src)
    m0 = (src == i0[..., None]).astype(coords.dtype) * (1.0 - frac)[..., None]
    m1 = (src == i1[..., None]).astype(coords.dtype) * frac[..., None]
    w = m0 + m1
    if zero_outside:
        inside = (coords >= -0.5) & (coords <= n_src - 0.5)
        w = w * inside[..., None].astype(w.dtype)
    return w


def _local_from_uv(face_id, u, v, dtype):
    """Local-space (x, y, z) of face texels from in-face (u, v)."""
    axis, sign, (ua, us), (va, vs) = _FACES[face_id]
    comps = [None, None, None]
    comps[axis] = jnp.asarray(float(sign), dtype)
    comps[ua] = u * us
    comps[va] = v * vs
    return comps


_ARR_AXIS = {0: 3, 1: 2, 2: 1}       # local axis -> (C, Z, Y, X) array dim
_ARR_TO_LOCAL = {1: 2, 2: 1, 3: 0}   # array dim -> local axis


def _axis_volume(vol: jax.Array, axis: int, config: FluidConfig,
                 lod: int = 0) -> jax.Array:
    """Slice-axis-major, box-averaged, bf16 view of the volume for one axis.

    (C, Z, Y, X) -> (C, n_s, A, B) with the marching axis first, in natural
    ascending order.  Built once per axis and shared by the +/- face pair.

    The relayout is the march's HBM hot spot at large grids, so it is
    expressed as an MXU matmul against a box-pooling matrix contracting the
    marching axis (after a bf16 cast): XLA then reads the volume once at
    half width and never materializes a full-size transpose -- measured
    10.6 ms -> ~1 ms for the three axes at 256^3.  For the Z axis the
    marching dim is already leading, so a cheap reshape-mean suffices.

    The slice count is capped at the LOD-scaled ray-sample budget (the
    reference clamps view rays to max_ray_samples and scales the march by
    mip level, FluidX12.cpp:38, Fluid.cpp:852-854); stride groups are
    box-averaged (midpoint-rule integration).
    """
    sizes = (config.grid_size[0], config.grid_size[1], config.grid_size[2])
    n_m = sizes[axis]
    cap = max(config.max_ray_samples >> lod, 1)
    stride = max(-(-n_m // cap), 1)
    n_s = n_m // stride
    mx = _mxu16()
    v16 = vol.astype(mx)  # no-op when the caller already cast (one shared cast)
    # Padded storage layout (core/padding.py): the slice axis pools over
    # the LOGICAL extent only (leading-dim crop is free for Z; the pooling
    # matrices' ghost rows stay zero for X/Y); the LATERAL dims stay padded
    # -- the fused march kernel addresses them through logical-clamped
    # coordinates and zero ghost color.
    n_march_arr = v16.shape[_ARR_AXIS[axis]]
    if axis == 2 and stride == 1:  # marching axis is already array dim 1
        return v16[:, :n_m] if n_march_arr != n_m else v16
    if axis == 2 and n_s * stride == n_m:
        # Marching axis is the leading array dim: box-pool it with a pure
        # leading-dim reshape (no (8,128) tile relayout; measured slightly
        # ahead of the pooling matmul at 256^3).
        return (v16[:, :n_m].reshape(4, n_s, stride, *v16.shape[2:])
                .astype(jnp.float32).mean(axis=2).astype(mx))
    pool = jnp.zeros((n_march_arr, n_s), mx).at[
        jnp.arange(n_s * stride), jnp.repeat(jnp.arange(n_s), stride)
    ].set(1.0 / stride)
    # f32 accumulation + cast: measured FASTER than asking the dot for bf16
    # output directly (XLA:TPU's native MXU mode is f32-accumulate; bf16
    # emission adds a slower epilogue -- 3.3 vs 5.1 ms at 256^3 shapes).
    if axis == 0:
        # Contracting the lane dim with m emitted as the new lane dim is a
        # clean batched matmul; the (z <-> m) reorder is then a LEADING-dim
        # transpose (cheap copy, no tile relayout) -- measured 6.4 -> 4.4 ms
        # at 256^3 vs emitting "cmzy" straight from the dot.
        t = jnp.einsum("czyx,xm->czym", v16, pool,
                       preferred_element_type=jnp.float32).astype(mx)
        return jnp.moveaxis(t, 3, 1)
    eq = {2: "czyx,zm->cmyx", 1: "czyx,ym->cmzx"}[axis]
    return jnp.einsum(eq, v16, pool,
                      preferred_element_type=jnp.float32).astype(mx)


def _march_face(
    face_id: int,
    volf: jax.Array,        # (4, n_s, A, B) from _axis_volume(face's axis)
    local_eye: jax.Array,
    num_samples: jax.Array,
    config: FluidConfig,
    dtype,
    lod: int = 0,
    slice_start=None,       # traced global index of volf's first slice (sharded)
    row_start=None,         # traced global start of volf dim 2 (sharded rows)
    psum_axis=None,         # mesh axis to psum the row contraction over
    partial: bool = False,  # also return the block's total transmittance
    extent=1.0,             # lateral half-extent of the plane: L or (Lu, Lv)
    res=None,               # texels across the plane: R or (Ru, Rv)
):
    """March one cube face in bulk; returns (R_eff, R_eff, 4), R_eff = R >> lod.

    Face orientation is folded into cheap per-face work instead of volume
    copies: the march direction (face sign) picks prefix vs suffix
    transmittance, lateral signs live in the interpolation weights, and the
    X faces' swapped lateral order becomes a transpose of the final image
    rather than of the volume.

    The volume carries 4 channels: [density, premultiplied rgb * light].
    Pre-multiplying color by light in volume space (instead of resampling
    both and multiplying after) nearly halves the resample matmuls and the
    big (n_s, R, R) intermediates; the difference -- trilinear-of-product vs
    product-of-trilinears -- is below the 8-bit output quantization for the
    smooth fields involved (cross-checked in tests/test_fastpath.py).

    LOD marches the face at mip resolution directly with a proportionally
    reduced slice budget, mirroring the reference's mip-scaled dispatch
    (Fluid.cpp:852-854) instead of marching full-res and downsampling.

    Sharded use (parallel/render.py): `slice_start` marches a contiguous
    sub-range of slices (this shard's Z-slab, for faces whose march axis is
    Z) -- `partial=True` then also returns the block's total transmittance
    so blocks compose front-to-back across shards with the OVER operator.
    `row_start`/`psum_axis` instead split the first lateral contraction
    across shards (for X/Y faces, whose lateral dim 2 is the sharded Z) and
    reduce the partial products with one psum.
    """
    axis, sign, (ua, us), (va, vs) = _FACES[face_id]
    z, y, x = config.zyx
    sizes = (x, y, z)
    n_m = sizes[axis]
    n_s = volf.shape[1]
    stride = -(-n_m // max(config.max_ray_samples >> lod, 1))
    plane_res = res if res is not None else max(config.cube_map_size >> lod, 1)
    r_u, r_v = (plane_res, plane_res) if isinstance(plane_res, int) else plane_res
    l_u, l_v = (extent, extent) if isinstance(extent, float) else extent
    del res  # reused below for the resampled volume

    # extent > 1 marches an enlarged base plane (the perspective shear-warp
    # factorization of the DIRECT screen-space methods, render/screencomp.py):
    # lateral texels beyond the volume get zero weight, not edge clamp.
    # The plane may be rectangular; the output is always (r_v rows, r_u cols).
    u_line = ((jnp.arange(r_u, dtype=dtype) + 0.5) / r_u * 2.0 - 1.0) * l_u
    v_line = -((jnp.arange(r_v, dtype=dtype) + 0.5) / r_v * 2.0 - 1.0) * l_v
    outside = max(l_u, l_v) > 1.0
    e_m = local_eye[axis]

    # Slice coordinates in natural ascending order; parametric position of
    # each slice along eye->face (s in (0, 1] marks slices in front).
    idx0 = jnp.asarray(0 if slice_start is None else slice_start, dtype)
    cell = (((idx0 + jnp.arange(n_s, dtype=dtype)) * stride + 0.5 * stride)
            / n_m) * 2.0 - 1.0
    denom = jnp.asarray(float(sign), dtype) - e_m
    denom = jnp.where(jnp.abs(denom) < 1e-8, 1e-8, denom)
    s = (cell - e_m) / denom  # (n_s,)

    rem_local = [_ARR_TO_LOCAL[a] for a in (1, 2, 3) if a != _ARR_AXIS[axis]]
    swapped = rem_local == [ua, va]  # X faces: rows resample u, cols v

    def coords_for(local_axis):
        # (n_s, R) source-space coordinates along one lateral array dim.
        if local_axis == ua:
            q_line, e_q, unit_sign = u_line, local_eye[ua], us
        else:
            q_line, e_q, unit_sign = v_line, local_eye[va], vs
        n_src = sizes[local_axis]
        h = e_q + (q_line[None, :] * unit_sign - e_q) * s[:, None]
        return (h + 1.0) * 0.5 * n_src - 0.5, n_src

    def w_for(local_axis):
        # (n_s, R, n_src) lerp weights resampling one lateral array dim.
        coords, n_src = coords_for(local_axis)
        return _interp_weights(coords, n_src, zero_outside=outside)

    # Per-texel ray direction and step length through one slice (rows = v,
    # cols = u; transposed to match the resampled (r, s) layout when this
    # face's lateral order is swapped).
    tex_pos = jnp.stack(
        jnp.broadcast_arrays(*_local_from_uv(face_id, u_line[None, :], v_line[:, None], dtype)),
        axis=-1,
    )  # (R, R, 3)
    rd = tex_pos - local_eye
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    dm = jnp.abs(rd[..., axis])
    step_len = (2.0 * stride / n_m) / jnp.maximum(dm, 1e-4)  # (R, R)

    ref_step = MAX_DIST / num_samples.astype(dtype)
    n_steps = step_len / ref_step
    if swapped:
        n_steps = n_steps.T

    valid = (s > 0.0) & (s <= 1.0)
    r_rows = r_u if rem_local[0] == ua else r_v
    r_cols = r_u if rem_local[1] == ua else r_v

    on_tpu = jax.default_backend() == "tpu" or _FUSED_ON_CPU
    unsharded = (not partial and psum_axis is None and slice_start is None
                 and row_start is None)
    big = n_s * r_rows * r_cols >= _FUSE_MIN_STACK
    # Lateral extents of volf may exceed the logical grid (padded storage
    # layout, core/padding.py): the fused kernel addresses them through
    # logical-clamped coordinates (ghost color is exactly zero), so padded
    # faces ALWAYS prefer the kernel -- the alternative is the XLA twin on
    # non-roll-clean shapes, the very fallback the padding exists to avoid.
    a_log = sizes[rem_local[0]]
    b_log = sizes[rem_local[1]]
    pad_lat = volf.shape[2] != a_log or volf.shape[3] != b_log

    # FULLY fused march (ops/pallas/composite.py::composite_resample_pallas):
    # the per-slice resample runs on the MXU inside the compositor kernel,
    # so neither the lerp-weight matrices nor the (4, n_s, R, R) resampled
    # stack ever exist in HBM -- the round trip that was the measured 1.4 ms
    # gap at 256^3 (VERDICT r4 item 2).  Sharded variants and unaligned
    # shapes keep the einsum + XLA chain, which is also the cross-check twin
    # (tests/test_pallas.py).
    if config.use_pallas and on_tpu and unsharded and (big or pad_lat):
        from fluidx12_tpu.ops.pallas.composite import (
            composite_resample_pallas,
            composite_resample_supported,
        )

        if composite_resample_supported(n_s, volf.shape[2], volf.shape[3],
                                        r_rows, r_cols):
            h_rows, _ = coords_for(rem_local[0])
            h_cols, _ = coords_for(rem_local[1])
            acc = composite_resample_pallas(
                volf, h_rows, h_cols, valid.astype(jnp.float32),
                n_steps.astype(jnp.float32), float(config.absorption),
                flip=sign < 0, zero_outside=outside,
                a_log=a_log if volf.shape[2] != a_log else 0,
                b_log=b_log if volf.shape[3] != b_log else 0)
            out_rgb = jnp.moveaxis(acc[1:], 0, -1)
            scatter = jnp.concatenate(
                [out_rgb / (2.0 * jnp.pi), acc[0][..., None]],
                axis=-1).astype(dtype)
            if swapped:
                scatter = jnp.swapaxes(scatter, 0, 1)
            return scatter

    if pad_lat:
        # Fused kernel unavailable: the einsum twin's weights are sized to
        # the logical extents, so crop the padded lateral dims (a relayout
        # copy; correctness fallback only).
        volf = volf[:, :, :a_log, :b_log]

    w_rows = w_for(rem_local[0])  # resamples volf dim 2
    w_cols = w_for(rem_local[1])  # resamples volf dim 3
    if row_start is not None:
        # volf dim 2 is this shard's row range; slice the weights to match.
        w_rows = jax.lax.dynamic_slice_in_dim(
            w_rows, row_start, volf.shape[2], axis=2)

    # Bulk separable resample on the MXU: (4, n_s, A, B) -> (4, n_s, R, R).
    # bf16 inputs with f32 accumulation double MXU throughput, and bf16
    # intermediates halve the HBM traffic of the big (n_s, R, R) tensors;
    # inputs are smooth imagery (densities/lit colors) where bf16's 8-bit
    # mantissa is below the 8-bit output quantization.
    mx = _mxu16()
    t1f = jnp.einsum("mrv,cmvu->cmru", w_rows.astype(mx), volf.astype(mx),
                     preferred_element_type=jnp.float32)
    if psum_axis is not None:
        # Partial row contraction: reduce across shards (f32, before the
        # half cast) -- the only collective of the X/Y-face march.
        t1f = jax.lax.psum(t1f, psum_axis)
    t1 = t1f.astype(mx)
    res = jnp.einsum("msu,cmru->cmrs", w_cols.astype(mx), t1,
                     preferred_element_type=jnp.float32).astype(mx)

    dens_r = res[0].astype(dtype)  # (n_s, R, R); transmittance math stays f32
    prod = res[1:4]                # (3, n_s, R, R) bf16, premultiplied rgb*light

    # Streaming compositor over a pre-materialized stack
    # (ops/pallas/composite.py::composite_pallas): the fallback fusion level
    # when the fully fused kernel's gates fail but the stack is still big
    # enough that one streaming pass beats the XLA chain's HBM round trips.
    use_ckernel = False
    if config.use_pallas and on_tpu and unsharded and big:
        from fluidx12_tpu.ops.pallas.composite import (
            composite_pallas,
            composite_supported,
        )

        use_ckernel = composite_supported(n_s, res.shape[2], res.shape[3])
    if use_ckernel:
        dens_m = jnp.where(valid[:, None, None], res[0], 0)
        acc = composite_pallas(dens_m, res[1:4], n_steps.astype(jnp.float32),
                               float(config.absorption), flip=sign < 0)
        out_rgb = jnp.moveaxis(acc[1:], 0, -1)
        out_a = acc[0]
        scatter = jnp.concatenate(
            [out_rgb / (2.0 * jnp.pi), out_a[..., None]], axis=-1).astype(dtype)
        if swapped:
            scatter = jnp.swapaxes(scatter, 0, 1)
        return scatter

    dens = jnp.clip(dens_r, 0.0, 1.0)                         # (n_s, R, R)
    a_ref = jnp.clip(dens * config.absorption, 0.0, 0.999)
    alpha = 1.0 - jnp.power(1.0 - a_ref, n_steps[None])
    alpha = jnp.where(valid[:, None, None], alpha, 0.0)
    alpha = jnp.clip(alpha, 0.0, 1.0 - _EPS_ALPHA)

    # Exclusive front-to-back transmittance via cumprod (log-depth scan of
    # multiplies; the log-space cumsum form spends two transcendentals per
    # sample -- measured 1.50 -> 1.14 ms for the 6-face scan at 128^3).
    # Slices are in natural ascending order, so front-to-back is a prefix
    # product toward positive faces and a suffix product toward negative.
    one_m = 1.0 - alpha
    if sign > 0:
        cp = jnp.cumprod(one_m, axis=0)
        transm = jnp.concatenate([jnp.ones_like(cp[:1]), cp[:-1]], axis=0)
    else:
        cp = jnp.cumprod(one_m[::-1], axis=0)
        transm = jnp.concatenate([jnp.ones_like(cp[:1]), cp[:-1]], axis=0)[::-1]

    w = alpha * transm  # (n_s, R, R) per-slice compositing weight
    # Scatter rate = (rgb/density) * light = prod / density; weighting by
    # w/density keeps the saturation behavior of the per-sample form.
    w_rate = jnp.where(dens > 0, w / jnp.maximum(dens, 1e-6), 0.0)
    out_rgb = jnp.einsum("cmrs,mrs->rsc", prod, w_rate.astype(prod.dtype),
                         preferred_element_type=jnp.float32)
    out_a = jnp.sum(w, axis=0)

    scatter = jnp.concatenate([out_rgb / (2.0 * jnp.pi), out_a[..., None]], axis=-1)
    if swapped:
        scatter = jnp.swapaxes(scatter, 0, 1)
    if partial:
        # Total transmittance through this slice block: with it, blocks
        # compose front-to-back across shards with the OVER operator
        # (scatter' = scatter_front + T_front * scatter_back).
        t_tot = cp[-1]
        if swapped:
            t_tot = t_tot.T
        return scatter, t_tot
    return scatter


def ray_march_cube_fast(
    grid: jax.Array,
    params: SceneParams,
    config: FluidConfig,
    light_map: jax.Array,
    lod: int = 0,
    static_mask: Optional[int] = None,
) -> jax.Array:
    """Bulk slice-compositing cube-map march (separate-light mode).

    Drop-in for render/cubemap.ray_march_cube when a light map is available.
    Marches each face directly at mip resolution R >> lod with an
    LOD-scaled slice budget (the reference's mip-scaled dispatch,
    Fluid.cpp:852-854).

    `static_mask`, when given, is a trace-time visibility bitmask: invisible
    faces are *not computed at all* (the analog of the reference skipping
    their dispatches, CSRayMarch.hlsl:101-102).  With the default camera 3
    of 6 faces are culled -- half the march.  The engine keys its jit cache
    on the mask, so a camera crossing a face plane just retraces.
    """
    dtype = config.render_dtype
    local_eye = transform_point_h(params.eye_pt, params.world_i)[:3].astype(dtype)
    # 4 marching channels: density + (premultiplied rgb * incident light),
    # cast once to the matmul dtype (shared by the per-axis pooling einsums).
    dens = grid[3:4].astype(dtype)
    prod = grid[:3].astype(dtype) * light_map.astype(dtype)
    vol = jnp.concatenate([dens, prod], axis=0).astype(_mxu16())

    if config.face_cull == FaceCullMode.NONE:
        visible = face_visibility_in_graph(local_eye)
    else:
        face_ids = jnp.arange(6, dtype=jnp.int32)
        visible = ((params.visibility_mask >> face_ids) & 1) > 0

    live = [f for f in range(6)
            if static_mask is None or (static_mask >> f) & 1]

    # Non-roll-clean grids (the FluidGI 150^3 preset): re-pad the marching
    # volume to the storage layout (core/padding.py) so the FULLY fused
    # march kernel runs -- its in-kernel coordinates clamp at the logical
    # extents and the pad's ghost color is exactly zero, so the output
    # matches the compact einsum twin; the pad itself is one cheap zero
    # fill vs the XLA twin's relayout-crawling einsums at 150 lanes
    # (measured 5.7 ms -> kernel at 150^3).  Only taken when every live
    # axis' fused gate holds at the padded lateral dims.
    if (config.use_pallas
            and (jax.default_backend() == "tpu" or _FUSED_ON_CPU)
            and config.is_3d):
        from fluidx12_tpu.core.padding import pad_to_storage, storage_zyx
        from fluidx12_tpu.ops.pallas.composite import (
            composite_resample_supported,
        )

        storage = storage_zyx(config)
        if tuple(storage) != tuple(config.zyx):
            R = max(config.cube_map_size >> lod, 1)
            lat = {0: (storage[0], storage[1]),   # X faces: lateral (Z, Y)
                   1: (storage[0], storage[2]),   # Y faces: lateral (Z, X)
                   2: (storage[1], storage[2])}   # Z faces: lateral (Y, X)
            cap = max(config.max_ray_samples >> lod, 1)

            def axis_ok(axis):
                n_m = config.grid_size[axis]
                n_s = n_m // max(-(-n_m // cap), 1)
                a, b = lat[axis]
                return composite_resample_supported(n_s, a, b, R, R)

            if all(axis_ok(_FACES[f][0]) for f in live):
                vol = pad_to_storage(vol, config)

    # One slice-axis-major volume per axis, shared by its +/- face pair
    # (the relayout dominates the march at large grids; see _axis_volume).
    volaxes = {axis: _axis_volume(vol, axis, config, lod)
               for axis in sorted({_FACES[f][0] for f in live})}
    R = max(config.cube_map_size >> lod, 1)
    faces = []
    for f in range(6):
        if f not in live:
            faces.append(jnp.zeros((R, R, 4), dtype))
            continue
        face = _march_face(f, volaxes[_FACES[f][0]], local_eye,
                           params.num_samples, config, dtype, lod)
        faces.append(jnp.where(visible[f], face, 0.0))
    cube = jnp.stack(faces, axis=0)

    if config.quantize_cube_map:
        cube = quantize_unorm8(cube)
    return cube
