"""TPU-native direct screen-space marcher: perspective shear-warp.

The fast twin of render/raycast.py (PSRayCast.hlsl / PSRayCastV.hlsl).  The
faithful path marches every viewport pixel's ray with per-step trilinear
gathers -- measured ~8.8 s/frame at 800^2 x 128^3 on v5e, pure gather cost.
This module re-expresses it with the classic perspective shear-warp
factorization (the same slice-is-affine observation the cube-map marcher
exploits, render/slicecomp.py):

1. **Shear + composite.**  Pick the volume face the view rays exit through
   along the dominant view axis (the "base plane").  For rays cast from the
   eye to points of that plane, the intersection with every axis slice is a
   *scale + translate* of the plane grid -- so the whole march is the
   existing `_march_face` bulk-einsum machinery, run once on an **enlarged**
   base plane (extent > 1 covers rays that exit through side faces; lateral
   texels outside the volume get zero weight).

2. **Warp.**  The composited base-plane image maps to the screen by a single
   2D projective transform (per-pixel ray / plane intersection), resolved
   with the same contiguous-record bilinear gather as the cube resolve
   (resolve.cube_cast with one face).

Static geometry (face id, plane extent, texel resolution) is host-computed
per frame from the camera (direct_plane_spec) and keys the engine's jit
cache, exactly like the face-culling bitmask; extent/resolution are
quantized so an orbiting camera only retraces at coarse thresholds.

The sampling pattern deviates from the reference exactly like the fast cube
march does (slice spacing along the axis instead of fixed ray steps, bf16
resampling); cross-checked against the faithful path in
tests/test_fastpath.py.  Point lights and an eye inside the volume fall back
to the faithful path (engine/fluidx.py).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fluidx12_tpu.core.config import FluidConfig
from fluidx12_tpu.core.state import SceneParams
from fluidx12_tpu.ops.transform import transform_point_h
from fluidx12_tpu.render.resolve import _compute_ray_hit, _texcoord_to_local
from fluidx12_tpu.render.slicecomp import _FACES, _axis_volume, _march_face, _mxu16


class DirectPlaneSpec(NamedTuple):
    """Static base-plane geometry for one camera pose (hashable: jit key)."""

    face_id: int                    # 0..5, the exit face marched as the base plane
    extent: tuple                   # (Lu, Lv) lateral half-extents (>= 1.0)
    res: tuple                      # (Ru, Rv) plane texels


# Resolution bounds: floor keeps tiny viewports sane; the cap bounds the
# (n_slices, Rv, Ru) march intermediates (~1 GB bf16 at 128 x 1024^2).
_RES_MIN, _RES_MAX = 256, 1024


def direct_plane_spec(local_eye: np.ndarray, wvp: np.ndarray,
                      viewport, config: FluidConfig,
                      density_scale: float = 1.0) -> Optional[DirectPlaneSpec]:
    """Host-side plane selection; None when the eye is inside the volume
    (no single exit plane covers all rays -> faithful fallback).

    - face: the *visible* face of the dominant eye axis (the far face the
      view rays exit through; IsVisible semantics, CSRayMarch.hlsl:69-74).
    - extent: projections of all 8 box corners from the eye onto the plane;
      their hull bounds every ray that traverses the box, so the enlarged
      plane covers rays exiting through side faces.  Kept rectangular
      (the u/v extents usually differ a lot -- 2.0 x 2.75 at the default
      camera -- and march cost is proportional to the plane area).
      Quantized up to 1/4.
    - res: matches the viewport's pixel density at the volume center
      (projected px per local unit), so the direct path keeps its
      full-resolution character; rounded up to a lane-friendly multiple
      of 128 and clamped to [256, 1024] per dimension.
    """
    e = np.asarray(local_eye, np.float64)
    axis = int(np.argmax(np.abs(e)))
    if abs(e[axis]) <= 1.05:
        return None
    sign = -1 if e[axis] > 0 else +1  # exit face: opposite side from the eye
    face_id = 2 * axis + (0 if sign > 0 else 1)
    _, _, (ua, us), (va, vs) = _FACES[face_id]

    corners = np.array([(x, y, z) for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)],
                       np.float64)
    t = (sign - e[axis]) / (corners[:, axis] - e[axis])
    proj = e[None, :] + (corners - e[None, :]) * t[:, None]

    def quant(v):
        return float(np.ceil(max(1.0, v) * 4.0 + 0.02) / 4.0)

    l_u = quant(np.abs(proj[:, ua]).max())
    l_v = quant(np.abs(proj[:, va]).max())

    # Pixel density: project the volume center and a small lateral offset.
    def to_px(p_local):
        h = wvp.T @ np.array([*p_local, 1.0])
        ndc = h[:2] / max(abs(h[3]), 1e-9)
        return ndc * np.array([viewport[0], viewport[1]]) * 0.5

    du = np.zeros(3)
    du[ua] = 0.2
    px_per_unit = np.linalg.norm(to_px(du) - to_px(np.zeros(3))) / 0.2

    def res_for(extent):
        r = int(px_per_unit * 2.0 * extent * density_scale)
        return min(max(-(-r // 128) * 128, _RES_MIN), _RES_MAX)

    return DirectPlaneSpec(face_id=face_id, extent=(l_u, l_v),
                           res=(res_for(l_u), res_for(l_v)))


def _plane_cast(img: jax.Array, ut: jax.Array, vt: jax.Array) -> jax.Array:
    """Bilinear fetch from a (possibly rectangular) plane image via the
    contiguous-record gather (same TPU gather shape as resolve.cube_cast:
    each texel's 2x2 neighborhood is one row, so one row gather per pixel
    replaces 16 scalar gathers).  LINEAR_CLAMP at the borders.

    img: (Rv, Ru, c); ut/vt: per-pixel texel coords (texel centers at ints).
    """
    from fluidx12_tpu.render.resolve import _records_2x2

    rv, ru, c = img.shape
    ib = img.astype(jnp.bfloat16 if min(rv, ru) >= 64 else img.dtype)
    records = _records_2x2(ib[None])

    u0 = jnp.clip(jnp.floor(ut).astype(jnp.int32), 0, ru - 2)
    v0 = jnp.clip(jnp.floor(vt).astype(jnp.int32), 0, rv - 2)
    lin = v0 * ru + u0
    fetched = jnp.take(records, lin.reshape(-1), axis=0).reshape(lin.shape + (4 * c,))
    fu = jnp.clip(ut - u0, 0.0, 1.0)[..., None]
    fv = jnp.clip(vt - v0, 0.0, 1.0)[..., None]
    s00 = fetched[..., 0 * c : 1 * c]
    s10 = fetched[..., 1 * c : 2 * c]
    s01 = fetched[..., 2 * c : 3 * c]
    s11 = fetched[..., 3 * c : 4 * c]
    top = s00 + (s10 - s00) * fu
    bot = s01 + (s11 - s01) * fu
    return (top + (bot - top) * fv).astype(ut.dtype)


def _warp_plane_to_screen(img: jax.Array, spec: DirectPlaneSpec,
                          params: SceneParams, config: FluidConfig,
                          rect=None) -> jax.Array:
    """Projective warp of the composited base-plane image to the viewport.

    Per pixel: form the local-space eye ray (TexcoordToLocalPos,
    PSRayCastCube.hlsl:17-26), intersect the base plane, map the lateral hit
    to plane uv, and bilinearly fetch with the record gather.  Pixels whose
    rays miss the volume box discard (PSRayCast.hlsl:38-42).  rect, a
    host-static (x0, y0, w, h) from core.lod.screen_bbox, restricts the
    per-pixel work and the row gather to the volume's screen bounding box
    (identical output: out-of-rect pixels are the miss discard).
    """
    axis, sign, (ua, us), (va, vs) = _FACES[spec.face_id]
    h, w = config.viewport[1], config.viewport[0]
    dtype = config.render_dtype
    x0, y0, rw, rh = rect if rect is not None else (0, 0, w, h)

    ju = (x0 + jnp.arange(rw, dtype=dtype) + 0.5) / w
    jv = (y0 + jnp.arange(rh, dtype=dtype) + 0.5) / h
    vv_, uu_ = jnp.meshgrid(jv, ju, indexing="ij")
    uv = jnp.stack([uu_, vv_], axis=-1)

    pos = _texcoord_to_local(params, uv).astype(dtype)
    local_eye = transform_point_h(params.eye_pt, params.world_i)[:3].astype(dtype)
    ray_dir = pos - local_eye
    ray_dir = ray_dir / jnp.linalg.norm(ray_dir, axis=-1, keepdims=True)

    _, _, is_hit = _compute_ray_hit(pos, ray_dir)

    d_m = ray_dir[..., axis]
    d_safe = jnp.where(jnp.abs(d_m) < 1e-8, 1e-8, d_m)
    t_hit = (jnp.asarray(float(sign), dtype) - local_eye[axis]) / d_safe
    hit = local_eye + ray_dir * t_hit[..., None]
    valid = is_hit & (t_hit > 0.0)

    l_u, l_v = spec.extent
    r_u, r_v = spec.res
    pu = (hit[..., ua] * us) / l_u
    pv = (hit[..., va] * vs) / l_v
    ut = (pu * 0.5 + 0.5) * r_u - 0.5
    vt = (1.0 - (pv * 0.5 + 0.5)) * r_v - 0.5

    rgba = _plane_cast(img.astype(dtype), ut, vt)
    rgba = jnp.where(valid[..., None], rgba, 0.0)
    rgba = jnp.where(rgba[..., 3:4] > 0.0, rgba, 0.0)
    if rect is not None:
        rgba = jnp.zeros((h, w, rgba.shape[-1]), rgba.dtype
                         ).at[y0:y0 + rh, x0:x0 + rw].set(rgba)
    return rgba


def ray_cast_direct_fast(
    grid: jax.Array,
    params: SceneParams,
    config: FluidConfig,
    light_map: jax.Array,
    spec: DirectPlaneSpec,
    num_samples: jax.Array,
    rect=None,
) -> jax.Array:
    """Fast direct screen-space march; returns (H, W, 4) premultiplied RGBA.

    Drop-in for render/raycast.ray_cast_direct given a light map (both
    DIRECT methods ride it: with slice-resolution lighting the merged and
    separate variants coincide, as for the fast cube path;
    engine/fluidx.py).  num_samples carries the method's binding:
    max_ray_samples for merged (Fluid.cpp:943), the LOD-clamped count for
    separate (Fluid.cpp:968).
    """
    dtype = config.render_dtype
    local_eye = transform_point_h(params.eye_pt, params.world_i)[:3].astype(dtype)

    dens = grid[3:4].astype(dtype)
    prod = grid[:3].astype(dtype) * light_map.astype(dtype)
    vol = jnp.concatenate([dens, prod], axis=0).astype(_mxu16())

    axis = _FACES[spec.face_id][0]
    # Non-roll-clean grids: re-pad the marching volume so the base-plane
    # march rides the fully fused kernel with logical-clamped coordinates
    # (same move as ray_march_cube_fast; ghost color is exactly zero).
    from fluidx12_tpu.render.slicecomp import _FUSED_ON_CPU

    if (config.use_pallas
            and (jax.default_backend() == "tpu" or _FUSED_ON_CPU)
            and config.is_3d):
        from fluidx12_tpu.core.padding import pad_to_storage, storage_zyx
        from fluidx12_tpu.ops.pallas.composite import (
            composite_resample_supported,
        )

        storage = storage_zyx(config)
        if tuple(storage) != tuple(config.zyx):
            lat = {0: (storage[0], storage[1]),
                   1: (storage[0], storage[2]),
                   2: (storage[1], storage[2])}[axis]
            n_m = config.grid_size[axis]
            n_s = n_m // max(-(-n_m // max(config.max_ray_samples, 1)), 1)
            # rows/cols assignment depends on the face's lateral order
            # (_march_face's `swapped`); require both orientations.
            if (composite_resample_supported(n_s, lat[0], lat[1],
                                             spec.res[1], spec.res[0])
                    and composite_resample_supported(n_s, lat[0], lat[1],
                                                     spec.res[0], spec.res[1])):
                vol = pad_to_storage(vol, config)

    volf = _axis_volume(vol, axis, config, lod=0)
    img = _march_face(spec.face_id, volf, local_eye, num_samples, config,
                      dtype, lod=0, extent=spec.extent, res=spec.res)
    return _warp_plane_to_screen(img, spec, params, config, rect=rect)
