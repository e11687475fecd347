"""Screen-space resolve of the ray-marched cube map (the paper's AA step).

The reference rasterizes the cube's interior faces (VSCube + PSCube) with a
custom gather-based bilinear filter; PSRayCastCube.hlsl is the equivalent
full-screen form (compiled but unused there, called out in SURVEY.md section 7
as the natural TPU spec since there is no rasterizer).  Per pixel:

1. unproject to a local-space near-plane point, form the eye ray
   (TexcoordToLocalPos, PSRayCastCube.hlsl:17-26),
2. intersect with the [-1,1]^3 box *exit* face (ComputeRayHit, :33-59),
3. map the hit to a cube face + uv (ComputeCubeTexcoord, :64-93),
4. custom bilinear with hand-computed corner weights, collapsing to single
   texels at exterior edges to avoid seam bleed (GetDomain/CubeCast,
   PSCube.hlsli:41-118).

Output is premultiplied RGBA, zero (discard) where the ray misses the box or
the filtered alpha is zero.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from fluidx12_tpu.core.config import FluidConfig
from fluidx12_tpu.core.state import SceneParams
from fluidx12_tpu.ops.transform import transform_ndc, transform_point_h


def _texcoord_to_local(params: SceneParams, uv: jax.Array) -> jax.Array:
    """Screen uv in [0,1] -> local-space point on the near plane."""
    xy = uv * 2.0 - 1.0
    ndc = jnp.stack([xy[..., 0], -xy[..., 1]], axis=-1)
    return transform_ndc(ndc, 0.0, params.world_view_proj_i)


def _compute_ray_hit(pos: jax.Array, ray_dir: jax.Array):
    """Exit-face intersection (PSRayCastCube.hlsl:33-59).

    Returns (hit_pos, hit_plane, is_hit); hit_plane in {0: x, 1: y, 2: z}.
    """
    big = jnp.asarray(3.4e38, pos.dtype)
    u_best = jnp.full(pos.shape[:-1], big, pos.dtype)
    plane = jnp.full(pos.shape[:-1], 3, jnp.int32)
    for i in range(3):
        j, k = (i + 1) % 3, (i + 2) % 3
        u = (jnp.sign(ray_dir[..., i]) - pos[..., i]) / ray_dir[..., i]
        ok = u >= 0.0
        ok &= jnp.abs(ray_dir[..., j] * u + pos[..., j]) <= 1.0
        ok &= jnp.abs(ray_dir[..., k] * u + pos[..., k]) <= 1.0
        better = ok & (u < u_best)
        u_best = jnp.where(better, u, u_best)
        plane = jnp.where(better, i, plane)
    hit_pos = ray_dir * u_best[..., None] + pos
    return hit_pos, plane, plane < 3


def _cube_texcoord(pos: jax.Array, plane: jax.Array):
    """Hit position + axis -> (face, u, v) with uv in [0,1], v flipped
    (ComputeCubeTexcoord, PSRayCastCube.hlsl:64-93)."""
    x, y, z = pos[..., 0], pos[..., 1], pos[..., 2]
    # plane 0 (x): u = -x*z, v = y, face = x<0 ? 1 : 0
    # plane 1 (y): u = x, v = -y*z, face = y<0 ? 3 : 2
    # plane 2 (z): u = z*x, v = y, face = z<0 ? 5 : 4
    u = jnp.where(plane == 0, -x * z, jnp.where(plane == 1, x, z * x))
    v = jnp.where(plane == 1, -y * z, y)
    face = jnp.where(
        plane == 0,
        jnp.where(x < 0, 1, 0),
        jnp.where(plane == 1, jnp.where(y < 0, 3, 2), jnp.where(z < 0, 5, 4)),
    ).astype(jnp.int32)
    uu = u * 0.5 + 0.5
    vv = 1.0 - (v * 0.5 + 0.5)
    return face, uu, vv


def _records_2x2(faces: jax.Array) -> jax.Array:
    """(F, H, W, C) -> (F*H*W, 4C) contiguous-record table: row (f, i, j)
    holds texel (i, j)'s edge-clamped 2x2 bilinear neighborhood, so one row
    gather fetches a full filter footprint (the TPU gather cost model bills
    per row, CLAUDE.md layout notes).  Shared by cube_cast, the
    depth-bilateral variant, and the DIRECT plane warp."""
    f, h, w, c = faces.shape
    right = jnp.concatenate([faces[:, :, 1:], faces[:, :, -1:]], axis=2)
    down = jnp.concatenate([faces[:, 1:], faces[:, -1:]], axis=1)
    down_right = jnp.concatenate([down[:, :, 1:], down[:, :, -1:]], axis=2)
    recs = jnp.concatenate([faces, right, down, down_right], axis=-1)
    return recs.reshape(f * h * w, 4 * c)


def cube_cast(
    cube: jax.Array,
    face: jax.Array,
    u: jax.Array,
    v: jax.Array,
    pos: jax.Array,
    ray_dir: jax.Array,
) -> jax.Array:
    """AA filtered fetch (CubeCast, PSCube.hlsli:63-118).

    cube (F, R, R, c) -- F = 6 for the cube map, or 1 when reused as the
    plane-warp gather of the fast DIRECT path (render/screencomp.py);
    face/u/v per pixel; pos = hit point (kept for interface parity with the
    reference's edge test).

    TPU-native gather shape: instead of 16 scalar gathers per pixel, each
    texel's full 2x2 bilinear neighborhood is packed into one contiguous
    16-float record and fetched with a single row gather -- XLA vectorizes
    contiguous trailing dimensions, cutting the resolve's gather cost ~10x.
    Edge behavior is true LINEAR_CLAMP via fractions clamped against the
    record origin, which reproduces the reference's exterior-edge collapse
    (GetDomain, PSCube.hlsli:41-58 emulates exactly clamp on cube hardware).
    """
    size = cube.shape[1]
    c = cube.shape[-1]
    ut = u * size - 0.5
    vt = v * size - 0.5

    # Record table: records[f, i, j] = texels (i, j), (i, j+1), (i+1, j),
    # (i+1, j+1), edge-clamped, 4*c contiguous values.  bf16 storage is
    # lossless here (the marched cube map is 8-bit-quantized,
    # quantize_cube_map).  Measured: the row-gather cost is per *row*, not
    # per element (f32/bf16/uint32-packed records all time within 2% at
    # 800^2), so the encoding is chosen for accuracy, not width.
    rec_dtype = jnp.bfloat16 if cube.shape[1] >= 64 else cube.dtype
    records = _records_2x2(cube.astype(rec_dtype))

    u0 = jnp.clip(jnp.floor(ut).astype(jnp.int32), 0, size - 2)
    v0 = jnp.clip(jnp.floor(vt).astype(jnp.int32), 0, size - 2)
    lin = (face * size + v0) * size + u0
    fetched = jnp.take(records, lin.reshape(-1), axis=0).reshape(lin.shape + (4 * c,))

    # Fractions relative to the clamped record origin, clipped to [0, 1]:
    # exact LINEAR_CLAMP at the face borders.
    fu = jnp.clip(ut - u0, 0.0, 1.0)[..., None]
    fv = jnp.clip(vt - v0, 0.0, 1.0)[..., None]

    s00 = fetched[..., 0 * c : 1 * c]
    s10 = fetched[..., 1 * c : 2 * c]
    s01 = fetched[..., 2 * c : 3 * c]
    s11 = fetched[..., 3 * c : 4 * c]
    top = s00 + (s10 - s00) * fu
    bot = s01 + (s11 - s01) * fu
    return top + (bot - top) * fv


def _pad_cube_seamless(cube: jax.Array, pad: int = 2) -> jax.Array:
    """Extend each face by `pad` texels of cube-adjacent content.

    Border texels are filled by *directionally* sampling the cube at the
    extrapolated texel centers (the gnomonic continuation of the face past
    its edge lands on the adjacent face) -- the standard seamless-cube-map
    unfold that cube hardware performs in TextureCube filtering.
    """
    from fluidx12_tpu.ops.cubemap import face_uv_to_direction, sample_cube_bilinear

    size = cube.shape[1]
    dtype = cube.dtype
    t = ((jnp.arange(size + 2 * pad, dtype=dtype) + 0.5 - pad) / size) * 2.0 - 1.0

    def strip(rows, cols):
        pv, pu = jnp.meshgrid(-t[rows], t[cols], indexing="ij")
        dirs = jnp.stack(
            [face_uv_to_direction(f, pu, pv) for f in range(6)], axis=0)
        return sample_cube_bilinear(cube, dirs)

    top = strip(slice(0, pad), slice(None))                     # (6, p, S+2p, c)
    bottom = strip(slice(size + pad, None), slice(None))
    left = strip(slice(pad, size + pad), slice(0, pad))         # (6, S, p, c)
    right = strip(slice(pad, size + pad), slice(size + pad, None))
    mid = jnp.concatenate([left, cube, right], axis=2)
    return jnp.concatenate([top, mid, bottom], axis=1)


def cube_cast_blocked(
    cube: jax.Array,
    face: jax.Array,
    u: jax.Array,
    v: jax.Array,
    hit_pos: jax.Array,
    is_hit: jax.Array,
) -> jax.Array:
    """AA filtered fetch with one gather per 2x2 pixel block (EXPERIMENTAL).

    Same contract as cube_cast, exploiting the measured TPU gather cost
    model: a row gather costs ~the same for 16..128-element rows, so one
    64-element row (a 4x4-texel RGBA window) per 2x2 pixel *block* fetches
    everything its four pixels' bilinear footprints need for ~2.5x less
    gather time (0.98 ms vs 2.56 ms at 800^2/128).  In practice the
    surrounding layout work (strided pixel de-interleave, slot re-interleave,
    weight synthesis) costs more than the gather saves on current XLA:TPU,
    so config.block_resolve defaults to False; kept as the reference
    implementation of the technique + its quality contract (exact on
    same-face blocks, seamless-unfold at cube seams).

    - Records are 4x4 windows of the seamlessly *padded* faces, so a block
      whose pixels straddle a cube edge still resolves: off-face pixels
      address the window through the gnomonic continuation of the anchor
      face (exactly the unfold the padding was built with).
    - Pixels on the anchor face use the same texel coordinates as
      cube_cast (LINEAR_CLAMP at face borders, the reference's
      exterior-edge collapse, PSCube.hlsli:41-58) and reproduce it exactly
      whenever their footprint fits the shared window -- interior blocks,
      i.e. everything but a thin band at extreme grazing angles.
    """
    size = cube.shape[1]
    c = cube.shape[-1]
    h, w = face.shape
    dtype = u.dtype

    # TPU layout rule driving every shape below: arrays are tiled on their
    # last two dims (8 sublanes x 128 lanes), so a materialized array with a
    # tiny trailing dim pads up to 64x.  The first draft of this kernel used
    # (Hb, 2, Wb, 2) pixel blocks and (.., 4, 4, c) windows and ran 6x
    # *slower* than the per-pixel gather purely from tile padding.  Hence:
    # per-slot (Hb, Wb) planes, flat (P, 64) records, matmul reduction.
    padded = _pad_cube_seamless(cube, pad=2).astype(
        jnp.bfloat16 if size >= 64 else cube.dtype)
    # records[(f, av, au), (i*4 + j)*c + ch] = padded window covering face
    # texels (av-2 .. av+1) x (au-2 .. au+1).
    recs = jnp.concatenate(
        [padded[:, i : i + size, j : j + size] for i in range(4) for j in range(4)],
        axis=-1,
    ).reshape(6 * size * size, 16 * c)

    def slots(x):
        # (H, W) -> four (Hb, Wb) planes, pixel slot (qi, qj) of each block.
        return [x[qi::2, qj::2] for qi in (0, 1) for qj in (0, 1)]

    f_s = slots(face)
    hit_s = slots(jnp.asarray(is_hit))
    # Anchor face per block: the first hit pixel's exit face.
    f0 = f_s[0]
    got = hit_s[0]
    for q in range(1, 4):
        f0 = jnp.where(~got & hit_s[q], f_s[q], f0)
        got = got | hit_s[q]
    plane0 = f0 >> 1
    sign0 = jnp.where((f0 & 1) == 0, 1.0, -1.0).astype(dtype)

    hx = slots(hit_pos[..., 0])
    hy = slots(hit_pos[..., 1])
    hz = slots(hit_pos[..., 2])
    u_s = slots(u)
    v_s = slots(v)

    tu_s, tv_s = [], []
    for q in range(4):
        # Extended (gnomonic) texel coords w.r.t. the anchor face: normalize
        # the hit point by its anchor-axis coordinate, then apply the anchor
        # face's uv formulas (the same products as _cube_texcoord; exact when
        # the pixel lies on the anchor face, where |axis| == 1).
        axc = jnp.where(plane0 == 0, hx[q], jnp.where(plane0 == 1, hy[q], hz[q]))
        inv = 1.0 / jnp.where(jnp.abs(axc) < 1e-20, 1e-20, jnp.abs(axc))
        px, py, pz = hx[q] * inv, hy[q] * inv, hz[q] * inv
        ue = jnp.where(plane0 == 0, -sign0 * pz,
                       jnp.where(plane0 == 1, px, sign0 * px))
        ve = jnp.where(plane0 == 1, -sign0 * pz, py)
        tu_ext = (ue * 0.5 + 0.5) * size - 0.5
        tv_ext = (1.0 - (ve * 0.5 + 0.5)) * size - 0.5
        # Pixels on the anchor face keep cube_cast's own clamped coordinates;
        # off-face pixels ride the extension, clipped to the padded range.
        same = f_s[q] == f0
        tu_s.append(jnp.where(same, jnp.clip(u_s[q] * size - 0.5, 0.0, size - 1.0),
                              jnp.clip(tu_ext, -1.5, size + 0.5)))
        tv_s.append(jnp.where(same, jnp.clip(v_s[q] * size - 0.5, 0.0, size - 1.0),
                              jnp.clip(tv_ext, -1.5, size + 0.5)))

    mu = jnp.minimum(jnp.minimum(tu_s[0], tu_s[1]), jnp.minimum(tu_s[2], tu_s[3]))
    mv = jnp.minimum(jnp.minimum(tv_s[0], tv_s[1]), jnp.minimum(tv_s[2], tv_s[3]))
    a_u = jnp.clip(jnp.floor(mu).astype(jnp.int32) + 2, 0, size - 1)
    a_v = jnp.clip(jnp.floor(mv).astype(jnp.int32) + 2, 0, size - 1)
    lin = (f0 * size + a_v) * size + a_u
    fetched = jnp.take(recs, lin.reshape(-1), axis=0).astype(dtype)  # (P, 16c)

    # Static per-lane window/channel ids of the (P, 16c) record rows:
    # lane l = (i*4 + j)*c + ch.
    lane = jnp.arange(16 * c, dtype=jnp.int32)
    i_l = (lane // (4 * c)).astype(dtype)
    j_l = ((lane // c) % 4).astype(dtype)
    # Channel-summing matrix: (16c, c), picks every c-th lane.  The matmul is
    # the lane-dim reduction (a small MXU op); a reshape-and-sum would pad.
    gmat = (lane[:, None] % c == jnp.arange(c)[None, :]).astype(dtype)

    outs = []
    for q in range(4):
        o_u = jnp.clip(tu_s[q] - (a_u - 2).astype(dtype), 0.0, 3.0).reshape(-1)
        o_v = jnp.clip(tv_s[q] - (a_v - 2).astype(dtype), 0.0, 3.0).reshape(-1)
        w64 = (jnp.maximum(1.0 - jnp.abs(o_v[:, None] - i_l), 0.0)
               * jnp.maximum(1.0 - jnp.abs(o_u[:, None] - j_l), 0.0))  # (P, 16c)
        outs.append(jnp.matmul(fetched * w64, gmat,
                               precision=jax.lax.Precision.HIGHEST))  # (P, c)

    # Interleave the four slot images back into (H, W, c).
    out = jnp.stack(outs, axis=0).reshape(2, 2, h // 2, w // 2, c)
    return out.transpose(2, 0, 3, 1, 4).reshape(h, w, c)


def cube_cast_depth_aware(
    cube: jax.Array,
    cube_depth: jax.Array,
    face: jax.Array,
    u: jax.Array,
    v: jax.Array,
    scene_depth: jax.Array,
    z_near: float,
    z_far: float,
) -> jax.Array:
    """Depth-bilateral AA fetch (`_HAS_DEPTH_MAP_` CubeCast, PSCube.hlsli:
    82-116; dormant in the reference app): each bilinear corner's weight is
    scaled by max(1 - 0.5 |lin(sceneZ) - lin(cornerZ)|, 0) in linear view-z,
    suppressing texels whose marched depth disagrees with the geometry under
    the pixel (halo prevention at depth edges).  Zero total weight falls
    back to the plain bilinear fetch (:118).

    cube (6, R, R, c); cube_depth (6, R, R) clip z; scene_depth per pixel.
    Packs rgba + depth into one 4*(c+1)-float record per texel, so the
    depth variant still costs a single row gather per pixel.  Depths are
    LINEARIZED before packing: a bf16 record lane of clip-space z would be
    amplified ~1/(1-z)^2 by the unprojection near the far plane (weight
    flicker), while bf16 of linear view-z keeps a bounded ~0.4% relative
    error against the |dz| bilateral scale.
    """
    from fluidx12_tpu.render.raymarch_core import unproject_z

    size = cube.shape[1]
    c = cube.shape[-1]
    ut = u * size - 0.5
    vt = v * size - 0.5

    cube_depth_lin = unproject_z(cube_depth.astype(jnp.float32), z_near, z_far)
    cd = jnp.concatenate(
        [cube, cube_depth_lin[..., None].astype(cube.dtype)], axis=-1)
    cc = c + 1
    rec_dtype = jnp.bfloat16 if size >= 64 else cd.dtype
    records = _records_2x2(cd.astype(rec_dtype))

    u0 = jnp.clip(jnp.floor(ut).astype(jnp.int32), 0, size - 2)
    v0 = jnp.clip(jnp.floor(vt).astype(jnp.int32), 0, size - 2)
    lin = (face * size + v0) * size + u0
    fetched = jnp.take(records, lin.reshape(-1), axis=0).reshape(lin.shape + (4 * cc,))
    fu = jnp.clip(ut - u0, 0.0, 1.0)
    fv = jnp.clip(vt - v0, 0.0, 1.0)

    depth_lin = unproject_z(scene_depth.astype(jnp.float32), z_near, z_far)
    corners = [fetched[..., i * cc : (i + 1) * cc].astype(jnp.float32)
               for i in range(4)]  # s00, s10, s01, s11
    wb = [(1.0 - fu) * (1.0 - fv), fu * (1.0 - fv),
          (1.0 - fu) * fv, fu * fv]
    num = 0.0
    ws = 0.0
    plain = 0.0
    for s, w_b in zip(corners, wb):
        zi = s[..., c]  # already linear view-z (packed linearized)
        w = w_b * jnp.maximum(1.0 - 0.5 * jnp.abs(depth_lin - zi), 0.0)
        num = num + s[..., :c] * w[..., None]
        ws = ws + w
        plain = plain + s[..., :c] * w_b[..., None]
    return jnp.where(ws[..., None] > 0.0, num / jnp.maximum(ws[..., None], 1e-12),
                     plain).astype(u.dtype)


def resolve_cube(
    cube: jax.Array,
    params: SceneParams,
    config: FluidConfig,
    cube_depth: Optional[jax.Array] = None,
    depth_map: Optional[jax.Array] = None,
    rect=None,
) -> jax.Array:
    """Resolve the cube map to the viewport; returns (H, W, 4) premultiplied RGBA.

    With cube_depth (from ray_march_cube's depth path) + the scene depth_map,
    the fetch becomes the depth-bilateral CubeCast (`_HAS_DEPTH_MAP_`).

    rect, a host-static (x0, y0, w, h) from core.lod.screen_bbox, restricts
    the whole pass to the volume's screen bounding box: the row gather's
    cost is per pixel, and pixels outside the silhouette resolve to the
    zero discard anyway (the reference gets this for free by rasterizing
    only the cube's faces, Fluid.cpp:929).  Output is identical to the
    full-frame form -- pixel centers are computed from GLOBAL indices, so
    in-rect values match bitwise."""
    h, w = config.viewport[1], config.viewport[0]
    dtype = config.render_dtype
    x0, y0, rw, rh = rect if rect is not None else (0, 0, w, h)

    ju = (x0 + jnp.arange(rw, dtype=dtype) + 0.5) / w
    jv = (y0 + jnp.arange(rh, dtype=dtype) + 0.5) / h
    vv, uu = jnp.meshgrid(jv, ju, indexing="ij")
    uv = jnp.stack([uu, vv], axis=-1)

    pos = _texcoord_to_local(params, uv).astype(dtype)
    local_eye = transform_point_h(params.eye_pt, params.world_i)[:3].astype(dtype)
    ray_dir = pos - local_eye
    ray_dir = ray_dir / jnp.linalg.norm(ray_dir, axis=-1, keepdims=True)

    hit_pos, plane, is_hit = _compute_ray_hit(pos, ray_dir)
    face, u, v = _cube_texcoord(hit_pos, plane)
    face = jnp.where(is_hit, face, 0)

    if cube_depth is not None and depth_map is not None:
        scene_depth = depth_map.astype(dtype)
        if rect is not None:  # depth map is full-viewport
            scene_depth = scene_depth[y0:y0 + rh, x0:x0 + rw]
        rgba = cube_cast_depth_aware(
            cube.astype(dtype), cube_depth, face, u, v,
            scene_depth, config.z_near, config.z_far)
    elif config.block_resolve and h % 2 == 0 and w % 2 == 0 and cube.shape[1] >= 8:
        rgba = cube_cast_blocked(cube.astype(dtype), face, u, v, hit_pos, is_hit)
    else:
        rgba = cube_cast(cube.astype(dtype), face, u, v, hit_pos, ray_dir)
    rgba = jnp.where(is_hit[..., None], rgba, 0.0)
    # discard when alpha <= 0 (PSCube.hlsl:26, PSRayCastCube.hlsl:111)
    rgba = jnp.where(rgba[..., 3:4] > 0.0, rgba, 0.0)
    if rect is not None:
        rgba = jnp.zeros((h, w, rgba.shape[-1]), rgba.dtype
                         ).at[y0:y0 + rh, x0:x0 + rw].set(rgba)
    return rgba
