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


def cube_cast(
    cube: jax.Array,
    face: jax.Array,
    u: jax.Array,
    v: jax.Array,
    pos: jax.Array,
    ray_dir: jax.Array,
) -> jax.Array:
    """AA filtered fetch (CubeCast, PSCube.hlsli:63-118).

    cube (6, R, R, 4); face/u/v per pixel; pos = hit point (kept for
    interface parity with the reference's edge test).

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
    cb = cube.astype(rec_dtype)
    right = jnp.concatenate([cb[:, :, 1:], cb[:, :, -1:]], axis=2)
    down = jnp.concatenate([cb[:, 1:], cb[:, -1:]], axis=1)
    down_right = jnp.concatenate([down[:, :, 1:], down[:, :, -1:]], axis=2)
    records = jnp.concatenate([cb, right, down, down_right], axis=-1)
    records = records.reshape(6 * size * size, 4 * c)

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


def resolve_cube(
    cube: jax.Array,
    params: SceneParams,
    config: FluidConfig,
) -> jax.Array:
    """Resolve the cube map to the viewport; returns (H, W, 4) premultiplied RGBA."""
    h, w = config.viewport[1], config.viewport[0]
    dtype = config.render_dtype

    ju = (jnp.arange(w, dtype=dtype) + 0.5) / w
    jv = (jnp.arange(h, dtype=dtype) + 0.5) / h
    vv, uu = jnp.meshgrid(jv, ju, indexing="ij")
    uv = jnp.stack([uu, vv], axis=-1)

    pos = _texcoord_to_local(params, uv).astype(dtype)
    local_eye = transform_point_h(params.eye_pt, params.world_i)[:3].astype(dtype)
    ray_dir = pos - local_eye
    ray_dir = ray_dir / jnp.linalg.norm(ray_dir, axis=-1, keepdims=True)

    hit_pos, plane, is_hit = _compute_ray_hit(pos, ray_dir)
    face, u, v = _cube_texcoord(hit_pos, plane)
    face = jnp.where(is_hit, face, 0)

    rgba = cube_cast(cube.astype(dtype), face, u, v, hit_pos, ray_dir)
    rgba = jnp.where(is_hit[..., None], rgba, 0.0)
    # discard when alpha <= 0 (PSCube.hlsl:26, PSRayCastCube.hlsl:111)
    return jnp.where(rgba[..., 3:4] > 0.0, rgba, 0.0)
