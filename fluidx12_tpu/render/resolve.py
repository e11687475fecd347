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


def _get_domain(uv_texel: jax.Array, pos: jax.Array, ray_dir: jax.Array, size: int):
    """Bilinear corner weights with exterior-edge collapse (GetDomain,
    PSCube.hlsli:41-58). uv_texel = uv * size."""
    domain = jnp.mod(uv_texel + 0.5, 1.0)
    bound = size - 1.0
    axes = pos * size
    edge = jnp.any((jnp.abs(axes) > bound) & (axes * ray_dir < 0.0), axis=-1)
    uv_c = jnp.minimum(uv_texel, size - 0.5)
    collapsed = jnp.where(uv_c < 0.5, 1.0, 0.0)
    return jnp.where(edge[..., None], collapsed, domain)


def cube_cast(
    cube: jax.Array,
    face: jax.Array,
    u: jax.Array,
    v: jax.Array,
    pos: jax.Array,
    ray_dir: jax.Array,
) -> jax.Array:
    """AA filtered fetch (CubeCast, PSCube.hlsli:63-118).

    cube (6, R, R, 4); face/u/v per pixel; pos = hit point for the edge test.
    """
    size = cube.shape[1]
    ut = u * size
    vt = v * size
    domain = _get_domain(jnp.stack([ut, vt], axis=-1), pos, ray_dir, size)
    dinv = 1.0 - domain

    # The gather quad around (ut, vt): texel (u0, v0) is floor(ut - 0.5).
    u0 = jnp.floor(ut - 0.5).astype(jnp.int32)
    v0 = jnp.floor(vt - 0.5).astype(jnp.int32)
    u0c = jnp.clip(u0, 0, size - 1)
    v0c = jnp.clip(v0, 0, size - 1)
    u1c = jnp.clip(u0 + 1, 0, size - 1)
    v1c = jnp.clip(v0 + 1, 0, size - 1)

    flat = cube.reshape(6 * size * size, cube.shape[-1])

    def fetch(vv_, uu_):
        lin = (face * size + vv_) * size + uu_
        return jnp.take(flat, lin.reshape(-1), axis=0).reshape(lin.shape + (cube.shape[-1],))

    s00 = fetch(v0c, u0c)  # (u0, v0)
    s10 = fetch(v0c, u1c)  # (u1, v0)
    s01 = fetch(v1c, u0c)  # (u0, v1)
    s11 = fetch(v1c, u1c)  # (u1, v1)

    du = domain[..., 0:1]
    dv = domain[..., 1:2]
    diu = dinv[..., 0:1]
    div_ = dinv[..., 1:2]
    # Weights match wb[] in PSCube.hlsli:96-102 (Gather order folded into the
    # four explicit corners).
    result = s01 * (diu * dv) + s11 * (du * dv) + s10 * (du * div_) + s00 * (diu * div_)
    return result


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
