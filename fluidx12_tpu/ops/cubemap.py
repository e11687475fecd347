"""Cube-map addressing and sampling primitives.

The reference leans on hardware TextureCube sampling (PSEnvironment.hlsl,
PSCube.hlsli gathers); on TPU a cube map is a plain (6, H, W, C) array and
these helpers provide the direction->face/uv mapping (D3D cube-map layout:
faces +X, -X, +Y, -Y, +Z, -Z) and per-face bilinear fetches with edge clamp.

Face/uv conventions match CubeMap.hlsli / CSRayMarch.hlsl:GetLocalPos:
face f covers axis f>>1, positive side when (f & 1) == 0; v runs top-down
(texture-style, y flipped).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def face_uv_to_direction(face: int, u: jax.Array, v: jax.Array) -> jax.Array:
    """Map in-face coords u, v in [-1, 1] (v already y-down-flipped to y-up)
    to an un-normalized direction. Matches GetCubeTexcoord(slice, pos)."""
    one = jnp.ones_like(u)
    table = {
        0: ( one,  v, -u),
        1: (-one,  v,  u),
        2: ( u,  one, -v),
        3: ( u, -one,  v),
        4: ( u,  v,  one),
        5: (-u,  v, -one),
    }
    return jnp.stack(table[face], axis=-1)


def direction_to_face_uv(d: jax.Array):
    """Map directions (..., 3) to (face, u, v) with u, v in [0, 1].

    Inverse of face_uv_to_direction, i.e. the D3D TextureCube lookup rule:
    major axis selects the face, the other two coordinates divide by |major|.
    """
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)

    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    is_z = ~(is_x | is_y)

    face = jnp.where(
        is_x, jnp.where(x >= 0, 0, 1),
        jnp.where(is_y, jnp.where(y >= 0, 2, 3), jnp.where(z >= 0, 4, 5)),
    )
    major = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    major = jnp.maximum(major, 1e-20)

    # in-face coordinates (before y flip), per face sign conventions above
    u = jnp.where(
        is_x, jnp.where(x >= 0, -z, z),
        jnp.where(is_y, x, jnp.where(z >= 0, x, -x)),
    )
    vv = jnp.where(is_y, jnp.where(y >= 0, -z, z), y)
    u = u / major
    vv = vv / major
    # to [0,1] texture coords with v flipped (texture y runs down)
    return face, (u + 1.0) * 0.5, (1.0 - vv) * 0.5


def sample_cube_bilinear(cube: jax.Array, dirs: jax.Array) -> jax.Array:
    """Bilinearly sample a cube map (6, H, W, C) along directions (..., 3).

    Per-face bilinear with edge clamp (no seam blending; the reference's
    resolve explicitly collapses to single texels at seams, PSCube.hlsli:41-58,
    so per-face clamp is the matching behavior).
    """
    face, u, v = direction_to_face_uv(dirs)
    size_h, size_w = cube.shape[1], cube.shape[2]

    tu = u * size_w - 0.5
    tv = v * size_h - 0.5
    u0 = jnp.floor(tu)
    v0 = jnp.floor(tv)
    fu = (tu - u0)[..., None]
    fv = (tv - v0)[..., None]
    u0 = jnp.clip(u0.astype(jnp.int32), 0, size_w - 1)
    v0 = jnp.clip(v0.astype(jnp.int32), 0, size_h - 1)
    u1 = jnp.clip(u0 + 1, 0, size_w - 1)
    v1 = jnp.clip(v0 + 1, 0, size_h - 1)

    flat = cube.reshape(6 * size_h * size_w, cube.shape[-1])

    def fetch(vv, uu):
        lin = (face * size_h + vv) * size_w + uu
        return jnp.take(flat, lin.reshape(-1), axis=0).reshape(lin.shape + (cube.shape[-1],))

    c00 = fetch(v0, u0)
    c01 = fetch(v0, u1)
    c10 = fetch(v1, u0)
    c11 = fetch(v1, u1)
    top = c00 + (c01 - c00) * fu
    bot = c10 + (c11 - c10) * fu
    return top + (bot - top) * fv


def face_texel_local_positions(size: int, dtype=jnp.float32) -> jax.Array:
    """Local-space positions of all cube-map texels, (6, size, size, 3).

    Matches GetLocalPos (CSRayMarch.hlsl:39-64): texel (i=row, j=col) of each
    face maps to the [-1,1]^3 box surface (row 0 is the top, y flipped).
    """
    t = ((jnp.arange(size, dtype=dtype) + 0.5) / size) * 2.0 - 1.0
    pv, pu = jnp.meshgrid(-t, t, indexing="ij")  # pv = -pos.y convention flip
    faces = [face_uv_to_direction(f, pu, pv) for f in range(6)]
    return jnp.stack(faces, axis=0)
