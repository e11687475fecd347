"""Sky background from the radiance cube map (ref: PSEnvironment.hlsl).

Per pixel: unproject the far-plane point through screenToWorld (the inverse
view-projection, LightProbe.cpp:74-78), form the world-space view ray and
sample the environment cube along it.  Drawn before the fluid passes, which
composite over it with premultiplied blending.

The `_FINITE_SIZE_` variant (finite-radius env box, PSEnvironment.hlsl:58-66)
is exposed via `finite_radius`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fluidx12_tpu.core.config import FluidConfig
from fluidx12_tpu.core.state import SceneParams
from fluidx12_tpu.ops.transform import transform_ndc

ENVCUBE_RADIUS = 768.0 / 1.414  # PSEnvironment.hlsl:7


def render_environment(
    radiance: jax.Array,
    params: SceneParams,
    config: FluidConfig,
    finite_radius: bool = False,
) -> jax.Array:
    """radiance (6, H, W, 3) -> background (H_vp, W_vp, 3)."""
    h, w = config.viewport[1], config.viewport[0]
    dtype = config.render_dtype

    ju = (jnp.arange(w, dtype=dtype) + 0.5) / w
    jv = (jnp.arange(h, dtype=dtype) + 0.5) / h
    vv, uu = jnp.meshgrid(jv, ju, indexing="ij")
    xy = jnp.stack([uu * 2.0 - 1.0, -(vv * 2.0 - 1.0)], axis=-1)
    world_pt = transform_ndc(xy, 1.0, params.screen_to_world)

    eye = params.eye_pt.astype(dtype)
    ray_dir = world_pt - eye
    ray_dir = ray_dir / jnp.linalg.norm(ray_dir, axis=-1, keepdims=True)

    if finite_radius:
        two_rad_sq = 2.0 * ENVCUBE_RADIUS * ENVCUBE_RADIUS
        proj = jnp.sum(eye * ray_dir, axis=-1)
        start_sq = jnp.sum(eye * eye)
        dist = jnp.sqrt(jnp.maximum(proj * proj - start_sq + two_rad_sq, 0.0)) - proj
        pos = eye + dist[..., None] * ray_dir
        # the finite variant samples with swizzled pos.zyx (PSEnvironment.hlsl:64)
        sample_dir = pos[..., ::-1]
    else:
        sample_dir = ray_dir

    # Contiguous-record bilinear (resolve.cube_cast): one row gather per
    # pixel instead of four 3-wide gathers -- the naive form cost ~11 ms of
    # the GI frame at 800^2 (gathers bill per row, and a 3-wide row also
    # pays the trailing-dim tile padding; CLAUDE.md layout notes).
    from fluidx12_tpu.ops.cubemap import direction_to_face_uv
    from fluidx12_tpu.render.resolve import cube_cast

    face, u, v = direction_to_face_uv(sample_dir)
    return cube_cast(radiance.astype(dtype), face, u, v, sample_dir, ray_dir)
