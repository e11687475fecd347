"""Shared volume ray-marching machinery.

TPU-native re-expression of RayMarch.hlsli: the reference's divergent
per-thread march loops with `break` early-outs become fixed-trip
`lax.fori_loop`s over *batches of rays* with per-ray liveness masks --
the correct shape for a lock-step vector machine (SURVEY.md section 7,
"divergent march loops").  Loop trip counts are the static `max_*_samples`
from the config; the dynamic LOD-clamped counts arrive as scalars and only
affect masks and step sizes, so no retracing happens when the camera moves.

Faithfully reproduced details (with reference cites):

- adaptive step controller `GetStep` (RayMarch.hlsli:200-210); note the
  reference's `step = (step + newStep) * 0.5` is a dead store (overwritten by
  `step = newStep` before use, RayMarch.hlsli:237-241 and CSRayMarch.hlsl:
  175-190), so the effective step is simply `newStep`,
- shadow rays `CastLightRay` with transmittance early-out (RayMarch.hlsli:215-247),
- density-gradient normals + SH irradiance ambient + AO ray (GetLight,
  RayMarch.hlsli:252-295),
- ray-box entry `ComputeRayOrigin` (RayMarch.hlsli:146-173) and target-hit
  `ComputeTargetHit` (:178-183),
- front-to-back premultiplied accumulation `scatter += color * ABSORPTION *
  transm` with the final 1/(2 pi) scatter normalization (CSRayMarch.hlsl:141-193).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from fluidx12_tpu.core.config import FluidConfig
from fluidx12_tpu.core.state import SceneParams
from fluidx12_tpu.gi.sh import evaluate_sh_irradiance
from fluidx12_tpu.ops.sampling import trilinear_sample
from fluidx12_tpu.ops.transform import transform_vector

# Local-space box diagonal (RayMarch.hlsli:29).  A plain float, NOT a jnp
# value: module-level jnp ops would initialize the JAX backend at import time,
# before the CLI can select a platform.
MAX_DIST = 2.0 * math.sqrt(3.0)


class LightEnv(NamedTuple):
    """Per-frame lighting quantities in volume-local space."""

    light_dir: jax.Array     # (3,) normalized local-space directional light
    light_pos: jax.Array     # (3,) local-space light point (point-light mode)
    light_color: jax.Array   # (3,) rgb * intensity
    ambient: jax.Array       # (3,) rgb * intensity
    world3x3: jax.Array      # (3, 3) volume->world rotation/scale (for SH eval)
    sh_coeffs: jax.Array     # (9, 3) SH irradiance coefficients (zeros if none)
    has_probe: bool          # static: light probe attached
    point_light: bool        # static: per-position light direction
    world44: Optional[jax.Array] = None        # (4, 4) volume->world (shadow map)
    shadow_map: Optional[jax.Array] = None     # (H, W) light-space depth
    shadow_view_proj: Optional[jax.Array] = None  # (4, 4) world->light clip


def make_light_env(params: SceneParams, sh_coeffs: Optional[jax.Array],
                   config: FluidConfig,
                   shadow_map: Optional[jax.Array] = None,
                   shadow_view_proj: Optional[jax.Array] = None) -> LightEnv:
    """Build local-space lighting (ref: CSRayMarch.hlsl:131-139: directional
    via `mul(g_lightPt, (float3x3)g_worldI)`, or point via the full inverse
    transform under `_POINT_LIGHT_`).  A shadow map + its view-projection
    enable the `_HAS_SHADOW_MAP_` path (dormant in the reference app)."""
    local_light = transform_vector(params.light_pt, params.world_i)
    light_dir = local_light / jnp.linalg.norm(local_light)
    from fluidx12_tpu.ops.transform import transform_point_h

    light_pos = transform_point_h(params.light_pt, params.world_i)[..., :3]
    has_probe = sh_coeffs is not None and config.has_light_probe
    return LightEnv(
        light_dir=light_dir,
        light_pos=light_pos,
        light_color=params.light_color[:3] * params.light_color[3],
        ambient=params.ambient[:3] * params.ambient[3],
        world3x3=params.world[:3, :3],
        sh_coeffs=sh_coeffs if sh_coeffs is not None else jnp.zeros((9, 3), jnp.float32),
        has_probe=has_probe,
        point_light=config.point_light,
        world44=params.world,
        shadow_map=shadow_map,
        shadow_view_proj=shadow_view_proj,
    )


def light_direction_at(env: LightEnv, pos: jax.Array) -> jax.Array:
    """Per-position light direction: constant for directional, normalized
    (light_pos - pos) for point lights (CSRayMarch.hlsl:158-161)."""
    if not env.point_light:
        return env.light_dir
    d = env.light_pos - pos
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)


def face_visibility_in_graph(local_eye: jax.Array) -> jax.Array:
    """(6,) bool: face f visible iff the local eye is on its outward side
    (IsVisible, CSRayMarch.hlsl:69-74; the `_CPU_CUBE_FACE_CULL_ == 0` GPU
    test, done in-graph on TPU)."""
    comps = jnp.stack([local_eye[0], local_eye[0],
                       local_eye[1], local_eye[1],
                       local_eye[2], local_eye[2]])
    odd = jnp.asarray([False, True, False, True, False, True])
    return jnp.where(odd, comps > -1.0, comps < 1.0)


def local_to_tex(pos: jax.Array) -> jax.Array:
    """Local space [-1,1]^3 -> texture space [0,1]^3 (RayMarch.hlsli:188-195)."""
    return pos * 0.5 + 0.5


def get_step(d_density, transm, density, step_scale):
    """Adaptive step controller (RayMarch.hlsli:200-210).

    factor_ev is written as division by a clamped denominator rather than
    `min(1/256/|dd|, 2)`: bit-identical values everywhere (the clamp bound
    1/512 and the cap 2 are exact powers of two), but the reverse-mode
    cotangent stays finite at dd == 0 where the naive form's masked
    `inf * 0` poisons gradients (tests/test_adjoint.py)."""
    factor_ev = (1.0 / 256.0) / jnp.maximum(jnp.abs(d_density), 1.0 / 512.0)
    factor_ui = jnp.minimum(1.0 - density, 1.0)
    factor_th = 1.0 - transm
    return step_scale * jnp.maximum(1.5 * factor_ev * factor_ui * factor_th, 1.0)


def density_gradient(grid: jax.Array, uvw: jax.Array) -> jax.Array:
    """6-tap density gradient (RayMarch.hlsli:73-95).

    grid: (C, Z, Y, X) whose last channel is density; uvw (..., 3).
    Offsets are in texels, matching SampleLevel's integer-offset form.
    Returns (..., 3) unnormalized gradient (+x, +y, +z differences).
    """
    z, y, x = grid.shape[-3:]
    texel = jnp.asarray([1.0 / x, 1.0 / y, 1.0 / z], uvw.dtype)
    density = grid[-1:]

    def tap(offset):
        return trilinear_sample(density, uvw + texel * jnp.asarray(offset, uvw.dtype))[0]

    gx = tap([1, 0, 0]) - tap([-1, 0, 0])
    gy = tap([0, 1, 0]) - tap([0, -1, 0])
    gz = tap([0, 0, 1]) - tap([0, 0, -1])
    return jnp.stack([gx, gy, gz], axis=-1)


def unproject_z(depth, z_near: float, z_far: float):
    """Clip-space depth -> linear view-space z (UnprojectZ, PSCube.hlsli:31-36)."""
    return (z_near * z_far) / (depth * (z_near - z_far) + z_far)


def get_t_max(clip_xy: jax.Array, clip_z: jax.Array, origin: jax.Array,
              ray_dir: jax.Array, params: SceneParams) -> jax.Array:
    """Occluded end point from a scene depth value (GetTMax,
    RayMarch.hlsli:100-114, the `_HAS_DEPTH_MAP_` path): unproject the
    clip-space position to local space and return its ray parameter;
    far-plane depths are unoccluded (FLT_MAX).

    The reference's max((pos - origin) / rayDir) is 0/0-fragile for
    axis-aligned rays (NaN) and amplifies unprojection rounding by
    1/|dir| on near-zero components; since pos lies on the ray (it is the
    unprojection of a point sampled along it), the projection onto the unit
    direction is the same parameter, robustly."""
    from fluidx12_tpu.ops.transform import transform_ndc

    pos = transform_ndc(clip_xy, clip_z[..., None], params.world_view_proj_i)
    t_max = jnp.sum((pos - origin) * ray_dir, axis=-1)
    return jnp.where(clip_z >= 1.0, jnp.asarray(jnp.inf, t_max.dtype), t_max)


def shadow_test(world_pos: jax.Array, shadow_map: jax.Array,
                shadow_view_proj: jax.Array, bias: float = 0.0027) -> jax.Array:
    """PCF comparison sample of an ortho shadow map (ShadowTest,
    RayMarch.hlsli:121-131, the `_HAS_SHADOW_MAP_` path): project into
    light clip space and bilinearly filter the per-tap comparison
    (depth >= ref - bias), the software form of SampleCmpLevelZero."""
    from fluidx12_tpu.ops.transform import transform_point_h

    ls = transform_point_h(world_pos, shadow_view_proj)[..., :3]  # ortho: no /w
    u = ls[..., 0] * 0.5 + 0.5
    v = 1.0 - (ls[..., 1] * 0.5 + 0.5)
    ref = ls[..., 2] - bias

    h, w = shadow_map.shape
    tu = u * w - 0.5
    tv = v * h - 0.5
    u0 = jnp.clip(jnp.floor(tu).astype(jnp.int32), 0, w - 1)
    v0 = jnp.clip(jnp.floor(tv).astype(jnp.int32), 0, h - 1)
    u1 = jnp.minimum(u0 + 1, w - 1)
    v1 = jnp.minimum(v0 + 1, h - 1)
    fu = jnp.clip(tu - u0, 0.0, 1.0)
    fv = jnp.clip(tv - v0, 0.0, 1.0)
    flat = shadow_map.reshape(-1)

    def cmp(vv, uu):
        d = jnp.take(flat, (vv * w + uu).reshape(-1), axis=0).reshape(uu.shape)
        return (d >= ref).astype(ref.dtype)

    top = cmp(v0, u0) * (1.0 - fu) + cmp(v0, u1) * fu
    bot = cmp(v1, u0) * (1.0 - fu) + cmp(v1, u1) * fu
    return top * (1.0 - fv) + bot * fv


def compute_ray_origin(origin: jax.Array, ray_dir: jax.Array):
    """Clip ray origins to the box entry face (RayMarch.hlsli:146-173).

    origin, ray_dir: (..., 3).  Returns (entry_pos, is_hit): origins already
    inside the box pass through unchanged.
    """
    inside = jnp.all(jnp.abs(origin) <= 1.0, axis=-1)

    big = jnp.asarray(3.4e38, origin.dtype)
    u_best = jnp.full(origin.shape[:-1], big, origin.dtype)
    hit = jnp.zeros(origin.shape[:-1], bool)
    for i in range(3):
        j, k = (i + 1) % 3, (i + 2) % 3
        u = (-jnp.sign(ray_dir[..., i]) - origin[..., i]) / ray_dir[..., i]
        ok = (u >= 0.0)
        ok &= jnp.abs(ray_dir[..., j] * u + origin[..., j]) <= 1.0
        ok &= jnp.abs(ray_dir[..., k] * u + origin[..., k]) <= 1.0
        better = ok & (u < u_best)
        u_best = jnp.where(better, u, u_best)
        hit |= better

    u_best = jnp.where(inside, 0.0, u_best)
    entry = jnp.clip(ray_dir * u_best[..., None] + origin, -1.0, 1.0)
    entry = jnp.where(inside[..., None], origin, entry)
    return entry, hit | inside


def compute_target_hit(origin: jax.Array, target: jax.Array, ray_dir: jax.Array) -> jax.Array:
    """t at which the ray reaches the target's face plane (RayMarch.hlsli:178-183)."""
    u = (target - origin) / ray_dir
    return jnp.max(u, axis=-1)


def cast_light_ray(
    density: jax.Array,
    transm0: jax.Array,
    origin: jax.Array,
    ray_dir: jax.Array,
    step_scale: jax.Array,
    max_samples: int,
    num_samples: jax.Array,
    config: FluidConfig,
) -> jax.Array:
    """Transmittance along a secondary ray (CastLightRay, RayMarch.hlsli:215-247).

    density: (1, Z, Y, X) density channel; origin (..., 3) local space;
    ray_dir (..., 3) or (3,); step_scale scalar; num_samples dynamic scalar.
    Returns attenuated transmittance (...,).
    """
    absorb = config.absorption
    zero = config.zero_threshold
    ray_dir = jnp.broadcast_to(ray_dir, origin.shape)

    def body(i, carry):
        t, transm, prev_density, alive = carry
        alive = alive & (i < num_samples)
        pos = origin + ray_dir * t[..., None]
        inside = jnp.all(jnp.abs(pos) <= 1.0, axis=-1)
        alive = alive & inside
        d = trilinear_sample(density, local_to_tex(pos))[0]
        d_density = d - prev_density
        new_step = get_step(d_density, transm, d, step_scale)
        transm_new = jnp.where(alive, transm * (1.0 - d * absorb), transm)
        alive = alive & (transm_new >= zero)
        t_new = jnp.where(alive, t + new_step, t)
        prev_new = jnp.where(alive, d, prev_density)
        return t_new, transm_new, prev_new, alive

    t0 = jnp.full(origin.shape[:-1], step_scale, origin.dtype)
    prev0 = jnp.zeros(origin.shape[:-1], origin.dtype)
    alive0 = transm0 >= zero  # ref: shadow-map pre-test guard (RayMarch.hlsli:268)
    # lax.scan over an index iota, not fori_loop: the same rolled XLA loop,
    # but reverse-mode differentiable (tests/test_adjoint.py renders with
    # jax.grad through the faithful marcher).
    (_, transm, _, _), _ = jax.lax.scan(
        lambda c, i: (body(i, c), None),
        (t0, transm0, prev0, alive0), jnp.arange(max_samples))
    return transm


def eval_light_merged(
    grid: jax.Array,
    pos: jax.Array,
    env: LightEnv,
    light_step: jax.Array,
    max_light_samples: int,
    num_light_samples: jax.Array,
    config: FluidConfig,
) -> jax.Array:
    """Per-sample lighting in merged mode (GetLight, RayMarch.hlsli:261-295):
    shadow ray toward the light + (optionally) SH irradiance with an AO ray.
    With a shadow map attached, the map's comparison result seeds the light
    ray's transmittance (RayMarch.hlsli:263-269: ShadowTest then
    CastLightRay only while shadow > ZERO_THRESHOLD -- cast_light_ray's
    alive0 mask implements exactly that guard)."""
    density = grid[-1:]
    ones = jnp.ones(pos.shape[:-1], pos.dtype)
    shadow0 = ones
    if env.shadow_map is not None:
        from fluidx12_tpu.ops.transform import transform_point_h

        world_pos = transform_point_h(pos, env.world44)[..., :3]
        shadow0 = shadow_test(world_pos, env.shadow_map, env.shadow_view_proj)
    light_dir = light_direction_at(env, pos)
    shadow = cast_light_ray(
        density, shadow0, pos, light_dir, light_step,
        max_light_samples, num_light_samples, config,
    )

    light = env.light_color * shadow[..., None]
    if env.has_probe:
        uvw = local_to_tex(pos)
        grad = -density_gradient(grid, uvw)
        # Avoid 0-gradient in uniform regions (RayMarch.hlsli:279).
        degenerate = jnp.all(grad == 0.0, axis=-1, keepdims=True)
        grad = jnp.where(degenerate, pos, grad)
        world_dir = transform_vector(grad, env.world3x3)
        world_dir = world_dir / jnp.maximum(jnp.linalg.norm(world_dir, axis=-1, keepdims=True), 1e-12)
        irradiance = evaluate_sh_irradiance(env.sh_coeffs, world_dir)
        grad_n = grad / jnp.maximum(jnp.linalg.norm(grad, axis=-1, keepdims=True), 1e-12)
        ao = cast_light_ray(
            density, ones, pos, grad_n, light_step,
            max_light_samples, num_light_samples, config,
        )
        ambient = irradiance * ao[..., None]
    else:
        ambient = env.ambient
    return light + ambient


def view_march(
    grid: jax.Array,
    origin: jax.Array,
    ray_dir: jax.Array,
    t_max: jax.Array,
    num_samples: jax.Array,
    env: LightEnv,
    config: FluidConfig,
    light_map: Optional[jax.Array] = None,
    num_light_samples: Optional[jax.Array] = None,
    active: Optional[jax.Array] = None,
) -> jax.Array:
    """Primary view-ray march (CSRayMarch.hlsl:141-193 / PSRayCast.hlsl:69-124).

    grid: (4, Z, Y, X) premultiplied RGBA volume.
    origin/ray_dir: (..., 3) local-space entry points and directions.
    t_max: (...,) exit distance (inf for screen-space marching without depth).
    light_map: (3, Z, Y, X) => separate-light mode (`_LIGHT_PASS_`); otherwise
        merged mode computes shadow/GI per sample.
    active: (...,) optional ray mask (invisible faces, missed boxes).
    Returns (..., 4) premultiplied in-scattered radiance (already / 2 pi).
    """
    absorb = config.absorption
    zero = config.zero_threshold
    dtype = origin.dtype
    step_scale = MAX_DIST / num_samples.astype(dtype)
    light_step = (
        MAX_DIST / num_light_samples.astype(dtype) if num_light_samples is not None else None
    )

    if active is None:
        active = jnp.ones(origin.shape[:-1], bool)

    def body(i, carry):
        t, scatter, prev_density, alive = carry
        alive = alive & (i < num_samples)
        pos = origin + ray_dir * t[..., None]
        inside = jnp.all(jnp.abs(pos) <= 1.0, axis=-1)
        alive = alive & inside

        uvw = local_to_tex(pos)
        color = jnp.moveaxis(trilinear_sample(grid, uvw), 0, -1)  # (..., 4)
        dense = color[..., 3] > zero
        hit = alive & dense

        if light_map is not None:
            light = jnp.moveaxis(trilinear_sample(light_map, uvw), 0, -1)
        else:
            light = eval_light_merged(
                grid, pos, env, light_step,
                config.max_light_samples, num_light_samples, config,
            )

        transm = 1.0 - scatter[..., 3]
        d_density = color[..., 3] - prev_density
        adaptive = get_step(d_density, transm, color[..., 3], step_scale)
        new_step = jnp.where(hit, adaptive, step_scale)

        rgb = color[..., :3]
        if not config.pre_multiplied:
            rgb = rgb * color[..., 3:4]
        contrib = jnp.concatenate([rgb * light, color[..., 3:4]], axis=-1)
        contrib = contrib * (absorb * transm)[..., None]
        scatter = jnp.where(hit[..., None], scatter + contrib, scatter)

        # Opacity early-out happens only on dense samples (CSRayMarch.hlsl:186).
        transm_after = 1.0 - scatter[..., 3]
        alive = alive & ~(hit & (transm_after < zero))

        t_new = t + new_step
        alive = alive & (t_new <= t_max)
        t = jnp.where(alive, t_new, t)
        prev_density = jnp.where(hit, color[..., 3], prev_density)
        return t, scatter, prev_density, alive

    t0 = jnp.zeros(origin.shape[:-1], dtype)
    scatter0 = jnp.zeros(origin.shape[:-1] + (4,), dtype)
    prev0 = jnp.zeros(origin.shape[:-1], dtype)
    # Scan form for reverse-mode differentiability (see cast_light_ray).
    (_, scatter, _, _), _ = jax.lax.scan(
        lambda c, i: (body(i, c), None),
        (t0, scatter0, prev0, active), jnp.arange(config.max_ray_samples))
    scatter = scatter.at[..., :3].multiply(1.0 / (2.0 * jnp.pi))
    return jnp.where(active[..., None], scatter, 0.0)
