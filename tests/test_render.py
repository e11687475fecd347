"""Render-path tests on tiny configs: analytic transmittance, path cross-checks."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from fluidx12_tpu.core.config import FluidConfig, RenderMethod
from fluidx12_tpu.core.state import default_scene_params
from fluidx12_tpu.core import math3d as m3
from fluidx12_tpu.core.camera import OrbitCamera
from fluidx12_tpu.render.raymarch_core import (
    cast_light_ray,
    compute_ray_origin,
    make_light_env,
)
from fluidx12_tpu.render.cubemap import ray_march_cube
from fluidx12_tpu.render.lightmap import render_light_map
from fluidx12_tpu.render.raycast import ray_cast_direct
from fluidx12_tpu.render.resolve import resolve_cube


def tiny_config(**kw):
    base = dict(
        grid_size=(16, 16, 16),
        viewport=(48, 48),
        max_ray_samples=48,
        max_light_samples=16,
        quantize_cube_map=False,
    )
    base.update(kw)
    return FluidConfig(**base)


def scene(cfg):
    cam = OrbitCamera(width=cfg.viewport[0], height=cfg.viewport[1])
    world = m3.scaling(cfg.volume_scale)
    world_i = m3.inverse(world)
    wvp = world @ cam.view_proj
    p = default_scene_params(cfg)
    return p._replace(
        eye_pt=jnp.asarray(cam.eye),
        world=jnp.asarray(world),
        world_i=jnp.asarray(world_i),
        world_view_proj=jnp.asarray(wvp),
        world_view_proj_i=jnp.asarray(m3.inverse(wvp)),
        screen_to_world=jnp.asarray(m3.inverse(cam.view_proj)),
        num_samples=jnp.int32(cfg.max_ray_samples),
        num_light_samples=jnp.int32(cfg.max_light_samples),
    )


def test_compute_ray_origin_inside_and_outside():
    origin = jnp.asarray(np.array([[0.0, 0.0, 0.0], [0.0, 0.0, -5.0], [0.0, 5.0, 0.0]], np.float32))
    rd = jnp.asarray(np.array([[0, 0, 1.0], [0, 0, 1.0], [0, 0, 1.0]], np.float32))
    entry, hit = compute_ray_origin(origin, rd)
    entry = np.asarray(entry)
    hit = np.asarray(hit)
    assert hit[0] and hit[1] and not hit[2]
    np.testing.assert_allclose(entry[0], [0, 0, 0], atol=1e-6)       # inside: unchanged
    np.testing.assert_allclose(entry[1], [0, 0, -1.0], atol=1e-6)    # clipped to face


def test_light_ray_transmittance_matches_closed_form():
    # Uniform density d: each step multiplies by (1 - d * ABSORPTION).
    cfg = tiny_config()
    d = 0.2
    density = jnp.full((1, 16, 16, 16), d, jnp.float32)
    # Ray along +x from the box center: path length 1 (half box) in local space.
    origin = jnp.asarray(np.zeros((1, 3), np.float32))
    rd = jnp.asarray(np.array([[1.0, 0, 0]], np.float32))
    n = 16
    step = float(2 * np.sqrt(3) / n)
    transm = np.asarray(
        cast_light_ray(
            density, jnp.ones(1, jnp.float32), origin, rd,
            jnp.float32(step), n, jnp.int32(n), cfg,
        )
    )[0]
    # Adaptive stepping with uniform density: dDensity = 0 after the first
    # sample => factorEv = 2 capped; number of attenuations = steps until exit.
    # Expected within the bracket of (1-d*0.8)^k for k in [2, n].
    lo, hi = (1 - d * 0.8) ** n, (1 - d * 0.8) ** 2
    assert lo <= transm <= hi


def test_raycast_empty_volume_is_transparent():
    cfg = tiny_config()
    grid = jnp.zeros((4, 16, 16, 16), jnp.float32)
    params = scene(cfg)
    img = np.asarray(ray_cast_direct(grid, params, cfg))
    np.testing.assert_allclose(img, 0.0, atol=1e-6)


def test_raycast_sees_centered_blob():
    cfg = tiny_config()
    grid = np.zeros((4, 16, 16, 16), np.float32)
    grid[:, 6:10, 6:10, 6:10] = 0.8  # premultiplied grey blob
    params = scene(cfg)
    img = np.asarray(ray_cast_direct(jnp.asarray(grid), params, cfg))
    h, w = cfg.viewport[1], cfg.viewport[0]
    center = img[h // 2 - 4 : h // 2 + 4, w // 2 - 4 : w // 2 + 4]
    corner = img[:4, :4]
    assert center[..., 3].max() > 0.2       # alpha accumulated in the middle
    assert corner[..., 3].max() < 1e-4      # corners miss the blob
    assert np.isfinite(img).all()


def test_resolve_screen_rect_matches_full_frame():
    """resolve_cube with the host-static screen bbox (core.lod.screen_bbox)
    must reproduce the full-frame resolve exactly: in-rect pixel centers are
    computed from global indices (bitwise-equal uv), and every hit pixel
    lies inside the rect (the bbox bounds the silhouette)."""
    from fluidx12_tpu.core.lod import screen_bbox

    cfg = tiny_config(viewport=(64, 48))
    rng = np.random.default_rng(1)
    grid = np.zeros((4, 16, 16, 16), np.float32)
    grid[3, 4:12, 4:12, 4:12] = rng.uniform(0.2, 0.8, (8, 8, 8))
    grid[:3] = grid[3] * 0.5
    params = scene(cfg)

    cube = ray_march_cube(jnp.asarray(grid), params, cfg, lod=0)
    full = np.asarray(resolve_cube(cube, params, cfg))

    wvp = np.asarray(params.world_view_proj)
    rect = screen_bbox(wvp, cfg.viewport, quant=8)
    assert rect is not None, "default orbit camera: volume is on-screen"
    x0, y0, rw, rh = rect
    assert rw < cfg.viewport[0] or rh < cfg.viewport[1]
    got = np.asarray(resolve_cube(cube, params, cfg, rect=rect))
    np.testing.assert_array_equal(got, full)

    # Containment: nothing resolves outside the rect in the full frame.
    mask = np.zeros(full.shape[:2], bool)
    mask[y0:y0 + rh, x0:x0 + rw] = True
    assert (full[~mask] == 0).all()


def test_direct_warp_screen_rect_matches_full_frame():
    """The DIRECT fast path's projective warp honors the same static rect."""
    from fluidx12_tpu.core.lod import screen_bbox
    from fluidx12_tpu.render.lightmap_sweep import render_light_map_fast
    from fluidx12_tpu.render.screencomp import (
        direct_plane_spec,
        ray_cast_direct_fast,
    )
    from fluidx12_tpu.ops.transform import transform_point_h

    cfg = tiny_config(viewport=(64, 48))
    rng = np.random.default_rng(2)
    grid = np.zeros((4, 16, 16, 16), np.float32)
    grid[3, 4:12, 4:12, 4:12] = rng.uniform(0.2, 0.8, (8, 8, 8))
    grid[:3] = grid[3] * 0.5
    params = scene(cfg)
    wvp = np.asarray(params.world_view_proj)
    local_eye = np.asarray(
        transform_point_h(np.asarray(params.eye_pt), np.asarray(params.world_i)))[:3]
    spec = direct_plane_spec(local_eye, wvp, cfg.viewport, cfg)
    assert spec is not None
    lm = render_light_map_fast(jnp.asarray(grid), params, cfg)
    num = jnp.int32(cfg.max_ray_samples)
    full = np.asarray(ray_cast_direct_fast(
        jnp.asarray(grid), params, cfg, lm, spec, num))
    rect = screen_bbox(wvp, cfg.viewport, quant=8)
    got = np.asarray(ray_cast_direct_fast(
        jnp.asarray(grid), params, cfg, lm, spec, num, rect=rect))
    np.testing.assert_array_equal(got, full)


def test_cubemap_march_plus_resolve_approximates_direct():
    # The paper's claim: cube-map-space marching + AA resolve ~ direct marching.
    cfg = tiny_config()
    rng = np.random.default_rng(0)
    grid = np.zeros((4, 16, 16, 16), np.float32)
    blob = rng.uniform(0.2, 0.7, (6, 6, 6)).astype(np.float32)
    grid[3, 5:11, 5:11, 5:11] = blob
    grid[:3, 5:11, 5:11, 5:11] = blob * 0.6
    params = scene(cfg)

    cube = ray_march_cube(jnp.asarray(grid), params, cfg, lod=0)
    resolved = np.asarray(resolve_cube(cube, params, cfg))
    direct = np.asarray(ray_cast_direct(jnp.asarray(grid), params, cfg))

    # Same silhouette: alpha masks overlap strongly.
    a1 = resolved[..., 3] > 0.05
    a2 = direct[..., 3] > 0.05
    inter = (a1 & a2).sum()
    union = (a1 | a2).sum()
    assert union > 0 and inter / union > 0.6
    # Comparable energy.
    e1, e2 = resolved[..., 3].sum(), direct[..., 3].sum()
    assert 0.5 < e1 / e2 < 2.0


def test_separate_light_path_matches_merged_roughly():
    cfg = tiny_config()
    grid = np.zeros((4, 16, 16, 16), np.float32)
    grid[3, 6:10, 6:10, 6:10] = 0.5
    grid[:3, 6:10, 6:10, 6:10] = 0.3
    params = scene(cfg)
    g = jnp.asarray(grid)

    lm = render_light_map(g, params, cfg)
    assert np.isfinite(np.asarray(lm)).all()
    img_sep = np.asarray(ray_cast_direct(g, params, cfg, light_map=lm))
    img_merged = np.asarray(ray_cast_direct(g, params, cfg))
    # Both paths light the same silhouette with comparable intensity.
    m1 = img_sep[..., 3] > 0.05
    m2 = img_merged[..., 3] > 0.05
    assert (m1 == m2).mean() > 0.95
    r1 = img_sep[m1, 0].mean()
    r2 = img_merged[m2, 0].mean()
    assert 0.5 < r1 / r2 < 2.0


def test_lightmap_shadow_gradient_along_light_dir():
    # Light at (75, 75, -75): voxels on the lit corner receive more light
    # than voxels shadowed behind the dense cube.
    cfg = tiny_config()
    grid = np.zeros((4, 16, 16, 16), np.float32)
    # Thin participating medium everywhere (empty voxels skip the march,
    # CSRayMarchL.hlsl:43) plus a dense occluder cube in the middle.
    grid[3, :, :, :] = 0.02
    grid[3, 6:10, 6:10, 6:10] = 0.95
    params = scene(cfg)
    lm = np.asarray(render_light_map(jnp.asarray(grid), params, cfg))  # (3, Z, Y, X)
    # light dir ~ normalize(1, 1, -1) in local space: toward +x, +y, -z.
    lit = lm[0, 2, 13, 13]       # corner voxel facing the light
    shadowed = lm[0, 13, 2, 2]   # opposite corner, behind the dense cube
    assert lit > shadowed * 1.2


def test_face_cull_modes_agree():
    import dataclasses
    from fluidx12_tpu.core.config import FaceCullMode
    from fluidx12_tpu.render.lightmap import render_light_map

    cfg_mask = tiny_config()
    cfg_none = dataclasses.replace(cfg_mask, face_cull=FaceCullMode.NONE)
    grid = np.zeros((4, 16, 16, 16), np.float32)
    grid[3, 6:10, 6:10, 6:10] = 0.5
    grid[:3, 6:10, 6:10, 6:10] = 0.3
    g = jnp.asarray(grid)
    params = scene(cfg_mask)
    lm = render_light_map(g, params, cfg_mask)
    c_mask = np.asarray(ray_march_cube(g, params, cfg_mask, light_map=lm))
    c_none = np.asarray(ray_march_cube(g, params, cfg_none, light_map=lm))
    np.testing.assert_allclose(c_mask, c_none, atol=1e-6)


def test_point_light_mode_differs_sensibly():
    # _POINT_LIGHT_ analog: a point light at the reference light position
    # must produce a different (but finite) light map than directional mode,
    # with empty voxels still fully lit.
    cfg_dir = tiny_config()
    cfg_pt = dataclasses.replace(cfg_dir, point_light=True)
    grid = np.zeros((4, 16, 16, 16), np.float32)
    grid[3, 6:10, 6:10, 6:10] = 0.9
    g = jnp.asarray(grid)
    params = scene(cfg_dir)
    lm_dir = np.asarray(render_light_map(g, params, cfg_dir))
    lm_pt = np.asarray(render_light_map(g, params, cfg_pt))
    assert np.isfinite(lm_pt).all()
    assert np.abs(lm_pt - lm_dir).max() > 1e-3
    # Empty corner voxel: full light either way.
    np.testing.assert_allclose(lm_pt[:, 0, 0, 0], lm_dir[:, 0, 0, 0], atol=1e-5)


def test_blocked_resolve_matches_per_pixel_cast():
    # cube_cast_blocked (one record gather per 2x2 pixel block) must equal
    # cube_cast exactly on blocks whose four pixels share one face, and stay
    # close in the thin cube-seam band where it blends via the seamless
    # unfold instead of the per-face edge clamp.
    import jax
    from fluidx12_tpu.ops.transform import transform_point_h
    from fluidx12_tpu.render import resolve as R
    from fluidx12_tpu.utils.image import quantize_unorm8

    cfg = tiny_config(viewport=(64, 64), quantize_cube_map=True)
    params = scene(cfg)
    S = cfg.cube_map_size
    rng = np.random.default_rng(3)
    base = rng.random((6, S, S, 4), np.float32)
    for _ in range(2):  # smooth; faces stay mutually independent (worst case)
        base = 0.5 * (base + np.roll(base, 1, axis=2))
    cube = quantize_unorm8(jnp.asarray(base))

    h, w = cfg.viewport[1], cfg.viewport[0]
    ju = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    jv = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    vv, uu = jnp.meshgrid(jv, ju, indexing="ij")
    pos = R._texcoord_to_local(params, jnp.stack([uu, vv], axis=-1))
    eye = transform_point_h(params.eye_pt, params.world_i)[:3]
    rd = pos - eye
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    hit_pos, plane, is_hit = R._compute_ray_hit(pos, rd)
    face, u, v = R._cube_texcoord(hit_pos, plane)
    face = jnp.where(is_hit, face, 0)

    a = np.asarray(R.cube_cast(cube, face, u, v, hit_pos, rd))
    b = np.asarray(R.cube_cast_blocked(cube, face, u, v, hit_pos, is_hit))
    hit = np.asarray(is_hit)
    d = np.abs(a - b).max(axis=-1) * hit

    fb = np.asarray(face).reshape(h // 2, 2, w // 2, 2)
    hb = hit.reshape(h // 2, 2, w // 2, 2)
    interior = (fb == fb[:, :1, :, :1]).all(axis=(1, 3)) & hb.all(axis=(1, 3))
    # Blocks whose bilinear footprints fit the shared 4x4 window: integer
    # texel spread <= 2 on both axes (beyond that -- extreme grazing
    # minification -- the window clamps and the result blurs instead of
    # aliasing).
    tu = np.floor(np.asarray(u).reshape(h // 2, 2, w // 2, 2) * S - 0.5)
    tv = np.floor(np.asarray(v).reshape(h // 2, 2, w // 2, 2) * S - 0.5)
    narrow = interior & (tu.max(axis=(1, 3)) - tu.min(axis=(1, 3)) <= 2) \
                      & (tv.max(axis=(1, 3)) - tv.min(axis=(1, 3)) <= 2)
    narrow_px = np.repeat(np.repeat(narrow, 2, 0), 2, 1)
    assert narrow_px.sum() > 0.5 * hit.sum()
    assert d[narrow_px].max() <= 1e-5
    # Seam + grazing bands: bounded deviation on a small fraction of pixels.
    assert d.max() <= 0.75
    assert (d > 2 / 255).sum() <= 0.08 * hit.sum()


def test_depth_map_bounds_direct_march():
    """`_HAS_DEPTH_MAP_` (PSRayCast.hlsl:30-35, :52-56): a near depth plane
    over half the screen truncates those rays' marches."""
    import jax.numpy as jnp
    from tests.test_fastpath import _smoke_grid

    cfg = tiny_config()
    grid = jnp.asarray(_smoke_grid())
    params = scene(cfg)
    lm = render_light_map(grid, params, cfg)
    h, w = cfg.viewport[1], cfg.viewport[0]

    far = jnp.ones((h, w), jnp.float32)          # no occluder
    near = far.at[:, : w // 2].set(0.05)         # geometry close to the camera
    img_free = np.asarray(ray_cast_direct(grid, params, cfg, light_map=lm,
                                          depth_map=far))
    img_occl = np.asarray(ray_cast_direct(grid, params, cfg, light_map=lm,
                                          depth_map=near))
    img_none = np.asarray(ray_cast_direct(grid, params, cfg, light_map=lm))
    # Far-plane depth == unbounded march.
    np.testing.assert_allclose(img_free, img_none, atol=1e-6)
    # The occluded half loses smoke alpha; the free half is untouched.
    assert img_occl[:, w // 2:, 3].sum() == img_free[:, w // 2:, 3].sum()
    assert img_occl[:, : w // 2, 3].sum() < img_free[:, : w // 2, 3].sum() - 1.0


def test_shadow_map_darkens_light_map():
    """`_HAS_SHADOW_MAP_` (CSRayMarchL.hlsl:28-33, RayMarch.hlsli:121-131):
    an all-blocking ortho shadow map zeroes the direct term, an all-open one
    reproduces the unshadowed map."""
    import jax.numpy as jnp
    from tests.test_fastpath import _smoke_grid
    from fluidx12_tpu.core import math3d as m3

    cfg = tiny_config()
    grid = jnp.asarray(_smoke_grid())
    params = scene(cfg)
    # Identity light view-proj: world xy in [-1,1] maps onto the map; depth
    # compare against world z.
    svp = jnp.eye(4, dtype=jnp.float32)
    open_map = jnp.full((32, 32), 1e6, jnp.float32)   # depth >= ref everywhere
    block_map = jnp.full((32, 32), -1e6, jnp.float32)  # fails everywhere

    lm_plain = np.asarray(render_light_map(grid, params, cfg))
    lm_open = np.asarray(render_light_map(grid, params, cfg,
                                          shadow_map=open_map, shadow_view_proj=svp))
    lm_block = np.asarray(render_light_map(grid, params, cfg,
                                           shadow_map=block_map, shadow_view_proj=svp))
    np.testing.assert_allclose(lm_open, lm_plain, atol=1e-5)
    # Fully shadowed: only the ambient term remains.
    ambient = np.asarray(params.ambient[:3] * params.ambient[3])
    np.testing.assert_allclose(
        lm_block, np.broadcast_to(ambient[:, None, None, None], lm_block.shape),
        atol=1e-5)


def test_depth_aware_cube_resolve():
    """`_HAS_DEPTH_MAP_` cube path (CSRayMarch.hlsl:121-125 + PSCube.hlsli:
    82-118): far-plane depth reproduces the plain resolve; a near occluder
    empties the cube on those rays."""
    import jax.numpy as jnp
    from tests.test_fastpath import _smoke_grid
    from fluidx12_tpu.render.cubemap import ray_march_cube

    cfg = tiny_config()
    grid = jnp.asarray(_smoke_grid())
    params = scene(cfg)
    lm = render_light_map(grid, params, cfg)
    h, w = cfg.viewport[1], cfg.viewport[0]
    far = jnp.ones((h, w), jnp.float32)

    cube_plain = ray_march_cube(grid, params, cfg, light_map=lm)
    cube_d, cube_depth = ray_march_cube(grid, params, cfg, light_map=lm,
                                        depth_map=far)
    np.testing.assert_allclose(np.asarray(cube_d), np.asarray(cube_plain), atol=1e-6)
    img_plain = np.asarray(resolve_cube(cube_plain, params, cfg))
    img_depth = np.asarray(resolve_cube(cube_d, params, cfg,
                                        cube_depth=cube_depth, depth_map=far))
    # Uniform far depth: bilateral weights are uniform -> same image.
    np.testing.assert_allclose(img_depth, img_plain, atol=2e-2)

    near = jnp.full((h, w), 0.05, jnp.float32)
    cube_n, cube_depth_n = ray_march_cube(grid, params, cfg, light_map=lm,
                                          depth_map=near)
    assert np.asarray(cube_n)[..., 3].sum() < np.asarray(cube_plain)[..., 3].sum() - 1.0


def test_ao_levels_gate_and_quarter_bound():
    """Quarter-res AO on big grids (VERDICT r3 item 2): the gate picks
    2 levels only at >= 256 per axis, and the quarter-res field stays
    close to the half-res reference on a plume-like density (occlusion is
    an integral, low-frequency quantity)."""
    from fluidx12_tpu.render.lightmap_sweep import (
        _ambient_occlusion, _ao_levels)
    from fluidx12_tpu.render.raymarch_core import MAX_DIST

    assert _ao_levels((256, 256, 256)) == 2
    assert _ao_levels((128, 128, 128)) == 1
    assert _ao_levels((150, 150, 150)) == 1  # FluidGI preset: half-res
    assert _ao_levels((24, 24, 24)) == 0

    n = 64
    cfg = FluidConfig(grid_size=(n, n, n), has_light_probe=True)
    ii = (np.arange(n, dtype=np.float32) + 0.5) / n
    z, y, x = np.meshgrid(ii, ii, ii, indexing="ij")
    d2 = (x - 0.5) ** 2 + (y - 0.35) ** 2 + (z - 0.5) ** 2
    density = jnp.asarray(np.exp(-60.0 * d2).astype(np.float32))
    ref_step = MAX_DIST / 8.0
    ao_h = np.asarray(_ambient_occlusion(
        density, None, None, None, ref_step, cfg, levels=1))
    ao_q = np.asarray(_ambient_occlusion(
        density, None, None, None, ref_step, cfg, levels=2))
    err = np.abs(ao_q - ao_h)
    assert err.mean() < 0.02 and err.max() < 0.3, (err.mean(), err.max())


def test_sharded_ao_gate_matches_quarter_choice():
    """The sharded light gate must reject layouts whose local slab cannot
    reproduce the replicated AO resolution choice (here: quarter at 256^3
    needs zl % 4 == 0)."""
    from fluidx12_tpu.parallel.light import sharded_light_supported

    cfg = FluidConfig(grid_size=(256, 256, 256), has_light_probe=True)
    assert sharded_light_supported(cfg, 8)      # zl = 32: quarter-capable
    assert not sharded_light_supported(cfg, 128)  # zl = 2: cannot quarter
