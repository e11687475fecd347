"""TPU-native fast paths vs the faithful gather-based reference paths.

This is the framework's own "dual-stack" cross-check (the analog of the
reference's Core-vs-EZ toggle, SURVEY.md section 4.2): the slice-sweep light
map and the slice-compositing cube marcher must agree with the per-ray
marchers within sampling tolerance.
"""

import numpy as np
import jax.numpy as jnp

from fluidx12_tpu.core.config import FluidConfig
from fluidx12_tpu.render.lightmap import render_light_map
from fluidx12_tpu.render.lightmap_sweep import (
    directional_transmittance,
    render_light_map_fast,
)
from fluidx12_tpu.render.cubemap import ray_march_cube
from fluidx12_tpu.render.slicecomp import ray_march_cube_fast
from fluidx12_tpu.render.resolve import resolve_cube
from tests.test_render import scene, tiny_config


def _smoke_grid(n=16, seed=0):
    rng = np.random.default_rng(seed)
    grid = np.zeros((4, n, n, n), np.float32)
    c = n // 2
    blob = rng.uniform(0.1, 0.8, (n // 2, n // 2, n // 2)).astype(np.float32)
    # smooth it so gradients are sane
    for ax in range(3):
        blob = (np.roll(blob, 1, ax) + blob + np.roll(blob, -1, ax)) / 3.0
    sl = slice(c - n // 4, c + n // 4)
    grid[3, sl, sl, sl] = blob
    grid[0, sl, sl, sl] = blob * 0.5
    grid[1, sl, sl, sl] = blob * 0.6
    grid[2, sl, sl, sl] = blob * 0.8
    return grid


def test_directional_transmittance_axis_aligned_exact():
    # Light along +y exactly: the sweep must match a direct cumulative product.
    n = 16
    cfg = tiny_config()
    density = np.zeros((n, n, n), np.float32)
    density[:, :, :] = 0.1
    ref_step = 2 * np.sqrt(3) / 16
    t = np.asarray(directional_transmittance(
        jnp.asarray(density), jnp.asarray([0.0, 1.0, 0.0], np.float32),
        1, jnp.float32(ref_step), 0.8,
    ))
    # Voxel at y index j: ray toward +y passes slices j+1..n-1, each with
    # path (2/n) local units => exponent per slice = (2/n)/ref_step.
    exp_per = (2.0 / n) / ref_step
    att = (1 - 0.1 * 0.8) ** exp_per
    for j in [0, 5, 14, 15]:
        expected = att ** (n - 1 - j)
        got = t[8, j, 8]
        np.testing.assert_allclose(got, expected, rtol=0.02, err_msg=f"j={j}")


def test_axis_aligned_sweep_fast_path_matches_general():
    """The cumsum-only axis_aligned branch must equal the general sheared
    sweep for an exactly axis-aligned light (where the shear weights are
    identity one-hots)."""
    n = 16
    d = np.asarray(_smoke_grid(n)[3])
    ref_step = jnp.float32(2 * np.sqrt(3) / 16)
    for ax, sgn in [(0, +1), (1, -1), (2, +1)]:
        ld = jnp.zeros(3, jnp.float32).at[ax].set(float(sgn))
        gen = np.asarray(directional_transmittance(
            jnp.asarray(d), ld, ax, ref_step, 0.8, flip=sgn > 0))
        fast = np.asarray(directional_transmittance(
            jnp.asarray(d), ld, ax, ref_step, 0.8, flip=sgn > 0,
            axis_aligned=True))
        np.testing.assert_allclose(fast, gen, atol=2e-5, err_msg=f"ax={ax}")


def test_fast_light_map_matches_faithful():
    cfg = tiny_config()
    grid = jnp.asarray(_smoke_grid())
    params = scene(cfg)
    slow = np.asarray(render_light_map(grid, params, cfg))
    fast = np.asarray(render_light_map_fast(grid, params, cfg))
    assert np.isfinite(fast).all()
    # Compare inside the volume where density is meaningful.
    d = np.asarray(grid[3])
    mask = d > 0.02
    rel = np.abs(fast[0][mask] - slow[0][mask]) / (np.abs(slow[0][mask]) + 1e-3)
    # Sampling patterns differ (slice midpoints vs fixed-step marching with
    # adaptive growth), so allow moderate pointwise tolerance; the mean must
    # be tight enough to catch a brightness regression (VERDICT r1 item 8).
    assert rel.mean() < 0.08, rel.mean()
    assert np.corrcoef(fast[0][mask], slow[0][mask])[0, 1] > 0.93


def test_lat_pooled_shadow_matches_full_res(monkeypatch):
    """The half-lateral-resolution shadow sweep (big-grid path, gated by
    _LAT_POOL_MIN) must track the full-res sweep closely -- shadow is an
    integral quantity, so 2x lateral box-pool + linear-up is a small
    perturbation on smooth densities."""
    import fluidx12_tpu.render.lightmap_sweep as ls

    cfg = tiny_config()
    grid = jnp.asarray(_smoke_grid(n=32))
    params = scene(cfg)
    full = np.asarray(render_light_map_fast(grid, params, cfg))
    monkeypatch.setattr(ls, "_LAT_POOL_MIN", 8)
    pooled = np.asarray(render_light_map_fast(grid, params, cfg))
    assert np.isfinite(pooled).all()
    d = np.asarray(grid[3])
    mask = d > 0.02
    rel = np.abs(pooled[0][mask] - full[0][mask]) / (np.abs(full[0][mask]) + 1e-3)
    assert rel.mean() < 0.05, rel.mean()
    assert np.corrcoef(pooled[0][mask], full[0][mask])[0, 1] > 0.97


def test_fast_point_light_map_matches_faithful():
    """Projective point-light sweep (lightmap_sweep.point_transmittance) vs
    the faithful per-voxel point-light marcher (_POINT_LIGHT_ semantics,
    RayMarch.hlsli:40: direction = normalize(light - pos) per voxel)."""
    import dataclasses
    from fluidx12_tpu.render.lightmap_sweep import point_sweep_supported

    cfg = dataclasses.replace(tiny_config(), point_light=True)
    assert point_sweep_supported(cfg)
    grid = jnp.asarray(_smoke_grid())
    params = scene(cfg)
    slow = np.asarray(render_light_map(grid, params, cfg))
    fast = np.asarray(render_light_map_fast(grid, params, cfg))
    assert np.isfinite(fast).all()
    d = np.asarray(grid[3])
    mask = d > 0.02
    rel = np.abs(fast[0][mask] - slow[0][mask]) / (np.abs(slow[0][mask]) + 1e-3)
    assert rel.mean() < 0.1, rel.mean()
    assert np.corrcoef(fast[0][mask], slow[0][mask])[0, 1] > 0.9


def test_point_light_rides_fast_engine_pipeline():
    """point_light=True with fast_render must run the sweep pipeline (no
    faithful fallback) for every render method and stay finite."""
    import dataclasses
    import jax
    from fluidx12_tpu.core.config import RenderMethod
    from fluidx12_tpu.engine.fluidx import FluidXEngine

    cfg = FluidConfig(grid_size=(16, 16, 16), viewport=(24, 24),
                      max_ray_samples=8, max_light_samples=4,
                      num_pressure_iters=4, point_light=True)
    engine = FluidXEngine(cfg)
    for method in (RenderMethod.RAY_MARCH_SEPARATE,
                   RenderMethod.RAY_MARCH_DIRECT_SEPARATE):
        engine.render_method = method
        img = np.asarray(engine.step_frame())
        assert np.isfinite(img).all(), method


def test_fast_cube_march_matches_faithful_image():
    cfg = tiny_config()
    grid = jnp.asarray(_smoke_grid())
    params = scene(cfg)
    lm = render_light_map(grid, params, cfg)

    slow_cube = ray_march_cube(grid, params, cfg, lod=0, light_map=lm)
    fast_cube = ray_march_cube_fast(grid, params, cfg, light_map=lm)
    img_slow = np.asarray(resolve_cube(slow_cube, params, cfg))
    img_fast = np.asarray(resolve_cube(fast_cube, params, cfg))

    assert np.isfinite(img_fast).all()
    a1 = img_fast[..., 3] > 0.05
    a2 = img_slow[..., 3] > 0.05
    union = (a1 | a2).sum()
    inter = (a1 & a2).sum()
    assert union > 0 and inter / union > 0.75, inter / union
    # Energy within 15% (different sampling distributions along rays; a
    # systematic brightness drift must fail loudly -- VERDICT r2 item 7).
    e1, e2 = img_fast[..., 3].sum(), img_slow[..., 3].sum()
    assert 0.85 < e1 / e2 < 1.15, e1 / e2
    # Pixelwise agreement where both hit.
    both = a1 & a2
    diff = np.abs(img_fast[both] - img_slow[both]).mean()
    assert diff < 0.12, diff


def test_fast_cube_march_lod_downsample():
    cfg = tiny_config()
    grid = jnp.asarray(_smoke_grid())
    params = scene(cfg)
    lm = render_light_map(grid, params, cfg)
    cube1 = np.asarray(ray_march_cube_fast(grid, params, cfg, light_map=lm, lod=1))
    assert cube1.shape == (6, 8, 8, 4)
    assert np.isfinite(cube1).all()


def test_fast_direct_matches_faithful_image():
    """Perspective shear-warp (render/screencomp.py) vs the faithful
    per-pixel screen-space march (PSRayCastV semantics)."""
    from fluidx12_tpu.core import math3d as m3
    from fluidx12_tpu.core.camera import OrbitCamera
    from fluidx12_tpu.render.raycast import ray_cast_direct
    from fluidx12_tpu.render.screencomp import direct_plane_spec, ray_cast_direct_fast

    cfg = tiny_config()
    grid = jnp.asarray(_smoke_grid())
    params = scene(cfg)
    lm = render_light_map(grid, params, cfg)

    cam = OrbitCamera(width=cfg.viewport[0], height=cfg.viewport[1])
    world = m3.scaling(cfg.volume_scale)
    local_eye = (np.append(np.asarray(cam.eye, np.float64), 1.0)
                 @ m3.inverse(world))[:3]
    spec = direct_plane_spec(local_eye, world @ cam.view_proj, cfg.viewport, cfg)
    assert spec is not None and min(spec.extent) >= 1.0

    img_slow = np.asarray(ray_cast_direct(grid, params, cfg, light_map=lm))
    img_fast = np.asarray(ray_cast_direct_fast(grid, params, cfg, lm, spec,
                                               params.num_samples))
    assert np.isfinite(img_fast).all()
    a1 = img_fast[..., 3] > 0.05
    a2 = img_slow[..., 3] > 0.05
    union, inter = (a1 | a2).sum(), (a1 & a2).sum()
    assert union > 0 and inter / union > 0.75, inter / union
    e1, e2 = img_fast[..., 3].sum(), img_slow[..., 3].sum()
    assert 0.85 < e1 / e2 < 1.15, e1 / e2
    both = a1 & a2
    diff = np.abs(img_fast[both] - img_slow[both]).mean()
    assert diff < 0.12, diff


def test_fast_full_frame_matches_faithful_composed():
    """Whole fast frame vs whole faithful frame at 48^3: every fast pass
    (advect, mg off at this size, sweep light map, slice march, resolve)
    composed against every faithful twin in ONE image bound, so a
    systematic drift in any single pass cannot hide inside per-pass
    tolerances (VERDICT r2 item 7)."""
    import dataclasses
    import jax
    from fluidx12_tpu.core.config import RenderMethod
    from fluidx12_tpu.models import SmokeModel

    base = FluidConfig(grid_size=(48, 48, 48), viewport=(64, 64),
                       max_ray_samples=48, max_light_samples=24,
                       num_pressure_iters=16)
    imgs = {}
    for fast in (True, False):
        cfg = dataclasses.replace(base, fast_sim=fast, fast_render=fast,
                                  use_pallas=fast)
        model = SmokeModel(cfg, method=RenderMethod.RAY_MARCH_SEPARATE)
        state = model.init()
        params = model.default_params()
        step = jax.jit(model.step, donate_argnums=(0,))
        for _ in range(12):
            state, img = step(state, params)
        imgs[fast] = np.asarray(img)
    fast_img, slow_img = imgs[True], imgs[False]
    assert np.isfinite(fast_img).all()
    diff = np.abs(fast_img - slow_img)
    assert diff.mean() < 0.02, diff.mean()
    # Total energy of the composed frame within 15%.
    e1 = fast_img.sum()
    e2 = slow_img.sum()
    assert 0.85 < e1 / e2 < 1.15, e1 / e2


def test_fast_advect_matches_faithful():
    import dataclasses
    from fluidx12_tpu.sim.advect import advect
    from fluidx12_tpu.sim.advect_fast import advect_fast
    from fluidx12_tpu.core.state import make_initial_state
    from fluidx12_tpu.sim.step import simulate
    import jax

    cfg = FluidConfig(grid_size=(32, 32, 32))
    # Exactness at uniform velocity (splitting introduces no error there).
    rng = np.random.default_rng(0)
    color = rng.uniform(0, 0.5, (4,) + cfg.zyx).astype(np.float32)
    vel = np.zeros((3,) + cfg.zyx, np.float32)
    vel[0], vel[1], vel[2] = 1.3, 0.7, -0.5
    _, c_ref = advect(jnp.asarray(vel), jnp.asarray(color), cfg.time_step, cfg)
    _, c_fast = advect_fast(jnp.asarray(vel), jnp.asarray(color), cfg.time_step, cfg)
    np.testing.assert_allclose(np.asarray(c_fast), np.asarray(c_ref), atol=1e-5)

    # Statistical agreement on a developed flow: the split backtrace is a
    # different (but valid) discretization; it deviates locally at the
    # sub-grid impulse vortex, so compare bulk metrics, not pointwise.
    cfg_slow = dataclasses.replace(cfg, fast_sim=False, use_pallas=False)
    state = make_initial_state(cfg_slow)
    step = jax.jit(lambda s: simulate(s, cfg_slow.time_step, cfg_slow))
    for _ in range(10):
        state = step(state)
    _, c_ref = advect(state.velocity, state.color, cfg.time_step, cfg)
    _, c_fast = advect_fast(state.velocity, state.color, cfg.time_step, cfg)
    c_ref = np.asarray(c_ref)
    c_fast = np.asarray(c_fast)
    assert np.abs(c_fast - c_ref).mean() < 0.005
    mass = c_fast[3].sum() / max(c_ref[3].sum(), 1e-6)
    assert 0.9 < mass < 1.1, mass


def test_fast_sim_stays_stable_long_run():
    import jax
    from fluidx12_tpu.core.state import make_initial_state
    from fluidx12_tpu.sim.step import simulate

    cfg = FluidConfig(grid_size=(32, 32, 32))  # fast_sim on by default
    state = make_initial_state(cfg)
    step = jax.jit(lambda s: simulate(s, cfg.time_step, cfg))
    for _ in range(40):
        state = step(state)
    c = np.asarray(state.color)
    v = np.asarray(state.velocity)
    assert np.isfinite(c).all() and np.isfinite(v).all()
    assert c.min() >= 0.0 and c.max() <= 1.0
    assert c[3].max() > 0.05
    assert np.abs(v).max() < 50.0


def test_fast_merged_equals_fast_separate():
    """With fast_render, RAY_MARCH_MERGED and RAY_MARCH_SEPARATE share the
    sweep-lit pipeline and must produce identical frames."""
    import jax
    from fluidx12_tpu.core.config import RenderMethod
    from fluidx12_tpu.models import SmokeModel

    cfg = FluidConfig(grid_size=(16, 16, 16), viewport=(24, 24),
                      max_ray_samples=8, max_light_samples=4,
                      num_pressure_iters=4)
    imgs = {}
    for method in (RenderMethod.RAY_MARCH_MERGED, RenderMethod.RAY_MARCH_SEPARATE):
        model = SmokeModel(cfg, method=method)
        state = model.init()
        params = model.default_params()
        step = jax.jit(model.step, donate_argnums=(0,))
        for _ in range(8):
            state, img = step(state, params)
        imgs[method] = np.asarray(img)
    np.testing.assert_allclose(
        imgs[RenderMethod.RAY_MARCH_MERGED],
        imgs[RenderMethod.RAY_MARCH_SEPARATE], atol=1e-6)
