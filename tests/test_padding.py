"""Padded HBM storage layout for non-roll-clean grids (core/padding.py).

The FluidGI 150^3 preset (ref: Bin/FluidGI.bat:1) stores its state in a
roll-clean padded array so the Pallas kernels tile it.  These tests pin the
exactness arguments:

- the padded projection's logically-masked stencils are BIT-equal to the
  compact twin on the interior (ghost values never propagate inward),
- the padded clamp-addressed advect twin is BIT-equal to the same clamp
  math on compact arrays,
- the Pallas kernels (interpret mode) match the padded XLA twin,
- the engine runs a padded config end to end.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fluidx12_tpu.core.config import FluidConfig, PRESETS
from fluidx12_tpu.core.padding import (
    crop_to_logical,
    is_padded,
    pad_to_storage,
    padded_zyx,
    storage_zyx,
)
from fluidx12_tpu.core.state import FluidState, make_initial_state


def _f32_cfg(**kw):
    return FluidConfig(sim_dtype=jnp.float32, **kw)


def _rand_fields(zyx, seed=0, c=7):
    rng = np.random.default_rng(seed)
    f = rng.uniform(-0.4, 0.4, (c,) + tuple(zyx)).astype(np.float32)
    f[3:] = np.abs(f[3:])  # premultiplied rgba stays in [0, 1]
    return f


def test_padded_dims():
    assert padded_zyx(PRESETS["fluidgi"]) == (160, 160, 256)
    assert padded_zyx(FluidConfig()) is None                    # 128^3 clean
    assert padded_zyx(FluidConfig(grid_size=(256,) * 3)) is None
    assert padded_zyx(FluidConfig(grid_size=(48, 48, 48))) is None  # too small
    assert padded_zyx(FluidConfig(grid_size=(512, 512, 1))) is None  # 2D
    cfg = _f32_cfg(grid_size=(96, 96, 96))
    assert padded_zyx(cfg) == (96, 96, 128)
    st = make_initial_state(PRESETS["fluidgi"])
    assert st.fields.shape == (7, 160, 160, 256)
    assert st.pressure.shape == (160, 160, 256)


def test_padded_projection_pieces_bitwise():
    """Each masked stencil stage == its compact twin on the interior,
    BITWISE, with poisoned ghosts (ghost values never propagate inward)."""
    from fluidx12_tpu.sim.padded import (
        boundary_damp_padded,
        divergence_masked,
        jacobi_sweeps_masked,
        subtract_gradient_masked,
    )
    from fluidx12_tpu.sim.project import (
        boundary_damp,
        divergence,
        jacobi_sweeps,
        subtract_gradient,
    )

    cfg = _f32_cfg(grid_size=(96, 96, 96))
    zyx = cfg.zyx
    f = jnp.asarray(_rand_fields(zyx, seed=3))
    q0 = jnp.asarray(_rand_fields(zyx, seed=4, c=1)[0])
    fp = pad_to_storage(f, cfg).at[..., :, :, zyx[2]:].set(7.25)
    qp = pad_to_storage(q0, cfg).at[..., :, :, zyx[2]:].set(-3.5)

    b_ref = divergence(f, True)
    b_pad = divergence_masked(fp, zyx)
    np.testing.assert_array_equal(
        np.asarray(crop_to_logical(b_pad, cfg)), np.asarray(b_ref))

    q_ref = jacobi_sweeps(q0, b_ref, 16, True)
    q_pad = jacobi_sweeps_masked(qp, pad_to_storage(b_ref, cfg), 16, zyx)
    np.testing.assert_array_equal(
        np.asarray(crop_to_logical(q_pad, cfg)), np.asarray(q_ref))

    v_ref = boundary_damp(subtract_gradient(f, q_ref, 0.48, True), cfg)
    v_pad = boundary_damp_padded(
        subtract_gradient_masked(fp, pad_to_storage(q_ref, cfg), 0.48, zyx),
        cfg)
    np.testing.assert_array_equal(
        np.asarray(crop_to_logical(v_pad, cfg)), np.asarray(v_ref))


def test_padded_projection_matches_compact():
    """Full padded projection == compact projection on the interior for both
    the plain-Jacobi and multigrid schedules.  The composed programs differ
    only by XLA fusion-level FMA reassociation (each stage is BIT-equal in
    test_padded_projection_pieces_bitwise; composed deltas measured <=
    1.5e-6 absolute), so this pins a tight tolerance."""
    from fluidx12_tpu.sim.project import project

    for mg_min in (16384, 9216):  # jacobi path, then mg at 96^2 planes
        cfg = dataclasses.replace(
            _f32_cfg(grid_size=(96, 96, 96), num_pressure_iters=16),
            mg_min_plane=mg_min)
        zyx = cfg.zyx
        fields = jnp.asarray(_rand_fields(zyx, seed=3))
        q0 = jnp.asarray(_rand_fields(zyx, seed=4, c=1)[0])
        dt = jnp.float32(cfg.time_step)

        ref_f, ref_q = project(fields, q0, dt, cfg)

        fp = pad_to_storage(fields, cfg)
        qp = pad_to_storage(q0, cfg)
        # Poison the ghosts: correctness must not depend on their values.
        fp = fp.at[..., :, :, zyx[2]:].set(7.25)
        qp = qp.at[..., :, :, zyx[2]:].set(-3.5)
        pad_f, pad_q = project(fp, qp, dt, cfg)

        np.testing.assert_allclose(
            np.asarray(crop_to_logical(pad_f, cfg)), np.asarray(ref_f),
            atol=5e-6)
        np.testing.assert_allclose(
            np.asarray(crop_to_logical(pad_q, cfg)), np.asarray(ref_q),
            atol=5e-6)


def test_padded_advect_twin_matches_compact_clamp_bitwise():
    """The padded clamp-displacement XLA twin == identical clamp math on the
    compact array (out-of-logical taps are zero-weight by construction)."""
    from fluidx12_tpu.sim.advect import apply_impulse_forces
    from fluidx12_tpu.sim.advect_fast import (
        _backtrace_split_clamped,
        advect_fields_fast,
    )

    cfg = _f32_cfg(grid_size=(96, 96, 96))
    fields = jnp.asarray(_rand_fields(cfg.zyx, seed=7) * 0.5)
    dt = jnp.float32(cfg.time_step)

    ref = _backtrace_split_clamped(fields, dt, cfg)
    vel, col = apply_impulse_forces(ref[:3], ref[3:], dt, cfg)
    ref = jnp.concatenate([vel, col], axis=0)

    fp = pad_to_storage(fields, cfg)
    fp = fp.at[..., :, :, cfg.zyx[2]:].set(0.33)
    out = advect_fields_fast(fp, dt, cfg)
    assert is_padded(out, cfg)
    np.testing.assert_array_equal(
        np.asarray(crop_to_logical(out, cfg)), np.asarray(ref))


def test_padded_pallas_interpret_matches_xla_twin():
    """backtrace_pallas (interpret mode) on a handmade padded layout matches
    the padded clamp XLA twin within kernel-reassociation tolerance."""
    from fluidx12_tpu.ops.pallas.advect import backtrace_pallas
    from fluidx12_tpu.sim.advect_fast import _backtrace_split_clamped

    cfg = _f32_cfg(grid_size=(40, 40, 24))
    logical = cfg.zyx  # (24, 40, 40)
    padded = (32, 48, 128)
    rng = np.random.default_rng(11)
    fp = np.zeros((7,) + padded, np.float32)
    fp[:, :24, :40, :40] = rng.uniform(-0.5, 0.5, (7,) + logical)
    fp[:, :, :, 40:] = 5.5  # poisoned ghosts
    dt = jnp.float32(cfg.time_step)

    for fuse_xy in (True, False):
        c = dataclasses.replace(cfg, advect_fuse_xy=fuse_xy)
        got = backtrace_pallas(jnp.asarray(fp), dt, c)
        want = _backtrace_split_clamped(jnp.asarray(fp), dt, c)
        np.testing.assert_allclose(
            np.asarray(crop_to_logical(got, c)),
            np.asarray(crop_to_logical(want, c)), atol=2e-5,
            err_msg=f"fuse_xy={fuse_xy}")


def test_padded_engine_end_to_end():
    """A padded config runs the full engine pipeline; frames stay finite and
    the state stays padded + bounded (ghosts included)."""
    from fluidx12_tpu.engine.fluidx import FluidXEngine

    cfg = _f32_cfg(grid_size=(96, 96, 96), viewport=(64, 64),
                   max_ray_samples=32, max_light_samples=8,
                   num_pressure_iters=8)
    engine = FluidXEngine(cfg)
    assert is_padded(engine.state.fields, cfg)
    for _ in range(3):
        img = np.asarray(engine.step_frame())
    assert np.isfinite(img).all()
    assert img.shape == (64, 64, 3)
    f = np.asarray(engine.state.fields)
    assert np.isfinite(f).all()
    # The logical interior has developed; renders consume only the crop.
    assert np.abs(np.asarray(crop_to_logical(engine.state.fields, cfg))).max() > 0


def test_padded_vs_compact_full_sim_step():
    """One full fast simulate() on the padded layout == the same step on a
    compact layout with the clamp twin + compact projection.  Stage-level
    bit-equality is pinned piecewise above; the two COMPOSED jit programs
    differ only by XLA fusion-level FMA reassociation (measured <= 4.5e-7
    absolute), so this pins a tight composed tolerance."""
    from fluidx12_tpu.sim.step import simulate

    cfg = _f32_cfg(grid_size=(96, 96, 96), num_pressure_iters=8)
    zyx = cfg.zyx
    fields = jnp.asarray(_rand_fields(zyx, seed=5) * 0.5)
    pressure = jnp.asarray(_rand_fields(zyx, seed=6, c=1)[0])

    # Compact reference: clamp-twin advect + forces + compact projection.
    from fluidx12_tpu.sim.advect import apply_impulse_forces
    from fluidx12_tpu.sim.advect_fast import _backtrace_split_clamped
    from fluidx12_tpu.sim.project import project

    dt = jnp.float32(cfg.time_step)
    adv = _backtrace_split_clamped(fields, dt, cfg)
    vel, col = apply_impulse_forces(adv[:3], adv[3:], dt, cfg)
    ref_f, ref_q = project(jnp.concatenate([vel, col], 0), pressure, dt, cfg)

    st = FluidState(fields=pad_to_storage(fields, cfg),
                    pressure=pad_to_storage(pressure, cfg))
    out = simulate(st, dt, cfg)
    np.testing.assert_allclose(
        np.asarray(crop_to_logical(out.fields, cfg)), np.asarray(ref_f),
        atol=5e-6)
    np.testing.assert_allclose(
        np.asarray(crop_to_logical(out.pressure, cfg)), np.asarray(ref_q),
        atol=5e-6)


def test_masked_jacobi_kernels_match_xla_twin():
    """jacobi_pallas with logical_zyx (interpret mode) == the masked XLA
    sweeps, both kernel forms (whole-window at small planes, plane-sweep at
    big planes), with poisoned ghosts."""
    from fluidx12_tpu.ops.pallas.jacobi import jacobi_pallas, jacobi_tuning
    from fluidx12_tpu.sim.padded import jacobi_sweeps_masked

    rng = np.random.default_rng(13)
    for storage, logical in (((32, 48, 128), (24, 40, 100)),    # whole-window
                             ((32, 160, 256), (24, 150, 150))):  # plane-sweep
        q = rng.uniform(-1, 1, storage).astype(np.float32)
        b = rng.uniform(-1, 1, storage).astype(np.float32)
        q[logical[0]:] = 9.0   # poisoned ghosts
        q[:, logical[1]:] = -9.0
        q[:, :, logical[2]:] = 9.0
        tuning = jacobi_tuning(storage, 8)
        assert tuning is not None, storage
        got = np.asarray(jacobi_pallas(jnp.asarray(q), jnp.asarray(b), 8,
                                       *tuning, logical_zyx=logical))
        want = np.asarray(jacobi_sweeps_masked(jnp.asarray(q),
                                               jnp.asarray(b), 8, logical))
        lz, ly, lx = logical
        np.testing.assert_allclose(got[:lz, :ly, :lx], want[:lz, :ly, :lx],
                                   atol=2e-6, err_msg=str(storage))
        assert np.isfinite(got).all()


def test_logical_stencil_kernels_match_masked_twins():
    """divergence_pallas / residual_pallas / grad_damp_pallas /
    prolong_correct_pallas with logical clamps (interpret mode) == the
    masked XLA twins of sim/padded.py on the logical interior, with
    poisoned ghosts.  These are the kernels the padded projection routes
    through on TPU (sim/padded.py _stencil_kernels_ok)."""
    from fluidx12_tpu.ops.pallas.stencil import (
        divergence_pallas,
        grad_damp_pallas,
        prolong_correct_pallas,
        residual_pallas,
    )
    from fluidx12_tpu.sim.padded import (
        _coarse_zyx,
        _prolong_padded,
        _residual_masked,
        boundary_damp_padded,
        divergence_masked,
        subtract_gradient_masked,
    )

    storage, logical = (32, 160, 256), (24, 150, 150)
    rng = np.random.default_rng(17)
    flds = rng.uniform(-0.5, 0.5, (7,) + storage).astype(np.float32)
    flds[:, logical[0]:] = 7.0   # poisoned ghosts
    flds[:, :, logical[1]:] = -7.0
    flds[:, :, :, logical[2]:] = 7.0
    q = rng.uniform(-1, 1, storage).astype(np.float32)
    lz, ly, lx = logical
    cfg = _f32_cfg(grid_size=(logical[2], logical[1], logical[0]))
    flds_j = jnp.asarray(flds)

    b_got = np.asarray(divergence_pallas(flds_j, logical_zyx=logical))
    b_want = np.asarray(divergence_masked(flds_j, logical))
    np.testing.assert_allclose(b_got[:lz, :ly, :lx], b_want[:lz, :ly, :lx],
                               atol=2e-6)
    assert np.isfinite(b_got).all()

    r_got = np.asarray(residual_pallas(jnp.asarray(q), jnp.asarray(b_want),
                                       logical_zyx=logical))
    r_want = np.asarray(_residual_masked(jnp.asarray(q), jnp.asarray(b_want),
                                         logical))
    np.testing.assert_allclose(r_got[:lz, :ly, :lx], r_want[:lz, :ly, :lx],
                               atol=2e-5)
    assert np.isfinite(r_got).all()

    vel = subtract_gradient_masked(flds_j, jnp.asarray(q), 1.25, logical)
    f_want = np.asarray(boundary_damp_padded(vel, cfg))
    f_got = np.asarray(grad_damp_pallas(flds_j, jnp.asarray(q), 1.25,
                                        logical_zyx=logical))
    # atol: inside the 3% damp band a 1-ulp difference in pos (XLA
    # strength-reduces the /n_log divide, Mosaic does not) is amplified
    # 33x by the (0.97 - |pos|)/0.03 scale -- measured ~2e-6 at the
    # logical +edges, same class the compact kernel twins tolerate.
    np.testing.assert_allclose(f_got[:3, :lz, :ly, :lx],
                               f_want[:3, :lz, :ly, :lx], atol=1e-5)
    # Ghost velocity writes ZERO (the padded layout's invariant).
    assert (f_got[:3, lz:] == 0).all()
    assert (f_got[:3, :, ly:] == 0).all()
    assert (f_got[:3, :, :, lx:] == 0).all()
    # Color channels pass through untouched.
    np.testing.assert_array_equal(f_got[3:], flds[3:])

    c_log = _coarse_zyx(logical)
    e_c = rng.uniform(-1, 1, tuple(n // 2 for n in storage)).astype(np.float32)
    e_c[c_log[0]:] = 5.0
    e_c[:, c_log[1]:] = -5.0
    e_c[:, :, c_log[2]:] = 5.0
    p_got = np.asarray(prolong_correct_pallas(jnp.asarray(q),
                                              jnp.asarray(e_c),
                                              logical_czyx=c_log))
    p_want = np.asarray(jnp.asarray(q) + _prolong_padded(jnp.asarray(e_c),
                                                         c_log))
    np.testing.assert_allclose(p_got[:lz, :ly, :lx], p_want[:lz, :ly, :lx],
                               atol=2e-5)
    assert np.isfinite(p_got).all()


def test_padded_ghost_velocity_invariant():
    """The projection re-zeroes ghost velocity every step (self-healing),
    so the Pallas tap-tier predicates follow the logical flow; seed the
    ghosts with garbage and check one simulate() restores the invariant."""
    from fluidx12_tpu.sim.step import simulate

    cfg = _f32_cfg(grid_size=(96, 96, 96), num_pressure_iters=4)
    zyx = cfg.zyx
    fields = pad_to_storage(jnp.asarray(_rand_fields(zyx, seed=9) * 0.3), cfg)
    fields = fields.at[:3, :, :, zyx[2]:].set(4.5)  # garbage ghost velocity
    st = FluidState(fields=fields,
                    pressure=jnp.zeros(fields.shape[-3:], jnp.float32))
    out = simulate(st, jnp.float32(cfg.time_step), cfg)
    vel = np.asarray(out.fields[:3])
    assert (vel[:, :, :, zyx[2]:] == 0).all()   # x ghosts
    assert (vel[:, :, zyx[1]:, :] == 0).all()   # y ghosts (z==y==96: none pad)


def test_padded_march_matches_cropped_twin(monkeypatch):
    """The padded-volume fused march (ray_march_cube_fast re-pads the
    grid so composite_resample_pallas runs with logical-clamped coords
    and zero ghost color) == the compact einsum-chain march on the
    cropped grid.  Forced on CPU via the _FUSED_ON_CPU interpret hook."""
    import fluidx12_tpu.render.slicecomp as sc
    from fluidx12_tpu.core.state import default_scene_params
    from fluidx12_tpu.core import math3d as m3
    from fluidx12_tpu.core.camera import OrbitCamera

    cfg = _f32_cfg(grid_size=(96, 96, 96), max_ray_samples=24,
                   max_light_samples=4)
    zyx = cfg.zyx
    rng = np.random.default_rng(23)
    grid = jnp.asarray(rng.uniform(0, 0.7, (4,) + zyx).astype(np.float32))
    lm = jnp.asarray(rng.uniform(0.1, 1.0, zyx).astype(np.float32))

    camera = OrbitCamera(width=64, height=64)
    world = m3.scaling(cfg.volume_scale)
    wvp = world @ camera.view_proj
    params = default_scene_params(cfg)._replace(
        eye_pt=jnp.asarray(camera.eye), world=jnp.asarray(world),
        world_i=jnp.asarray(m3.inverse(world)),
        world_view_proj=jnp.asarray(wvp),
        world_view_proj_i=jnp.asarray(m3.inverse(wvp)),
        screen_to_world=jnp.asarray(m3.inverse(camera.view_proj)))

    ref = np.asarray(sc.ray_march_cube_fast(grid, params, cfg, lm))
    monkeypatch.setattr(sc, "_FUSED_ON_CPU", True)
    got = np.asarray(sc.ray_march_cube_fast(grid, params, cfg, lm))
    assert got.shape == ref.shape == (6, 96, 96, 4)
    np.testing.assert_allclose(got, ref, atol=2e-2)  # 8-bit-quantized cube
    assert np.isfinite(got).all()


def test_padded_direct_march_matches_cropped_twin(monkeypatch):
    """The DIRECT shear-warp on a padded grid (screencomp pads the base
    plane's marching volume for the fused kernel) == the compact einsum
    twin, via the _FUSED_ON_CPU interpret hook."""
    import fluidx12_tpu.render.slicecomp as sc
    from fluidx12_tpu.core import math3d as m3
    from fluidx12_tpu.core.camera import OrbitCamera
    from fluidx12_tpu.core.state import default_scene_params
    from fluidx12_tpu.render.screencomp import (
        direct_plane_spec,
        ray_cast_direct_fast,
    )

    cfg = _f32_cfg(grid_size=(96, 96, 96), viewport=(64, 64),
                   max_ray_samples=24, max_light_samples=4)
    zyx = cfg.zyx
    rng = np.random.default_rng(29)
    grid = jnp.asarray(rng.uniform(0, 0.7, (4,) + zyx).astype(np.float32))
    lm = jnp.asarray(rng.uniform(0.1, 1.0, zyx).astype(np.float32))

    camera = OrbitCamera(width=64, height=64)
    world = m3.scaling(cfg.volume_scale)
    wvp = world @ camera.view_proj
    params = default_scene_params(cfg)._replace(
        eye_pt=jnp.asarray(camera.eye), world=jnp.asarray(world),
        world_i=jnp.asarray(m3.inverse(world)),
        world_view_proj=jnp.asarray(wvp),
        world_view_proj_i=jnp.asarray(m3.inverse(wvp)),
        screen_to_world=jnp.asarray(m3.inverse(camera.view_proj)))
    local_eye = (np.append(np.asarray(camera.eye, np.float64), 1.0)
                 @ np.asarray(m3.inverse(world), np.float64))[:3]
    spec = direct_plane_spec(local_eye, wvp, cfg.viewport, cfg)
    assert spec is not None
    num = jnp.int32(cfg.max_ray_samples)

    ref = np.asarray(ray_cast_direct_fast(grid, params, cfg, lm, spec, num))
    monkeypatch.setattr(sc, "_FUSED_ON_CPU", True)
    got = np.asarray(ray_cast_direct_fast(grid, params, cfg, lm, spec, num))
    np.testing.assert_allclose(got, ref, atol=5e-3)
    assert np.isfinite(got).all()


def test_padded_faithful_stack_runs():
    """fast_sim=False on a padded grid crops into the faithful advect and
    pads back; shapes round-trip and values stay finite."""
    from fluidx12_tpu.sim.step import simulate

    cfg = _f32_cfg(grid_size=(96, 96, 96), num_pressure_iters=4,
                   fast_sim=False, fast_render=False)
    st = make_initial_state(cfg)
    assert st.fields.shape == (7, 96, 96, 128)
    out = simulate(st, jnp.float32(cfg.time_step), cfg)
    assert out.fields.shape == st.fields.shape
    assert np.isfinite(np.asarray(out.fields)).all()
