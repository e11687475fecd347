"""Physics tests for advection and projection (SURVEY.md section 4 test pyramid)."""

import numpy as np
import jax
import jax.numpy as jnp

from fluidx12_tpu.core.config import FluidConfig
from fluidx12_tpu.core.state import make_initial_state
from fluidx12_tpu.sim.advect import advect
from fluidx12_tpu.sim.project import divergence, project
from fluidx12_tpu.sim.step import simulate

CFG3D = FluidConfig(grid_size=(32, 32, 32))
CFG2D = FluidConfig(grid_size=(64, 64, 1))


def test_advect_zero_velocity_is_identity_modulo_impulse_dissipation():
    cfg = CFG3D
    rng = np.random.default_rng(0)
    color = jnp.asarray(rng.uniform(0, 0.5, size=(4,) + cfg.zyx).astype(np.float32))
    vel = jnp.zeros((3,) + cfg.zyx, np.float32)
    dt = cfg.time_step
    v2, c2 = advect(vel, color, dt, cfg)
    atten = max(1.0 - cfg.dissipation * dt, 0.0)
    # Far away from the impulse the result is exactly color * atten.
    far = np.asarray(c2)[:, :, 20:, :]  # impulse sits at y ~ 0.1 * 32 ~ 3
    np.testing.assert_allclose(far, np.asarray(color)[:, :, 20:, :] * atten, atol=1e-5)


def test_advect_injects_dye_and_buoyancy_at_impulse():
    cfg = CFG3D
    state = make_initial_state(cfg)
    dt = cfg.time_step
    v2, c2 = advect(state.velocity, state.color, dt, cfg)
    c2 = np.asarray(c2)
    v2 = np.asarray(v2)
    # Dye appears near (0.5, 0.1, 0.5) => voxel (x=16, y=3, z=16).
    assert c2[3, 16, 3, 16] > 0.01
    # Buoyant force is +y and scaled x4 in 3D.
    assert v2[1, 16, 3, 16] > 0.0
    # Vortex swirl: at +x offset from impulse center the z-velocity is positive.
    assert v2[2, 16, 3, 17] > 0.0
    # Nothing outside the impulse radius.
    assert abs(c2[3, 16, 28, 16]) < 1e-6


def test_advect_translates_blob_downwind():
    cfg = CFG3D
    z, y, x = cfg.zyx
    # Uniform +x velocity of 1 grid-width per unit time.
    vel = jnp.zeros((3, z, y, x), np.float32).at[0].set(1.0)
    color = np.zeros((4, z, y, x), np.float32)
    color[:, 16, 28, 8] = 1.0  # blob far from the impulse region
    dt = 4.0 / x  # backtrace distance = 4 voxels
    _, c2 = advect(vel, jnp.asarray(color), dt, cfg)
    c2 = np.asarray(c2)
    assert c2[3, 16, 28, 12] > 0.5  # moved +4 voxels in x
    assert c2[3, 16, 28, 8] < 0.1


def test_projection_reduces_divergence():
    cfg = CFG3D
    rng = np.random.default_rng(1)
    vel = jnp.asarray(rng.standard_normal((3,) + cfg.zyx).astype(np.float32))
    q = jnp.zeros(cfg.zyx, np.float32)
    div0 = np.abs(np.asarray(divergence(vel, True))).mean()
    vel2, q2 = project(vel, q, cfg.time_step, cfg)
    div1 = np.abs(np.asarray(divergence(vel2, True)))[2:-2, 2:-2, 2:-2].mean()
    # The reference scheme (collocated central differences, rho=0.48, 64
    # sweeps) is a soft projection: ~0.47x on white noise, measured on the
    # same fields in f64. A second pass with the warm-started pressure keeps
    # reducing it.
    assert div1 < 0.6 * div0
    vel3, _ = project(vel2, q2, cfg.time_step, cfg)
    div2 = np.abs(np.asarray(divergence(vel3, True)))[2:-2, 2:-2, 2:-2].mean()
    assert div2 < div1


def test_projection_noop_when_paused():
    cfg = CFG3D
    rng = np.random.default_rng(2)
    vel = jnp.asarray(rng.standard_normal((3,) + cfg.zyx).astype(np.float32))
    q = jnp.asarray(rng.standard_normal(cfg.zyx).astype(np.float32))
    vel2, q2 = project(vel, q, 0.0, cfg)
    np.testing.assert_array_equal(np.asarray(vel), np.asarray(vel2))
    np.testing.assert_array_equal(np.asarray(q), np.asarray(q2))


def test_projection_2d_reduces_divergence():
    cfg = CFG2D
    rng = np.random.default_rng(3)
    vel = np.zeros((3,) + cfg.zyx, np.float32)
    vel[:2] = rng.standard_normal((2,) + cfg.zyx).astype(np.float32)
    q = jnp.zeros(cfg.zyx, np.float32)
    div0 = np.abs(np.asarray(divergence(jnp.asarray(vel), False))).mean()
    vel2, _ = project(jnp.asarray(vel), q, cfg.time_step, cfg)
    div1 = np.abs(np.asarray(divergence(vel2, False)))[:, 2:-2, 2:-2].mean()
    # 2D (N=4, rho=1) converges a bit slower than 3D on white noise: ~0.64x.
    assert div1 < 0.75 * div0


def test_simulate_stays_finite_and_bounded():
    cfg = CFG3D
    state = make_initial_state(cfg)
    step = jax.jit(lambda s: simulate(s, cfg.time_step, cfg))
    for _ in range(20):
        state = step(state)
    c = np.asarray(state.color)
    v = np.asarray(state.velocity)
    assert np.isfinite(c).all() and np.isfinite(v).all()
    # Premultiplied-alpha invariant: 0 <= rgb <= a <= 1 at injection; dissipation
    # keeps it below 1 strictly.
    assert c.min() >= 0.0 and c.max() <= 1.0
    assert (c[:3] <= c[3:4] + 1e-5).all()
    # Smoke actually appeared.
    assert c[3].max() > 0.05


def test_simulate_paused_is_near_identity():
    cfg = CFG3D
    state = make_initial_state(cfg)
    step = jax.jit(lambda s: simulate(s, cfg.time_step, cfg))
    for _ in range(5):
        state = step(state)
    frozen = jax.jit(lambda s: simulate(s, 0.0, cfg))(state)
    np.testing.assert_allclose(np.asarray(frozen.color), np.asarray(state.color), atol=1e-6)
    np.testing.assert_allclose(np.asarray(frozen.velocity), np.asarray(state.velocity), atol=1e-6)


def test_mg_pressure_solver_beats_jacobi_residual():
    """The multigrid fast solver (sim/mg.py) must reach at least the
    64-sweep Jacobi schedule's residual on a smooth rhs -- the dual-stack
    guarantee for the big-grid pressure path (VERDICT r2: 256^3 perf)."""
    import jax.numpy as jnp
    from fluidx12_tpu.sim.mg import mg_solve, mg_supported, _residual, _restrict, _prolong
    from fluidx12_tpu.sim.project import jacobi_sweeps

    rng = np.random.default_rng(0)
    # Both mg-engaging plane classes: the flagship's 128x128 planes
    # (config.mg_min_plane) and a larger non-power-of-two plane.
    for n in ((16, 128, 128), (16, 144, 144)):
        assert mg_supported(n)
        b = rng.uniform(-1, 1, n).astype(np.float32)
        for ax in range(3):
            b = (np.roll(b, 1, ax) + b + np.roll(b, -1, ax)) / 3.0
        b = jnp.asarray(b - b.mean())
        q0 = jnp.zeros(n, jnp.float32)
        r_j = np.abs(np.asarray(_residual(jacobi_sweeps(q0, b, 64, True), b))).mean()
        r_m = np.abs(np.asarray(_residual(mg_solve(q0, b), b))).mean()
        assert r_m <= r_j * 1.05, (n, r_m, r_j)

    # Transfer operators preserve the mean (no mass bias in the correction).
    r = jnp.asarray(rng.uniform(-1, 1, (16, 32, 32)).astype(np.float32))
    np.testing.assert_allclose(float(_restrict(r).mean()), float(r.mean()), atol=1e-6)
    e = jnp.asarray(rng.uniform(-1, 1, (8, 16, 16)).astype(np.float32))
    np.testing.assert_allclose(float(_prolong(e).mean()), float(e.mean()), atol=1e-6)


def test_pallas_stencil_kernels_match_xla_twins():
    """divergence / residual / grad+damp streaming kernels (interpret mode
    on CPU) vs the XLA formulations (sim/project.py)."""
    import jax.numpy as jnp
    from fluidx12_tpu.ops.pallas.stencil import (
        divergence_pallas, grad_damp_pallas, residual_pallas,
        stencil_pallas_supported)
    from fluidx12_tpu.sim.project import (
        divergence, subtract_gradient, boundary_damp)
    from fluidx12_tpu.sim.mg import _residual as residual_xla

    cfg = FluidConfig(grid_size=(128, 128, 16))
    assert stencil_pallas_supported(cfg.zyx)
    rng = np.random.default_rng(1)
    nz, ny, nx = cfg.zyx
    v = jnp.asarray(rng.uniform(-1, 1, (3, nz, ny, nx)).astype(np.float32))
    p = jnp.asarray(rng.uniform(-1, 1, (nz, ny, nx)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-1, 1, (nz, ny, nx)).astype(np.float32))

    np.testing.assert_allclose(
        np.asarray(divergence_pallas(v)), np.asarray(divergence(v, True)),
        atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(residual_pallas(p, b)), np.asarray(residual_xla(p, b)),
        atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(grad_damp_pallas(v, p, 0.48)),
        np.asarray(boundary_damp(subtract_gradient(v, p, 0.48, True), cfg)),
        atol=1e-5)
