"""Adjoint (reverse-mode) differentiability of the faithful simulation.

A capability upgrade over the reference: the DX12 compute pipeline
(CSAdvect.hlsl + CSProject3D.hlsl) is not differentiable, but the faithful
JAX twins are pure gather/stencil math, so `jax.grad` through `simulate`
yields the exact adjoint of the discretized solver -- usable for smoke
control / source optimization.  The fast stack (Pallas kernels, multigrid)
has no custom VJPs and is not covered; the faithful stack is the
differentiable twin (dual-stack rule, CLAUDE.md).

These tests pin that property: gradients exist, are finite, flow through
the full advect -> project(Jacobi) chain, and match finite differences.
"""

import numpy as np
import jax
import jax.numpy as jnp

from fluidx12_tpu.core.config import FluidConfig
from fluidx12_tpu.core.state import FluidState, make_initial_state
from fluidx12_tpu.sim.step import simulate

# Faithful stack only: fast_sim / mg / pallas off.  Few pressure iters keep
# the scan short (reverse-mode stores one residual field per sweep).
CFG = FluidConfig(grid_size=(16, 16, 16), fast_sim=False, use_pallas=False,
                  mg_pressure=False, num_pressure_iters=6,
                  sim_dtype=jnp.float32)  # f32 state: clean FD comparisons


def _loss_from_velocity(v0_flat, state0, n_steps=2):
    """Scalar loss: dye mass in a target slab after n_steps faithful steps,
    as a function of an initial-velocity perturbation."""
    fields = state0.fields.at[:3].add(v0_flat.reshape((3,) + CFG.zyx))
    state = FluidState(fields=fields, pressure=state0.pressure)
    dt = jnp.asarray(CFG.time_step, jnp.float32)
    for _ in range(n_steps):
        state = simulate(state, dt, CFG)
    # Dye alpha integrated over the +x half.  The impulse injects dye at
    # x = 0.5 * nx (the region boundary), so any x-velocity perturbation
    # moves mass across it: the loss is velocity-sensitive and smooth in
    # the velocity (trilinear weights).
    return jnp.sum(state.fields[6, :, :, 8:])


def test_grad_exists_and_is_finite():
    state0 = make_initial_state(CFG)
    v0 = jnp.zeros(3 * 16 * 16 * 16, jnp.float32)
    g = jax.jit(jax.grad(_loss_from_velocity))(v0, state0)
    g = np.asarray(g)
    assert np.all(np.isfinite(g))
    # The impulse injects dye near y~2; velocity there influences where it
    # lands, so the gradient is not identically zero.
    assert np.abs(g).max() > 1e-6


def test_grad_matches_finite_differences():
    state0 = make_initial_state(CFG)
    v0 = jnp.zeros(3 * 16 * 16 * 16, jnp.float32)
    loss = jax.jit(_loss_from_velocity)
    g = jax.jit(jax.grad(_loss_from_velocity))(v0, state0)

    # Directional derivative along a smooth random direction vs central FD.
    rng = np.random.default_rng(3)
    d = rng.normal(size=v0.shape).astype(np.float32)
    d /= np.linalg.norm(d)
    d = jnp.asarray(d)
    eps = 3e-2  # f32 arithmetic: large enough to rise above rounding noise
    f_plus = float(loss(v0 + eps * d, state0))
    f_minus = float(loss(v0 - eps * d, state0))
    fd = (f_plus - f_minus) / (2 * eps)
    ad = float(jnp.vdot(g, d))
    assert np.isfinite(fd) and np.isfinite(ad)
    np.testing.assert_allclose(ad, fd, rtol=5e-2, atol=5e-4)


def test_grad_through_faithful_render():
    """Differentiable volume rendering: jax.grad flows from a rendered-image
    loss back to the initial velocity through the FULL faithful frame --
    simulate -> per-voxel light march (cast_light_ray) -> cube-map view
    march (march_rays) -> gather resolve.  quantize_cube_map is off (u8
    rounding has zero gradient a.e.)."""
    from fluidx12_tpu.core.config import RenderMethod
    from fluidx12_tpu.models.smoke import SmokeModel

    cfg = FluidConfig(grid_size=(16, 16, 16), viewport=(24, 24),
                      fast_sim=False, fast_render=False, use_pallas=False,
                      mg_pressure=False, num_pressure_iters=4,
                      max_ray_samples=12, max_light_samples=4,
                      quantize_cube_map=False, sim_dtype=jnp.float32)
    model = SmokeModel(cfg, method=RenderMethod.RAY_MARCH_SEPARATE)
    params = model.default_params()
    state0 = model.init()
    # Two warm steps put smoke in the volume so rays actually hit density.
    for _ in range(2):
        state0, _ = jax.jit(model.step)(state0, params)

    def image_loss(v_pert, state):
        fields = state.fields.at[:3].add(v_pert.reshape((3,) + cfg.zyx))
        st = FluidState(fields=fields, pressure=state.pressure)
        _, image = model.step(st, params)
        return jnp.sum(image)

    v0 = jnp.zeros(3 * 16 * 16 * 16, jnp.float32)
    loss = jax.jit(image_loss)
    g = jax.jit(jax.grad(image_loss))(v0, state0)
    g = np.asarray(g)
    assert np.all(np.isfinite(g))
    assert np.abs(g).max() > 1e-8

    rng = np.random.default_rng(7)
    d = rng.normal(size=v0.shape).astype(np.float32)
    d /= np.linalg.norm(d)
    d = jnp.asarray(d)
    eps = 2e-2
    fd = (float(loss(v0 + eps * d, state0))
          - float(loss(v0 - eps * d, state0))) / (2 * eps)
    ad = float(jnp.vdot(jnp.asarray(g), d))
    # The march's alive/step logic makes the image only piecewise-smooth in
    # the fields; the FD secant still tracks the adjoint to a few percent.
    np.testing.assert_allclose(ad, fd, rtol=8e-2, atol=1e-3)


def test_jacobi_scan_matches_fori_semantics():
    """The scan-based sweeps are trace-identical to the old fori_loop form:
    pin against a hand-rolled Python loop of the same update."""
    from fluidx12_tpu.ops.sampling import neighbor_shift
    from fluidx12_tpu.sim.project import jacobi_sweeps

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(8, 8, 8)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(8, 8, 8)).astype(np.float32))
    out = np.asarray(jacobi_sweeps(q, b, 5, True))

    ref = q
    for _ in range(5):
        s = sum(neighbor_shift(ref, ax, sg) for ax in (0, 1, 2) for sg in (+1, -1))
        ref = (s - b) / 6.0
    np.testing.assert_allclose(out, np.asarray(ref), rtol=1e-6, atol=1e-6)
