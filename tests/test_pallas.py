"""Pallas kernels vs their XLA twins (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from fluidx12_tpu.ops.pallas.jacobi import jacobi_pallas
from fluidx12_tpu.sim.project import jacobi_sweeps


def test_jacobi_pallas_matches_xla():
    rng = np.random.default_rng(0)
    n = 32
    q = jnp.asarray(rng.standard_normal((n, n, n)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((n, n, n)).astype(np.float32))
    ref = np.asarray(jacobi_sweeps(q, b, 8, True))
    got = np.asarray(jacobi_pallas(q, b, 8, slab=16, inner=8))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_jacobi_pallas_multiple_rounds():
    rng = np.random.default_rng(1)
    n = 32
    q = jnp.asarray(rng.standard_normal((n, n, n)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((n, n, n)).astype(np.float32))
    ref = np.asarray(jacobi_sweeps(q, b, 16, True))
    got = np.asarray(jacobi_pallas(q, b, 16, slab=16, inner=8))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_advect_backtrace_pallas_matches_xla():
    """Interpret-mode check of the roll-based backtrace kernels."""
    from fluidx12_tpu.core.config import FluidConfig
    from fluidx12_tpu.ops.pallas.advect import backtrace_pallas
    from fluidx12_tpu.sim.advect_fast import _backtrace_split

    cfg = FluidConfig(grid_size=(16, 16, 16))
    rng = np.random.default_rng(0)
    both = jnp.asarray(rng.uniform(0, 1, (7, 16, 16, 16)).astype(np.float32))
    # Varied displacements, zeroed near the walls so the kernel's CLAMP
    # addressing agrees exactly with the XLA twin's MIRROR.
    both = both.at[:3].multiply(2.0)  # max displacement = 2*u = 4 voxels
    interior = np.zeros((16, 16, 16), np.float32)
    interior[6:-6, 6:-6, 6:-6] = 1.0
    both = both.at[:3].multiply(jnp.asarray(interior))
    dt = cfg.time_step
    ref = np.asarray(_backtrace_split(both, dt, cfg))
    got = np.asarray(backtrace_pallas(both, dt, cfg))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_advect_backtrace_pallas_z_kernel():
    """Grid tall enough to engage the halo'd z-pass kernel (z >= 34)."""
    from fluidx12_tpu.core.config import FluidConfig
    from fluidx12_tpu.ops.pallas.advect import backtrace_pallas
    from fluidx12_tpu.sim.advect_fast import _backtrace_split

    cfg = FluidConfig(grid_size=(16, 16, 40))
    rng = np.random.default_rng(1)
    both = jnp.asarray(rng.uniform(0, 1, (7, 40, 16, 16)).astype(np.float32))
    both = both.at[:3].multiply(2.0)
    interior = np.zeros((40, 16, 16), np.float32)
    interior[8:-8, 6:-6, 6:-6] = 1.0
    both = both.at[:3].multiply(jnp.asarray(interior))
    dt = cfg.time_step
    ref = np.asarray(_backtrace_split(both, dt, cfg))
    got = np.asarray(backtrace_pallas(both, dt, cfg))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_jacobi_pallas_ytiled_matches_xla():
    """Planes > 128x128 engage the y-strip tiling path."""
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((32, 256, 128)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((32, 256, 128)).astype(np.float32))
    ref = np.asarray(jacobi_sweeps(q, b, 8, True))
    got = np.asarray(jacobi_pallas(q, b, 8))
    np.testing.assert_allclose(got, ref, atol=1e-5)
