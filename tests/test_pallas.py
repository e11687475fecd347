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


def test_jacobi_tuning_rejects_unaligned_tiled_halo():
    # Tiled-Y windows start at y0 - halo with a pl.multiple_of(lo_y, 8)
    # alignment hint; a halo that is not a multiple of 8 makes that hint a
    # lie (silently wrong DMA), so the plan must refuse it.
    from fluidx12_tpu.ops.pallas.jacobi import _plan, jacobi_tuning

    assert _plan((32, 256, 256), slab=16, inner=4) is None   # tiled, halo 4
    assert _plan((32, 256, 256), slab=16, inner=8) is not None
    assert _plan((32, 128, 128), slab=16, inner=4) is not None  # full plane
    assert jacobi_tuning((128, 128, 128), 64) == (32, 4)
    # Big planes route to the plane-sweep kernel (inner=8 windows).
    assert jacobi_tuning((256, 256, 256), 64) == (64, 8)


def test_jacobi_planewise_plan_and_match():
    """Planes > 128x128 use the plane-sweep kernel; must match the XLA twin."""
    from fluidx12_tpu.ops.pallas.jacobi import _plan_planewise

    assert _plan_planewise((256, 256, 256), 8) == (64, 32, 8)
    rng = np.random.default_rng(7)
    # Small z, big plane: engages _planewise_kernel (plane 256x192 > 128^2).
    q = jnp.asarray(rng.standard_normal((32, 256, 192)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((32, 256, 192)).astype(np.float32))
    ref = np.asarray(jacobi_sweeps(q, b, 8, True))
    got = np.asarray(jacobi_pallas(q, b, 8))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_jacobi_pallas_full_plane_tall_slab():
    # The tuned full-plane config (slab=32, inner=4) must match the XLA twin.
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.random((64, 32, 128), np.float32))
    b = jnp.asarray(rng.random((64, 32, 128), np.float32) * 0.1)
    ref = np.asarray(jacobi_sweeps(q, b, 8, True))
    got = np.asarray(jacobi_pallas(q, b, 8, slab=32, inner=4))
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_composite_kernel_matches_xla_chain():
    """Streaming compositor (ops/pallas/composite.py, interpret mode) vs the
    slicecomp XLA chain it replaces, both march directions."""
    import jax.numpy as jnp
    from fluidx12_tpu.ops.pallas.composite import (
        composite_pallas, composite_supported)

    rng = np.random.default_rng(3)
    ns, r1, r2 = 16, 16, 128
    absorption = 0.8
    dens = jnp.asarray(rng.uniform(0, 1, (ns, r1, r2)).astype(np.float32))
    prod = jnp.asarray(rng.uniform(0, 1, (3, ns, r1, r2)).astype(np.float32))
    nst = jnp.asarray(rng.uniform(0.5, 2, (r1, r2)).astype(np.float32))
    assert composite_supported(ns, r1, r2)

    def xla_chain(flip):
        d = jnp.clip(dens, 0, 1)
        a_ref = jnp.clip(d * absorption, 0, 0.999)
        alpha = jnp.clip(1 - jnp.power(1 - a_ref, nst[None]), 0, 1 - 1e-6)
        one_m = 1 - alpha
        if not flip:
            cp = jnp.cumprod(one_m, axis=0)
            transm = jnp.concatenate([jnp.ones_like(cp[:1]), cp[:-1]], 0)
        else:
            cp = jnp.cumprod(one_m[::-1], 0)
            transm = jnp.concatenate([jnp.ones_like(cp[:1]), cp[:-1]], 0)[::-1]
        w = alpha * transm
        w_rate = jnp.where(d > 0, w / jnp.maximum(d, 1e-6), 0)
        rgb = jnp.einsum("cmrs,mrs->crs", prod, w_rate)
        return jnp.concatenate([w.sum(0)[None], rgb], 0)

    for flip in (False, True):
        ref = np.asarray(xla_chain(flip))
        got = np.asarray(composite_pallas(dens, prod, nst, absorption, flip))
        np.testing.assert_allclose(got, ref, atol=5e-4)


def test_jacobi2d_kernel_matches_xla():
    """Whole-plane 2D Jacobi kernel (interpret mode) vs the XLA sweeps."""
    import jax.numpy as jnp
    from fluidx12_tpu.ops.pallas.jacobi import (
        jacobi2d_pallas, jacobi2d_pallas_supported)
    from fluidx12_tpu.sim.project import jacobi_sweeps

    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.uniform(-1, 1, (128, 128)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-1, 1, (128, 128)).astype(np.float32))
    assert jacobi2d_pallas_supported((128, 128))
    assert not jacobi2d_pallas_supported((128, 120))   # lane misalignment
    assert not jacobi2d_pallas_supported((2048, 2048))  # VMEM overflow
    ref = np.asarray(jacobi_sweeps(q[None], b[None], 16, False))[0]
    got = np.asarray(jacobi2d_pallas(q, b, 16))
    np.testing.assert_allclose(got, ref, atol=1e-5)
