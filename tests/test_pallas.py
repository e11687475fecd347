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


def test_advect_per_channel_scratch_weights(monkeypatch):
    """Force the per-channel tiling (_pass_kernel_fused_d1, normally only
    engaged by the 256^3 y pass) and check its scratch-cached tap weights
    reproduce the all-channel fused kernel exactly (same CLAMP semantics,
    same f32 tap math -- the only difference is weight reuse across the
    channel-innermost grid steps)."""
    from fluidx12_tpu.ops.pallas import advect as pa

    rng = np.random.default_rng(2)
    vol = jnp.asarray(rng.uniform(0, 1, (7, 8, 16, 128)).astype(np.float32))
    scale = 37.0  # displacements up to MAX_DISP: both tap tiers engage
    for axis, disp_ch in ((3, 0), (2, 1)):
        ref = pa._run_pass_fused(vol, axis=axis, interpret=True,
                                 disp_ch=disp_ch, scale=scale)
        assert ref is not None
        monkeypatch.setattr(pa, "_CBLOCK_BUDGET_ELEMS", 0)
        got = pa._run_pass_fused(vol, axis=axis, interpret=True,
                                 disp_ch=disp_ch, scale=scale)
        monkeypatch.undo()
        assert got is not None
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6)


def test_advect_still_tier_passthrough():
    """Blocks with ~zero displacement take the still tier (out = q exactly);
    mixed volumes where only some z-slabs are quiescent must still match
    the XLA twin everywhere (tier predicates must not misfire)."""
    from fluidx12_tpu.core.config import FluidConfig
    from fluidx12_tpu.ops.pallas.advect import backtrace_pallas
    from fluidx12_tpu.sim.advect_fast import _backtrace_split

    cfg = FluidConfig(grid_size=(16, 16, 16))
    rng = np.random.default_rng(3)
    both = rng.uniform(0, 1, (7, 16, 16, 16)).astype(np.float32)
    # Exact-zero velocity: every block is still; output == input bitwise.
    both_still = both.copy()
    both_still[:3] = 0.0
    got = np.asarray(backtrace_pallas(jnp.asarray(both_still),
                                      cfg.time_step, cfg))
    np.testing.assert_array_equal(got, both_still)

    # Mixed: velocity zero except an interior blob (away from the walls so
    # CLAMP == MIRROR); still blocks coexist with tap tiers.
    interior = np.zeros((16, 16, 16), np.float32)
    interior[6:-6, 6:-6, 6:-6] = 1.0
    both[:3] *= 2.0 * interior
    ref = np.asarray(_backtrace_split(jnp.asarray(both), cfg.time_step, cfg))
    got = np.asarray(backtrace_pallas(jnp.asarray(both), cfg.time_step, cfg))
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


def test_jacobi_packed64_matches_xla():
    """The whole-VMEM packed-lane kernel for nx = 64 volumes (the mg coarse
    level under a 128^3 fine grid) must match the XLA sweeps exactly:
    pack = reshape, neighbors = masked rolls across the two lane halves."""
    from fluidx12_tpu.ops.pallas.jacobi import (
        jacobi_packed_pallas, jacobi_packed_supported)

    assert jacobi_packed_supported((64, 64, 64))
    assert not jacobi_packed_supported((64, 64, 128))   # aligned kernels
    assert not jacobi_packed_supported((64, 63, 64))    # odd y cannot pack
    assert not jacobi_packed_supported((16, 72, 64))    # ny/2 not 8-aligned
    rng = np.random.default_rng(11)
    for shape in ((64, 64, 64), (16, 48, 64)):
        q = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        b = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        ref = np.asarray(jacobi_sweeps(q, b, 6, True))
        got = np.asarray(jacobi_packed_pallas(q, b, 6))
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


def test_jacobi_rr_fused_matches_smooth_residual_restrict():
    """The fused pre-smooth + residual + 2x-restrict kernel must match the
    unfused mg chain (smooth -> residual -> restrict * scale)."""
    from fluidx12_tpu.ops.pallas.jacobi import (
        jacobi_pallas_rr, jacobi_rr_supported)
    from fluidx12_tpu.sim.mg import _residual, _restrict

    assert jacobi_rr_supported((256, 256, 256), 4)
    assert not jacobi_rr_supported((128, 128, 128), 4)  # whole-window path
    assert not jacobi_rr_supported((256, 256, 256), 8)  # no fresh halo ring

    rng = np.random.default_rng(11)
    # ny = 144 exercises all three window y-shifts (bottom/interior/top).
    shape = (32, 144, 256)
    assert jacobi_rr_supported(shape, 4)
    q = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    q_ref = jacobi_sweeps(q, b, 4, True)
    rc_ref = np.asarray(_restrict(_residual(q_ref, b, use_pallas=False)) * 4.0)
    q_got, rc_got = jacobi_pallas_rr(q, b, 4, scale=4.0)
    np.testing.assert_allclose(np.asarray(q_got), np.asarray(q_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rc_got), rc_ref, atol=1e-4)


def test_jacobi_divrr_fused_matches_chain():
    """Pre-smoother with BOTH ends fused (divergence prologue + residual/
    restrict epilogue) vs the unfused chain: b = div(v); q = smooth(q, b);
    r_c = restrict(b - A q) * scale.  VERDICT r3 item 1."""
    from fluidx12_tpu.ops.pallas.jacobi import (
        jacobi_divrr_supported, jacobi_pallas_divrr)
    from fluidx12_tpu.sim.mg import _residual, _restrict
    from fluidx12_tpu.sim.project import divergence

    assert jacobi_divrr_supported((256, 256, 256), 4)
    assert not jacobi_divrr_supported((128, 128, 128), 4)  # whole-window path
    assert not jacobi_divrr_supported((256, 256, 256), 8)  # no fresh ring

    rng = np.random.default_rng(17)
    # ny = 144 exercises all three window y-shifts (bottom/interior/top);
    # 5 channels check the velocity-slice addressing of the combined state.
    shape = (32, 144, 256)
    assert jacobi_divrr_supported(shape, 4, vel_bytes=4)
    fields = jnp.asarray(rng.standard_normal((5,) + shape).astype(np.float32))
    q = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    b_ref = divergence(fields, True)
    q_ref = jacobi_sweeps(q, b_ref, 4, True)
    rc_ref = np.asarray(_restrict(_residual(q_ref, b_ref, use_pallas=False)) * 4.0)
    q_got, b_got, rc_got = jacobi_pallas_divrr(fields, q, 4, scale=4.0)
    np.testing.assert_allclose(np.asarray(b_got), np.asarray(b_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(q_got), np.asarray(q_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rc_got), rc_ref, atol=1e-4)


def test_jacobi_grad_fused_matches_chain():
    """Post-smoother with the projection tail fused (gradient-subtract +
    boundary damp on the velocity channels, in place) vs the unfused chain.
    VERDICT r3 item 1."""
    from fluidx12_tpu.core.config import FluidConfig
    from fluidx12_tpu.ops.pallas.jacobi import (
        jacobi_grad_supported, jacobi_pallas_grad)
    from fluidx12_tpu.sim.project import boundary_damp, subtract_gradient

    assert jacobi_grad_supported((256, 256, 256), 4)
    assert not jacobi_grad_supported((128, 128, 128), 4)

    rng = np.random.default_rng(19)
    shape = (32, 144, 256)
    assert jacobi_grad_supported(shape, 4, vel_bytes=4)
    cfg = FluidConfig(grid_size=(256, 144, 32))
    assert cfg.zyx == shape
    fields = jnp.asarray(rng.standard_normal((5,) + shape).astype(np.float32))
    q = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    rho = 0.48
    q_ref = jacobi_sweeps(q, b, 4, True)
    vel = boundary_damp(subtract_gradient(fields, q_ref, rho, True), cfg)
    f_ref = np.concatenate([np.asarray(vel), np.asarray(fields[3:])], axis=0)
    q_got, f_got = jacobi_pallas_grad(q, b, fields, 4, rho)
    np.testing.assert_allclose(np.asarray(q_got), np.asarray(q_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_got), f_ref, atol=1e-4)


def test_mg_project_fused_matches_unfused():
    """The fully fused projection (mg_project_fused) vs the unfused kernel
    chain (divergence -> mg_solve -> grad+damp) on bf16 production storage."""
    from fluidx12_tpu.ops.pallas.stencil import (
        divergence_pallas, grad_damp_pallas)
    from fluidx12_tpu.sim.mg import (
        mg_fused_supported, mg_project_fused, mg_solve)

    assert mg_fused_supported((256, 256, 256), vel_bytes=2)
    shape = (32, 144, 256)
    assert mg_fused_supported(shape, vel_bytes=2)
    rng = np.random.default_rng(23)
    fields = jnp.asarray(
        rng.standard_normal((5,) + shape).astype(np.float32)
    ).astype(jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    rho = 0.48

    b = divergence_pallas(fields)
    q_ref = mg_solve(q, b, use_pallas=False)
    f_ref = grad_damp_pallas(fields, q_ref, rho)

    f_got, q_got = mg_project_fused(fields, q, rho)
    np.testing.assert_allclose(np.asarray(q_got), np.asarray(q_ref), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(f_got, dtype=np.float32), np.asarray(f_ref, np.float32),
        atol=0.03)


def test_prolong_correct_kernel_matches_xla():
    """q + prolong(e_c) streaming kernel vs the mg XLA chain."""
    from fluidx12_tpu.ops.pallas.stencil import prolong_correct_pallas
    from fluidx12_tpu.sim.mg import _prolong

    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((16, 144, 256)).astype(np.float32))
    e = jnp.asarray(rng.standard_normal((8, 72, 128)).astype(np.float32))
    ref = np.asarray(q + _prolong(e))
    got = np.asarray(prolong_correct_pallas(q, e))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_stencil_gates_reject_infeasible_vmem():
    """The support gates must reject shapes whose SMALLEST reachable
    z-block (the odd core of nz -- _pick_bz halves only while even) still
    exceeds the scoped-VMEM budget model: an ungated call would OOM at
    Mosaic compile time (and on axon, wedge the shared relay)."""
    from fluidx12_tpu.ops.pallas.stencil import (
        prolong_pallas_supported,
        stencil_pallas_supported,
    )

    # Production shapes stay supported.
    assert stencil_pallas_supported((128, 128, 128))
    assert stencil_pallas_supported((256, 256, 256))
    assert prolong_pallas_supported((128, 128, 128))
    assert prolong_pallas_supported((256, 256, 256))
    # nz=48 bottoms out at bz=3 (odd), over budget on 1024^2 planes.
    assert not stencil_pallas_supported((48, 1024, 1024))
    # prolong needs an EVEN block (min 2 * odd_core): at 512^2 planes
    # bz=2 already exceeds its model, while the odd-core-1 kernels fit.
    assert stencil_pallas_supported((512, 512, 512))
    assert not prolong_pallas_supported((512, 512, 512))


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


def test_composite_resample_kernel_matches_einsum_chain():
    """FULLY fused march kernel (in-kernel lerp-weight build + MXU resample
    + running composite; ops/pallas/composite.py) vs the einsum + XLA chain
    twin it replaces (render/slicecomp._march_face), with matching bf16
    quantization points, both march directions, and the zero-outside mode
    (the screencomp enlarged plane)."""
    import jax.numpy as jnp
    from fluidx12_tpu.ops.pallas.composite import (
        composite_resample_pallas, composite_resample_supported)
    from fluidx12_tpu.render.slicecomp import _interp_weights

    rng = np.random.default_rng(9)
    ns, a, b, r1, r2 = 8, 128, 128, 16, 128
    absorption = 0.8
    volf = jnp.asarray(rng.uniform(0, 1, (4, ns, a, b)).astype(np.float32))
    # Coords mostly inside, some past the edges (clamp / zero-outside).
    h_rows = jnp.asarray(
        rng.uniform(-4.0, a + 3.0, (ns, r1)).astype(np.float32))
    h_cols = jnp.asarray(
        rng.uniform(-4.0, b + 3.0, (ns, r2)).astype(np.float32))
    valid = jnp.asarray((rng.uniform(0, 1, ns) > 0.2).astype(np.float32))
    nst = jnp.asarray(rng.uniform(0.5, 2, (r1, r2)).astype(np.float32))
    assert composite_resample_supported(ns, a, b, r1, r2)
    assert composite_resample_supported(ns, 160, 160, r1, r2)  # padded lat
    assert not composite_resample_supported(ns, 124, b, r1, r2)  # a % 8
    assert not composite_resample_supported(ns, a, 150, r1, r2)  # b % 16

    def xla_twin(flip, zero_outside):
        bf = jnp.bfloat16
        wr = _interp_weights(h_rows, a, zero_outside=zero_outside).astype(bf)
        wc = _interp_weights(h_cols, b, zero_outside=zero_outside).astype(bf)
        t1 = jnp.einsum("mrv,cmvu->cmru", wr, volf.astype(bf),
                        preferred_element_type=jnp.float32).astype(bf)
        res = jnp.einsum("msu,cmru->cmrs", wc, t1,
                         preferred_element_type=jnp.float32).astype(bf)
        d = jnp.clip(res[0].astype(jnp.float32), 0, 1)
        a_ref = jnp.clip(d * absorption, 0, 0.999)
        alpha = jnp.clip(1 - jnp.power(1 - a_ref, nst[None]), 0, 1 - 1e-6)
        alpha = alpha * valid[:, None, None]
        one_m = 1 - alpha
        if not flip:
            cp = jnp.cumprod(one_m, axis=0)
            transm = jnp.concatenate([jnp.ones_like(cp[:1]), cp[:-1]], 0)
        else:
            cp = jnp.cumprod(one_m[::-1], 0)
            transm = jnp.concatenate([jnp.ones_like(cp[:1]), cp[:-1]], 0)[::-1]
        w = alpha * transm
        w_rate = jnp.where(d > 0, w / jnp.maximum(d, 1e-6), 0)
        rgb = jnp.einsum("cmrs,mrs->crs", res[1:4].astype(jnp.float32), w_rate)
        return jnp.concatenate([w.sum(0)[None], rgb], 0)

    for flip in (False, True):
        for zo in (False, True):
            ref = np.asarray(xla_twin(flip, zo))
            got = np.asarray(composite_resample_pallas(
                volf, h_rows, h_cols, valid, nst, absorption, flip,
                zero_outside=zo))
            np.testing.assert_allclose(got, ref, atol=2e-3,
                                       err_msg=f"flip={flip} zo={zo}")


def test_composite_resample_kernel_padded_lateral():
    """The fused march kernel on a PADDED-lateral volume (a_log/b_log,
    core/padding.py layout) == the einsum twin on the CROPPED volume with
    logical-edge clamps; poisoned ghost texels never contribute.  The
    output plane is intentionally NOT 128-lane aligned (r2 = 72): padded
    grids' cube faces are logical-sized (150^2 at the FluidGI preset)."""
    import jax.numpy as jnp
    from fluidx12_tpu.ops.pallas.composite import (
        composite_resample_pallas, composite_resample_supported)
    from fluidx12_tpu.render.slicecomp import _interp_weights

    rng = np.random.default_rng(17)
    ns, a, b = 6, 16, 128
    a_log, b_log = 13, 100
    r1, r2 = 24, 72
    absorption = 0.7
    volf = rng.uniform(0, 1, (4, ns, a, b)).astype(np.float32)
    volf[:, :, a_log:, :] = 7.0   # poisoned ghosts
    volf[:, :, :, b_log:] = -7.0
    volf = jnp.asarray(volf)
    h_rows = jnp.asarray(
        rng.uniform(-2.0, a_log + 2.0, (ns, r1)).astype(np.float32))
    h_cols = jnp.asarray(
        rng.uniform(-2.0, b_log + 2.0, (ns, r2)).astype(np.float32))
    valid = jnp.ones((ns,), jnp.float32)
    nst = jnp.asarray(rng.uniform(0.5, 2, (r1, r2)).astype(np.float32))
    assert composite_resample_supported(ns, a, b, r1, r2)

    bf = jnp.bfloat16
    crop = volf[:, :, :a_log, :b_log].astype(bf)
    wr = _interp_weights(h_rows, a_log).astype(bf)
    wc = _interp_weights(h_cols, b_log).astype(bf)
    t1 = jnp.einsum("mrv,cmvu->cmru", wr, crop,
                    preferred_element_type=jnp.float32).astype(bf)
    res = jnp.einsum("msu,cmru->cmrs", wc, t1,
                     preferred_element_type=jnp.float32).astype(bf)
    d = jnp.clip(res[0].astype(jnp.float32), 0, 1)
    a_ref = jnp.clip(d * absorption, 0, 0.999)
    alpha = jnp.clip(1 - jnp.power(1 - a_ref, nst[None]), 0, 1 - 1e-6)
    cp = jnp.cumprod(1 - alpha, axis=0)
    transm = jnp.concatenate([jnp.ones_like(cp[:1]), cp[:-1]], 0)
    w = alpha * transm
    w_rate = jnp.where(d > 0, w / jnp.maximum(d, 1e-6), 0)
    rgb = jnp.einsum("cmrs,mrs->crs", res[1:4].astype(jnp.float32), w_rate)
    ref = np.asarray(jnp.concatenate([w.sum(0)[None], rgb], 0))

    got = np.asarray(composite_resample_pallas(
        volf, h_rows, h_cols, valid, nst, absorption, flip=False,
        a_log=a_log, b_log=b_log))
    np.testing.assert_allclose(got, ref, atol=2e-3)
    assert np.isfinite(got).all()


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


def test_gi_light_kernel_matches_xla_chain():
    """Fused GI light-map kernel (interpret mode) vs the channel-leading XLA
    chain it replaces (render/lightmap_sweep.py GI branch)."""
    from fluidx12_tpu.core import math3d as m3
    from fluidx12_tpu.core.camera import OrbitCamera
    from fluidx12_tpu.core.config import FluidConfig
    from fluidx12_tpu.core.state import default_scene_params
    from fluidx12_tpu.ops.pallas.stencil import gi_light_pallas
    from fluidx12_tpu.ops.transform import transform_vector
    from fluidx12_tpu.render.lightmap_sweep import (
        _ambient_occlusion, directional_transmittance, render_light_map_fast)
    from fluidx12_tpu.render.raymarch_core import MAX_DIST

    cfg = FluidConfig(grid_size=(128, 128, 32), has_light_probe=True)
    rng = np.random.default_rng(0)
    nz, ny, nx = cfg.zyx
    dens = rng.uniform(0, 0.6, (nz, ny, nx)).astype(np.float32)
    for ax in range(3):
        dens = (np.roll(dens, 1, ax) + dens + np.roll(dens, -1, ax)) / 3
    grid = np.zeros((4, nz, ny, nx), np.float32)
    grid[3] = dens
    grid[:3] = dens * 0.5
    cam = OrbitCamera(width=64, height=64)
    world = m3.scaling(cfg.volume_scale)
    p = default_scene_params(cfg)._replace(
        eye_pt=jnp.asarray(cam.eye), world=jnp.asarray(world),
        world_i=jnp.asarray(m3.inverse(world)))
    sh = jnp.asarray(rng.uniform(0, 0.3, (9, 3)).astype(np.float32))

    lm_chain = np.asarray(render_light_map_fast(jnp.asarray(grid), p, cfg, sh))

    dt = jnp.asarray(grid[3])
    lp = np.asarray(cfg.light_pos, np.float32)
    major = int(np.argmax(np.abs(lp)))
    local_light = transform_vector(p.light_pt, p.world_i)
    ld = (local_light / jnp.linalg.norm(local_light)).astype(jnp.float32)
    ref_step = MAX_DIST / p.num_light_samples.astype(jnp.float32)
    shadow = directional_transmittance(dt, ld, major, ref_step,
                                       cfg.absorption, flip=bool(lp[major] > 0))
    shadow = jnp.where(dt >= cfg.zero_threshold, shadow, 1.0)
    ao = _ambient_occlusion(dt, None, None, None, ref_step, cfg)
    lm_k = np.asarray(gi_light_pallas(
        dt, shadow, ao, sh, p.world[:3, :3],
        p.light_color[:3] * p.light_color[3], cfg.zero_threshold))
    np.testing.assert_allclose(lm_k, lm_chain, atol=5e-6)


def test_zpass_fused_forces_matches_xla():
    """z-pass kernel with the fused impulse/forces epilogue (interpret) vs
    the XLA twin followed by apply_impulse_forces."""
    from fluidx12_tpu.core.config import FluidConfig
    from fluidx12_tpu.ops.pallas.advect import (
        backtrace_pallas, zpass_forces_supported)
    from fluidx12_tpu.sim.advect import apply_impulse_forces
    from fluidx12_tpu.sim.advect_fast import _backtrace_split

    cfg = FluidConfig(grid_size=(128, 128, 16))
    assert zpass_forces_supported(cfg)
    rng = np.random.default_rng(2)
    both = jnp.asarray(rng.uniform(0, 1, (7,) + cfg.zyx).astype(np.float32))
    both = both.at[:3].multiply(0.5)
    dt = cfg.time_step

    ref_bt = _backtrace_split(both, dt, cfg)
    v_ref, c_ref = apply_impulse_forces(ref_bt[:3], ref_bt[3:], dt, cfg)

    got = backtrace_pallas(both, dt, cfg, forces_dt=dt)
    # Interior only: the z kernel clamps at walls where the XLA twin mirrors
    # (documented deviation); forces math itself is position-exact.
    sl = (slice(None), slice(1, -1), slice(14, -14), slice(14, -14))
    np.testing.assert_allclose(np.asarray(got[:3])[sl],
                               np.asarray(v_ref)[sl], atol=3e-5)
    np.testing.assert_allclose(np.asarray(got[3:])[sl],
                               np.asarray(c_ref)[sl], atol=3e-5)


def test_advect_fused_xy_matches_two_pass():
    """Fused x+y kernel (_pass_kernel_fused_xy) vs the two-pass form, both
    tiers.  The fused path quantizes its VMEM intermediate through the
    storage dtype at exactly the point the two-pass form round-trips HBM,
    so the results differ only by f32 tap re-association."""
    import dataclasses
    from fluidx12_tpu.core.config import FluidConfig
    from fluidx12_tpu.ops.pallas.advect import (
        backtrace_pallas, _run_pass_fused_xy, fused_xy_supported)

    cfg_on = FluidConfig(grid_size=(32, 16, 16))
    cfg_off = dataclasses.replace(cfg_on, advect_fuse_xy=False)
    assert fused_xy_supported(cfg_on.zyx, interpret=True)
    rng = np.random.default_rng(7)
    for umax, tag in ((0.8, "calm"), (4.0, "heavy")):
        both = jnp.asarray(
            rng.uniform(0, 1, (7,) + cfg_on.zyx).astype(np.float32))
        both = both.at[:3].set((both[:3] - 0.5) * (2 * umax))
        interior = np.zeros(cfg_on.zyx, np.float32)
        interior[3:-3, 6:-6, 6:-6] = 1.0
        both = both.at[:3].multiply(jnp.asarray(interior))
        dt = cfg_on.time_step
        ref = np.asarray(backtrace_pallas(both, dt, cfg_off))
        got = np.asarray(backtrace_pallas(both, dt, cfg_on))
        np.testing.assert_allclose(got, ref, atol=3e-5, err_msg=tag)

    # Direct unit check with bf16 storage: the quantization point must
    # bit-match the two-pass HBM round trip (tap math stays f32, so only
    # re-association noise remains -- bounded well under one bf16 ulp of
    # the [0, 1] data here).
    vol8 = jnp.asarray(
        rng.uniform(0, 1, (7, 8, 16, 128)).astype(np.float32))
    volb = vol8.astype(jnp.bfloat16)
    got_b = _run_pass_fused_xy(volb, True, 0.7, -0.45)
    assert got_b is not None and got_b.dtype == jnp.bfloat16
    from fluidx12_tpu.ops.pallas.advect import _run_pass_fused
    step1 = _run_pass_fused(volb, axis=3, interpret=True, disp_ch=0,
                            scale=0.7)
    step2 = _run_pass_fused(step1, axis=2, interpret=True, disp_ch=1,
                            scale=-0.45)
    np.testing.assert_allclose(
        np.asarray(got_b, np.float32), np.asarray(step2, np.float32),
        atol=2e-2)


def test_advect_fused_xy_slab1():
    """slab = 1 layout (the 256^3 operating point, where one (Y, X) plane
    fills the whole block budget): channel visit order and the scratch
    displacement persistence must behave identically to bigger slabs."""
    from fluidx12_tpu.ops.pallas.advect import (
        _run_pass_fused, _run_pass_fused_xy)

    rng = np.random.default_rng(11)
    # ny * nx = 64 * 1024 == _BLOCK_BUDGET_ELEMS exactly -> slab = 1.
    vol = jnp.asarray(rng.uniform(0, 1, (7, 2, 256, 256)).astype(np.float32))
    vol = vol.at[:3].set((vol[:3] - 0.5) * 6.0)  # heavy tier
    got = _run_pass_fused_xy(vol, True, 0.9, 0.6)
    assert got is not None
    step1 = _run_pass_fused(vol, axis=3, interpret=True, disp_ch=0, scale=0.9)
    step2 = _run_pass_fused(step1, axis=2, interpret=True, disp_ch=1, scale=0.6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(step2), atol=3e-5)


def test_shear_scan_kernel_matches_einsum_sweep():
    """Streaming shear-scan kernel vs the einsum shear/cumsum/unshear form
    (2-tap-identical weights and zero lateral boundaries; only summation
    precision differs).  Covers positive AND negative lateral slopes (the
    sign-dependent pad) and fractional shifts."""
    from fluidx12_tpu.render.lightmap_sweep import directional_transmittance

    rng = np.random.default_rng(5)
    # Global (Z, Y, X) = (16, 16, 128): major axis z -> pooled slices are
    # (16, 16, 128) lateral planes, which pass the kernel's roll gate.
    density = jnp.asarray(rng.uniform(0, 0.9, (16, 16, 128)).astype(np.float32))
    ref_step = jnp.float32(2.0 / 64)
    for ld in ((0.35, -0.45, 0.82), (-0.2, 0.3, -0.93)):
        light = np.asarray(ld, np.float32)
        light /= np.linalg.norm(light)
        flip = bool(light[2] > 0)
        fast = directional_transmittance(
            density, jnp.asarray(light), 2, ref_step, 12.0, flip=flip,
            use_pallas=True)
        ref = directional_transmittance(
            density, jnp.asarray(light), 2, ref_step, 12.0, flip=flip,
            use_pallas=False)
        # Summation order differs (f32 running carry vs MXU matmul +
        # cumsum); transmittance in [0, 1] agrees to a few 1e-4.
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                                   atol=5e-4)


def test_lateral_pass_rejects_non_roll_clean_dims():
    """Hardware-mode lateral passes must return None on non-roll-clean
    resampled dims: Mosaic pads them in VMEM (150 lanes pad 1.7x) and the
    padded tap temporaries blew the 16 MB scoped stack at the FluidGI
    150^3 preset.  The gate fires before any pallas_call is built, so it
    is testable on CPU with interpret=False."""
    from fluidx12_tpu.ops.pallas.advect import (
        _run_pass, _run_pass_fused, fused_xy_supported)

    vol = jnp.zeros((7, 2, 150, 150), jnp.bfloat16)
    disp = jnp.zeros((2, 150, 150), jnp.float32)
    assert _run_pass_fused(vol, axis=3, interpret=False, disp_ch=0,
                           scale=0.5) is None
    assert _run_pass_fused(vol, axis=2, interpret=False, disp_ch=1,
                           scale=0.5) is None
    assert _run_pass(vol, disp, axis=3, interpret=False) is None
    assert not fused_xy_supported((150, 150, 150))
