"""Sharded step vs single-device step on an 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from fluidx12_tpu.core.config import FluidConfig
from fluidx12_tpu.core.state import make_initial_state
from fluidx12_tpu.parallel.domain import shard_state, sharded_simulate
from fluidx12_tpu.parallel.mesh import make_grid_mesh
from fluidx12_tpu.sim.step import simulate

# The sharded step implements the faithful (gather-based) semantics; pin the
# single-device comparison to the same path.
CFG = FluidConfig(grid_size=(32, 32, 32), num_pressure_iters=16,
                  fast_sim=False, use_pallas=False)


def test_mesh_has_8_devices():
    mesh = make_grid_mesh()
    assert mesh.devices.size == 8


def test_sharded_step_matches_single_device():
    mesh = make_grid_mesh()
    cfg = CFG
    state = make_initial_state(cfg)

    # Warm up some structure with the single-device path first.
    step1 = jax.jit(lambda s: simulate(s, cfg.time_step, cfg))
    for _ in range(5):
        state = step1(state)

    ref = simulate(state, cfg.time_step, cfg)

    sh = shard_state(state, mesh)
    stepN = jax.jit(lambda s: sharded_simulate(s, cfg.time_step, cfg, mesh))
    out = stepN(sh)

    # The advection backtrace clamp only differs when |dz| > ADVECT_HALO
    # voxels, which the reference forcing never reaches; fields should agree
    # to float tolerance.
    np.testing.assert_allclose(
        np.asarray(out.color), np.asarray(ref.color), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.velocity), np.asarray(ref.velocity), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.pressure), np.asarray(ref.pressure), atol=5e-4
    )


def test_sharded_step_keeps_sharding():
    mesh = make_grid_mesh()
    state = shard_state(make_initial_state(CFG), mesh)
    out = jax.jit(lambda s: sharded_simulate(s, CFG.time_step, CFG, mesh))(state)
    assert len(out.velocity.sharding.device_set) == 8


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_sharded_render_matches_single_device_image():
    import jax.numpy as jnp
    import dataclasses
    from fluidx12_tpu.core.config import FluidConfig
    from fluidx12_tpu.models import SmokeModel
    from fluidx12_tpu.parallel.render import sharded_render_frame

    cfg = FluidConfig(grid_size=(16, 16, 16), viewport=(32, 32),
                      max_ray_samples=8, max_light_samples=4,
                      num_pressure_iters=4, use_pallas=False)
    model = SmokeModel(cfg)
    state = model.init()
    params = model.default_params()
    step = jax.jit(model.step, donate_argnums=(0,))
    for _ in range(8):
        state, img_single = step(state, params)

    mesh = make_grid_mesh()
    grid = jax.device_put(state.color)
    img_sharded = sharded_render_frame(grid, params, cfg, mesh)
    # sharded_render_frame returns the premultiplied RGBA resolve; compare
    # against the single-device fast pipeline's resolve of the same state.
    from fluidx12_tpu.render.lightmap_sweep import render_light_map_fast
    from fluidx12_tpu.render.resolve import resolve_cube
    from fluidx12_tpu.render.slicecomp import ray_march_cube_fast
    lm = render_light_map_fast(state.color, params, cfg)
    cube = ray_march_cube_fast(state.color, params, cfg, lm)
    ref = resolve_cube(cube, params, cfg)
    np.testing.assert_allclose(
        np.asarray(img_sharded), np.asarray(ref), atol=2e-5)


def test_sharded_light_map_matches_replicated():
    """The decomposed sweep (parallel/light.py) must reproduce the
    single-device render_light_map_fast for both decomposition shapes:
    lateral-major (all_to_all reshard) and z-major (slab prefix)."""
    import dataclasses
    import functools
    from jax.sharding import PartitionSpec as P
    from fluidx12_tpu.parallel.light import (
        sharded_light_map,
        sharded_light_supported,
    )
    from fluidx12_tpu.parallel.mesh import Z_AXIS
    from fluidx12_tpu.render.lightmap_sweep import render_light_map_fast
    from tests.test_fastpath import _smoke_grid
    from tests.test_render import scene

    mesh = make_grid_mesh()
    grid = jnp.asarray(_smoke_grid(32))
    for light_pos in [(75.0, 75.0, -75.0),   # major = x: all_to_all path
                      (10.0, 20.0, 75.0)]:   # major = z: slab-prefix path
        cfg = FluidConfig(grid_size=(32, 32, 32), viewport=(32, 32),
                          use_pallas=False, light_pos=light_pos)
        assert sharded_light_supported(cfg, 8), light_pos
        params = scene(cfg)
        ref = np.asarray(render_light_map_fast(grid, params, cfg))

        f = functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(None, Z_AXIS, None, None),),
            out_specs=P(None, Z_AXIS, None, None),
        )(lambda g: sharded_light_map(g, params, cfg, None))
        out = np.asarray(jax.jit(f)(grid))
        np.testing.assert_allclose(out, ref, atol=2e-5, err_msg=str(light_pos))


def test_sharded_light_map_pooled_matches_replicated(monkeypatch):
    """The half-lateral-resolution shadow pooling that render_light_map_fast
    applies on big grids must be mirrored by the sharded twin (it engages
    at _LAT_POOL_MIN=256 laterals in production; shrink the threshold so a
    32^3 grid exercises it).  Covers both decomposition shapes: major x
    pools z+y (z-pairs shard-local, unpool lerp crosses seams) and major z
    pools y+x (fully local)."""
    import functools
    from jax.sharding import PartitionSpec as P
    from fluidx12_tpu.parallel.light import (
        sharded_light_map,
        sharded_light_supported,
    )
    from fluidx12_tpu.parallel.mesh import Z_AXIS
    from fluidx12_tpu.render import lightmap_sweep
    from fluidx12_tpu.render.lightmap_sweep import render_light_map_fast
    from tests.test_fastpath import _smoke_grid
    from tests.test_render import scene

    monkeypatch.setattr(lightmap_sweep, "_LAT_POOL_MIN", 16)
    mesh = make_grid_mesh()
    grid = jnp.asarray(_smoke_grid(32))
    for light_pos in [(75.0, 75.0, -75.0),   # major = x: z is a pooled dim
                      (10.0, 20.0, 75.0)]:   # major = z: local y/x pooling
        cfg = FluidConfig(grid_size=(32, 32, 32), viewport=(32, 32),
                          use_pallas=False, light_pos=light_pos)
        arr_axis = {0: 2, 1: 1, 2: 0}[
            int(np.argmax(np.abs(np.asarray(light_pos))))]
        assert lightmap_sweep._lat_pooled_ok(cfg.zyx, arr_axis)
        assert sharded_light_supported(cfg, 8), light_pos
        params = scene(cfg)
        ref = np.asarray(render_light_map_fast(grid, params, cfg))

        f = functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(None, Z_AXIS, None, None),),
            out_specs=P(None, Z_AXIS, None, None),
        )(lambda g: sharded_light_map(g, params, cfg, None))
        out = np.asarray(jax.jit(f)(grid))
        np.testing.assert_allclose(out, ref, atol=2e-5, err_msg=str(light_pos))


def test_smoke_ensemble_matches_independent_members():
    """Data-parallel ensemble (parallel/ensemble.py): one vmapped program
    over member-sharded states must reproduce each member run
    independently through SmokeModel, and distinct init noise must make
    members diverge."""
    import jax.tree_util as jtu
    from fluidx12_tpu.models.smoke import SmokeModel
    from fluidx12_tpu.parallel.ensemble import SmokeEnsemble

    cfg = FluidConfig(grid_size=(24, 24, 24), viewport=(32, 32),
                      use_pallas=False)
    ens = SmokeEnsemble(cfg, batch=8, mesh=make_grid_mesh())
    states0 = ens.init(seed=3)
    params = ens.default_params()
    step = jax.jit(ens.step)
    states, imgs = step(ens.shard(states0), ens.shard(params))
    states, imgs = step(states, ens.shard(params))
    imgs = np.asarray(imgs)

    model = SmokeModel(cfg)
    mstep = jax.jit(model.step)
    p1 = model.default_params()
    for b in range(8):
        sb = jtu.tree_map(lambda a, b=b: a[b], states0)
        for _ in range(2):
            sb, img = mstep(sb, p1)
        # The vmapped program fuses/reassociates differently than the
        # single-member one; an epsilon at a quantize_unorm8 rounding
        # boundary can flip ONE cube-map level (1/255).  Require near-exact
        # almost everywhere and any stragglers within one quantization step.
        diff = np.abs(imgs[b] - np.asarray(img))
        assert (diff > 2e-5).mean() < 1e-3, f"member {b}: {diff.max()}"
        assert diff.max() <= 1.0 / 255.0 + 2e-5, f"member {b}: {diff.max()}"
    assert np.abs(imgs[0] - imgs[1]).max() > 1e-6  # members diverged


def test_sharded_ensemble_simulate_matches_per_member():
    """Composed data x spatial parallelism: 2 members x 4 Z-slabs on the
    8-device mesh must reproduce each member run through the 1D Z-sharded
    step on its own 4-device mesh -- the member axis is pure DP, so the
    composition may add NOTHING numerically (measured bit-identical; the
    1D step's own fidelity vs single-device is pinned by
    test_sharded_step_matches_single_device)."""
    import jax.tree_util as jtu
    from fluidx12_tpu.parallel.ensemble import (
        make_ensemble_mesh,
        sharded_ensemble_simulate,
    )

    cfg = CFG
    step1 = jax.jit(lambda s: simulate(s, cfg.time_step, cfg))
    # Two distinct members: different warmup depths.
    members = []
    s = make_initial_state(cfg)
    for i in range(6):
        s = step1(s)
        if i in (3, 5):
            members.append(s)

    mesh = make_ensemble_mesh(2, 4)
    stacked = jtu.tree_map(lambda *xs: jnp.stack(xs), *members)
    out = jax.jit(lambda st: sharded_ensemble_simulate(
        st, cfg.time_step, cfg, mesh))(stacked)
    assert len(out.fields.sharding.device_set) == 8

    mesh1 = make_grid_mesh(4)
    for b, m in enumerate(members):
        ref = jax.jit(lambda st: sharded_simulate(
            st, cfg.time_step, cfg, mesh1))(shard_state(m, mesh1))
        np.testing.assert_allclose(
            np.asarray(out.fields[b], np.float32),
            np.asarray(jnp.concatenate([ref.velocity, ref.color], axis=0),
                       np.float32),
            atol=1e-6, err_msg=f"member {b} fields")
        np.testing.assert_allclose(
            np.asarray(out.pressure[b]), np.asarray(ref.pressure),
            atol=1e-6, err_msg=f"member {b} pressure")


def test_sharded_ensemble_render_matches_per_member():
    """Composed render: 2 members x 4 Z-slabs must reproduce each member
    run through the 1D sharded render on its own 4-device mesh (same
    composition rule as the sim: the member axis adds nothing)."""
    import jax.tree_util as jtu
    from fluidx12_tpu.models import SmokeModel
    from fluidx12_tpu.parallel.ensemble import (
        make_ensemble_mesh,
        sharded_ensemble_render,
    )
    from fluidx12_tpu.parallel.render import sharded_render_frame

    cfg = FluidConfig(grid_size=(16, 16, 16), viewport=(32, 32),
                      max_ray_samples=8, max_light_samples=4,
                      num_pressure_iters=4, use_pallas=False)
    model = SmokeModel(cfg)
    params = model.default_params()
    # Two distinct member states (different warmup depths).
    step = jax.jit(model.step, donate_argnums=(0,))
    members, state = [], model.init()
    for i in range(8):
        state, _ = step(state, params)
        if i in (5, 7):
            members.append(state.color)

    mesh = make_ensemble_mesh(2, 4)
    grids = jnp.stack(members)
    paramsB = jtu.tree_map(
        lambda a: jnp.broadcast_to(a[None], (2,) + a.shape), params)
    out = np.asarray(jax.jit(lambda g, p: sharded_ensemble_render(
        g, p, cfg, mesh))(grids, paramsB))

    mesh1 = make_grid_mesh(4)
    for b, grid in enumerate(members):
        ref = sharded_render_frame(jax.device_put(grid), params, cfg, mesh1)
        np.testing.assert_allclose(out[b], np.asarray(ref), atol=1e-6,
                                   err_msg=f"member {b}")


def test_sharded_light_gate_rejects_divergent_resolutions():
    """Configs where the single-device fast path would pool (shadow) or
    halve (AO) but the sharded layout cannot must be REJECTED, not run
    divergently: zg=40 on 8 devices gives zl=5 (odd)."""
    from fluidx12_tpu.parallel.light import sharded_light_supported

    # Odd local z + replicated half-res AO would diverge -> unsupported.
    cfg = FluidConfig(grid_size=(32, 32, 40), viewport=(32, 32),
                      use_pallas=False, has_light_probe=True,
                      light_pos=(10.0, 20.0, 75.0))
    assert not sharded_light_supported(cfg, 8)
    # Same grid without the probe and with a z-major light: the shadow
    # pooling gate only bites when z is a LATERAL dim, so this stays
    # supported (lat dims y/x pool locally) as long as slices tile.
    cfg2 = FluidConfig(grid_size=(32, 32, 40), viewport=(32, 32),
                       use_pallas=False, light_pos=(10.0, 20.0, 75.0))
    assert sharded_light_supported(cfg2, 8)


def test_sharded_point_light_map_matches_replicated():
    """The decomposed PROJECTIVE sweep (point light) must reproduce the
    single-device point path of render_light_map_fast for both layouts:
    z-major (slab prefix) and lateral-major (all_to_all reshard)."""
    import functools
    from jax.sharding import PartitionSpec as P
    from fluidx12_tpu.parallel.light import (
        sharded_light_map,
        sharded_light_supported,
    )
    from fluidx12_tpu.parallel.mesh import Z_AXIS
    from fluidx12_tpu.render.lightmap_sweep import (
        point_sweep_supported,
        render_light_map_fast,
    )
    from tests.test_fastpath import _smoke_grid
    from tests.test_render import scene

    mesh = make_grid_mesh()
    grid = jnp.asarray(_smoke_grid(32))
    for light_pos in [(10.0, 20.0, 75.0),    # major = z: slab-prefix path
                      (75.0, 20.0, 30.0)]:   # major = x: all_to_all path
        cfg = FluidConfig(grid_size=(32, 32, 32), viewport=(32, 32),
                          use_pallas=False, point_light=True,
                          light_pos=light_pos)
        assert point_sweep_supported(cfg), light_pos
        assert sharded_light_supported(cfg, 8), light_pos
        params = scene(cfg)
        ref = np.asarray(render_light_map_fast(grid, params, cfg))

        f = functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(None, Z_AXIS, None, None),),
            out_specs=P(None, Z_AXIS, None, None),
        )(lambda g: sharded_light_map(g, params, cfg, None))
        out = np.asarray(jax.jit(f)(grid))
        # atol: the split cumsum (local excl + shard prefix) reassociates
        # f32 sums; observed max 3e-5 on light values ~14 (rel ~3e-6).
        np.testing.assert_allclose(out, ref, atol=1e-4, err_msg=str(light_pos))


def test_sharded_gi_light_map_matches_replicated():
    """Sharded GI ambient (gradient + half-res 6-sweep AO + SH irradiance)
    vs the single-device XLA GI branch."""
    import functools
    from jax.sharding import PartitionSpec as P
    from fluidx12_tpu.parallel.light import (
        sharded_light_map,
        sharded_light_supported,
    )
    from fluidx12_tpu.parallel.mesh import Z_AXIS
    from fluidx12_tpu.render.lightmap_sweep import render_light_map_fast
    from tests.test_fastpath import _smoke_grid
    from tests.test_render import scene

    mesh = make_grid_mesh()
    cfg = FluidConfig(grid_size=(32, 32, 32), viewport=(32, 32),
                      use_pallas=False, has_light_probe=True)
    assert sharded_light_supported(cfg, 8)
    grid = jnp.asarray(_smoke_grid(32))
    params = scene(cfg)
    rng = np.random.default_rng(3)
    sh = jnp.asarray(rng.uniform(-0.2, 0.8, (9, 3)).astype(np.float32))
    ref = np.asarray(render_light_map_fast(grid, params, cfg, sh))

    f = functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, Z_AXIS, None, None), P(None, None)),
        out_specs=P(None, Z_AXIS, None, None),
    )(lambda g, s: sharded_light_map(g, params, cfg, s))
    out = np.asarray(jax.jit(f)(grid, sh))
    np.testing.assert_allclose(out, ref, atol=5e-5)


def test_sharded_mg_matches_single_device():
    """The Z-sharded multigrid V-cycle (parallel/domain._sharded_mg) must
    reproduce the single-device solver (sim/mg.mg_solve): same smoother
    counts, same transfer operators, halo exchanges replacing the clamped
    shifts at shard boundaries."""
    import functools
    from jax.sharding import PartitionSpec as P
    from fluidx12_tpu.parallel.domain import _sharded_mg
    from fluidx12_tpu.parallel.mesh import Z_AXIS
    from fluidx12_tpu.sim.mg import mg_solve

    mesh = make_grid_mesh()
    rng = np.random.default_rng(11)
    n = (16, 144, 144)  # plane > 128x128: the grids where mg engages
    b = rng.uniform(-1, 1, n).astype(np.float32)
    for ax in range(3):
        b = (np.roll(b, 1, ax) + b + np.roll(b, -1, ax)) / 3.0
    b = jnp.asarray(b - b.mean())
    q0 = jnp.zeros(n, jnp.float32)

    ref = np.asarray(mg_solve(q0, b))

    f = functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(Z_AXIS, None, None), P(Z_AXIS, None, None)),
        out_specs=P(Z_AXIS, None, None),
    )(lambda q, d: _sharded_mg(q, d))
    out = np.asarray(jax.jit(f)(q0, b))
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_sharded_batched_sweeps_match_single_device():
    """Halo-depth-batched Jacobi (k sweeps per exchange, redundant halo
    recompute) must match the single-device sweeps exactly."""
    import functools
    from jax.sharding import PartitionSpec as P
    from fluidx12_tpu.parallel.domain import _sharded_sweeps
    from fluidx12_tpu.parallel.mesh import Z_AXIS
    from fluidx12_tpu.sim.project import jacobi_sweeps

    mesh = make_grid_mesh()
    rng = np.random.default_rng(5)
    n = (64, 32, 128)  # zl = 8: two batched rounds at k = 8 for 16 iters
    q = jnp.asarray(rng.uniform(-1, 1, n).astype(np.float32))
    b = jnp.asarray(rng.uniform(-1, 1, n).astype(np.float32))
    ref = np.asarray(jacobi_sweeps(q, b, 16, True))
    f = functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(Z_AXIS, None, None), P(Z_AXIS, None, None)),
        out_specs=P(Z_AXIS, None, None),
    )(lambda qq, d: _sharded_sweeps(qq, d, 16, True))
    out = np.asarray(jax.jit(f)(q, b))
    np.testing.assert_allclose(out, ref, atol=1e-5)
    # A non-multiple iteration count exercises the remainder round.
    ref11 = np.asarray(jacobi_sweeps(q, b, 11, True))
    f11 = functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(Z_AXIS, None, None), P(Z_AXIS, None, None)),
        out_specs=P(Z_AXIS, None, None),
    )(lambda qq, d: _sharded_sweeps(qq, d, 11, True))
    np.testing.assert_allclose(np.asarray(jax.jit(f11)(q, b)), ref11,
                               atol=1e-5)


def test_sharded_mg_fresh_ring_matches_single_device():
    """zl >= pre + 1 engages the fused pre-smooth + residual branch (one
    exchange); must still match the single-device V-cycle."""
    import functools
    from jax.sharding import PartitionSpec as P
    from fluidx12_tpu.parallel.domain import _sharded_mg
    from fluidx12_tpu.parallel.mesh import Z_AXIS
    from fluidx12_tpu.sim.mg import mg_solve

    mesh = make_grid_mesh()
    rng = np.random.default_rng(13)
    n = (64, 144, 144)  # zl = 8 >= MG_PRE + 1
    b = rng.uniform(-1, 1, n).astype(np.float32)
    for ax in range(3):
        b = (np.roll(b, 1, ax) + b + np.roll(b, -1, ax)) / 3.0
    b = jnp.asarray(b - b.mean())
    q0 = jnp.zeros(n, jnp.float32)
    ref = np.asarray(mg_solve(q0, b))
    f = functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(Z_AXIS, None, None), P(Z_AXIS, None, None)),
        out_specs=P(Z_AXIS, None, None),
    )(lambda q, d: _sharded_mg(q, d))
    out = np.asarray(jax.jit(f)(q0, b))
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_sharded_solve_exchange_counts():
    """ICI round trips per pressure solve (VERDICT r3 item 3): the jaxpr's
    ppermute count is the per-solve exchange count x2 (fwd + bwd legs),
    because the batched rounds are a static Python loop.  64-sweep Jacobi
    must take <= 8 exchanges, the mg V-cycle <= 6."""
    import functools
    from jax.sharding import PartitionSpec as P
    from fluidx12_tpu.parallel.domain import _sharded_mg, _sharded_sweeps
    from fluidx12_tpu.parallel.mesh import Z_AXIS

    mesh = make_grid_mesh()

    def count(fn, shape):
        args = [jax.ShapeDtypeStruct(shape, jnp.float32)] * 2
        f = functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(Z_AXIS, None, None),) * 2,
            out_specs=P(Z_AXIS, None, None),
        )(fn)
        return str(jax.make_jaxpr(f)(*args)).count("ppermute")

    # 256 global z over 8 shards: zl = 32, k = 8 -> 8 rounds, rhs rides
    # round 1's message.
    assert count(lambda q, d: _sharded_sweeps(q, d, 64, True),
                 (256, 16, 128)) <= 2 * 8
    # mg: 1 (pre + residual, fresh ring) + 3 (coarse, k = 11) + 1 (prolong)
    # + 1 (post) = 6.
    assert count(lambda q, d: _sharded_mg(q, d), (256, 16, 128)) <= 2 * 6


def test_windowed_pallas_kernel_under_shard_map():
    """A windowed Pallas kernel traced INSIDE shard_map sees the per-device
    LOCAL shape: its plan/gate logic (_plan_planewise / _plan halo
    alignment) must hold at that shape, not the global one (VERDICT r4
    item 7).  Two independent per-shard Jacobi problems relaxed by
    jacobi_pallas (interpret mode) inside shard_map must match the XLA
    sweeps run per shard outside.  Kept to one short dispatch (CPU
    rendezvous budget, CLAUDE.md)."""
    from functools import partial

    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from fluidx12_tpu.ops.pallas.jacobi import jacobi_pallas, jacobi_tuning
    from fluidx12_tpu.sim.project import jacobi_sweeps

    mesh = make_grid_mesh(2)
    rng = np.random.default_rng(21)
    # Global (64, 32, 128): each of 2 Z-shards sees LOCAL (32, 32, 128) --
    # a shape whose whole-window plan differs from the global one.
    q = jnp.asarray(rng.uniform(-1, 1, (64, 32, 128)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-1, 1, (64, 32, 128)).astype(np.float32))
    local_shape = (32, 32, 128)
    tuning = jacobi_tuning(local_shape, 8)
    assert tuning is not None

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=(P("z"), P("z")),
             out_specs=P("z"), check_rep=False)
    def relax_local(ql, bl):
        assert ql.shape == local_shape  # the kernel plans at the LOCAL shape
        return jacobi_pallas(ql, bl, 8, *tuning)

    got = np.asarray(relax_local(q, b))
    for s in range(2):
        ref = np.asarray(jacobi_sweeps(q[32 * s:32 * (s + 1)],
                                       b[32 * s:32 * (s + 1)], 8, True))
        np.testing.assert_allclose(got[32 * s:32 * (s + 1)], ref, atol=2e-6)

    # Gate sanity at sharded shapes: a local shard too thin for any window
    # plan must be rejected (the fallback path), not mis-planned.
    assert jacobi_tuning((4, 32, 128), 8) is None
    assert jacobi_tuning((32, 32, 120), 8) is None  # lane misalignment
