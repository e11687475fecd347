"""Benchmark harness: flagship sim+render steps/sec on real hardware.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
The baseline target is 60 sim+render steps/sec at 128^3 on one TPU v5e chip
(BASELINE.md).  Extra diagnostic lines go to stderr.

Modes (combinable):
  python bench.py           headline only
  python bench.py --all     + the full BASELINE.json config suite, with
                            per-pass composed-delta ms and an HBM roofline
                            estimate per pass (SURVEY.md section 6)
  python bench.py --check   + TPU-vs-CPU-golden image consistency at the
                            golden configs (the WARP-vs-hardware cross-check;
                            pytest runs CPU-only, so this is the only place
                            the TPU's images are verified, not just timed)
"""

import json
import os
import sys
import time


def _sync(x):
    # On the axon TPU relay, block_until_ready can return before remote
    # execution completes; a small device->host fetch is the only reliable
    # completion barrier (see CLAUDE.md).
    import numpy as np

    np.asarray(x.ravel()[:4])


_CANARY_CODE = """
import time
import jax, jax.numpy as jnp, numpy as np
try:
    jax.config.update("jax_compilation_cache_dir", "/root/.jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass
x = jnp.zeros((256, 256), jnp.float32)
f = jax.jit(lambda a: a * 2.0 + 1.0)
x = f(x)
np.asarray(x.ravel()[:4])
t0 = time.perf_counter()
for _ in range(50):
    x = f(x)
np.asarray(x.ravel()[:4])
print("CANARY_MS", (time.perf_counter() - t0) / 50 * 1000, flush=True)
"""


def _canary_ms():
    """Trivial-jit chained call rate (ms/call) or None; the relay-health
    probe, run in a SUBPROCESS.

    Healthy: ~0.8-1.3 ms/call.  Multi-second readings (or a multi-minute
    first call) mean the axon relay is wedged/degraded -- a state external
    sessions can induce (a client killed mid-compile poisons the shared
    remote-compile service for ~1 h, CLAUDE.md).  A subprocess keeps the
    probe's backend state out of this process: a relay that is fully DOWN
    fails backend init, and jax caches that failure per process -- probing
    in-process would leave bench unable to ever init the backend after
    recovery.  No timeout: killing a relay client mid-compile is what
    wedges the service in the first place; a down relay returns the init
    error on its own (observed ~25 min worst case)."""
    import subprocess

    r = subprocess.run([sys.executable, "-c", _CANARY_CODE],
                       capture_output=True, text=True)
    for line in r.stdout.splitlines():
        if line.startswith("CANARY_MS"):
            return float(line.split()[1])
    tail = (r.stderr or "").strip().splitlines()
    print(f"# relay canary subprocess failed (rc {r.returncode}): "
          f"{tail[-1] if tail else '?'}", file=sys.stderr)
    return None


def _wait_for_healthy_relay(budget_s=900.0, threshold_ms=2.5):
    """Poll the canary until the relay looks healthy or the budget runs out.

    Returns the last canary reading (ms/call; None = backend unavailable).
    A single probe can itself block for many minutes behind a wedged
    compile queue; that wait counts against the budget naturally."""
    deadline = time.perf_counter() + budget_s
    while True:
        ms = _canary_ms()
        healthy = ms is not None and ms < threshold_ms
        state = ("healthy" if healthy
                 else "DOWN" if ms is None else "degraded")
        print(f"# relay canary: "
              f"{'n/a' if ms is None else f'{ms:.3f} ms/call'} [{state}]",
              file=sys.stderr)
        if healthy or time.perf_counter() > deadline:
            return ms
        time.sleep(30.0)


def main():
    import jax

    # Persistent compile cache: TPU remote compiles here take minutes; warm
    # runs then start in seconds.
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    canary_ms = _wait_for_healthy_relay()

    from __graft_entry__ import entry

    fn, (state, params) = entry()
    step = jax.jit(fn, donate_argnums=(0,))

    # Warmup / compile.  If the backend is unavailable (relay outage: init
    # blocks ~25 min then raises UNAVAILABLE), still emit an honest JSON
    # line so the round's record shows WHY there is no number.
    t0 = time.perf_counter()
    try:
        state, image = step(state, params)
        _sync(image)
    except Exception as e:
        print(json.dumps({
            "metric": "sim+render steps/sec @128^3 (separate-light cube-map path)",
            "value": 0.0,
            "unit": "steps/s",
            "vs_baseline": 0.0,
            "error": f"TPU backend unavailable: {type(e).__name__}: {str(e)[:200]}",
            "relay_canary_ms": (None if canary_ms is None
                                else round(canary_ms, 3)),
        }))
        return
    compile_s = time.perf_counter() - t0
    print(f"# compile+first-step: {compile_s:.1f}s", file=sys.stderr)

    # Let the smoke develop to steady state so the march and the adaptive
    # advect taps (ops/pallas/advect.py) do their real, worst-case work --
    # a short warmup would overstate throughput on a near-empty volume.
    for _ in range(300):
        state, image = step(state, params)
    _sync(image)

    # Timed run with async dispatch, syncing only at the end.  Three trials,
    # best wins: the axon relay adds 1-4 ms of per-window jitter unrelated
    # to device throughput (CLAUDE.md perf notes), and the best trial is the
    # closest estimate of the chip's actual pace.
    n = 60
    best = 0.0
    for trial in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            state, image = step(state, params)
        _sync(image)
        elapsed = time.perf_counter() - t0
        best = max(best, n / elapsed)
        print(f"# trial {trial}: {n / elapsed:.2f} steps/s", file=sys.stderr)

    steps_per_sec = best

    # Secondary (disclosed, not the headline): scan-batched submission --
    # K frames per device dispatch via lax.scan, same frame semantics as
    # sequential per-step calls with a static camera (equality spot-checked
    # on device below; batched_matches_sequential in the JSON).  It
    # amortizes the axon relay's ~1-2 ms per-dispatch overhead, so it
    # approximates the chip's pace with a locally attached host; the
    # headline stays per-step dispatch because the reference app presents
    # every frame.
    batched_sps = None
    batched_exact = None
    try:
        import numpy as np

        k = 8

        def kstep_fn(s, p):
            def body(carry, _):
                s2, img = fn(carry, p)
                return s2, img

            s_out, imgs = jax.lax.scan(body, s, None, length=k)
            return s_out, imgs[-1]

        kstep = jax.jit(kstep_fn, donate_argnums=(0,))
        # On-device equality spot-check of THIS batched program against k
        # sequential per-step calls from the same state (the engine's
        # step_frames form has its own test; this one is what produces the
        # reported field).
        snap = jax.device_get(state)
        s_seq = jax.device_put(snap)
        for _ in range(k):
            s_seq, img_seq = step(s_seq, params)
        img_seq = jax.device_get(img_seq)
        state, image = kstep(jax.device_put(snap), params)
        _sync(image)
        d = np.abs(np.asarray(image, np.float32) - img_seq.astype(np.float32))
        batched_exact = bool(d.max() == 0.0)
        if not batched_exact:
            print(f"# batched-vs-sequential max diff {d.max():.3e}",
                  file=sys.stderr)
        for _ in range(60 // k):
            state, image = kstep(state, params)
        _sync(image)
        bb = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(64 // k):
                state, image = kstep(state, params)
            _sync(image)
            bb = max(bb, 64 / (time.perf_counter() - t0))
        batched_sps = bb
        print(f"# batched (k={k}): {bb:.2f} steps/s", file=sys.stderr)
    except Exception as e:
        print(f"# batched case failed: {type(e).__name__}: {e}", file=sys.stderr)

    baseline = 60.0
    result = {
        "metric": "sim+render steps/sec @128^3 (separate-light cube-map path)",
        "value": round(steps_per_sec, 2),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / baseline, 3),
        "method": "best of 3x60-step trials (relay-jitter isolation); "
                  "per-step dispatch (one device call per frame)",
        "relay_canary_ms": (None if canary_ms is None
                            else round(canary_ms, 3)),
    }
    if batched_sps is not None:
        result["batched_k8_steps_per_sec"] = round(batched_sps, 2)
        result["batched_matches_sequential"] = batched_exact

    # --all / --check write BENCH_ALL.json next to the headline JSON so the
    # full suite + golden verdicts are machine-readable artifacts, not
    # stderr quotes (VERDICT r3 item 5; ref: FluidX12.cpp:662-710).
    artifact = {"relay_canary_ms": result["relay_canary_ms"],
                "headline": result}
    if "--all" in sys.argv:
        artifact["configs"] = run_config_suite()
        artifact["breakdown"] = run_pass_breakdown()
    if "--check" in sys.argv:
        artifact["goldens"] = run_golden_check()
        artifact["sharded_pallas"] = run_sharded_pallas_check()
    if "--all" in sys.argv or "--check" in sys.argv:
        path = os.path.join(os.path.dirname(__file__), "BENCH_ALL.json")
        with open(path, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"# wrote {path}", file=sys.stderr)

    print(json.dumps(result))


def _time_engine(engine, warm=20, n=15, trials=3, batch=1):
    """Best of `trials` timing windows -- same methodology as the headline
    (the axon relay adds 1-4 ms of per-window jitter unrelated to device
    throughput; a single window overstates ms/step by jitter/n).

    batch > 1 drives engine.step_frames(batch) (scan-batched dispatch);
    warm/n stay in UNITS OF FRAMES so the timed work matches the per-step
    cases."""
    import numpy as np

    def do():
        return (engine.step_frames(batch) if batch > 1
                else engine.step_frame())

    img = do()
    np.asarray(img.ravel()[:4])
    for _ in range(max(1, warm // batch)):
        img = do()
    np.asarray(img.ravel()[:4])
    best = float("inf")
    calls = max(1, n // batch)
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(calls):
            img = do()
        np.asarray(img.ravel()[:4])
        best = min(best, (time.perf_counter() - t0) / (calls * batch))
    return best


def run_config_suite():
    """Measure every BASELINE.json config; one stderr line each.  Returns
    the rows as dicts for the BENCH_ALL.json artifact."""
    from fluidx12_tpu.core.config import PRESETS, FluidConfig, RenderMethod

    from fluidx12_tpu.engine.fluidx import FluidXEngine

    def gi_radiance():
        import numpy as np

        path = os.path.join(os.path.dirname(__file__), "assets", "rnl_cross.npz")
        return np.load(path)["radiance"].astype(np.float32)

    # Suite rows use n=60-step windows like the headline: the relay's
    # 1-4 ms per-window jitter over short windows under-read the fast
    # configs by ~15% in round 4 (VERDICT r4 item 4).
    cases = [
        ("Fluid2D 512^2 visualize", FluidConfig(grid_size=(512, 512, 1)),
         RenderMethod.RAY_MARCH_SEPARATE, None, 60, 60),
        ("Fluid3D 128^3 separate cube (OPTIMIZED)", FluidConfig(),
         RenderMethod.RAY_MARCH_SEPARATE, None, 60, 60),
        ("Fluid3D 128^3 separate cube (batched k=8)", FluidConfig(),
         RenderMethod.RAY_MARCH_SEPARATE, None, 64, 64, 8),
        ("Fluid3D 128^3 direct ray cast (screen-space)", FluidConfig(),
         RenderMethod.RAY_MARCH_DIRECT_SEPARATE, None, 60, 60),
        # Per-sample shadow rays through the screen-space warp (the last
        # unbenchmarked method row, VERDICT r3 item 8).
        ("Fluid3D 128^3 direct MERGED (per-sample shadows)", FluidConfig(),
         RenderMethod.RAY_MARCH_DIRECT_MERGED, None, 60, 60),
        ("Fluid3D 128^3 @1080p", FluidConfig(viewport=(1920, 1080)),
         RenderMethod.RAY_MARCH_SEPARATE, None, 40, 40),
        # The direct screen-space warp at 1080p (VERDICT r4 item 10): the
        # base-plane march rides the fully fused kernel; the warp gather is
        # the per-row-cost floor (CLAUDE.md row-gather model).
        ("Fluid3D 128^3 direct @1080p", FluidConfig(viewport=(1920, 1080)),
         RenderMethod.RAY_MARCH_DIRECT_SEPARATE, None, 40, 40),
        ("Fluid3D 256^3 separate cube", FluidConfig(grid_size=(256, 256, 256)),
         RenderMethod.RAY_MARCH_SEPARATE, None, 30, 30),
        # The reference's FluidGI.bat preset verbatim: 150^3 is NOT a
        # 128-multiple; it rides the padded roll-clean storage layout
        # (core/padding.py) so the Pallas kernels engage (VERDICT r4 item 1;
        # ref: Bin/FluidGI.bat:1).
        ("FluidGI preset 150^3 (padded layout)", PRESETS["fluidgi"],
         RenderMethod.RAY_MARCH_SEPARATE, gi_radiance, 30, 30),
        ("FluidGI SH irradiance 256^3", FluidConfig(
            grid_size=(256, 256, 256), has_light_probe=True),
         RenderMethod.RAY_MARCH_SEPARATE, gi_radiance, 30, 30),
    ]
    rows = []
    for name, cfg, method, rad, warm, n, *extra in cases:
        try:
            radiance = rad() if rad is not None else None
            engine = FluidXEngine(cfg, radiance=radiance)
            engine.render_method = method
            dt = _time_engine(engine, warm=warm, n=n,
                              batch=extra[0] if extra else 1)
            print(f"# {name}: {dt*1000:.2f} ms/step = {1/dt:.1f} steps/s",
                  file=sys.stderr)
            rows.append({"name": name, "ms_per_step": round(dt * 1000, 3),
                         "steps_per_sec": round(1 / dt, 2)})
        except Exception as e:  # keep the suite best-effort
            print(f"# {name}: FAILED {type(e).__name__}: {e}", file=sys.stderr)
            rows.append({"name": name,
                         "error": f"{type(e).__name__}: {str(e)[:200]}"})
    return rows


def run_pass_breakdown(n=256):
    """Composed-prefix pass deltas + HBM roofline % at n^3.

    Jits growing prefixes of the pipeline (sim / +light / +march / +resolve
    / +composite) and reports the delta each stage adds to the composed
    step -- the honest number (standalone pass timings carry ~0.8 ms
    dispatch+sync each on this relay).  Roofline % compares the delta
    against the pass's minimum HBM bytes at the measured streaming
    bandwidth envelope.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fluidx12_tpu.core import math3d as m3
    from fluidx12_tpu.core.camera import OrbitCamera
    from fluidx12_tpu.core.config import FluidConfig
    from fluidx12_tpu.core.state import default_scene_params, make_initial_state
    from fluidx12_tpu.render.lightmap_sweep import render_light_map_fast
    from fluidx12_tpu.render.resolve import resolve_cube
    from fluidx12_tpu.render.slicecomp import ray_march_cube_fast
    from fluidx12_tpu.sim.step import simulate
    from fluidx12_tpu.utils.image import composite_premultiplied

    cfg = FluidConfig(grid_size=(n, n, n))
    cam = OrbitCamera(width=cfg.viewport[0], height=cfg.viewport[1])
    world = m3.scaling(cfg.volume_scale)
    wvp = world @ cam.view_proj
    params = default_scene_params(cfg)._replace(
        eye_pt=jnp.asarray(cam.eye), world=jnp.asarray(world),
        world_i=jnp.asarray(m3.inverse(world)), world_view_proj=jnp.asarray(wvp),
        world_view_proj_i=jnp.asarray(m3.inverse(wvp)),
        screen_to_world=jnp.asarray(m3.inverse(cam.view_proj)))

    from fluidx12_tpu.core.lod import gen_visibility_mask, screen_bbox

    vis_mask = gen_visibility_mask(m3.inverse(world), cam.eye)
    rect = screen_bbox(wvp, cfg.viewport)

    def prefix(depth):
        def run(state):
            state = simulate(state, params.time_step, cfg)
            out = state.color
            if depth >= 1:
                lm = render_light_map_fast(out, params, cfg)
                out = lm
            if depth >= 2:
                cube = ray_march_cube_fast(state.color, params, cfg, lm,
                                           static_mask=vis_mask)
                out = cube
            if depth >= 3:
                rgba = resolve_cube(cube, params, cfg, rect=rect)
                out = rgba
            if depth >= 4:
                bg = jnp.broadcast_to(jnp.asarray(cfg.clear_color[:3], rgba.dtype),
                                      rgba.shape[:-1] + (3,))
                out = composite_premultiplied(rgba, bg)
            return state, out

        return jax.jit(run, donate_argnums=(0,))

    # Per-pass minimum HBM traffic (bytes), for the roofline estimate.
    vox = n ** 3
    half = 2  # bf16/f16 bytes
    state_b = 7 * vox * half + vox * 4
    from fluidx12_tpu.sim.mg import mg_fused_supported
    if cfg.mg_project_fused and mg_fused_supported(cfg.zyx, vel_bytes=half):
        # FULLY fused projection (sim/mg.mg_project_fused): divergence rides
        # the pre-smoother windows (vel windows at 1.875x redundancy, b
        # center written once), grad+damp the post-smoother epilogue (vel
        # centers r+w in place); + prolong-correct + coarse cycle.
        proj_b = vox * 4 * (
            (1.875 + 1.0 + 1.0 + 0.125) + 1.875 * 3 * 0.5   # divrr + vel wins
            + 4.75                                          # coarse cycle
            + 1.0 + 0.125 + 1.0                             # prolong-correct
            + (1.875 + 1.875 + 1.0) + 2 * 1.5 * 0.5)        # grad + vel ctr r/w
    elif n * n >= cfg.mg_min_plane:
        # Multigrid pressure path (sim/mg.py): 2 fine smooth calls with
        # 1.875x window redundancy + residual (1-plane z edges) +
        # transfers + coarse cycle; separate div / grad+damp passes.
        poisson_b = vox * 4 * (2 * (2 * 1.875 + 1) + 2.5 + 1.5 + 4.75)
        proj_b = (poisson_b
                  + 3 * vox * half + vox * 4   # divergence (reads vel, f32 out)
                  + 6 * vox * half + 1.25 * vox * 4)  # grad+damp in place
    else:
        poisson_b = vox * 4 * 2 * (64 // 8) * 2.3  # 64-sweep Jacobi trips
        proj_b = (poisson_b + 3 * vox * half + vox * 4
                  + 6 * vox * half + 1.25 * vox * 4)
    from fluidx12_tpu.ops.pallas.advect import fused_xy_supported
    if cfg.advect_fuse_xy and fused_xy_supported(cfg.zyx):
        # Fused x+y kernel: one read + one write of the 7-channel state,
        # plus the channel-0 displacement block re-read once per z step.
        lateral_trips = 2 + 1 / 7
    else:
        lateral_trips = 2 + 2  # separate x and y passes, r+w each
    # EVERY substep streams the full state through the lateral + z passes
    # (sim/advect_fast.py runs advect_substeps backtrace sub-steps; the
    # splitting-error argument at its definition).  The floor charges the
    # algorithm as configured -- 2 substeps = twice the advect bytes.
    n_sub = max(int(cfg.advect_substeps), 1)
    sim_b = (7 * vox * half * n_sub * (lateral_trips + 2.25)  # z: 1.25x halo
             + proj_b)                                        # read + 1 write
    light_b = vox * half + 3 * vox * half * 2
    slices = min(cfg.max_ray_samples, n)
    march_b = 4 * vox * half + 3 * (4 * slices * n * n * half * 3)
    resolve_b = (6 * n * n * 16 * 4 + cfg.viewport[0] * cfg.viewport[1] * 16 * 4)
    comp_b = cfg.viewport[0] * cfg.viewport[1] * 4 * 4 * 3
    mins = [sim_b, light_b, march_b, resolve_b, comp_b]
    BW = 600e9  # measured streaming envelope on this chip (GB/s)

    names = ["simulate", "+light map", "+cube march", "+resolve", "+composite"]
    prev = 0.0
    rows = []
    print(f"# pass breakdown @{n}^3 (composed deltas):", file=sys.stderr)
    for depth, name in enumerate(names):
        f = prefix(depth)
        state = make_initial_state(cfg)
        state, out = f(state)
        _sync(out)
        for _ in range(10):
            state, out = f(state)
        _sync(out)
        t0 = time.perf_counter()
        N = 15
        for _ in range(N):
            state, out = f(state)
        _sync(out)
        ms = (time.perf_counter() - t0) / N * 1000
        delta = ms - prev
        floor_ms = mins[depth] / BW * 1000
        # Sub-floor deltas are measurement noise on a near-zero pass (the
        # composite fuses into the resolve program); cap at 100.
        pct = min(100.0 * floor_ms / max(delta, 1e-6), 100.0)
        print(f"#   {name:14s} {ms:8.2f} ms total, delta {delta:7.2f} ms, "
              f"HBM floor {floor_ms:6.2f} ms -> {pct:5.1f}% of roofline",
              file=sys.stderr)
        rows.append({"pass": name, "grid": n, "total_ms": round(ms, 3),
                     "delta_ms": round(delta, 3),
                     "hbm_floor_ms": round(floor_ms, 3),
                     "roofline_pct": round(pct, 1)})
        prev = ms
    return rows


def run_golden_check():
    """Render the golden configs on the CURRENT backend (TPU) and compare
    against the CPU-rendered goldens in tests/goldens (loose tolerance:
    backend math + bf16 state drift over the run).  Returns rows for
    BENCH_ALL.json, including the faithful-vs-fast frame check at flagship
    resolution (VERDICT r3 item 7)."""
    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from test_golden import CONFIGS, render_case  # noqa: E402

    from fluidx12_tpu.utils.png import read_png

    golden_dir = os.path.join(os.path.dirname(__file__), "tests", "goldens")
    rows = []
    for name in CONFIGS:
        try:
            img = render_case(name).astype(np.int32)
            golden = read_png(os.path.join(golden_dir, f"{name}.png")).astype(np.int32)
            diff = np.abs(img - golden)
            # Tight gates lock in the achieved quality (round-4 measured
            # mean <= 1.1, frac_gt60 <= 0.171% across all goldens) so kernel
            # rewrites cannot silently erode it (VERDICT r4 item 5).
            ok = diff.mean() < 2.0 and (diff > 60).mean() < 0.005
            print(f"# golden-check {name}: mean {diff.mean():.2f}, "
                  f">60 {(diff > 60).mean():.4f} -> {'OK' if ok else 'MISMATCH'}",
                  file=sys.stderr)
            rows.append({"name": name, "mean_diff": round(float(diff.mean()), 3),
                         "frac_gt60": round(float((diff > 60).mean()), 5),
                         "ok": bool(ok)})
        except Exception as e:
            print(f"# golden-check {name}: FAILED {type(e).__name__}: {e}",
                  file=sys.stderr)
            rows.append({"name": name,
                         "error": f"{type(e).__name__}: {str(e)[:200]}"})
    rows.append(run_faithful_frame_check())
    return rows


def run_sharded_pallas_check():
    """Run the SHARDED frame on a 1-device mesh on the real chip with
    use_pallas=True: proves the multi-chip program the dryrun certifies on
    CPU (with XLA twins) compiles and runs with the production Pallas
    kernels inside shard_map on hardware (VERDICT r3 item 4).

    What this exercises: the per-shard render body's Pallas kernels (GI
    ambient chain stencil.gi_light_pallas + the gradient kernels via
    render_light_map_fast, engaged by has_light_probe at 128^3).  The
    sharded SIM bodies are XLA by design (their stencils are re-expressed
    for halo-batched shard_map, parallel/domain.py), so no sim kernel claim
    is made -- the row discloses exactly which gates were live."""
    import numpy as np

    name = "sharded frame + Pallas kernels @1-device mesh (TPU)"
    try:
        import jax
        import jax.numpy as jnp

        from fluidx12_tpu.core import math3d as m3
        from fluidx12_tpu.core.camera import OrbitCamera
        from fluidx12_tpu.core.config import FluidConfig
        from fluidx12_tpu.core.state import (default_scene_params,
                                             make_initial_state)
        from fluidx12_tpu.ops.pallas.stencil import stencil_pallas_supported
        from fluidx12_tpu.parallel.domain import shard_state, sharded_simulate
        from fluidx12_tpu.parallel.mesh import make_grid_mesh
        from fluidx12_tpu.parallel.render import sharded_render_frame

        if jax.default_backend() != "tpu":
            return {"name": name, "skipped": "backend is not tpu"}

        cfg = FluidConfig(has_light_probe=True)  # GI: pallas ambient chain
        camera = OrbitCamera(width=cfg.viewport[0], height=cfg.viewport[1])
        world = m3.scaling(cfg.volume_scale)
        wvp = world @ camera.view_proj
        params = default_scene_params(cfg)._replace(
            eye_pt=jnp.asarray(camera.eye), world=jnp.asarray(world),
            world_i=jnp.asarray(m3.inverse(world)),
            world_view_proj=jnp.asarray(wvp),
            world_view_proj_i=jnp.asarray(m3.inverse(wvp)),
            screen_to_world=jnp.asarray(m3.inverse(camera.view_proj)))
        rng = np.random.default_rng(7)
        sh_coeffs = jnp.asarray(
            rng.uniform(0.0, 0.5, (9, 3)).astype(np.float32))

        mesh = make_grid_mesh(1)
        state = shard_state(make_initial_state(cfg), mesh)

        @jax.jit
        def frame(s):
            s = sharded_simulate(s, cfg.time_step, cfg, mesh)
            return s, sharded_render_frame(s.color, params, cfg, mesh,
                                           sh_coeffs)

        for _ in range(10):
            state, img = frame(state)
        img = np.asarray(img)
        assert np.isfinite(img).all(), "non-finite sharded frame"

        # Cross-check vs the replicated fast pipeline on the same state
        # (the dryrun's equality certificate, now on hardware with the
        # production kernels).
        from fluidx12_tpu.render.lightmap_sweep import render_light_map_fast
        from fluidx12_tpu.render.resolve import resolve_cube
        from fluidx12_tpu.render.slicecomp import ray_march_cube_fast

        grid = jax.device_put(np.asarray(state.color))
        lm = render_light_map_fast(grid, params, cfg, sh_coeffs)
        cube = ray_march_cube_fast(grid, params, cfg, lm)
        ref = np.asarray(resolve_cube(cube, params, cfg))
        d = float(np.abs(img - ref).max())
        ok = d <= 2e-2  # quantized cube levels + bf16 reassociation
        print(f"# {name}: max diff vs replicated {d:.4f} "
              f"-> {'OK' if ok else 'MISMATCH'}", file=sys.stderr)
        return {"name": name, "ok": bool(ok),
                "max_diff_vs_replicated": round(d, 5),
                "pallas_gates": {
                    "use_pallas": bool(cfg.use_pallas),
                    "gi_ambient_stencil": bool(
                        stencil_pallas_supported(cfg.zyx)),
                }}
    except Exception as e:
        print(f"# {name}: FAILED {type(e).__name__}: {e}", file=sys.stderr)
        return {"name": name, "error": f"{type(e).__name__}: {str(e)[:200]}"}


def run_faithful_frame_check():
    """One FAITHFUL-stack frame at flagship resolution (128^3 / 800^2) on
    the current backend, compared against the fast stack from the same
    developed state -- the dual-stack parity argument at the resolution
    being benchmarked, not only at the 48^3 test size (VERDICT r3 item 7;
    SURVEY.md section 4.2).  The faithful frame costs seconds, so it runs
    once here rather than in the per-frame suite."""
    import dataclasses

    import numpy as np

    name = "faithful-vs-fast @128^3/800^2"
    try:
        import jax

        from fluidx12_tpu.core.config import FluidConfig
        from fluidx12_tpu.engine.fluidx import FluidXEngine

        cfg = FluidConfig()  # flagship 128^3, 800^2 viewport
        engine = FluidXEngine(cfg)
        for _ in range(60):
            engine.step_frame()
        snap = jax.device_get(engine.state)  # developed state
        fast = np.asarray(engine.step_frame(), np.float32)

        slow_cfg = dataclasses.replace(cfg, fast_sim=False, fast_render=False,
                                       use_pallas=False)
        slow_engine = FluidXEngine(slow_cfg)
        slow_engine.state = jax.device_put(snap)
        slow = np.asarray(slow_engine.step_frame(), np.float32)
        d = np.abs(fast - slow)
        # u8-scale stats (frames are float [0,1] premultiplied rgba).
        mean255 = float(d.mean() * 255.0)
        max255 = float(d.max() * 255.0)
        ok = mean255 < 2.0
        print(f"# {name}: mean {mean255:.3f}/255, max {max255:.1f}/255 "
              f"-> {'OK' if ok else 'MISMATCH'}", file=sys.stderr)
        return {"name": name, "mean_diff_u8": round(mean255, 3),
                "max_diff_u8": round(max255, 2), "ok": bool(ok)}
    except Exception as e:
        print(f"# {name}: FAILED {type(e).__name__}: {e}", file=sys.stderr)
        return {"name": name, "error": f"{type(e).__name__}: {str(e)[:200]}"}


if __name__ == "__main__":
    main()
