"""Composed-prefix TPU profiling at the flagship (or any cubic) config.

Methodology (CLAUDE.md, "Axon relay measurement"): standalone pass timings
carry 1-4 ms of variable dispatch+sync jitter on the axon relay, so passes
are timed as COMPOSED PREFIXES of the full frame inside one jit --
P0 = sim, P1 = sim+light, P2 = sim+light+march, P3 = full frame -- and the
per-pass cost is the delta between consecutive prefixes.  A trivial-jit
canary brackets the run: healthy ~0.8-1.3 ms/call; multi-second readings
mean the relay is degraded/wedged and NOTHING from the run is trustworthy.

Completion is forced with a tiny device->host fetch (block_until_ready may
return early on the relay).  Each prefix reports the best of three 60-step
trials (relay jitter isolation, same as bench.py).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_tpu.py [N]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def sync(x):
    # The ravel/slice must happen DEVICE-side so only 4 elements cross the
    # relay (CLAUDE.md); np.asarray(leaf) first would fetch the whole array
    # and bias every composed-prefix delta by a full device->host transfer.
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jnp.ravel(leaf)[:4])


def canary(tag):
    x = jnp.zeros((256, 256), jnp.float32)
    f = jax.jit(lambda a: a * 2.0 + 1.0)
    x = f(x)
    sync(x)
    t0 = time.perf_counter()
    for _ in range(50):
        x = f(x)
    sync(x)
    ms = (time.perf_counter() - t0) / 50 * 1000
    health = "healthy" if ms < 2.5 else "DEGRADED -- discard this run"
    print(f"canary ({tag}): {ms:.3f} ms/call  [{health}]", flush=True)


def best_of(step, state, params, trials=3, steps=60, warm=120):
    t0 = time.perf_counter()
    state, out = step(state, params)
    sync(out)
    print(f"  compile+1: {time.perf_counter()-t0:.1f}s", flush=True)
    for _ in range(warm):
        state, out = step(state, params)
    sync(out)
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, out = step(state, params)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / steps)
    return best * 1000


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    from fluidx12_tpu.core import math3d as m3
    from fluidx12_tpu.core.camera import OrbitCamera
    from fluidx12_tpu.core.config import FluidConfig
    from fluidx12_tpu.core.lod import screen_bbox
    from fluidx12_tpu.core.state import default_scene_params, make_initial_state
    from fluidx12_tpu.render.lightmap_sweep import render_light_map_fast
    from fluidx12_tpu.render.resolve import resolve_cube
    from fluidx12_tpu.render.slicecomp import ray_march_cube_fast
    from fluidx12_tpu.sim.step import simulate
    from fluidx12_tpu.utils.image import composite_premultiplied

    config = FluidConfig(grid_size=(n, n, n))
    camera = OrbitCamera(width=config.viewport[0], height=config.viewport[1])
    world = m3.scaling(config.volume_scale)
    wvp = world @ camera.view_proj
    params = default_scene_params(config)._replace(
        eye_pt=jnp.asarray(camera.eye),
        world=jnp.asarray(world),
        world_i=jnp.asarray(m3.inverse(world)),
        world_view_proj=jnp.asarray(wvp),
        world_view_proj_i=jnp.asarray(m3.inverse(wvp)),
        screen_to_world=jnp.asarray(m3.inverse(camera.view_proj)),
    )
    rect = screen_bbox(wvp, config.viewport)
    state0 = make_initial_state(config)
    state_np = jax.device_get(state0)
    print(f"== grid {n}^3, backend {jax.default_backend()} ==", flush=True)
    canary("before")

    def p0(state, params):
        state = simulate(state, params.time_step, config)
        return state, state.fields[0]

    def p1(state, params):
        state = simulate(state, params.time_step, config)
        lm = render_light_map_fast(state.color, params, config)
        return state, lm

    def p2(state, params):
        state = simulate(state, params.time_step, config)
        lm = render_light_map_fast(state.color, params, config)
        cube = ray_march_cube_fast(state.color, params, config, lm, lod=0)
        return state, cube

    def p3(state, params):
        state = simulate(state, params.time_step, config)
        lm = render_light_map_fast(state.color, params, config)
        cube = ray_march_cube_fast(state.color, params, config, lm, lod=0)
        rgba = resolve_cube(cube, params, config, rect=rect)
        bg = jnp.broadcast_to(
            jnp.asarray(config.clear_color[:3], rgba.dtype),
            rgba.shape[:-1] + (3,))
        return state, composite_premultiplied(rgba, bg)

    results = {}
    for name, fn in (("P0 sim", p0), ("P1 +light", p1), ("P2 +march", p2),
                     ("P3 full", p3)):
        step = jax.jit(fn, donate_argnums=(0,))
        s = jax.device_put(state_np)
        print(f"{name}:", flush=True)
        results[name] = best_of(step, s, params)
        print(f"  {results[name]:.2f} ms/step", flush=True)

    print("\n== composed-prefix deltas ==", flush=True)
    prev = 0.0
    for name in ("P0 sim", "P1 +light", "P2 +march", "P3 full"):
        ms = results[name]
        print(f"{name:12s} {ms:7.2f} ms  (delta {ms-prev:+.2f} ms)", flush=True)
        prev = ms
    print(f"headline equivalent: {1000/results['P3 full']:.1f} steps/s",
          flush=True)
    canary("after")


if __name__ == "__main__":
    main()
