"""Per-pass TPU profiling at the flagship config.

Times each pass by chaining `reps` dispatches and forcing completion with a
single tiny fetch (block_until_ready is unreliable on the axon relay), so
per-call overhead amortizes away.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_tpu.py [N]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[:4])


def timed(name, f, *args, reps=10):
    out = f(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name:40s} {dt:8.2f} ms", flush=True)
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    from fluidx12_tpu.core import math3d as m3
    from fluidx12_tpu.core.camera import OrbitCamera
    from fluidx12_tpu.core.config import FluidConfig
    from fluidx12_tpu.core.state import default_scene_params, make_initial_state
    from fluidx12_tpu.render.lightmap_sweep import render_light_map_fast
    from fluidx12_tpu.render.resolve import resolve_cube
    from fluidx12_tpu.render.slicecomp import ray_march_cube_fast
    from fluidx12_tpu.sim.advect_fast import advect_fast
    from fluidx12_tpu.sim.project import project

    cfg = FluidConfig(grid_size=(n, n, n))
    cam = OrbitCamera()
    world = m3.scaling(10.0)
    wvp = world @ cam.view_proj
    params = default_scene_params(cfg)._replace(
        eye_pt=jnp.asarray(cam.eye), world=jnp.asarray(world),
        world_i=jnp.asarray(m3.inverse(world)), world_view_proj=jnp.asarray(wvp),
        world_view_proj_i=jnp.asarray(m3.inverse(wvp)),
        screen_to_world=jnp.asarray(m3.inverse(cam.view_proj)))
    state = make_initial_state(cfg)
    print(f"== grid {n}^3, backend {jax.default_backend()} ==", flush=True)

    adv = jax.jit(lambda s: advect_fast(s.velocity, s.color, cfg.time_step, cfg))
    vel_col = timed("advect_fast", adv, state)
    prj = jax.jit(lambda v, q: project(v, q, cfg.time_step, cfg))
    v2, q2 = timed("project (pallas jacobi)", prj, vel_col[0], state.pressure)

    grid = vel_col[1]
    lm_f = jax.jit(lambda g: render_light_map_fast(g, params, cfg))
    lm = timed("light map (shear+cumsum)", lm_f, grid)
    cm_f = jax.jit(lambda g, l: ray_march_cube_fast(g, params, cfg, l))
    cube = timed("cube march (bulk einsum)", cm_f, grid, lm)
    rs_f = jax.jit(lambda c: resolve_cube(c, params, cfg))
    timed("resolve 800x800 (record gather)", rs_f, cube)

    from __graft_entry__ import entry

    fn, (st, pp) = entry()
    step = jax.jit(fn, donate_argnums=(0,))
    st, img = step(st, pp)
    sync(img)
    t0 = time.perf_counter()
    N = 30
    for _ in range(N):
        st, img = step(st, pp)
    sync(img)
    dt = (time.perf_counter() - t0) / N
    print(f"{'FULL STEP':40s} {dt*1000:8.2f} ms  => {1/dt:6.1f} steps/s", flush=True)


if __name__ == "__main__":
    main()
