"""Per-pass profiling (the aux tracing subsystem, SURVEY.md section 5.1).

The reference exposes only an FPS title counter; XUSG's GPU timestamp query
API goes unused.  Here profiling is first-class: `profile_passes` times every
pipeline stage on the current backend and returns a dict of milliseconds.

Note on this TPU environment: `block_until_ready` can return before remote
execution finishes (axon relay), so timing forces a tiny device->host fetch,
which is the only reliable completion barrier.
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import numpy as np


def _force(x) -> None:
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[:4])


def time_fn(fn, *args, reps: int = 5) -> float:
    """Median-free simple timing: compile+warm once, then average `reps`."""
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        _force(out)
    return (time.perf_counter() - t0) / reps * 1000.0


def profile_passes(engine, reps: int = 5) -> Dict[str, float]:
    """Time each pipeline stage of a FluidXEngine on its current state."""
    from fluidx12_tpu.render.lightmap import render_light_map
    from fluidx12_tpu.render.lightmap_sweep import render_light_map_fast
    from fluidx12_tpu.render.cubemap import ray_march_cube
    from fluidx12_tpu.render.slicecomp import ray_march_cube_fast
    from fluidx12_tpu.render.resolve import resolve_cube
    from fluidx12_tpu.sim.advect import advect
    from fluidx12_tpu.sim.advect_fast import advect_fast
    from fluidx12_tpu.sim.project import project

    from fluidx12_tpu.core.state import unpack_scene_params

    cfg = engine.config
    packed, lod, vis_mask = engine.update_frame()
    params = unpack_scene_params(packed)
    state = engine.state
    out: Dict[str, float] = {}

    adv = advect_fast if cfg.fast_sim else advect
    adv_j = jax.jit(lambda s: adv(s.velocity, s.color, cfg.time_step, cfg))
    out["advect"] = time_fn(adv_j, state, reps=reps)
    vel, color = adv_j(state)

    prj = jax.jit(lambda v, q: project(v, q, cfg.time_step, cfg))
    out["project"] = time_fn(prj, vel, state.pressure, reps=reps)

    if cfg.is_3d:
        if cfg.fast_render:
            lm_f = jax.jit(lambda g: render_light_map_fast(g, params, cfg, engine.sh_coeffs))
        else:
            lm_f = jax.jit(lambda g: render_light_map(g, params, cfg, engine.sh_coeffs))
        out["light_map"] = time_fn(lm_f, color, reps=reps)
        lm = lm_f(color)

        if cfg.fast_render:
            cm = jax.jit(lambda g, l: ray_march_cube_fast(
                g, params, cfg, l, lod=lod, static_mask=vis_mask))
        else:
            cm = jax.jit(lambda g, l: ray_march_cube(g, params, cfg, lod=lod, light_map=l))
        out["cube_march"] = time_fn(cm, color, lm, reps=reps)
        cube = cm(color, lm)

        rs = jax.jit(lambda c: resolve_cube(c, params, cfg))
        out["resolve"] = time_fn(rs, cube, reps=reps)

    out["total"] = sum(v for k, v in out.items())
    return out
