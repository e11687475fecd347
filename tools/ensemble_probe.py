"""Single-chip ensemble throughput probe: does vmapping B independent
sims+renders over one TPU chip beat B sequential dispatches?

At small grids the per-dispatch relay overhead (~1-2 ms) and sub-peak
per-pass occupancy leave headroom; a vmapped member batch amortizes both
(the MXU sees B-fold bigger contractions, the relay one dispatch).  Run
on a HEALTHY relay (canary gated) and read frames/s per member batch:

    python tools/ensemble_probe.py 64        # grid size, default 64
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
    # Device-side ravel/slice: 4 elements cross the relay (CLAUDE.md).
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


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    from fluidx12_tpu.core.config import FluidConfig
    from fluidx12_tpu.parallel.ensemble import SmokeEnsemble

    config = FluidConfig(grid_size=(n, n, n))
    print(f"== ensemble probe, grid {n}^3, backend "
          f"{jax.default_backend()} ==", flush=True)
    canary("before")

    for batch in (1, 2, 4, 8):
        ens = SmokeEnsemble(config, batch=batch)
        states = ens.init(seed=0)
        params = ens.default_params()
        step = jax.jit(ens.step, donate_argnums=(0,))
        t0 = time.perf_counter()
        states, imgs = step(states, params)
        sync(imgs)
        print(f"  B={batch}: compile+1 {time.perf_counter()-t0:.1f}s",
              flush=True)
        for _ in range(max(4, 32 // batch)):
            states, imgs = step(states, params)
        sync(imgs)
        best = float("inf")
        iters = max(4, 32 // batch)
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                states, imgs = step(states, params)
            sync(imgs)
            best = min(best, (time.perf_counter() - t0) / iters)
        fps = batch / best
        print(f"  B={batch}: {best*1000:.2f} ms/dispatch = "
              f"{fps:.1f} member-frames/s", flush=True)

    canary("after")


if __name__ == "__main__":
    main()
