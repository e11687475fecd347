"""Benchmark harness: flagship sim+render steps/sec on real hardware.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
The baseline target is 60 sim+render steps/sec at 128^3 on one TPU v5e chip
(BASELINE.md).  Extra diagnostic lines go to stderr.

`python bench.py --all` additionally measures the BASELINE.json config suite
(2D 512^2, 128^3 paths, 256^3 paths) and reports them on stderr.
"""

import json
import sys
import time


def main():
    import jax

    # Persistent compile cache: TPU remote compiles here take minutes; warm
    # runs then start in seconds.
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    import numpy as np

    from __graft_entry__ import entry

    fn, (state, params) = entry()
    step = jax.jit(fn, donate_argnums=(0,))

    def sync(x):
        # On the axon TPU relay, block_until_ready can return before remote
        # execution completes; a small device->host fetch is the only
        # reliable completion barrier (see CLAUDE.md).
        np.asarray(x.ravel()[:4])

    # Warmup / compile.
    t0 = time.perf_counter()
    state, image = step(state, params)
    sync(image)
    compile_s = time.perf_counter() - t0
    print(f"# compile+first-step: {compile_s:.1f}s", file=sys.stderr)

    # Let the smoke develop to steady state so the march and the adaptive
    # advect taps (ops/pallas/advect.py) do their real, worst-case work --
    # a short warmup would overstate throughput on a near-empty volume.
    for _ in range(300):
        state, image = step(state, params)
    sync(image)

    # Timed run with async dispatch, syncing only at the end.
    n = 100
    t0 = time.perf_counter()
    for _ in range(n):
        state, image = step(state, params)
    sync(image)
    elapsed = time.perf_counter() - t0

    steps_per_sec = n / elapsed
    baseline = 60.0
    result = {
        "metric": "sim+render steps/sec @128^3 (separate-light cube-map path)",
        "value": round(steps_per_sec, 2),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / baseline, 3),
    }

    if "--all" in sys.argv:
        run_config_suite()

    print(json.dumps(result))


def run_config_suite():
    """Measure the BASELINE.json config suite; report to stderr."""
    import jax
    import numpy as np

    from fluidx12_tpu.core.config import FluidConfig, RenderMethod
    from fluidx12_tpu.engine.fluidx import FluidXEngine

    cases = [
        ("Fluid2D 512^2 visualize", FluidConfig(grid_size=(512, 512, 1)),
         RenderMethod.RAY_MARCH_SEPARATE),
        ("Fluid3D 128^3 separate cube (OPTIMIZED)", FluidConfig(),
         RenderMethod.RAY_MARCH_SEPARATE),
        ("Fluid3D 128^3 @1080p", FluidConfig(viewport=(1920, 1080)),
         RenderMethod.RAY_MARCH_SEPARATE),
        ("Fluid3D 256^3 separate cube", FluidConfig(grid_size=(256, 256, 256)),
         RenderMethod.RAY_MARCH_SEPARATE),
    ]
    for name, cfg, method in cases:
        try:
            engine = FluidXEngine(cfg)
            engine.render_method = method
            img = engine.step_frame()
            np.asarray(img.ravel()[:4])
            for _ in range(5):
                img = engine.step_frame()
            np.asarray(img.ravel()[:4])
            t0 = time.perf_counter()
            n = 15
            for _ in range(n):
                img = engine.step_frame()
            np.asarray(img.ravel()[:4])
            dt = (time.perf_counter() - t0) / n
            print(f"# {name}: {dt*1000:.2f} ms/step = {1/dt:.1f} steps/s",
                  file=sys.stderr)
        except Exception as e:  # keep the suite best-effort
            print(f"# {name}: FAILED {type(e).__name__}: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
