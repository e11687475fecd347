"""Golden-image regression tests (SURVEY.md section 4: the reference's only
numerical output path is the F11 screenshot; goldens make that a real test).

Goldens are small CPU-rendered frames at pinned configs committed under
tests/goldens/.  Regenerate deliberately with:

    python tests/test_golden.py --regen

Comparisons allow small per-pixel drift (backend math differences) but fail
on structural change.
"""

import os
import sys

if __name__ == "__main__":
    # Direct script use (--regen): goldens must be CPU-rendered, like the
    # pytest runs (conftest forces CPU there).
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from fluidx12_tpu.core.config import FluidConfig, RenderMethod
from fluidx12_tpu.engine.fluidx import FluidXEngine
from fluidx12_tpu.engine.frame_loop import FrameLoop
from fluidx12_tpu.utils.png import read_png, write_png

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

CONFIGS = {
    # Fluid2D.bat analog, small
    "fluid2d": dict(
        config=FluidConfig(grid_size=(64, 64, 1), viewport=(64, 64),
                           num_pressure_iters=16),
        method=RenderMethod.RAY_MARCH_SEPARATE,
        frames=40,
    ),
    # 3D separate-light cube path (the default OPTIMIZED pipeline)
    "fluid3d_separate": dict(
        config=FluidConfig(grid_size=(24, 24, 24), viewport=(64, 64),
                           max_ray_samples=32, max_light_samples=8,
                           num_pressure_iters=16),
        method=RenderMethod.RAY_MARCH_SEPARATE,
        frames=35,
    ),
    # 3D direct merged path (PSRayCast analog, faithful gather marcher)
    "fluid3d_direct": dict(
        config=FluidConfig(grid_size=(24, 24, 24), viewport=(64, 64),
                           max_ray_samples=32, max_light_samples=8,
                           num_pressure_iters=16),
        method=RenderMethod.RAY_MARCH_DIRECT_MERGED,
        frames=35,
    ),
    # Merged cube-map method (CSRayMarch: per-sample shadow rays)
    "fluid3d_merged": dict(
        config=FluidConfig(grid_size=(24, 24, 24), viewport=(64, 64),
                           max_ray_samples=32, max_light_samples=8,
                           num_pressure_iters=16),
        method=RenderMethod.RAY_MARCH_MERGED,
        frames=35,
    ),
    # GI path: bundled light probe -> SH irradiance + environment sky
    # (FluidGI.bat analog, small)
    "fluidgi": dict(
        config=FluidConfig(grid_size=(24, 24, 24), viewport=(64, 64),
                           max_ray_samples=32, max_light_samples=8,
                           num_pressure_iters=16, has_light_probe=True),
        method=RenderMethod.RAY_MARCH_SEPARATE,
        frames=35,
        radiance="assets/rnl_cross.npz",
    ),
    # FLAGSHIP: the exact default config bench.py times (128^3 grid, 800^2
    # viewport, default sample budgets, fast pipeline) -- verifies the
    # image whose throughput the whole perf story rests on, not just its
    # speed (the reference's F11-screenshot oracle at full resolution,
    # FluidX12.cpp:625-660).  bench.py --check replays it on real TPU.
    "fluid3d_flagship": dict(
        config=FluidConfig(),
        method=RenderMethod.RAY_MARCH_SEPARATE,
        frames=20,
    ),
}


def render_case(name):
    case = CONFIGS[name]
    radiance = None
    if case.get("radiance"):
        path = os.path.join(os.path.dirname(__file__), "..", case["radiance"])
        radiance = np.load(path)["radiance"].astype(np.float32)
    engine = FluidXEngine(case["config"], radiance=radiance)
    engine.render_method = case["method"]
    loop = FrameLoop(engine, show_fps=False)
    return loop.run(case["frames"])


def _golden_path(name):
    return os.path.join(GOLDEN_DIR, f"{name}.png")


def _check(name):
    img = render_case(name)
    golden = read_png(_golden_path(name))
    assert img.shape == golden.shape
    diff = np.abs(img.astype(np.int32) - golden.astype(np.int32))
    # Allow small numeric drift; fail on structural change.
    assert diff.mean() < 2.0, f"{name}: mean abs diff {diff.mean():.2f}"
    assert (diff > 25).mean() < 0.01, f"{name}: {(diff > 25).mean():.4f} pixels changed a lot"


def test_golden_fluid2d():
    _check("fluid2d")


def test_golden_fluid3d_separate():
    _check("fluid3d_separate")


def test_golden_fluid3d_direct():
    _check("fluid3d_direct")


def test_golden_fluid3d_merged():
    _check("fluid3d_merged")


def test_golden_fluidgi():
    _check("fluidgi")


def test_golden_fluid3d_flagship():
    # ~30+ min of single-core CPU rendering at 128^3/800^2: opt-in for
    # pytest (the TPU replays this same check cheaply every round via
    # `bench.py --check`, which is where it guards the benchmarked image).
    import pytest

    if not os.environ.get("FLUIDX_FULL_GOLDENS"):
        pytest.skip("flagship golden is checked by bench.py --check on TPU; "
                    "set FLUIDX_FULL_GOLDENS=1 to render it on CPU")
    _check("fluid3d_flagship")


if __name__ == "__main__":
    if "--regen" in sys.argv:
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        names = [a for a in sys.argv[1:] if a in CONFIGS] or list(CONFIGS)
        for name in names:
            img = render_case(name)
            write_png(_golden_path(name), img)
            print(f"wrote {name}: {img.shape}")
    else:
        print(__doc__)
