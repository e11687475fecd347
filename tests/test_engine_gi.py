"""Engine end-to-end with a light probe attached (the FluidGI preset path).

This covers the code path that only activates with `has_light_probe=True` +
a radiance cube: SH projection at startup, environment background, SH ambient
in the light map and in the merged marcher.  (A TPU NaN bug escaped the suite
in round 1 precisely because no engine test attached a probe.)
"""

import numpy as np

from fluidx12_tpu.core.config import FluidConfig, RenderMethod
from fluidx12_tpu.engine.fluidx import FluidXEngine
from fluidx12_tpu.engine.frame_loop import FrameLoop
from fluidx12_tpu.gi.sh import cube_texel_directions


def synthetic_radiance(size=16):
    """Sky-like HDR cube: bright +y hemisphere, warm horizon."""
    dirs = np.asarray(cube_texel_directions(size, np))
    unit = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    y = unit[..., 1]
    sky = np.stack([
        0.3 + 2.0 * np.maximum(y, 0.0),
        0.4 + 1.5 * np.maximum(y, 0.0),
        0.8 + 1.0 * np.maximum(y, 0.0),
    ], axis=-1)
    return sky.astype(np.float32)


def gi_config(**kw):
    base = dict(
        grid_size=(16, 16, 16), viewport=(32, 32),
        max_ray_samples=16, max_light_samples=6, num_pressure_iters=8,
        has_light_probe=True,
    )
    base.update(kw)
    return FluidConfig(**base)


def test_gi_engine_all_methods_finite_and_show_sky():
    rad = synthetic_radiance()
    for method in (RenderMethod.RAY_MARCH_SEPARATE, RenderMethod.RAY_MARCH_DIRECT_MERGED):
        engine = FluidXEngine(gi_config(), radiance=rad)
        engine.render_method = method
        img = FrameLoop(engine, show_fps=False).run(15)
        assert np.isfinite(img).all(), method
        # The environment background replaces the grey clear color: corners
        # (which miss the volume) must show sky, not (51, 51, 51).
        corner = img[0, 0].astype(int)
        assert abs(int(corner[2]) - 51) > 10, f"{method}: sky not visible {corner}"


def test_gi_sh_coeffs_light_the_smoke():
    rad = synthetic_radiance()
    engine = FluidXEngine(gi_config(), radiance=rad)
    assert engine.sh_coeffs is not None and engine.sh_coeffs.shape == (9, 3)
    assert np.isfinite(np.asarray(engine.sh_coeffs)).all()
    img_gi = FrameLoop(engine, show_fps=False).run(15).astype(np.float32)

    engine2 = FluidXEngine(gi_config(has_light_probe=False))
    img_no = FrameLoop(engine2, show_fps=False).run(15).astype(np.float32)
    # Images must differ: GI ambient + sky background vs constant ambient + grey.
    assert np.abs(img_gi - img_no).mean() > 1.0
