"""SmokeModel (library API) vs FluidXEngine (app): one pipeline definition.

render/pipeline.render_frame is the single render-dispatch site consumed by
both (VERDICT r4 item 6); these tests pin that the library renders exactly
what the app renders, per method, including the host-static extras the
model used to lack (scissor rect, fast-DIRECT plane spec, point-light
gate).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fluidx12_tpu.core.config import FluidConfig, RenderMethod
from fluidx12_tpu.engine.fluidx import FluidXEngine
from fluidx12_tpu.models import SmokeModel


def _cfg(**kw):
    return FluidConfig(grid_size=(24, 24, 24), viewport=(48, 48),
                       max_ray_samples=16, max_light_samples=4,
                       num_pressure_iters=4, sim_dtype=jnp.float32, **kw)


@pytest.mark.parametrize("method", list(RenderMethod))
def test_model_matches_engine_per_method(method):
    """Three frames from the same zero state: the model's jitted step and
    the engine's compiled program must produce the same images."""
    cfg = _cfg()
    engine = FluidXEngine(cfg)
    engine.render_method = method

    model = SmokeModel(cfg, method=method)
    step = jax.jit(model.step)
    state = model.init()
    params = model.default_params()

    for i in range(3):
        img_e = np.asarray(engine.step_frame())
        state, img_m = step(state, params)
        np.testing.assert_allclose(
            np.asarray(img_m), img_e, atol=2e-5,
            err_msg=f"{method.name} frame {i}")


def test_model_uses_fast_direct_plane_spec():
    """DIRECT methods get the engine's shear-warp plane spec (the library
    no longer silently rides the slow faithful path)."""
    model = SmokeModel(_cfg(), method=RenderMethod.RAY_MARCH_DIRECT_SEPARATE)
    assert model.plane_spec is not None
    cube_model = SmokeModel(_cfg(), method=RenderMethod.RAY_MARCH_SEPARATE)
    assert cube_model.plane_spec is None   # cube methods don't need one
    # Scissor rect matches the engine's host cache for the same pose (None
    # when the volume fills the viewport -- screen_bbox only shrinks).
    engine = FluidXEngine(_cfg())
    assert cube_model.rect == engine._screen_rect()


def test_model_2d():
    cfg = FluidConfig(grid_size=(64, 64, 1), viewport=(64, 64),
                      sim_dtype=jnp.float32)
    model = SmokeModel(cfg)
    state = model.init()
    state, img = jax.jit(model.step)(state, model.default_params())
    assert img.shape == (64, 64, 3)
    assert np.isfinite(np.asarray(img)).all()
