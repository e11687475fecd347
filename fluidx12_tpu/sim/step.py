"""One full simulation step: advect then project (ref: Fluid::Simulate, Fluid.cpp:348-410).

The reference records two dispatches with barriers between ping-pong
textures; functionally that is just composition.  Buffer reuse comes from
jit donation at the engine layer, not from explicit ping-pong state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fluidx12_tpu.core.config import FluidConfig
from fluidx12_tpu.core.state import FluidState
from fluidx12_tpu.sim.advect import advect
from fluidx12_tpu.sim.advect_fast import advect_fast
from fluidx12_tpu.sim.project import project


def simulate(state: FluidState, time_step: jax.Array, config: FluidConfig) -> FluidState:
    """Advect + project.  State storage may be f16 (the reference's RGBA16F
    textures); all pass arithmetic runs in f32 and results quantize back to
    the storage dtype once per frame -- the same rounding point as the
    reference's RGBA16F render-target writes."""
    store = state.velocity.dtype
    advect_fn = advect_fast if config.fast_sim else advect
    # The advect paths manage their own upcasts (the Pallas kernels stream
    # f16 blocks directly and upcast in VMEM) and return f32.
    velocity, color = advect_fn(state.velocity, state.color, time_step, config)
    velocity, pressure = project(velocity, state.pressure, time_step, config)
    return FluidState(velocity=velocity.astype(store),
                      color=color.astype(store), pressure=pressure)
