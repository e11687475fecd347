"""One full simulation step: advect then project (ref: Fluid::Simulate, Fluid.cpp:348-410).

The reference records two dispatches with barriers between ping-pong
textures; functionally that is just composition.  Buffer reuse comes from
jit donation at the engine layer, not from explicit ping-pong state.
"""

from __future__ import annotations

import jax

from fluidx12_tpu.core.config import FluidConfig
from fluidx12_tpu.core.state import FluidState
from fluidx12_tpu.sim.advect import advect
from fluidx12_tpu.sim.advect_fast import advect_fast
from fluidx12_tpu.sim.project import project


def simulate(state: FluidState, time_step: jax.Array, config: FluidConfig) -> FluidState:
    advect_fn = advect_fast if config.fast_sim else advect
    velocity, color = advect_fn(state.velocity, state.color, time_step, config)
    velocity, pressure = project(velocity, state.pressure, time_step, config)
    return FluidState(velocity=velocity, color=color, pressure=pressure)
