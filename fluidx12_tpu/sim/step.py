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
from fluidx12_tpu.sim.project import project


def simulate(state: FluidState, time_step: jax.Array, config: FluidConfig) -> FluidState:
    """Advect + project.  State storage may be half precision (the
    reference's RGBA16F textures); all pass arithmetic runs in f32 and
    results quantize back to the storage dtype once per frame -- the same
    rounding point as the reference's RGBA16F render-target writes.

    The whole step flows through the COMBINED (7, Z, Y, X) state array:
    advection streams all channels together, and the projection's Pallas
    kernels read/write the velocity channels in place (channel-pinned
    BlockSpecs + output aliasing), so no per-step concatenate/split copies
    exist anywhere on the fast path."""
    store = state.fields.dtype
    if config.fast_sim:
        from fluidx12_tpu.sim.advect_fast import advect_fields_fast

        fields = advect_fields_fast(state.fields, time_step, config)
    else:
        from fluidx12_tpu.core.padding import (
            crop_to_logical,
            is_padded,
            pad_to_storage,
        )

        # The faithful gather-based advect runs on the compact logical
        # volume (its mirror sampler is defined over the logical extent);
        # padded storage crops in and pads back out around it.
        flds = state.fields
        padded = is_padded(flds, config)
        if padded:
            flds = crop_to_logical(flds, config)
        velocity, color = advect(flds[:3], flds[3:], time_step, config)
        fields = jnp.concatenate([velocity, color], axis=0)
        if padded:
            fields = pad_to_storage(fields, config)
    fields, pressure = project(fields, state.pressure, time_step, config)
    return FluidState(fields=fields.astype(store), pressure=pressure)
