from fluidx12_tpu.engine.fluidx import FluidXEngine
