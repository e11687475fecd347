from fluidx12_tpu.core.config import FluidConfig, RenderMethod
from fluidx12_tpu.core.state import FluidState, SceneParams, make_initial_state
