from fluidx12_tpu.sim.advect import advect
from fluidx12_tpu.sim.project import project
from fluidx12_tpu.sim.step import simulate
