from fluidx12_tpu.parallel.mesh import make_grid_mesh
from fluidx12_tpu.parallel.domain import sharded_simulate, shard_state
