from fluidx12_tpu.render.lightmap import render_light_map
from fluidx12_tpu.render.cubemap import ray_march_cube
from fluidx12_tpu.render.resolve import resolve_cube
from fluidx12_tpu.render.raycast import ray_cast_direct
from fluidx12_tpu.render.visualize2d import visualize_color_2d
from fluidx12_tpu.render.environment import render_environment
