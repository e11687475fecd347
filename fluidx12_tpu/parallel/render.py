"""Sharded rendering: light map and cube march distributed over the mesh.

Round-1 decomposition (see SURVEY.md section 5.7 for the roadmap):

- the *light map* is computed slab-parallel: each device holds its Z-slab of
  the grid (from the sharded sim step), all-gathers the density over ICI
  (one (Z,Y,X) array per frame; cheap at bf16) and computes its own slab of
  the light map with the dense sweep -- output stays Z-sharded,
- the *cube-map march* is face-parallel: faces are assigned round-robin to
  devices; each device marches its faces against the gathered volume and the
  results combine with a psum (devices beyond 6 faces contribute zeros).

The fully-sharded marcher (per-shard compositing with transmittance
composition over ICI -- the rendering analog of ring attention) is the
planned upgrade; this version keeps collectives to two all-gathers and one
psum per frame.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from fluidx12_tpu.core.config import FluidConfig
from fluidx12_tpu.core.state import SceneParams
from fluidx12_tpu.ops.transform import transform_point_h
from fluidx12_tpu.parallel.mesh import Z_AXIS
from fluidx12_tpu.render.lightmap_sweep import render_light_map_fast
from fluidx12_tpu.render.resolve import resolve_cube
from fluidx12_tpu.render.slicecomp import _march_face
from fluidx12_tpu.utils.image import quantize_unorm8


def sharded_render_frame(
    grid: jax.Array,          # (4, Z, Y, X) Z-sharded outside shard_map
    params: SceneParams,
    config: FluidConfig,
    mesh: Mesh,
) -> jax.Array:
    """Render the (H, W, 4) premultiplied frame from a Z-sharded grid."""

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, Z_AXIS, None, None),),
        out_specs=P(),
        check_vma=False,
    )
    def render(grid_local):
        n = jax.lax.axis_size(Z_AXIS)
        idx = jax.lax.axis_index(Z_AXIS)

        # Full grid on every device (ICI all-gather along the ring).
        grid_full = jax.lax.all_gather(grid_local, Z_AXIS, axis=1, tiled=True)

        # Light map: full-volume sweep, cheap and dense; each device keeps
        # the full result (the sweep is bandwidth-light after gathering).
        light_map = render_light_map_fast(grid_full, params, config, None)

        dtype = config.render_dtype
        local_eye = transform_point_h(params.eye_pt, params.world_i)[:3].astype(dtype)
        # March channels: density + premultiplied rgb * light (see slicecomp).
        vol = jnp.concatenate(
            [grid_full[3:4].astype(dtype),
             grid_full[:3].astype(dtype) * light_map.astype(dtype)], axis=0
        )

        face_ids = jnp.arange(6, dtype=jnp.int32)
        visible = ((params.visibility_mask >> face_ids) & 1) > 0

        # Face-parallel march: device d computes faces f with f % n == d.
        from fluidx12_tpu.render.slicecomp import _FACES, _axis_volume

        volaxes = {axis: _axis_volume(vol, axis, config) for axis in (0, 1, 2)}
        faces = []
        for f in range(6):
            face = _march_face(f, volaxes[_FACES[f][0]], local_eye,
                               params.num_samples, config, dtype)
            mine = (f % n) == idx
            faces.append(jnp.where(mine & visible[f], face, 0.0))
        cube = jnp.stack(faces, axis=0)
        cube = jax.lax.psum(cube, Z_AXIS)
        if config.quantize_cube_map:
            cube = quantize_unorm8(cube)

        return resolve_cube(cube, params, config)

    return render(grid)
