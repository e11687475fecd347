"""Sharded rendering: per-shard marching with transmittance composition.

Decomposition (SURVEY.md section 5.7 -- the rendering analog of ring
attention), replacing round 1's full-volume all-gather (O(N^3) ICI bytes and
O(N^3) per-device memory every frame):

- **light map + GI**: fully decomposed sweeps (parallel/light.py): shard-
  local shear work with an exclusive prefix of per-shard optical-depth
  planes (z-major) or a pooled-volume all_to_all reshard (lateral-major);
  GI gradient/AO/irradiance run shard-local with 1-plane halos.  No
  density all-gather (a small-shape fallback keeps the replicated sweep).

- **Z-axis cube faces (+Z/-Z)**: the march slices along Z, so each shard
  composites its own contiguous slice block locally (1/n of the work) and
  emits a partial premultiplied image + its block transmittance.  Blocks
  combine front-to-back with the OVER operator after one all_gather of
  (R, R, 5) images -- comm is O(face area), not O(volume).

- **X/Y-axis cube faces**: their march slices are lateral, but the FIRST
  resample contraction runs over Z (the sharded dim), so each shard
  contracts its Z rows against its slice of the interpolation weights and
  one psum of the (4, n_s, R, lat) partial product completes the resample.
  The second resample + compositing are replicated (tiny: one einsum + an
  (n_s, R, R) cumprod).

Per-frame ICI traffic at 256^3 / 8 devices: light prefix planes + 2 pooled
all_to_alls ~4 MB + 2 psums x 33 MB + 2 image gathers x 2.5 MB ~= 75 MB,
vs 470 MB gathered -- per-device compute AND memory stay O(N^3/n).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from fluidx12_tpu.core.config import FluidConfig
from fluidx12_tpu.core.state import SceneParams
from fluidx12_tpu.ops.transform import transform_point_h
from fluidx12_tpu.parallel.mesh import Z_AXIS
from fluidx12_tpu.render.lightmap_sweep import render_light_map_fast
from fluidx12_tpu.render.resolve import resolve_cube
from fluidx12_tpu.render.slicecomp import _FACES, _march_face, _mxu16
from fluidx12_tpu.utils.image import quantize_unorm8


def _pool_matrix(n_m: int, n_s: int, stride: int, dtype):
    """Box-pooling matrix (n_m, n_s), same construction as _axis_volume."""
    return jnp.zeros((n_m, n_s), dtype).at[
        jnp.arange(n_s * stride), jnp.repeat(jnp.arange(n_s), stride)
    ].set(1.0 / stride)


def slice_parallel_render_supported(config: FluidConfig, n_dev: int) -> bool:
    """Z faces slice-parallelize only when shard boundaries align with
    pooled slice groups; tiny/odd shapes keep the gathered fallback."""
    z = config.grid_size[2]
    if z % n_dev:
        return False
    stride = max(-(-z // max(config.max_ray_samples, 1)), 1)
    zl = z // n_dev
    return not (zl % stride or zl < stride)


def _render_local(grid_local, params: SceneParams, config: FluidConfig,
                  sh_coeffs, *, sizes, strides, zl, light_sharded):
    """The per-shard render body; runs inside any shard_map binding Z_AXIS
    (the 1D wrapper below, or vmapped over local ensemble members on a
    2D members x slabs mesh -- every collective here names Z_AXIS only)."""
    from fluidx12_tpu.parallel.light import sharded_light_map

    n = jax.lax.axis_size(Z_AXIS)
    idx = jax.lax.axis_index(Z_AXIS)
    dtype = config.render_dtype
    mx = _mxu16()
    local_eye = transform_point_h(params.eye_pt, params.world_i)[:3].astype(dtype)

    if light_sharded:
        # Fully decomposed sweep + GI (parallel/light.py): per-device
        # compute is O(N^3/n) and comm is prefix planes + two pooled
        # all_to_alls -- no density all-gather.
        light_local = sharded_light_map(grid_local, params, config,
                                        sh_coeffs)
    else:
        # Fallback for shapes the sweep cannot decompose: gather the
        # 1-channel density and run the sweep replicated.
        dens_full = jax.lax.all_gather(
            grid_local[3:4].astype(mx), Z_AXIS, axis=1, tiled=True)
        light_full = render_light_map_fast(
            dens_full.astype(dtype), params, config, sh_coeffs)
        light_local = jax.lax.dynamic_slice_in_dim(
            light_full, idx * zl, zl, axis=1)

    # March channels: density + premultiplied rgb * light (see slicecomp).
    vol = jnp.concatenate(
        [grid_local[3:4].astype(dtype),
         grid_local[:3].astype(dtype) * light_local.astype(dtype)],
        axis=0).astype(mx)

    face_ids = jnp.arange(6, dtype=jnp.int32)
    visible = ((params.visibility_mask >> face_ids) & 1) > 0

    faces = []
    for f in range(6):
        axis, sign = _FACES[f][0], _FACES[f][1]
        stride = strides[axis]
        if axis == 2:
            # Slice-parallel: pool my slab, march my slice block,
            # compose partials front-to-back across shards.
            n_sl = zl // stride
            pool = _pool_matrix(zl, n_sl, stride, mx)
            volf = jnp.einsum("czyx,zm->cmyx", vol, pool,
                              preferred_element_type=jnp.float32).astype(mx)
            part, t_tot = _march_face(
                f, volf, local_eye, params.num_samples, config, dtype,
                slice_start=idx * n_sl, partial=True)
            parts = jax.lax.all_gather(
                jnp.concatenate([part, t_tot[..., None]], axis=-1),
                Z_AXIS)                       # (n, R, R, 5)
            order = range(n) if sign > 0 else range(n - 1, -1, -1)
            face = jnp.zeros_like(part)
            transm = jnp.ones_like(t_tot)
            for i in order:
                face = face + transm[..., None] * parts[i, ..., :4]
                transm = transm * parts[i, ..., 4]
        else:
            # Lateral-axis face: pool over the (local-full) major axis,
            # split the Z-row contraction across shards, one psum.
            n_m = sizes[axis]
            n_sl = n_m // stride
            pool = _pool_matrix(n_m, n_sl, stride, mx)
            eq = {1: "czyx,ym->cmzx", 0: "czyx,xm->cmzy"}[axis]
            volf = jnp.einsum(eq, vol, pool,
                              preferred_element_type=jnp.float32).astype(mx)
            face = _march_face(
                f, volf, local_eye, params.num_samples, config, dtype,
                row_start=idx * zl, psum_axis=Z_AXIS)
        faces.append(jnp.where(visible[f], face, 0.0))
    cube = jnp.stack(faces, axis=0)
    if config.quantize_cube_map:
        cube = quantize_unorm8(cube)

    return resolve_cube(cube, params, config)


def sharded_render_frame(
    grid: jax.Array,          # (4, Z, Y, X) Z-sharded outside shard_map
    params: SceneParams,
    config: FluidConfig,
    mesh: Mesh,
    sh_coeffs: jax.Array = None,
) -> jax.Array:
    """Render the (H, W, 4) premultiplied frame from a Z-sharded grid."""
    from fluidx12_tpu.parallel.light import sharded_light_supported

    x, y, z = config.grid_size
    sizes = (x, y, z)
    cap = max(config.max_ray_samples, 1)
    strides = {a: max(-(-sizes[a] // cap), 1) for a in range(3)}
    n_dev = mesh.devices.size
    zl = z // n_dev
    # The light sweep decomposes under its own (stricter) predicate.
    light_sharded = sharded_light_supported(config, n_dev)
    if not slice_parallel_render_supported(config, n_dev):
        return _gathered_render_frame(grid, params, config, mesh, sh_coeffs)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, Z_AXIS, None, None),),
        out_specs=P(),
        check_vma=False,
    )
    def render(grid_local):
        return _render_local(grid_local, params, config, sh_coeffs,
                             sizes=sizes, strides=strides, zl=zl,
                             light_sharded=light_sharded)

    return render(grid)


def _gathered_render_frame(grid, params, config, mesh, sh_coeffs=None):
    """Fallback: all-gather the volume and render face-parallel (round-1
    scheme); used only when shard boundaries don't align with slice pools."""

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, Z_AXIS, None, None),),
        out_specs=P(),
        check_vma=False,
    )
    def render(grid_local):
        from fluidx12_tpu.render.slicecomp import _axis_volume

        n = jax.lax.axis_size(Z_AXIS)
        idx = jax.lax.axis_index(Z_AXIS)
        grid_full = jax.lax.all_gather(grid_local, Z_AXIS, axis=1, tiled=True)
        light_map = render_light_map_fast(grid_full, params, config, sh_coeffs)
        dtype = config.render_dtype
        local_eye = transform_point_h(params.eye_pt, params.world_i)[:3].astype(dtype)
        vol = jnp.concatenate(
            [grid_full[3:4].astype(dtype),
             grid_full[:3].astype(dtype) * light_map.astype(dtype)], axis=0)
        face_ids = jnp.arange(6, dtype=jnp.int32)
        visible = ((params.visibility_mask >> face_ids) & 1) > 0
        volaxes = {axis: _axis_volume(vol, axis, config) for axis in (0, 1, 2)}
        faces = []
        for f in range(6):
            face = _march_face(f, volaxes[_FACES[f][0]], local_eye,
                               params.num_samples, config, dtype)
            mine = (f % n) == idx
            faces.append(jnp.where(mine & visible[f], face, 0.0))
        cube = jax.lax.psum(jnp.stack(faces, axis=0), Z_AXIS)
        if config.quantize_cube_map:
            cube = quantize_unorm8(cube)
        return resolve_cube(cube, params, config)

    return render(grid)
