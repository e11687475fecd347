"""2D color visualization (ref: PSVisualizeColor.hlsl + Fluid::visualizeColor).

Samples the color slice at z = 0.5, applies the Reinhard-style tone map
`c / (c + 0.5)` and resizes to the viewport with bilinear filtering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fluidx12_tpu.core.config import FluidConfig
from fluidx12_tpu.ops.sampling import trilinear_sample


def visualize_color_2d(grid: jax.Array, config: FluidConfig) -> jax.Array:
    """grid (4, Z, Y, X) -> viewport (H, W, 4) premultiplied RGBA."""
    h, w = config.viewport[1], config.viewport[0]
    dtype = config.render_dtype

    ju = (jnp.arange(w, dtype=dtype) + 0.5) / w
    jv = (jnp.arange(h, dtype=dtype) + 0.5) / h
    vv, uu = jnp.meshgrid(jv, ju, indexing="ij")
    # uvw = (u, 1-v, 0.5): the shader flips v (PSVisualizeColor.hlsl:24-25).
    uvw = jnp.stack([uu, 1.0 - vv, jnp.full_like(uu, 0.5)], axis=-1)
    color = jnp.moveaxis(trilinear_sample(grid.astype(dtype), uvw), 0, -1)
    rgb = color[..., :3]
    rgb = rgb / (rgb + 0.5)
    return jnp.concatenate([rgb, color[..., 3:4]], axis=-1)
