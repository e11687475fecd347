"""2D color visualization (ref: PSVisualizeColor.hlsl + Fluid::visualizeColor).

Samples the color slice at z = 0.5, applies the Reinhard-style tone map
`c / (c + 0.5)` and resizes to the viewport.

TPU-native form: the viewport resample is a fixed bilinear resize, i.e. two
*static* interpolation matrices applied as matmuls (constant-folded by XLA)
-- no gathers.  Sampler semantics are LINEAR_CLAMP with the shader's v flip
(PSVisualizeColor.hlsl:24-25).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fluidx12_tpu.core.config import FluidConfig


def _resize_weights(n_out: int, n_src: int, flip: bool) -> np.ndarray:
    """(n_out, n_src) bilinear weights from texel centers, edge-clamped."""
    u = (np.arange(n_out) + 0.5) / n_out
    if flip:
        u = 1.0 - u
    t = u * n_src - 0.5
    i0 = np.floor(t).astype(np.int64)
    frac = t - i0
    i0c = np.clip(i0, 0, n_src - 1)
    i1c = np.clip(i0 + 1, 0, n_src - 1)
    w = np.zeros((n_out, n_src), np.float32)
    w[np.arange(n_out), i0c] += (1.0 - frac).astype(np.float32)
    w[np.arange(n_out), i1c] += frac.astype(np.float32)
    return w


def visualize_color_2d(grid: jax.Array, config: FluidConfig) -> jax.Array:
    """grid (4, Z, Y, X) -> viewport (H, W, 4) premultiplied RGBA."""
    h, w = config.viewport[1], config.viewport[0]
    dtype = config.render_dtype
    z, y, x = config.zyx

    # z = 0.5 slice (the mid plane; a single plane in the 2D preset).
    slice_rgba = grid[:, z // 2].astype(dtype)  # (4, Y, X)

    wu = jnp.asarray(_resize_weights(w, x, flip=False))       # (W, X)
    wv = jnp.asarray(_resize_weights(h, y, flip=True))        # (H, Y), v flip
    resized = jnp.einsum("hy,cyx,wx->hwc", wv, slice_rgba, wu)

    rgb = resized[..., :3]
    rgb = rgb / (rgb + 0.5)
    return jnp.concatenate([rgb, resized[..., 3:4]], axis=-1)
