"""Image helpers: premultiplied compositing and 8-bit output conversion.

The reference's output merger blends every fluid pass over the cleared
backbuffer with PREMULTIPLIED blending (src*1 + dst*(1-srcA), Fluid.cpp:662)
and presents an RGBA8_UNORM swap chain; these helpers reproduce that fixed
function stage in-graph.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def composite_premultiplied(src_rgba, dst_rgb):
    """out = src.rgb + dst.rgb * (1 - src.a); returns rgb."""
    a = src_rgba[..., 3:4]
    return src_rgba[..., :3] + dst_rgb * (1.0 - a)


def to_srgb_u8(rgb) -> np.ndarray:
    """Clamp linear [0,1] to uint8 (the reference's RGBA8_UNORM swap chain does
    no sRGB encode -- the format is UNORM, so this is a straight quantize)."""
    arr = np.asarray(rgb)
    return (np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def quantize_unorm8(x):
    """Round-trip through 8-bit UNORM storage (cube-map RGBA8 emulation)."""
    return jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0) / 255.0
