"""PNG round-trip, DDS parsing, checkpoint save/load."""

import os
import struct

import numpy as np
import jax.numpy as jnp

from fluidx12_tpu.utils.png import read_png, write_png
from fluidx12_tpu.gi.dds import load_dds_cubemap, parse_header
from fluidx12_tpu.core.config import FluidConfig
from fluidx12_tpu.core.state import make_initial_state
from fluidx12_tpu.engine.checkpoint import load_state, save_state


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (33, 47, 3), dtype=np.uint8)
    path = str(tmp_path / "t.png")
    write_png(path, img)
    back = read_png(path)
    np.testing.assert_array_equal(back, img)


def _make_float_cube_dds(path, size=8):
    """Synthesize a DX10 RGBA32F cube-map DDS."""
    rng = np.random.default_rng(1)
    faces = rng.uniform(0, 4, (6, size, size, 4)).astype(np.float32)
    header = bytearray(148)
    header[0:4] = b"DDS "
    struct.pack_into("<7I", header, 4, 124, 0x1007, size, size, 0, 1, 1)
    struct.pack_into("<II", header, 4 + 72, 32, 0x4)  # pf size, fourcc flag
    header[4 + 80 : 4 + 84] = b"DX10"
    struct.pack_into("<I", header, 4 + 108, 0x1000 | 0x8)
    struct.pack_into("<I", header, 4 + 112, 0x200 | 0xFE00)  # caps2 cubemap
    struct.pack_into("<5I", header, 128, 2, 3, 0x4, 1, 0)  # RGBA32F, tex2d, cube
    with open(path, "wb") as f:
        f.write(bytes(header))
        f.write(faces.tobytes())
    return faces


def test_dds_float_cube_roundtrip(tmp_path):
    path = str(tmp_path / "c.dds")
    faces = _make_float_cube_dds(path)
    hdr = parse_header(open(path, "rb").read())
    assert hdr.is_cube and hdr.width == 8 and hdr.dxgi_format == 2
    cube = load_dds_cubemap(path)
    assert cube.shape == (6, 8, 8, 3)
    np.testing.assert_allclose(cube, faces[..., :3], atol=1e-6)


def test_reference_asset_header_parses():
    ref = "/root/reference/Bin/Assets/rnl_cross.dds"
    if not os.path.exists(ref):
        return
    hdr = parse_header(open(ref, "rb").read())
    assert hdr.is_cube and hdr.width == 256 and hdr.mip_count == 9
    assert hdr.dxgi_format == 95  # BC6H_UF16


def test_checkpoint_roundtrip(tmp_path):
    cfg = FluidConfig(grid_size=(8, 8, 8))
    state = make_initial_state(cfg)
    state = state.with_color(state.color + 0.25)
    path = str(tmp_path / "s.npz")
    save_state(path, state)
    back = load_state(path)
    np.testing.assert_array_equal(np.asarray(back.color), np.asarray(state.color))
    np.testing.assert_array_equal(np.asarray(back.pressure), np.asarray(state.pressure))
