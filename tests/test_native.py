"""Native C++ library vs Python fallbacks (skipped when not built)."""

import os

import numpy as np
import pytest

from fluidx12_tpu.utils.native import get_native_lib

pytestmark = pytest.mark.skipif(get_native_lib() is None, reason="native lib not built")

_REF_DDS = "/root/reference/Bin/Assets/rnl_cross.dds"


def test_bc6h_native_matches_numpy():
    from fluidx12_tpu.gi.bc6h_np import decode_bc6h_numpy
    from fluidx12_tpu.gi.dds import decode_bc6h, parse_header

    if not os.path.exists(_REF_DDS):
        pytest.skip("reference asset unavailable")
    data = open(_REF_DDS, "rb").read()
    hdr = parse_header(data)
    nbytes = (hdr.width // 4) * (hdr.height // 4) * 16
    blocks = np.frombuffer(data, np.uint8, nbytes, hdr.data_offset)

    native = decode_bc6h(blocks, hdr.width, hdr.height)     # dispatches to C++
    fallback = decode_bc6h_numpy(blocks, hdr.width, hdr.height)
    np.testing.assert_array_equal(native, fallback)
    assert np.isfinite(native).all()
    assert native.max() > 1.0  # HDR content


def test_native_png_roundtrip(tmp_path):
    from fluidx12_tpu.utils.png import read_png, write_png

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (21, 17, 3), dtype=np.uint8)
    path = str(tmp_path / "n.png")
    write_png(path, img)  # native path when lib is present
    np.testing.assert_array_equal(read_png(path), img)


def test_full_probe_loads_hdr_cube():
    from fluidx12_tpu.gi.dds import load_dds_cubemap

    if not os.path.exists(_REF_DDS):
        pytest.skip("reference asset unavailable")
    cube = load_dds_cubemap(_REF_DDS)
    assert cube.shape == (6, 256, 256, 3)
    assert np.isfinite(cube).all()
    assert cube.max() > 2.0 and cube.min() >= 0.0
