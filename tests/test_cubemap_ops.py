"""Cube-map addressing round-trips and sampling tests."""

import numpy as np
import jax.numpy as jnp

from fluidx12_tpu.ops.cubemap import (
    direction_to_face_uv,
    face_texel_local_positions,
    sample_cube_bilinear,
)
from fluidx12_tpu.gi.sh import cube_texel_directions


def test_direction_roundtrip_through_texel_directions():
    # Every texel direction must map back to its own (face, u, v).
    size = 8
    dirs = np.asarray(cube_texel_directions(size, np))  # (6, s, s, 3)
    face, u, v = direction_to_face_uv(jnp.asarray(dirs))
    face = np.asarray(face)
    u = np.asarray(u)
    v = np.asarray(v)
    for f in range(6):
        assert (face[f] == f).all(), f"face {f} misassigned"
        # texel (row i, col j) center -> u = (j + 0.5)/size, v = (i + 0.5)/size
        ii, jj = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
        np.testing.assert_allclose(u[f], (jj + 0.5) / size, atol=1e-5)
        np.testing.assert_allclose(v[f], (ii + 0.5) / size, atol=1e-5)


def test_face_axis_directions():
    face, _, _ = direction_to_face_uv(jnp.asarray(np.array([
        [1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]
    ], np.float32)))
    np.testing.assert_array_equal(np.asarray(face), [0, 1, 2, 3, 4, 5])


def test_sample_cube_at_texel_centers_is_exact():
    rng = np.random.default_rng(0)
    size = 8
    cube = rng.uniform(0, 1, (6, size, size, 3)).astype(np.float32)
    dirs = np.asarray(cube_texel_directions(size, np))
    got = np.asarray(sample_cube_bilinear(jnp.asarray(cube), jnp.asarray(dirs)))
    np.testing.assert_allclose(got, cube, atol=1e-5)


def test_face_texel_local_positions_on_box_surface():
    pos = np.asarray(face_texel_local_positions(8))
    # All positions on the surface |max component| == 1
    assert np.allclose(np.max(np.abs(pos), axis=-1), 1.0)
    # +X face has x == 1 etc.
    assert (pos[0, ..., 0] == 1).all()
    assert (pos[1, ..., 0] == -1).all()
    assert (pos[2, ..., 1] == 1).all()
    assert (pos[5, ..., 2] == -1).all()
    # Texel (0,0) of +Z face: top-left => x ~ -1+1/8, y ~ 1-1/8 (y flipped)
    np.testing.assert_allclose(pos[4, 0, 0], [-1 + 1 / 8, 1 - 1 / 8, 1.0], atol=1e-6)
