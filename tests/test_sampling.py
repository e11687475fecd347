"""Trilinear sampling vs. a NumPy reference implementation."""

import numpy as np
import jax.numpy as jnp

from fluidx12_tpu.ops.sampling import AddressMode, trilinear_sample, neighbor_shift


def _np_resolve(idx, size, mode):
    if mode == AddressMode.CLAMP:
        return np.clip(idx, 0, size - 1)
    m = np.remainder(idx, 2 * size)
    return np.where(m >= size, 2 * size - 1 - m, m)


def _np_trilinear(field, uvw, mode):
    c, z, y, x = field.shape
    sizes = np.array([x, y, z], np.float32)
    t = uvw * sizes - 0.5
    t0 = np.floor(t).astype(np.int64)
    f = t - t0
    out = np.zeros((c,) + uvw.shape[:-1], np.float32)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                ix = _np_resolve(t0[..., 0] + dx, x, mode)
                iy = _np_resolve(t0[..., 1] + dy, y, mode)
                iz = _np_resolve(t0[..., 2] + dz, z, mode)
                w = (
                    (f[..., 0] if dx else 1 - f[..., 0])
                    * (f[..., 1] if dy else 1 - f[..., 1])
                    * (f[..., 2] if dz else 1 - f[..., 2])
                )
                out += field[:, iz, iy, ix] * w
    return out


def test_matches_numpy_reference_clamp_and_mirror():
    rng = np.random.default_rng(0)
    field = rng.standard_normal((2, 5, 6, 7)).astype(np.float32)
    uvw = rng.uniform(-0.6, 1.6, size=(64, 3)).astype(np.float32)
    for mode in (AddressMode.CLAMP, AddressMode.MIRROR):
        got = np.asarray(trilinear_sample(jnp.asarray(field), jnp.asarray(uvw), mode))
        want = _np_trilinear(field, uvw, mode)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_texel_centers_are_exact():
    rng = np.random.default_rng(1)
    field = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
    idx = np.stack(np.meshgrid(*[np.arange(4)] * 3, indexing="ij"), axis=-1)  # (4,4,4,3) zyx
    uvw = (idx[..., ::-1] + 0.5) / 4.0  # to xyz texture coords
    got = np.asarray(trilinear_sample(jnp.asarray(field), jnp.asarray(uvw.astype(np.float32))))
    np.testing.assert_allclose(got[0], field[0], atol=1e-5)


def test_mirror_reflects_across_edges():
    field = jnp.asarray(np.arange(4, dtype=np.float32).reshape(1, 1, 1, 4))
    # just outside the left edge: mirrors back onto texel 0
    v = trilinear_sample(field, jnp.asarray([[-0.1, 0.5, 0.5]], np.float32), AddressMode.MIRROR)
    np.testing.assert_allclose(np.asarray(v)[0, 0], 0.0, atol=0.2)


def test_neighbor_shift_edge_clamps():
    a = jnp.asarray(np.arange(5, dtype=np.float32).reshape(1, 1, 5))
    right = np.asarray(neighbor_shift(a, 2, +1))[0, 0]
    left = np.asarray(neighbor_shift(a, 2, -1))[0, 0]
    np.testing.assert_array_equal(right, [1, 2, 3, 4, 4])
    np.testing.assert_array_equal(left, [0, 0, 1, 2, 3])
