"""SH basis / projection / irradiance tests against analytic results."""

import numpy as np
import jax.numpy as jnp

from fluidx12_tpu.gi.sh import (
    cube_texel_directions,
    evaluate_sh_irradiance,
    project_cubemap_sh,
    sh_eval_basis,
)


def _ref_basis_order3(v):
    """Hand-transcribed order-3 basis from SHMath.hlsli:14-66."""
    x, y, z = v
    b = np.zeros(9)
    b[0] = 0.282094791773878140
    b[2] = 0.488602511902919920 * z
    b[1] = -0.488602511902919920 * y
    b[3] = -0.488602511902919920 * x
    z2 = z * z
    b[6] = 0.946174695757560080 * z2 - 0.315391565252520050
    b[5] = -1.092548430592079200 * z * y
    b[7] = -1.092548430592079200 * z * x
    s2 = 2 * x * y
    c2 = x * x - y * y
    b[4] = 0.546274215296039590 * s2
    b[8] = 0.546274215296039590 * c2
    return b


def test_basis_matches_reference_order3():
    rng = np.random.default_rng(0)
    for _ in range(20):
        v = rng.standard_normal(3)
        v /= np.linalg.norm(v)
        got = np.asarray(sh_eval_basis(3, v.astype(np.float32)))
        np.testing.assert_allclose(got, _ref_basis_order3(v), atol=1e-5)


def test_basis_orthonormality():
    # Monte-Carlo orthonormality check over the sphere for order 4.
    rng = np.random.default_rng(1)
    v = rng.standard_normal((200000, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    b = np.asarray(sh_eval_basis(4, v.astype(np.float32)))  # (N, 16)
    gram = (b.T @ b) / v.shape[0] * 4 * np.pi
    np.testing.assert_allclose(gram, np.eye(16), atol=0.05)


def test_project_constant_cubemap():
    # A constant radiance L projects to coeffs[0] = L * sqrt(4 pi), rest ~ 0.
    cube = np.full((6, 16, 16, 3), 2.0, np.float32)
    coeffs = np.asarray(project_cubemap_sh(jnp.asarray(cube), order=3))
    expected_dc = 2.0 * np.sqrt(4 * np.pi)
    np.testing.assert_allclose(coeffs[0], expected_dc, rtol=1e-3)
    assert np.abs(coeffs[1:]).max() < 1e-2


def test_project_axis_gradient_hits_linear_band():
    # Radiance = max(y_dir, 0): projects strongly onto the l=1, m=-1-ish bands.
    dirs = np.asarray(cube_texel_directions(16, np))
    unit = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    cube = np.maximum(unit[..., 1:2], 0.0).repeat(3, axis=-1).astype(np.float32)
    coeffs = np.asarray(project_cubemap_sh(jnp.asarray(cube), order=3))
    # Analytic: integral of max(y,0)*Y_1m over sphere: only the y band survives:
    # c = integral max(y,0) * (-0.4886 y) = -0.4886 * (2 pi / 3) ... => negative.
    assert coeffs[1, 0] < -0.5
    # Other l=1 bands vanish.
    assert abs(coeffs[2, 0]) < 1e-2 and abs(coeffs[3, 0]) < 1e-2


def test_irradiance_constant_probe_is_uniform():
    coeffs = np.zeros((9, 3), np.float32)
    coeffs[0] = 1.0
    n = np.array([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, -1.0]], np.float32)
    irr = np.asarray(evaluate_sh_irradiance(jnp.asarray(coeffs), jnp.asarray(n)))
    np.testing.assert_allclose(irr, np.broadcast_to(irr[0], irr.shape), atol=1e-6)
    np.testing.assert_allclose(irr[0], np.full(3, 0.88622692545), rtol=1e-5)


def test_irradiance_dominant_direction():
    # Probe lit from +y: normal +y gets more irradiance than -y. Build
    # coefficients by projecting max(y, 0) radiance.
    dirs = np.asarray(cube_texel_directions(32, np))
    unit = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    cube = np.maximum(unit[..., 1:2], 0.0).repeat(3, axis=-1).astype(np.float32)
    coeffs = project_cubemap_sh(jnp.asarray(cube), order=3)
    up = np.asarray(evaluate_sh_irradiance(coeffs, jnp.asarray([0.0, 1.0, 0.0])))
    down = np.asarray(evaluate_sh_irradiance(coeffs, jnp.asarray([0.0, -1.0, 0.0])))
    assert up[0] > down[0] * 2


def test_basis_order6_orthonormality():
    # Full SHMath.hlsli parity: degree-5 (order-6, 36 coeff) basis.
    rng = np.random.default_rng(2)
    v = rng.standard_normal((400000, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    b = np.asarray(sh_eval_basis(6, v.astype(np.float64)))
    gram = (b.T @ b) / v.shape[0] * 4 * np.pi
    np.testing.assert_allclose(gram, np.eye(36), atol=0.12)
