"""Spherical-harmonics light probe: projection and irradiance evaluation.

TPU-native re-expression of the reference's three-dispatch SH transform
(CSSHCubeMap.hlsl -> CSSHSum.hlsl ping-pong -> CSSHNormalize.hlsl, orchestrated
by LightProbeEZ::TransformSH, LightProbeEZ.cpp:117-123): per-texel SH basis x
radiance x differential-solid-angle, wave/group tree reductions, then a 4 pi /
sum(weight) normalization.  On TPU the whole thing is one fused jnp reduction --
XLA's reduction codegen replaces CSWaveOp's groupshared emulation wholesale.

Basis convention matches SHMath.hlsli's generated `sh_eval_basis_*` (the D3DX
real SH basis with Condon-Shortley phase folded into the constants); the
irradiance evaluation matches SHIrradianceTypeless.hlsli:16-37 (Ramamoorthi
constants, note the x/y sign flips).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def sh_eval_basis(order: int, dirs) -> jax.Array:
    """Evaluate the real SH basis for unit directions.

    dirs: (..., 3) unit vectors. Returns (..., order**2) basis values laid out
    as index l*(l+1)+m, identical to sh_eval_basis_1..5 (SHMath.hlsli:14-235).
    Supports order 1..6 via the standard solid-harmonic recurrences the
    reference's generated code hard-codes.
    """
    if not 1 <= order <= 6:
        raise ValueError("order must be in 1..6")
    xp = jnp if isinstance(dirs, jax.Array) else np
    dirs = xp.asarray(dirs)
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]

    n2 = order * order
    b = [None] * n2

    # Zonal (m = 0) via Legendre recurrence with normalization
    # K(l,0) = sqrt((2l+1)/(4 pi)).
    p_prev = xp.ones_like(z)  # P_0
    p_curr = z                # P_1
    b[0] = 0.2820947917738781 * p_prev
    if order > 1:
        for l in range(1, order):
            k = np.sqrt((2 * l + 1) / (4 * np.pi))
            p = p_prev if l == 0 else p_curr
            b[l * (l + 1)] = k * p
            if l >= 1:
                p_next = ((2 * l + 1) * z * p_curr - l * p_prev) / (l + 1)
                p_prev, p_curr = p_curr, p_next

    # Sectoral/tesseral (m > 0): s_m, c_m are sin^m(theta) {sin,cos}(m phi)
    # built by the Chebyshev-style recurrence the reference uses
    # (SHMath.hlsli:24-27), and A_l^m(z) from the associated-Legendre
    # recurrence with the Condon-Shortley phase folded in.
    s_m = y
    c_m = x
    for m in range(1, order):
        # A_m^m = (-1)^m (2m-1)!! with (1-z^2)^{m/2} already inside s_m/c_m.
        amm = (-1) ** m * float(np.prod(np.arange(1, 2 * m, 2.0)))
        a_prev = None
        a_curr = amm * xp.ones_like(z)
        for l in range(m, order):
            k = np.sqrt((2 * l + 1) / (2 * np.pi) * _factorial_ratio(l - m, l + m))
            base = l * (l + 1)
            b[base - m] = k * a_curr * s_m
            b[base + m] = k * a_curr * c_m
            # Recurrence: A_{l+1}^m = ((2l+1) z A_l^m - (l+m) A_{l-1}^m)/(l-m+1)
            a_next = ((2 * l + 1) * z * a_curr - ((l + m) * a_prev if a_prev is not None else 0.0)) / (l - m + 1)
            a_prev, a_curr = a_curr, a_next
        s_m, c_m = x * s_m + y * c_m, x * c_m - y * s_m

    return xp.stack(b, axis=-1)


def _factorial_ratio(a: int, b: int) -> float:
    """a! / b! for a <= b."""
    r = 1.0
    for i in range(a + 1, b + 1):
        r /= i
    return r


def cube_texel_directions(size: int, xp=jnp):
    """Un-normalized direction of each cube-map texel, (6, size, size, 3).

    Matches GetCubeTexcoord(index, texSize) (CubeMap.hlsli:37-48): texel (i, j)
    of face f maps through per-face axis swizzles of (xy - half + 0.5, half).
    """
    half = size * 0.5
    j = xp.arange(size, dtype=xp.float32) - half + 0.5          # u axis
    i = -(xp.arange(size, dtype=xp.float32) - half + 0.5)       # v axis (flipped)
    vv, uu = [a for a in _meshgrid_ij(xp, i, j)]
    rr = xp.full_like(uu, half)
    faces = [
        xp.stack([rr, vv, -uu], axis=-1),   # +X
        xp.stack([-rr, vv, uu], axis=-1),   # -X
        xp.stack([uu, rr, -vv], axis=-1),   # +Y
        xp.stack([uu, -rr, vv], axis=-1),   # -Y
        xp.stack([uu, vv, rr], axis=-1),    # +Z
        xp.stack([-uu, vv, -rr], axis=-1),  # -Z
    ]
    return xp.stack(faces, axis=0)


def _meshgrid_ij(xp, i, j):
    return xp.meshgrid(i, j, indexing="ij")


def project_cubemap_sh(cube: jax.Array, order: int = 3) -> jax.Array:
    """Project a radiance cube map onto SH coefficients.

    cube: (6, size, size, 3) radiance.  Returns (order**2, 3) coefficients,
    matching the three-pass reference transform (CSSHCubeMap + CSSHSum +
    CSSHNormalize) including its differential-solid-angle weighting
    (CSSHCubeMap.hlsl:48-58) and 4 pi / sum(weight) normalization
    (CSSHNormalize.hlsl:14-17).
    """
    size = cube.shape[1]
    dirs = cube_texel_directions(size, jnp)
    norm = jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    unit = dirs / norm

    # Differential solid angle from the texel's [-1, 1] face coordinates
    # (the corrected mapping in CSSHCubeMap.hlsl:48-55).
    b = 1.0 / size - 1.0
    s = 2.0 * (1.0 - 1.0 / size) / (size - 1.0) if size > 1 else 0.0
    ax = jnp.arange(size, dtype=jnp.float32) * s + b
    u, v = jnp.meshgrid(ax, ax, indexing="xy")  # u along x (axis 1), v along y (axis 0)
    diff = 1.0 + u * u + v * v
    d_solid = 4.0 / (diff * jnp.sqrt(diff))  # (size, size)
    d_solid = jnp.broadcast_to(d_solid, (6, size, size))

    basis = sh_eval_basis(order, unit)  # (6, size, size, n2)
    weighted = cube * d_solid[..., None]  # (6, size, size, 3)
    # HIGHEST precision: on TPU the default f32 einsum uses bf16 MXU passes,
    # which costs ~0.3% on the coefficients; this runs once at startup.
    coeffs = jnp.einsum("fijn,fijc->nc", basis, weighted,
                        precision=jax.lax.Precision.HIGHEST)
    total_weight = jnp.sum(d_solid)
    return coeffs * (4.0 * jnp.pi / total_weight)


# Ramamoorthi irradiance constants (SHIrradianceTypeless.hlsli:18-21).
_C1 = 0.42904276540489171563379376569857
_C2 = 0.51166335397324424423977581244463
_C3 = 0.24770795610037568833406429782001
_C4 = 0.88622692545275801364908374167057


def evaluate_sh_irradiance(coeffs: jax.Array, normal: jax.Array) -> jax.Array:
    """Irradiance from 9 SH coefficients (SHIrradianceTypeless.hlsli:16-37).

    coeffs: (9, 3); normal: (..., 3) unit vectors. Returns (..., 3), clamped
    at 0.  Note the reference negates x and y before evaluation.
    """
    x = -normal[..., 0:1]
    y = -normal[..., 1:2]
    z = normal[..., 2:3]
    c = coeffs
    irr = (
        (_C1 * (x * x - y * y)) * c[8]
        + (_C3 * (3.0 * z * z - 1.0)) * c[6]
        + _C4 * c[0]
        + 2.0 * _C1 * (c[4] * x * y + c[7] * x * z + c[5] * y * z)
        + 2.0 * _C2 * (c[3] * x + c[1] * y + c[2] * z)
    )
    return jnp.maximum(irr, 0.0)


def evaluate_sh_irradiance_planar(coeffs: jax.Array, nx: jax.Array,
                                  ny: jax.Array, nz: jax.Array) -> jax.Array:
    """Channel-leading twin of evaluate_sh_irradiance for volume fields.

    Direction components arrive as separate (...) arrays and the result is
    (3, ...): on TPU a (..., 3) array pads its 3-wide trailing dim up to a
    full (8, 128) tile (~42x) the moment it materializes, so volume-sized
    irradiance must never take that layout (CLAUDE.md, XLA:TPU layout
    gotchas).  Same math and x/y negation as the reference
    (SHIrradianceTypeless.hlsli:16-37).
    """
    x, y, z = -nx, -ny, nz
    c = coeffs  # (9, 3)

    def ch(l):
        return c[l][:, None, None, None] if x.ndim == 3 else c[l][:, None, None]

    irr = (
        (_C1 * (x * x - y * y))[None] * ch(8)
        + (_C3 * (3.0 * z * z - 1.0))[None] * ch(6)
        + _C4 * ch(0)
        + 2.0 * _C1 * ((x * y)[None] * ch(4) + (x * z)[None] * ch(7)
                       + (y * z)[None] * ch(5))
        + 2.0 * _C2 * (x[None] * ch(3) + y[None] * ch(1) + z[None] * ch(2))
    )
    return jnp.maximum(irr, 0.0)
