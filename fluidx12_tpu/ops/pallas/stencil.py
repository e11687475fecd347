"""Pallas streaming kernels for the projection's stencil passes.

The XLA formulations of divergence / gradient-subtract / boundary-damp
(sim/project.py) are one-liners, but XLA:TPU materializes each edge-clamped
shift as a full relayout copy: measured 6.8 / 5.5 / 4.1 ms standalone at
256^3 on v5e against a ~0.5-1 ms HBM streaming floor.  These kernels stream
the volume once through VMEM with all shifts done in-register:

- X and Y neighbors are in-block `pltpu.roll`s with edge-clamp masks (blocks
  span full Y x X planes, so the only block boundary is Z).
- Z neighbors come from passing the same HBM array as three BlockSpec inputs
  whose index maps point at blocks i-1 / i / i+1 (clamped): the adjacent
  plane is the neighbor block's edge plane, no manual halo DMA needed.

Semantics match the XLA twins exactly (edge-clamped central differences,
CSProject3D.hlsl:77-88; 3% boundary band damp, :104-108); cross-checked in
tests/test_pallas.py.  CPU runs the XLA twins (sim/project.py gates on the
TPU backend).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from fluidx12_tpu.ops.pallas.shifts import (
    shift_lane_clamped as _shift_lane_clamped,
    shift_sublane_clamped as _shift_sublane_clamped,
)


def _z_neighbors(c, prev, nxt, bz, nz, z0=None):
    """(zm, zp): +-1 z-shifted views of block `c` using the adjacent blocks'
    edge planes, clamped at the global volume boundary.  prev/nxt are
    single-plane blocks (the last plane of block i-1 / first of block i+1):
    fetching one plane instead of a whole neighbor block keeps the kernel's
    z-neighbor traffic at 2/bz of a volume instead of 2x (VERDICT r2: the
    full-block fetch put grad_damp 4x off its HBM floor)."""
    zm = jnp.concatenate([prev[-1:], c[:-1]], axis=0)
    zp = jnp.concatenate([c[1:], nxt[:1]], axis=0)
    if z0 is None:
        # NOTE: pl.program_id must not be called inside a pl.when branch
        # (interpret mode cannot lower it there); callers that branch pass
        # a hoisted z0.
        z0 = pl.program_id(0) * bz
    gz = jax.lax.broadcasted_iota(jnp.int32, (bz, 1, 1), 0) + z0
    zm = jnp.where(gz == 0, c, zm)
    zp = jnp.where(gz == nz - 1, c, zp)
    return zm, zp


def _div_kernel(ux_ref, uy_ref, uz_ref, uzp, uzm, out, *, bz: int, nz: int,
                lx=None, ly=None):
    """out = 0.5 * (dx ux + dy uy + dz uz), edge-clamped central diffs.
    Each velocity component rides its own channel-pinned BlockSpec of the
    COMBINED state array (no channel slicing copies); uzp/uzm are the z
    channel's single edge planes (blocks i+1 / i-1).  Velocity may arrive
    in the half storage dtype; the stencil runs f32.

    lx/ly (and nz passed as the LOGICAL z extent) move the +edge clamps to
    the logical extents on padded storage layouts (core/padding.py) -- same
    op count, constant thresholds; ghost outputs are bounded garbage that
    the logically-masked smoothers never consume."""
    f32 = jnp.float32
    ux, uy, uz = (ux_ref[0].astype(f32), uy_ref[0].astype(f32),
                  uz_ref[0].astype(f32))
    dx = _shift_lane_clamped(ux, +1, hi=lx) - _shift_lane_clamped(ux, -1)
    dy = _shift_sublane_clamped(uy, +1, hi=ly) - _shift_sublane_clamped(uy, -1)
    zm, zp = _z_neighbors(uz, uzm[0].astype(f32), uzp[0].astype(f32), bz, nz)
    out[...] = 0.5 * (dx + dy + (zp - zm))


def _grad_damp_kernel(u_ref, pc, pzp, pzm, out, *, bz: int, nz: int, ny: int,
                      nx: int, rho: float, logical_zyx=None):
    """out = damp(v - 0.5 * grad(p) / rho): the two post-Jacobi passes of the
    projection fused into one streaming pass (CSProject3D.hlsl:92-108).

    Grid is (z-block, component) with the component innermost, so the
    pressure blocks (whose index maps ignore the component) are fetched
    once per z-block; each step reads ONE velocity channel of the combined
    state array and writes it back through an aliased output -- the color
    channels are never touched (zero traffic), which is what lets the
    projection run on the combined (7, Z, Y, X) state without any channel
    slicing copies.  v streams in the storage dtype; pressure and all math
    are f32, and the output rounds back to the storage dtype (the state's
    quantization point, core/config.py sim_dtype)."""
    ci = pl.program_id(1)
    z0 = pl.program_id(0) * bz  # hoisted: program_id is illegal inside pl.when
    p = pc[...]
    s = 0.5 / rho
    f32 = jnp.float32
    u = u_ref[0].astype(f32)
    lz, ly, lx = logical_zyx or (nz, ny, nx)

    def ids3(iota_dim):
        ids = jax.lax.broadcasted_iota(jnp.int32, (bz, ny, nx), iota_dim)
        return ids + z0 if iota_dim == 0 else ids

    # Boundary damp: pos in [-1, 1] per axis (LOGICAL extents on padded
    # storage); outward components scale by clamp((0.97 - |pos|)/0.03, -1, 1).
    def pos(n, iota_dim):
        return ((ids3(iota_dim).astype(p.dtype) + 0.5) / n) * 2.0 - 1.0

    def damp(u, pv):
        scale = jnp.clip((0.97 - jnp.abs(pv)) / 0.03, -1.0, 1.0)
        v = jnp.where(u * pv > 0.0, u * scale, u)
        if logical_zyx is None:
            return v
        # Ghost velocity writes ZERO, (re-)establishing the padded layout's
        # zero-ghost invariant (sim/padded.py) every projection.
        mask = (ids3(0) < lz) & (ids3(1) < ly) & (ids3(2) < lx)
        return jnp.where(mask, v, 0.0)

    @pl.when(ci == 0)
    def _():
        gx = (_shift_lane_clamped(p, +1, hi=None if lx == nx else lx)
              - _shift_lane_clamped(p, -1)) * s
        out[0] = damp(u - gx, pos(lx, 2)).astype(out.dtype)

    @pl.when(ci == 1)
    def _():
        gy = (_shift_sublane_clamped(p, +1, hi=None if ly == ny else ly)
              - _shift_sublane_clamped(p, -1)) * s
        out[0] = damp(u - gy, pos(ly, 1)).astype(out.dtype)

    @pl.when(ci == 2)
    def _():
        zm, zp = _z_neighbors(p, pzm[...], pzp[...], bz, lz, z0=z0)
        gz = (zp - zm) * s
        out[0] = damp(u - gz, pos(lz, 0)).astype(out.dtype)


def _gradient_kernel(qc, qzp, qzm, out, *, bz: int, nz: int, ny: int, nx: int):
    """out = (gx, gy, gz) central differences with jnp.gradient's edge
    semantics (one-sided full difference at the boundary).  Channel-leading
    output; one streaming pass (the GI ambient's gradient was 3 XLA
    stencil passes with materialized shifts)."""
    f32 = jnp.float32
    q = qc[...].astype(f32)

    def scale(iota_dim, n, gids=None):
        ids = (jax.lax.broadcasted_iota(jnp.int32, q.shape, iota_dim)
               if gids is None else gids)
        edge = (ids == 0) | (ids == n - 1)
        return jnp.where(edge, 1.0, 0.5)

    gx = (_shift_lane_clamped(q, +1) - _shift_lane_clamped(q, -1)) * scale(2, nx)
    gy = (_shift_sublane_clamped(q, +1) - _shift_sublane_clamped(q, -1)) * scale(1, ny)
    zm, zp = _z_neighbors(q, qzm[...].astype(f32), qzp[...].astype(f32), bz, nz)
    gz_ids = jax.lax.broadcasted_iota(jnp.int32, q.shape, 0) + pl.program_id(0) * bz
    gz = (zp - zm) * scale(0, nz, gz_ids)
    out[0] = gx
    out[1] = gy
    out[2] = gz


def _gi_light_kernel(qc, qzp, qzm, shadow, ao, coeffs, w3, env, out, *,
                     bz: int, nz: int, ny: int, nx: int, zero_thr: float):
    """Fused GI light map: out = env * shadow + dense ? irradiance(grad) * ao : 0.

    One streaming pass over density (+ its z-neighbor blocks), the shadow
    sweep and the upsampled AO replaces the XLA chain's ~6 materialized
    volumes (gradient components, rotated/normalized directions, SH
    irradiance, ambient): gradient -> radial fallback (RayMarch.hlsli:279)
    -> world rotation -> normalize -> SH irradiance (x/y negated,
    SHIrradianceTypeless.hlsli:16-37) -> dense mask -> light combine
    (CSRayMarchL.hlsl:44-79), all in registers.  coeffs (9, 3), w3 (3, 3)
    and env (3,) ride in SMEM as scalars.
    """
    f32 = jnp.float32
    q = qc[...].astype(f32)

    def scale(iota_dim, n, gids=None):
        ids = (jax.lax.broadcasted_iota(jnp.int32, q.shape, iota_dim)
               if gids is None else gids)
        edge = (ids == 0) | (ids == n - 1)
        return jnp.where(edge, 1.0, 0.5)

    gx = (_shift_lane_clamped(q, +1) - _shift_lane_clamped(q, -1)) * scale(2, nx)
    gy = (_shift_sublane_clamped(q, +1) - _shift_sublane_clamped(q, -1)) * scale(1, ny)
    zm, zp = _z_neighbors(q, qzm[...].astype(f32), qzp[...].astype(f32), bz, nz)
    gz_ids = jax.lax.broadcasted_iota(jnp.int32, q.shape, 0) + pl.program_id(0) * bz
    gz = (zp - zm) * scale(0, nz, gz_ids)

    n1, n2, n3 = -gx, -gy, -gz  # -(d/dx, d/dy, d/dz)
    degenerate = n1 * n1 + n2 * n2 + n3 * n3 < 1e-16
    # radial fallback: voxel center in [-1, 1] per axis
    ix = jax.lax.broadcasted_iota(jnp.int32, q.shape, 2).astype(f32)
    iy = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1).astype(f32)
    px = (ix + 0.5) / nx * 2.0 - 1.0
    py = (iy + 0.5) / ny * 2.0 - 1.0
    pz = (gz_ids.astype(f32) + 0.5) / nz * 2.0 - 1.0
    n1 = jnp.where(degenerate, px, n1)
    n2 = jnp.where(degenerate, py, n2)
    n3 = jnp.where(degenerate, pz, n3)

    # world rotation (row-vector convention) + normalize
    wx = n1 * w3[0, 0] + n2 * w3[1, 0] + n3 * w3[2, 0]
    wy = n1 * w3[0, 1] + n2 * w3[1, 1] + n3 * w3[2, 1]
    wz = n1 * w3[0, 2] + n2 * w3[1, 2] + n3 * w3[2, 2]
    inv = jax.lax.rsqrt(jnp.maximum(wx * wx + wy * wy + wz * wz, 1e-24))
    # reference negates x and y before SH evaluation
    x = -wx * inv
    y = -wy * inv
    z = wz * inv

    _C1 = 0.42904276540489171563379376569857
    _C2 = 0.51166335397324424423977581244463
    _C3 = 0.24770795610037568833406429782001
    _C4 = 0.88622692545275801364908374167057
    b8 = _C1 * (x * x - y * y)
    b6 = _C3 * (3.0 * z * z - 1.0)
    bxy = 2.0 * _C1 * (x * y)
    bxz = 2.0 * _C1 * (x * z)
    byz = 2.0 * _C1 * (y * z)

    dense = q >= zero_thr
    ao_v = ao[...].astype(f32)
    sh_v = shadow[...].astype(f32)
    for ch in range(3):
        irr = (b8 * coeffs[8, ch] + b6 * coeffs[6, ch] + _C4 * coeffs[0, ch]
               + bxy * coeffs[4, ch] + bxz * coeffs[7, ch] + byz * coeffs[5, ch]
               + 2.0 * _C2 * (x * coeffs[3, ch] + y * coeffs[1, ch]
                              + z * coeffs[2, ch]))
        ambient = jnp.where(dense, jnp.maximum(irr, 0.0) * ao_v, 0.0)
        out[ch] = env[ch] * sh_v + ambient


def _prolong_correct_kernel(qc, ecc, ecp, ecm, pyt, px, out, *, bzc: int,
                            lzc=None):
    """out = q + prolong(e_c): the multigrid's coarse-correction applied in
    one streaming pass over the fine volume (the XLA chain materializes two
    lateral-upsample intermediates plus the fine correction, ~4.5 volume
    moves; this kernel reads q once, the coarse block once, writes once).

    Lateral upsample is two MXU matmuls per coarse plane (pyt = (ny, nyc)
    transposed trilinear matrix, px = (nxc, nx)); the z-direction is the
    cell-centered lerp done on the leading dim (even fine plane 2m mixes
    coarse (m-1, m) at (0.25, 0.75), odd 2m+1 mixes (m, m+1) at
    (0.75, 0.25); edges clamp via the neighbor-plane BlockSpecs).  Exactly
    mg._prolong's weights; pooling-order rounding differs by ~1 ulp.
    """
    f32 = jnp.float32
    hi = jax.lax.Precision.HIGHEST  # default MXU passes round f32 to bf16
    zc0 = pl.program_id(0) * bzc  # hoisted (illegal inside pl.when)
    # Assembled coarse slab: (bzc + 2, nyc, nxc) with clamped edge planes.
    e = jnp.concatenate([ecm[...], ecc[...], ecp[...]], axis=0)
    planes = [jnp.dot(jnp.dot(pyt[...], e[j], precision=hi,
                              preferred_element_type=f32),
                      px[...], precision=hi, preferred_element_type=f32)
              for j in range(bzc + 2)]
    e_up = jnp.stack(planes, axis=0)          # (bzc + 2, ny, nx)
    e_hi = e_up[2:]
    if lzc is not None:
        # Padded storage: the +z coarse read clamps at the LOGICAL coarse
        # edge plane lzc-1 (core/padding.py; matches _prolong_padded).
        gc = (jax.lax.broadcasted_iota(jnp.int32, (bzc, 1, 1), 0) + zc0)
        e_hi = jnp.where(gc == lzc - 1, e_up[1:-1], e_hi)
    even = 0.25 * e_up[:-2] + 0.75 * e_up[1:-1]
    odd = 0.75 * e_up[1:-1] + 0.25 * e_hi
    e_fine = jnp.stack([even, odd], axis=1).reshape(qc.shape)
    out[...] = qc[...] + e_fine


def prolong_correct_pallas(q: jax.Array, e_c: jax.Array,
                           logical_czyx=None) -> jax.Array:
    """q + mg._prolong(e_c) as one streaming pass; q (Z, Y, X) f32 fine,
    e_c (Z/2, Y/2, X/2) f32 coarse.

    logical_czyx: COARSE logical extents on padded storage -- prolongation
    reads clamp at the logical coarse edges (matches sim/padded.
    _prolong_padded); None = compact."""
    import numpy as np

    from fluidx12_tpu.sim.mg import _prolong_matrix

    nz, ny, nx = q.shape
    nzc, nyc, nxc = e_c.shape
    # q in + out + the upsampled coarse stack (~half a block) + temporaries.
    bz = _pick_bz(nz, ny * nx, 4 + 4 + 2 + 6)
    if bz % 2:
        bz *= 2  # coarse blocks pair fine planes
    # Gated by prolong_pallas_supported; a silent over-budget block would
    # OOM Mosaic's 16 MB scoped stack at compile time (and on axon a failed
    # big compile can wedge the shared relay), so fail loudly instead.
    assert _bz_fits(bz, ny * nx, 16), (
        f"prolong_correct_pallas: no feasible even z-block for {q.shape}; "
        "gate with prolong_pallas_supported")
    bzc = bz // 2
    ec_c, ec_p, ec_m = _zspecs(bzc, nyc, nxc, nzc)
    qspec = pl.BlockSpec((bz, ny, nx), lambda i: (i, 0, 0))
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    lzc = None
    if logical_czyx is not None and tuple(logical_czyx) != (nzc, nyc, nxc):
        from fluidx12_tpu.sim.padded import _prolong_matrix_logical

        lzc, lyc, lxc = logical_czyx
        if lzc == nzc:
            lzc = None  # z unpadded: the array clamp is already logical
        pyt = np.ascontiguousarray(_prolong_matrix_logical(nyc, lyc).T)
        px = _prolong_matrix_logical(nxc, lxc)
    else:
        pyt = np.ascontiguousarray(_prolong_matrix(nyc).T)  # (ny, nyc)
        px = _prolong_matrix(nxc)                           # (nxc, nx)
    return pl.pallas_call(
        functools.partial(_prolong_correct_kernel, bzc=bzc, lzc=lzc),
        interpret=(jax.default_backend() == "cpu"),
        out_shape=jax.ShapeDtypeStruct(q.shape, jnp.float32),
        grid=(nz // bz,),
        in_specs=[qspec, ec_c, ec_p, ec_m,
                  vmem((ny, nyc), lambda i: (0, 0)),
                  vmem((nxc, nx), lambda i: (0, 0))],
        out_specs=qspec,
    )(q, e_c, e_c, e_c, jnp.asarray(pyt), jnp.asarray(px))


def _residual_kernel(qc, qzp, qzm, bc, out, *, bz: int, nz: int,
                     lx=None, ly=None):
    """out = b - (sum(neighbors) - 6 q): the Poisson residual for the
    multigrid fast solver (sim/project.py).  Same fixed point as the Jacobi
    sweep (CSPoisson.hlsli:8-26): residual 0 <=> q = (sum(nb) - b)/6.
    lx/ly (+ nz as the logical z extent) move the +edge clamps to the
    logical extents on padded storage layouts."""
    f32 = jnp.float32
    q = qc[...].astype(f32)
    s = _shift_lane_clamped(q, +1, hi=lx) + _shift_lane_clamped(q, -1)
    s = s + _shift_sublane_clamped(q, +1, hi=ly) + _shift_sublane_clamped(q, -1)
    zm, zp = _z_neighbors(q, qzm[...].astype(f32), qzp[...].astype(f32), bz, nz)
    out[...] = bc[...].astype(f32) - (s + zm + zp - 6.0 * q)


def _bz_fits(bz: int, plane_elems: int, budget_bytes: int) -> bool:
    return bz * plane_elems * budget_bytes * 2 <= 12 * 1024 * 1024


def _pick_bz(nz: int, plane_bytes: int, n_blocks_vmem: int) -> int:
    """Largest z-block keeping ~n_blocks_vmem plane-stacks under ~12 MB.
    Mosaic double-buffers every pipelined block, hence the factor 2.
    Neighbor planes are single-plane blocks and cost ~nothing here, but
    their per-block refetch costs 2/bz of a volume in HBM traffic -- so
    prefer the LARGEST bz that fits, not the smallest that works.

    Halving stops at the odd core of nz, which can still be over budget
    (e.g. nz=48 with huge planes bottoms out at bz=3); feasibility is the
    GATE's job -- stencil_pallas_supported checks fits(odd_core) at the
    worst caller budget, so a gated call never reaches an over-budget bz."""
    bz = nz
    while bz > 1 and (bz % 2 == 0) and not _bz_fits(bz, plane_bytes, n_blocks_vmem):
        bz //= 2
    return bz


def _odd_core(nz: int) -> int:
    while nz % 2 == 0:
        nz //= 2
    return nz


def stencil_pallas_supported(zyx, budget_bytes: int = 24) -> bool:
    """Blocks span full Y x X planes; Mosaic needs a 128-multiple lane dim
    (same constraint as the Jacobi kernels) and an even Z split.  Also
    requires that the smallest reachable z-block (the odd core of nz --
    _pick_bz halves only while even) fits the scoped-VMEM model at the
    worst per-element budget of the kernels sharing this gate (24 B:
    divergence/grad_damp/gi_light at f32); fits() is monotonic in bz, so
    this certifies every caller's _pick_bz result is in budget."""
    nz, ny, nx = zyx
    if not (nx % 128 == 0 and ny % 8 == 0 and nz % 2 == 0 and nz >= 4):
        return False
    return _bz_fits(_odd_core(nz), ny * nx, budget_bytes)


def prolong_pallas_supported(zyx) -> bool:
    """prolong_correct_pallas additionally needs an EVEN fine z-block
    (coarse blocks pair fine planes), so its floor is 2 * odd_core(nz),
    at its own 16 B/elem budget."""
    nz, ny, nx = zyx
    if not stencil_pallas_supported(zyx, budget_bytes=16):
        return False
    return _bz_fits(2 * _odd_core(nz), ny * nx, 16)


def _zspecs(bz, ny, nx, nz, lead=None):
    """BlockSpecs for (center, z+1-edge, z-1-edge) views of one array.

    The center spec is a bz-plane block; the neighbor specs are SINGLE-plane
    blocks pointing at the first plane of block i+1 / the last plane of block
    i-1 (clamped at the volume ends) -- the only planes _z_neighbors reads.
    """
    nb = nz // bz - 1
    del nb  # center blocks index directly; edges clamp on plane indices
    shape = (bz, ny, nx) if lead is None else (lead, bz, ny, nx)

    def mk_center():
        if lead is None:
            return pl.BlockSpec(shape, lambda i: (i, 0, 0))
        return pl.BlockSpec(shape, lambda i: (0, i, 0, 0))

    def mk_edge(off):
        # index maps run traced on the scalar core: jnp.clip, not min/max.
        # Block units are single planes, so the map returns plane indices.
        if off > 0:
            plane = lambda i: jnp.clip((i + 1) * bz, 0, nz - 1)
        else:
            plane = lambda i: jnp.clip(i * bz - 1, 0, nz - 1)
        if lead is None:
            return pl.BlockSpec((1, ny, nx), lambda i: (plane(i), 0, 0))
        return pl.BlockSpec((lead, 1, ny, nx), lambda i: (0, plane(i), 0, 0))

    return mk_center(), mk_edge(+1), mk_edge(-1)


def divergence_pallas(fields: jax.Array, bz: int = 0,
                      logical_zyx=None) -> jax.Array:
    """Central-difference divergence from a (C >= 3, Z, Y, X) field array
    whose channels 0..2 are velocity (the combined state array works
    directly -- channel-pinned BlockSpecs, no slicing copies).

    logical_zyx: the logical (Z, Y, X) extents on padded storage layouts
    (core/padding.py) -- the +edge clamps move there; None = compact."""
    _, nz, ny, nx = fields.shape
    lz, ly, lx = logical_zyx or (nz, ny, nx)
    vb = fields.dtype.itemsize
    if not bz:
        # 3 channel blocks (storage dtype) + f32 out + ~2 f32 temporaries.
        bz = _pick_bz(nz, ny * nx, 3 * vb + 4 + 8)

    def ch(c):
        return pl.BlockSpec((1, bz, ny, nx), lambda i, c=c: (c, i, 0, 0))

    def ch_edge(c, off):
        if off > 0:
            plane = lambda i: jnp.clip((i + 1) * bz, 0, nz - 1)
        else:
            plane = lambda i: jnp.clip(i * bz - 1, 0, nz - 1)
        return pl.BlockSpec((1, 1, ny, nx),
                            lambda i, c=c, plane=plane: (c, plane(i), 0, 0))

    return pl.pallas_call(
        functools.partial(_div_kernel, bz=bz, nz=lz,
                          lx=None if lx == nx else lx,
                          ly=None if ly == ny else ly),
        interpret=(jax.default_backend() == "cpu"),
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), jnp.float32),
        grid=(nz // bz,),
        in_specs=[ch(0), ch(1), ch(2), ch_edge(2, +1), ch_edge(2, -1)],
        out_specs=pl.BlockSpec((bz, ny, nx), lambda i: (i, 0, 0)),
    )(fields, fields, fields, fields, fields)


def gradient3_pallas(q: jax.Array) -> jax.Array:
    """(Z, Y, X) -> (3, Z, Y, X) spatial gradient (gx, gy, gz), matching
    jnp.gradient's central/one-sided scheme; f32 out."""
    nz, ny, nx = q.shape
    bz = _pick_bz(nz, ny * nx, q.dtype.itemsize + 3 * 4)
    pc, pzp, pzm = _zspecs(bz, ny, nx, nz)
    return pl.pallas_call(
        functools.partial(_gradient_kernel, bz=bz, nz=nz, ny=ny, nx=nx),
        interpret=(jax.default_backend() == "cpu"),
        out_shape=jax.ShapeDtypeStruct((3, nz, ny, nx), jnp.float32),
        grid=(nz // bz,),
        in_specs=[pc, pzp, pzm],
        out_specs=pl.BlockSpec((3, bz, ny, nx), lambda i: (0, i, 0, 0)),
    )(q, q, q)


def gi_light_pallas(density: jax.Array, shadow: jax.Array, ao: jax.Array,
                    sh_coeffs: jax.Array, world3: jax.Array, env: jax.Array,
                    zero_threshold: float) -> jax.Array:
    """Fused GI light map (see _gi_light_kernel): (Z, Y, X) density/shadow/ao
    + (9, 3) SH coeffs + (3, 3) world rotation + (3,) env light ->
    (3, Z, Y, X) f32 light map."""
    nz, ny, nx = density.shape
    bz = _pick_bz(nz, ny * nx, density.dtype.itemsize
                  + shadow.dtype.itemsize + ao.dtype.itemsize + 3 * 4)
    pc, pzp, pzm = _zspecs(bz, ny, nx, nz)
    plane = pl.BlockSpec((bz, ny, nx), lambda i: (i, 0, 0))
    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    return pl.pallas_call(
        functools.partial(_gi_light_kernel, bz=bz, nz=nz, ny=ny, nx=nx,
                          zero_thr=zero_threshold),
        interpret=(jax.default_backend() == "cpu"),
        out_shape=jax.ShapeDtypeStruct((3, nz, ny, nx), jnp.float32),
        grid=(nz // bz,),
        in_specs=[pc, pzp, pzm, plane, plane,
                  smem((9, 3), lambda i: (0, 0)),
                  smem((3, 3), lambda i: (0, 0)),
                  smem((3,), lambda i: (0,))],
        out_specs=pl.BlockSpec((3, bz, ny, nx), lambda i: (0, i, 0, 0)),
    )(density, density, density, shadow, ao,
      sh_coeffs.astype(jnp.float32), world3.astype(jnp.float32),
      env.astype(jnp.float32))


def residual_pallas(pressure: jax.Array, b: jax.Array,
                    logical_zyx=None) -> jax.Array:
    """Poisson residual b - A q of a (Z, Y, X) f32 pair (3D).
    logical_zyx: logical extents on padded storage (None = compact)."""
    nz, ny, nx = pressure.shape
    lz, ly, lx = logical_zyx or (nz, ny, nx)
    # 3 f32 io stacks + ~4 block-sized f32 sweep temporaries (the +8
    # allowance; at bz=8 the kernel measured 16.19 MB of scoped VMEM and
    # OOM'd the 16 MB stack -- temporaries are real).
    bz = _pick_bz(nz, ny * nx, 3 * 4 + 8)
    pc, pzp, pzm = _zspecs(bz, ny, nx, nz)
    bspec = pl.BlockSpec((bz, ny, nx), lambda i: (i, 0, 0))
    return pl.pallas_call(
        functools.partial(_residual_kernel, bz=bz, nz=lz,
                          lx=None if lx == nx else lx,
                          ly=None if ly == ny else ly),
        interpret=(jax.default_backend() == "cpu"),
        out_shape=jax.ShapeDtypeStruct(pressure.shape, jnp.float32),
        grid=(nz // bz,),
        in_specs=[pc, pzp, pzm, bspec],
        out_specs=bspec,
    )(pressure, pressure, pressure, b)


def grad_damp_pallas(fields: jax.Array, pressure: jax.Array,
                     rho: float, logical_zyx=None) -> jax.Array:
    """Fused (v - 0.5*grad(p)/rho) + boundary damp applied IN PLACE on a
    (C >= 3, Z, Y, X) field array: the output aliases the input and only
    the velocity-channel blocks (0..2) are ever written, so extra channels
    (the combined state's color) pass through with ZERO read/write traffic.
    Returns the full updated array.

    logical_zyx: logical extents on padded storage (core/padding.py) --
    clamps/damp positions move to the logical extents and ghost velocity
    writes ZERO (the padded layout's invariant); None = compact."""
    c, nz, ny, nx = fields.shape
    vb = fields.dtype.itemsize
    # 1 velocity channel in + aliased out (storage dtype) + f32 pressure
    # block + ~3 f32 temporaries.
    bz = _pick_bz(nz, ny * nx, 2 * vb + 4 + 12)

    uspec = pl.BlockSpec((1, bz, ny, nx), lambda i, ci: (ci, i, 0, 0))
    pc = pl.BlockSpec((bz, ny, nx), lambda i, ci: (i, 0, 0))
    pzp = pl.BlockSpec((1, ny, nx),
                       lambda i, ci: (jnp.clip((i + 1) * bz, 0, nz - 1), 0, 0))
    pzm = pl.BlockSpec((1, ny, nx),
                       lambda i, ci: (jnp.clip(i * bz - 1, 0, nz - 1), 0, 0))
    return pl.pallas_call(
        functools.partial(_grad_damp_kernel, bz=bz, nz=nz, ny=ny, nx=nx,
                          rho=rho, logical_zyx=logical_zyx),
        interpret=(jax.default_backend() == "cpu"),
        out_shape=jax.ShapeDtypeStruct(fields.shape, fields.dtype),
        grid=(nz // bz, 3),
        in_specs=[uspec, pc, pzp, pzm],
        out_specs=uspec,
        input_output_aliases={0: 0},
    )(fields, pressure, pressure, pressure)
