"""Configuration for the FluidX12-TPU engine.

One dataclass replaces the reference's three config tiers (SURVEY.md section 5.6):
CLI flags (FluidX12.cpp:398-433), runtime hotkeys (FluidX12.cpp:311-334) and
compile-time shader defines (Common.hlsli:5-10, SharedConsts.h:5-6,
RayMarch.hlsli:38-57).  Everything that was an `#ifdef` is a boolean field here;
changing it just retraces the jitted step.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Tuple

import jax.numpy as jnp


class RenderMethod(enum.IntEnum):
    """The four live-toggleable render methods (ref: FluidX12.cpp:19-29).

    RAY_MARCH_MERGED           cube-map march, per-sample shadow rays
    RAY_MARCH_SEPARATE         light-map pass + cube-map march (the default, "OPTIMIZED")
    RAY_MARCH_DIRECT_MERGED    screen-space march, per-sample shadow rays
    RAY_MARCH_DIRECT_SEPARATE  light-map pass + screen-space march
    """

    RAY_MARCH_MERGED = 0
    RAY_MARCH_SEPARATE = 1
    RAY_MARCH_DIRECT_MERGED = 2
    RAY_MARCH_DIRECT_SEPARATE = 3

    def next(self) -> "RenderMethod":
        return RenderMethod((self + 1) % 4)

    def prev(self) -> "RenderMethod":
        return RenderMethod((self + 3) % 4)

    @property
    def uses_cube_map(self) -> bool:
        return self in (RenderMethod.RAY_MARCH_MERGED, RenderMethod.RAY_MARCH_SEPARATE)

    @property
    def separate_light_pass(self) -> bool:
        return self in (
            RenderMethod.RAY_MARCH_SEPARATE,
            RenderMethod.RAY_MARCH_DIRECT_SEPARATE,
        )


class FaceCullMode(enum.IntEnum):
    """Cube-face culling strategy (ref: SharedConsts.h:5-6, `_CPU_CUBE_FACE_CULL_`).

    On TPU all six faces live in one dispatch, so "culling" means masking the
    work for invisible faces (NONE computes all six unconditionally).
    """

    NONE = 0      # in-graph visibility test per face (ref GPU test, CSRayMarch.hlsl:69-74)
    MASK = 1      # host-computed visibility bitmask fed as an argument (ref mode 1)
    LIST = 2      # host-computed packed face list (ref mode 2); masked identically on TPU


@dataclasses.dataclass(frozen=True)
class FluidConfig:
    """Static (trace-time) configuration.

    Defaults mirror the reference app defaults (FluidX12.cpp:34-46, Main.cpp:17).
    """

    # -gridSize x y z (ref default 128^3). grid_size.z == 1 selects the 2D pipeline.
    grid_size: Tuple[int, int, int] = (128, 128, 128)
    # Viewport (ref default 800x800, Main.cpp:17).
    viewport: Tuple[int, int] = (800, 800)
    # -maxRaySamples / -maxLightSamples (ref: FluidX12.cpp:38-39).
    max_ray_samples: int = 192
    max_light_samples: int = 64
    # Poisson pressure-solve sweeps (ref: CSProject3D.hlsl `ITER` = 64).
    num_pressure_iters: int = 64
    # Cube-map mip count for the LOD controller (ref: Fluid.cpp:230 numMips=5).
    num_cube_mips: int = 5
    # Whether a radiance light probe (SH GI) is attached (-radiance file).
    has_light_probe: bool = False
    # Face culling strategy.
    face_cull: FaceCullMode = FaceCullMode.MASK
    # Premultiplied-alpha color storage (ref: Common.hlsli `_PRE_MULTIPLIED_`, on).
    pre_multiplied: bool = True
    # Treat the light as a point light instead of directional (the reference's
    # dormant `_POINT_LIGHT_` define, RayMarch.hlsli:40, CSRayMarch.hlsl:131).
    # Only the faithful render paths honor this; the fast sweeps assume a
    # directional light (parallel rays).
    point_light: bool = False
    # Quantize the ray-marched cube map to 8-bit like the reference's RGBA8 target
    # (Fluid.cpp:229-232); disable for a higher-quality-than-reference float path.
    quantize_cube_map: bool = True
    # STORAGE dtype for the persistent velocity/color fields.  The reference
    # stores these as half-precision textures (RGBA16F, Fluid.cpp:204-216)
    # with fp32 ALU math; bf16 is the TPU-native half-storage equivalent
    # (Mosaic has no f16) and halves the HBM traffic of every pass that
    # touches the state.  All arithmetic still runs in f32, with one
    # half round-trip per frame at the state boundary -- the same
    # quantization point as the reference's per-pass texture writes.
    # Pressure stays f32 (ref m_incompress is R32_FLOAT, Fluid.cpp:218-221).
    sim_dtype: jnp.dtype = jnp.bfloat16
    # Compute dtype for render-path sampling/accumulation. The reference used
    # min16float accumulation into an RGBA8 target; bf16 is the TPU analog.
    render_dtype: jnp.dtype = jnp.float32
    # Master switch for Pallas kernels (False = pure-XLA everywhere; the two
    # paths are a dual-stack cross-check, SURVEY.md section 4).  Kernels only
    # engage on the TPU backend; CPU always runs the XLA twins.
    use_pallas: bool = True
    # Per-kernel gates (measured at 128^3 on v5e):
    # - advection backtrace rolls in VMEM: 5.7 ms vs 18.2 ms XLA dense-shift
    pallas_advect: bool = True
    # - Jacobi slab kernel (roll-based sweeps): 4.8 ms vs 5.5 ms XLA
    pallas_jacobi: bool = True
    # Fuse the x and y advect resample passes into ONE kernel visit per
    # channel block (ops/pallas/advect.py::_pass_kernel_fused_xy): the
    # x-advected intermediate lives only in a VMEM accumulator, cutting the
    # lateral-pass HBM traffic from 4 full-volume trips to ~2.14 at 256^3.
    # Requires a full (Y, X) plane per block; unsupported planes fall back
    # to the two-pass form automatically.
    advect_fuse_xy: bool = True
    # Multigrid pressure fast solver: on grids with mg_min_plane or more
    # plane cells (128x128 up -- the reference's 64-sweep schedule costs
    # ~2.8 ms at 128^3 and ~15 ms at 256^3), one V(4,4) cycle with 32
    # half-grid sweeps replaces the 64 Jacobi sweeps -- several times less
    # fine-level work AND a lower post-projection divergence (the coarse
    # level removes the smooth error Jacobi cannot; cross-checked in
    # tests/test_sim.py).  Smaller grids keep the reference schedule.
    mg_pressure: bool = True
    # FULLY fused projection (divergence in the pre-smoother prologue,
    # grad+damp in the post-smoother epilogue, sim/mg.mg_project_fused):
    # bit-identical to the unfused chain but measured SLOWER at 256^3
    # (12.99 vs 12.15 ms simulate, TPU A/B 2026-08-19): the velocity/center
    # buffers push the planewise windows from slab 64 to 32, raising the
    # z-window read redundancy 1.25 -> 1.5x and doubling the window count,
    # which costs more than the removed standalone div/grad volume trips.
    # Kept as an opt-in experiment with full cross-checks
    # (tests/test_pallas.py); default off on the measurement.
    mg_project_fused: bool = False
    # Smallest (Y * X) plane-cell count at which the multigrid solver
    # engages.  128*128 planes (the flagship grid) measured better on BOTH
    # axes on CPU twins -- V(4,4)+32 residual rms 0.0145 vs 0.0174 for the
    # 64-sweep schedule at 128^3 -- and the V-cycle's fine-level work is
    # ~4x less; grids below this keep the reference-faithful fixed
    # iteration schedule.
    mg_min_plane: int = 128 * 128
    # Use the TPU-native slice-reformulated render passes (lightmap sweep +
    # slice-compositing cube march) instead of the faithful per-ray gather
    # marchers.  ~1000x on TPU; cross-checked in tests/test_fastpath.py.
    fast_render: bool = True
    # Use the dense-shift dimensional-split advection instead of the
    # gather-based trilinear backtrace (sim/advect_fast.py).
    fast_sim: bool = True
    # EXPERIMENTAL: resolve the cube map with one record gather per 2x2
    # pixel block (render/resolve.py::cube_cast_blocked).  The raw gather is
    # 2.5x cheaper (160k x 64-elem rows vs 640k x 16: 0.98 vs 2.56 ms at
    # 800^2), but the layout shuffling around it (pixel de/re-interleave,
    # per-slot planes) costs more than the gather saves on current XLA:TPU
    # (measured 2.0 -> 11+ ms composed).  Kept off; the math is exact on
    # interior blocks and cross-checked in tests/test_render.py.
    block_resolve: bool = False
    # Sub-steps of the split backtrace (error ~ (CFL/n)^2 per sub-step).
    advect_substeps: int = 1

    # ---- physics constants (ref: CSAdvect.hlsl:11-14, Impulse.hlsli) ----
    ext_force: Tuple[float, float, float] = (0.0, 48.0, 0.0)
    force_scale_3d: float = 4.0
    vort_scale: float = 200.0
    dissipation: float = 0.2
    impulse_pos: Tuple[float, float, float] = (0.5, 0.1, 0.5)
    impulse_radius: float = 1.0 / 16.0
    impulse_color: Tuple[float, float, float] = (0.2, 0.4, 1.0)
    impulse_density: float = 40.0
    # Pressure-equation density rho (ref: CSProject3D.hlsl:26 / CSProject2D.hlsl:24).
    fluid_density_3d: float = 0.48
    fluid_density_2d: float = 1.0

    # ---- render constants (ref: RayMarch.hlsli:11-12, Fluid.cpp ctor) ----
    absorption: float = 0.8
    zero_threshold: float = 0.01
    light_pos: Tuple[float, float, float] = (75.0, 75.0, -75.0)
    light_color: Tuple[float, float, float, float] = (1.0, 0.7, 0.3, 3.0 * 3.141592653589793)
    ambient: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.5 * 3.141592653589793)
    # Volume world transform scale (ref: Fluid.cpp:184 scaling(10)).
    volume_scale: float = 10.0
    # Clear color of the frame (ref: FluidX12.cpp:471).
    clear_color: Tuple[float, float, float, float] = (0.2, 0.2, 0.2, 0.0)
    # Camera frustum (ref: SharedConsts.h:8-9, FluidX12.cpp:30).
    z_near: float = 1.0
    z_far: float = 1000.0
    fov_y: float = 3.141592653589793 / 4.0

    # ------------------------------------------------------------------
    @property
    def is_3d(self) -> bool:
        return self.grid_size[2] > 1

    @property
    def time_step(self) -> float:
        """Resolution-locked dt (ref: FluidX12.cpp:266): (3D? 2 : 1)/grid.y."""
        return (2.0 if self.is_3d else 1.0) / self.grid_size[1]

    @property
    def cube_map_size(self) -> int:
        """Cube-map face resolution at mip 0 (ref: Fluid.cpp:231 = grid.x)."""
        return self.grid_size[0]

    @property
    def zyx(self) -> Tuple[int, int, int]:
        """Grid extents in array order (Z, Y, X)."""
        x, y, z = self.grid_size
        return (z, y, x)

    def validate(self) -> "FluidConfig":
        x, y, z = self.grid_size
        if x != y:
            # ref asserts grid squareness (Fluid.cpp:201)
            raise ValueError(f"grid_size.x must equal grid_size.y, got {self.grid_size}")
        if x < 8 or y < 8 or z < 1:
            raise ValueError(f"grid too small: {self.grid_size}")
        if self.max_ray_samples < 1 or self.max_light_samples < 1:
            raise ValueError("sample counts must be >= 1")
        return self


# Launch presets mirroring Bin/*.bat (ref: Fluid2D.bat, FluidGI.bat).
PRESETS = {
    "fluid3d": FluidConfig(),
    "fluid2d": FluidConfig(grid_size=(512, 512, 1)),
    "fluidgi": FluidConfig(grid_size=(150, 150, 150), has_light_probe=True),
}
