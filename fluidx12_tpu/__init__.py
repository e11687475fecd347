"""FluidX12-TPU: a TPU-native real-time smoke simulation + volume rendering framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of StarsX/FluidX12
(Eulerian smoke simulation with cube-map-space anti-aliased ray marching and
spherical-harmonics light-probe GI), built for TPU hardware:

- the whole sim+render step is one fused, jit-compiled, donated-buffer program,
- stencil/marching kernels are dense XLA ops or Pallas kernels (no textures,
  no barriers, no descriptor heaps -- those concepts dissolve under jit),
- multi-chip scaling is spatial domain decomposition over a `jax.sharding.Mesh`
  with ICI halo exchange (`fluidx12_tpu.parallel`).

Layer map (mirrors SURVEY.md section 7):
    core/     config, state pytree, camera & world math, LOD/face-cull controller
    ops/      sampling/stencil primitives + Pallas kernels
    sim/      advection + pressure projection      (ref: CSAdvect/CSProject*)
    render/   ray marchers, resolve, visualize     (ref: CSRayMarch*/PSCube/PSRayCast*)
    gi/       SH light probe + DDS loading         (ref: CSSH*/XUSGDDSLoader)
    engine/   frame loop, CLI, screenshots, stats  (ref: FluidX12.cpp/Main.cpp)
    parallel/ device mesh + sharded domain decomposition (new capability)
    utils/    PNG IO, image helpers                (ref: stb_image_write)
"""

__version__ = "0.1.0"

from fluidx12_tpu.core.config import FluidConfig, RenderMethod
