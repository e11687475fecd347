"""Test configuration: force the CPU backend with 8 virtual devices.

This is the TPU analog of the reference's `-warp` software-rasterizer path
(FluidX12.cpp:404-406): the whole pipeline must run and be testable without
the accelerator.  The 8 virtual devices let sharding tests exercise a real
`jax.sharding.Mesh` on one host.

Note: this environment's sitecustomize registers the `axon` TPU platform and
programmatically forces `jax_platforms=axon`, so an env var alone is not
enough -- we override the config after importing jax.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
