"""Device mesh setup for multi-chip scaling.

The reference is single-GPU (one adapter, one queue, FluidX12.cpp:92-141);
its scale axis beyond one chip is spatial domain decomposition (SURVEY.md
sections 2.5 and 5.7-5.8).  This module isolates mesh construction so the
single-chip path stays trivial: a 1D mesh over the named axis "z" shards the
slowest-varying grid dimension; halos ride ICI via `lax.ppermute`.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

Z_AXIS = "z"


def make_grid_mesh(n_devices: Optional[int] = None,
                   devices: Optional[Sequence] = None) -> Mesh:
    """1D mesh over the grid's Z dimension."""
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.array(devices), (Z_AXIS,))
