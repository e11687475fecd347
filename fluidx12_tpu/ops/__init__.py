from fluidx12_tpu.ops.sampling import (
    AddressMode,
    trilinear_sample,
    sample_at_cells,
    neighbor_shift,
)
