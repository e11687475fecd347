from fluidx12_tpu.gi.sh import (
    sh_eval_basis,
    project_cubemap_sh,
    evaluate_sh_irradiance,
)
from fluidx12_tpu.gi.dds import load_dds_cubemap
