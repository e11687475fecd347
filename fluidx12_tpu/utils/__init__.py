from fluidx12_tpu.utils.png import write_png
from fluidx12_tpu.utils.image import to_srgb_u8, composite_premultiplied
