"""Convert a DDS radiance cube map into the bundled .npz probe format.

The reference ships `Bin/Assets/rnl_cross.dds` and its FluidGI preset loads
it directly (Bin/FluidGI.bat:1).  The TPU build's `--preset fluidgi` looks
for `assets/rnl_cross.npz` (engine/cli.py); this tool produces that file
from any DDS cube map (BC6H / f16 / f32 / RGBA8 via gi/dds.py), so the
preset works out of the box with no reference checkout present.

Usage:
    python tools/convert_probe.py [src.dds] [dst.npz]

Defaults: src = /root/reference/Bin/Assets/rnl_cross.dds,
          dst = <repo>/assets/rnl_cross.npz.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv):
    src = argv[1] if len(argv) > 1 else "/root/reference/Bin/Assets/rnl_cross.dds"
    dst = argv[2] if len(argv) > 2 else os.path.join(
        os.path.dirname(__file__), "..", "assets", "rnl_cross.npz")

    import numpy as np

    from fluidx12_tpu.gi.dds import load_dds_cubemap

    radiance = np.asarray(load_dds_cubemap(src))  # (6, H, W, 3) f32
    os.makedirs(os.path.dirname(os.path.abspath(dst)), exist_ok=True)
    # f16 storage: HDR radiance from a BC6H source is f16-exact by format.
    np.savez_compressed(dst, radiance=radiance.astype(np.float16))
    print(f"wrote {dst}: {radiance.shape} "
          f"(range {radiance.min():.3f}..{radiance.max():.3f})")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
