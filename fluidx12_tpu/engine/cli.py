"""Command-line interface mirroring the reference's flags and presets.

Reference CLI (ParseCommandLineArgs, FluidX12.cpp:398-433):
    -gridSize x y z, -maxRaySamples n, -maxLightSamples n, -radiance file,
    -warp (software device), -uma
Launch presets (Bin/Fluid2D.bat, Bin/FluidGI.bat) are exposed as --preset.

Run:  python -m fluidx12_tpu.engine.cli --frames 120 --screenshot out.png
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="fluidx12-tpu", description=__doc__)
    p.add_argument("--preset", choices=["fluid3d", "fluid2d", "fluidgi"], default="fluid3d")
    p.add_argument("--gridSize", nargs=3, type=int, metavar=("X", "Y", "Z"), default=None)
    p.add_argument("--maxRaySamples", type=int, default=None)
    p.add_argument("--maxLightSamples", type=int, default=None)
    p.add_argument("--radiance", type=str, default=None, help="DDS cube-map light probe")
    p.add_argument("--viewport", nargs=2, type=int, metavar=("W", "H"), default=None)
    p.add_argument("--method", type=int, default=1,
                   help="render method 0..3 (ref hotkeys Left/Right)")
    p.add_argument("--frames", type=int, default=120)
    p.add_argument("--batch", type=int, default=1, metavar="K",
                   help="frames per device dispatch (lax.scan throughput "
                        "mode for headless runs; ignored with --interactive)")
    p.add_argument("--screenshot", type=str, default=None,
                   help="PNG path; {frame} is substituted (ref hotkey F11)")
    p.add_argument("--screenshot-every", type=int, default=None)
    p.add_argument("--checkpoint", type=str, default=None, help="save final state (.npz)")
    p.add_argument("--restore", type=str, default=None, help="load initial state (.npz)")
    p.add_argument("--paused", action="store_true", help="start paused (ref: Space)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the reference's -warp analog)")
    p.add_argument("--no-fps", action="store_true", help="hide FPS readout (ref: F1)")
    p.add_argument("--interactive", action="store_true",
                   help="live hotkeys on a TTY: Space pause, f FPS, arrows "
                        "method, s screenshot, x fast/faithful stack, "
                        "a/d/w/z orbit + +/- dolly (camera), q quit "
                        "(ref OnKeyUp + mouse camera, FluidX12.cpp:311-396)")
    p.add_argument("--profile", type=str, default=None,
                   help="write a jax.profiler trace to this directory")
    p.add_argument("--profile-passes", action="store_true",
                   help="print per-pass timings after the run")
    p.add_argument("--watchdog", type=int, default=0, metavar="N",
                   help="check/recover sim state every N frames")
    p.add_argument("--metrics", type=str, default=None,
                   help="append JSON-lines frame metrics to this file")
    p.add_argument("--preview", type=int, nargs="?", const=1, default=0,
                   metavar="N",
                   help="draw every Nth frame to the terminal as ANSI "
                        "half-block art (the present analog of the "
                        "reference's window, Win32Application.cpp:205-211; "
                        "also the p hotkey with --interactive)")
    return p


def config_from_args(args) -> "FluidConfig":
    from fluidx12_tpu.core.config import PRESETS

    cfg = PRESETS[args.preset]
    updates = {}
    if args.gridSize:
        updates["grid_size"] = tuple(args.gridSize)
    if args.maxRaySamples:
        updates["max_ray_samples"] = args.maxRaySamples
    if args.maxLightSamples:
        updates["max_light_samples"] = args.maxLightSamples
    if args.viewport:
        updates["viewport"] = tuple(args.viewport)
    if args.radiance:
        updates["has_light_probe"] = True
    return dataclasses.replace(cfg, **updates)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    from fluidx12_tpu.core.config import RenderMethod
    from fluidx12_tpu.engine.checkpoint import load_session, save_session
    from fluidx12_tpu.engine.fluidx import FluidXEngine
    from fluidx12_tpu.engine.frame_loop import FrameLoop

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.jaxcache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    print(f"[fluidx12-tpu] backend: {jax.default_backend()}, "
          f"devices: {jax.device_count()}", file=sys.stderr)

    cfg = config_from_args(args)
    radiance = None
    if args.radiance:
        from fluidx12_tpu.gi.dds import load_dds_cubemap

        radiance = load_dds_cubemap(args.radiance)
    elif cfg.has_light_probe:
        default = os.path.join(os.path.dirname(__file__), "..", "..", "assets", "rnl_cross.npz")
        if os.path.exists(default):
            radiance = np.load(default)["radiance"]

    engine = FluidXEngine(cfg, radiance=radiance)
    engine.render_method = RenderMethod(args.method)
    engine.is_paused = args.paused
    if args.restore:
        # Session checkpoint: fluid + frame index, camera, method, pause
        # (engine/checkpoint.py).  Explicit --method/--paused flags below
        # would be overwritten, so restore first and reapply CLI overrides.
        load_session(args.restore, engine)
        if args.method != build_parser().get_default("method"):
            engine.render_method = RenderMethod(args.method)
        if args.paused:
            engine.is_paused = True

    loop = FrameLoop(engine, show_fps=not args.no_fps,
                     watchdog_every=args.watchdog, metrics_path=args.metrics,
                     preview_every=args.preview)

    if args.profile:
        import jax

        with jax.profiler.trace(args.profile):
            loop.run(args.frames, args.screenshot, args.screenshot_every,
                     interactive=args.interactive, batch=args.batch)
    else:
        loop.run(args.frames, args.screenshot, args.screenshot_every,
                 interactive=args.interactive, batch=args.batch)

    if args.checkpoint:
        save_session(args.checkpoint, engine)

    if args.profile_passes:
        from fluidx12_tpu.engine.profiler import profile_passes

        for name, ms in profile_passes(engine).items():
            print(f"[profile] {name:12s} {ms:8.2f} ms", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
