"""Checkpoint / resume of the simulation state AND the session around it.

The reference has no sim-state persistence (SURVEY.md section 5.4); with a
functional state pytree this is trivial, so it ships as a capability upgrade:
save/load the full FluidState (velocity, color, pressure) as an .npz archive.

`save_session`/`load_session` (VERDICT r4 item 8) additionally capture the
frame index (the deterministic per-frame seed), camera pose, render method,
pause state and a config fingerprint, so a restored engine CONTINUES the
session bit-identically instead of just reloading the fluid
(tests/test_engine.py::test_session_checkpoint_resumes_bit_identical).
State-only checkpoints load fine through load_session (the extras default).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from fluidx12_tpu.core.state import FluidState


def _to_numpy(x) -> np.ndarray:
    """bf16 (ml_dtypes) has no stable .npz round-trip; widen losslessly."""
    a = np.asarray(x)
    if a.dtype == jnp.bfloat16:
        return a.astype(np.float32)
    return a


def save_state(path: str, state: FluidState) -> None:
    np.savez_compressed(
        path,
        velocity=_to_numpy(state.velocity),
        color=_to_numpy(state.color),
        pressure=_to_numpy(state.pressure),
        store_dtype=np.str_(str(state.velocity.dtype)),
    )


def load_state(path: str, expected_zyx=None) -> FluidState:
    """Load a checkpoint; optionally validate the grid shape up front so a
    mismatched restore fails with a clear message instead of a jit shape error."""
    with np.load(path) as data:
        store = jnp.dtype(str(data["store_dtype"])) if "store_dtype" in data \
            else data["velocity"].dtype
        state = FluidState.from_parts(
            velocity=jnp.asarray(data["velocity"], dtype=store),
            color=jnp.asarray(data["color"], dtype=store),
            pressure=jnp.asarray(data["pressure"]),
        )
    if expected_zyx is not None and tuple(state.pressure.shape) != tuple(expected_zyx):
        raise ValueError(
            f"checkpoint grid {tuple(state.pressure.shape)} (Z, Y, X) does not "
            f"match configured grid {tuple(expected_zyx)}; pass a matching "
            f"--gridSize or a different --restore file"
        )
    return state


def _config_fingerprint(config) -> str:
    """The config fields a resumed session must agree on to continue the
    same trajectory (grid/dtype/solver schedule); rendering knobs like the
    viewport may differ without breaking the sim."""
    return "|".join(str(v) for v in (
        config.grid_size, str(config.sim_dtype), config.advect_substeps,
        config.num_pressure_iters, config.mg_pressure, config.mg_min_plane,
        config.fast_sim, config.dissipation, config.impulse_pos,
        config.impulse_radius,
    ))


def save_session(path: str, engine) -> None:
    """FluidState + frame index, camera pose, render method, pause flag and
    config fingerprint: everything needed to resume the SESSION, not just
    the fluid."""
    state = engine.state
    np.savez_compressed(
        path,
        velocity=_to_numpy(state.velocity),
        color=_to_numpy(state.color),
        pressure=_to_numpy(state.pressure),
        store_dtype=np.str_(str(state.velocity.dtype)),
        frame_index=np.int64(engine.frame_index),
        camera_view=np.asarray(engine.camera.view, np.float64),
        camera_eye=np.asarray(engine.camera.eye, np.float64),
        render_method=np.int32(int(engine.render_method.value)),
        is_paused=np.bool_(engine.is_paused),
        config_fp=np.str_(_config_fingerprint(engine.config)),
    )


def load_session(path: str, engine) -> None:
    """Restore a session checkpoint into `engine` (in place).  State-only
    archives (save_state) restore the fluid and leave the session fields at
    their current values.  A config-fingerprint mismatch raises up front
    with both fingerprints in the message."""
    from fluidx12_tpu.core.config import RenderMethod
    from fluidx12_tpu.core.padding import storage_zyx

    engine.state = load_state(path, expected_zyx=storage_zyx(engine.config))
    with np.load(path) as data:
        if "config_fp" in data:
            fp_saved = str(data["config_fp"])
            fp_here = _config_fingerprint(engine.config)
            if fp_saved != fp_here:
                raise ValueError(
                    "checkpoint config fingerprint does not match this "
                    f"session:\n  saved: {fp_saved}\n  here:  {fp_here}\n"
                    "pass the matching sim flags (grid/dtype/solver) or a "
                    "different --restore file")
        if "frame_index" in data:
            engine.frame_index = int(data["frame_index"])
        if "camera_view" in data:
            # Restore in the camera's own dtype (float32): the f64 archive
            # round-trip is lossless, but leaving f64 matrices in place
            # shifts the host matrix math by an ulp and breaks bit-identical
            # resume.
            vdt = engine.camera.view.dtype
            engine.camera.view = np.asarray(data["camera_view"], vdt)
            engine.camera.eye = np.asarray(data["camera_eye"], vdt)
        if "render_method" in data:
            engine.render_method = RenderMethod(int(data["render_method"]))
        if "is_paused" in data:
            engine.is_paused = bool(data["is_paused"])
