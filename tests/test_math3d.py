"""Unit tests for the row-vector LH math against hand-derived expectations."""

import numpy as np

from fluidx12_tpu.core import math3d as m3
from fluidx12_tpu.core.camera import OrbitCamera


def test_look_at_lh_maps_eye_to_origin_and_focus_to_plus_z():
    eye = [4.0, 16.0, -40.0]
    focus = [0.0, 0.0, 0.0]
    view = m3.look_at_lh(eye, focus, [0, 1, 0])
    assert np.allclose(m3.transform_point_h(np.array(eye, np.float32), view)[:3], 0, atol=1e-5)
    f = m3.transform_point_h(np.array(focus, np.float32), view)[:3]
    assert abs(f[0]) < 1e-4 and abs(f[1]) < 1e-4
    assert f[2] > 0  # LH: forward is +z
    np.testing.assert_allclose(f[2], np.linalg.norm(np.array(eye)), rtol=1e-5)


def test_perspective_lh_depth_range():
    proj = m3.perspective_fov_lh(np.pi / 4, 1.0, 1.0, 1000.0)
    near = m3.transform_point(np.array([0, 0, 1.0], np.float32), proj)
    far = m3.transform_point(np.array([0, 0, 1000.0], np.float32), proj)
    assert abs(near[2]) < 1e-6      # depth 0 at near plane
    assert abs(far[2] - 1.0) < 1e-6  # depth 1 at far plane


def test_world_view_proj_roundtrip():
    cam = OrbitCamera()
    world = m3.scaling(10.0)
    wvp = world @ cam.view_proj
    wvp_i = m3.inverse(wvp)
    p = np.array([0.3, -0.2, 0.7], np.float32)
    clip = m3.transform_point(p, wvp)
    back = m3.transform_point(clip, wvp_i)
    np.testing.assert_allclose(back, p, atol=1e-3)


def test_orbit_preserves_distance():
    cam = OrbitCamera()
    d0 = np.linalg.norm(cam.eye - cam.focus)
    cam.orbit(37.0, -12.0)
    d1 = np.linalg.norm(cam.eye - cam.focus)
    np.testing.assert_allclose(d0, d1, rtol=1e-4)


def test_dolly_moves_along_view_axis():
    cam = OrbitCamera()
    d0 = np.linalg.norm(cam.eye - cam.focus)
    cam.dolly(1.0)
    d1 = np.linalg.norm(cam.eye - cam.focus)
    assert d1 < d0


def test_rotation_matches_axis_rotations():
    # pitch-only rotation about x
    m = m3.rotation_roll_pitch_yaw(np.pi / 2, 0.0)
    v = m3.transform_vector(np.array([0, 1, 0], np.float32), m)
    np.testing.assert_allclose(v, [0, 0, 1], atol=1e-6)
    # yaw-only rotation about y
    m = m3.rotation_roll_pitch_yaw(0.0, np.pi / 2)
    v = m3.transform_vector(np.array([0, 0, 1], np.float32), m)
    np.testing.assert_allclose(v, [1, 0, 0], atol=1e-6)
