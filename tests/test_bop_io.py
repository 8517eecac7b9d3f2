"""BOP IO tests: synthetic PLY round-trip, results CSV round-trip,
model bank construction from a synthetic BOP models dir."""

import json
import os
import struct

import numpy as np
import pytest

from gdrnpp_bop2022_tpu.bop import (
    load_ply, save_bop_results, load_bop_results, ModelBank, decimate_mesh)
from gdrnpp_bop2022_tpu.bop.inout import save_json, load_scene_gt, load_scene_camera


def _write_ascii_ply(path, pts, faces):
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(pts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for p in pts:
            f.write(f"{p[0]} {p[1]} {p[2]}\n")
        for face in faces:
            f.write(f"3 {face[0]} {face[1]} {face[2]}\n")


def _write_binary_ply(path, pts, faces):
    with open(path, "wb") as f:
        hdr = ("ply\nformat binary_little_endian 1.0\n"
               f"element vertex {len(pts)}\n"
               "property float x\nproperty float y\nproperty float z\n"
               f"element face {len(faces)}\n"
               "property list uchar int vertex_indices\nend_header\n")
        f.write(hdr.encode())
        for p in pts:
            f.write(struct.pack("<fff", *p))
        for face in faces:
            f.write(struct.pack("<Biii", 3, *face))


def _cube(scale=10.0):
    pts = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)],
                   np.float64) * scale
    faces = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int64)
    return pts, faces


def test_ply_ascii_binary_roundtrip(tmp_path):
    pts, faces = _cube()
    pa = tmp_path / "a.ply"
    pb = tmp_path / "b.ply"
    _write_ascii_ply(pa, pts, faces)
    _write_binary_ply(pb, pts, faces)
    for p in (pa, pb):
        m = load_ply(str(p))
        np.testing.assert_allclose(m["pts"], pts, atol=1e-5)
        np.testing.assert_array_equal(m["faces"], faces)
    m = load_ply(str(pb), vertex_scale=0.001)
    np.testing.assert_allclose(m["pts"], pts * 0.001, atol=1e-8)


def test_bop_results_roundtrip(tmp_path):
    rs = np.random.RandomState(0)
    res = [{"scene_id": 1, "im_id": 2, "obj_id": 3, "score": 0.9,
            "R": np.linalg.qr(rs.randn(3, 3))[0], "t": rs.randn(3) * 100,
            "time": 0.05}]
    path = str(tmp_path / "res.csv")
    save_bop_results(path, res)
    loaded = load_bop_results(path)
    assert loaded[0]["scene_id"] == 1 and loaded[0]["obj_id"] == 3
    np.testing.assert_allclose(loaded[0]["R"], res[0]["R"], atol=1e-6)
    np.testing.assert_allclose(loaded[0]["t"], res[0]["t"], atol=1e-6)


def test_scene_json_loaders(tmp_path):
    gt = {"0": [{"obj_id": 5, "cam_R_m2c": list(np.eye(3).ravel()),
                 "cam_t_m2c": [0, 0, 500]}]}
    cam = {"0": {"cam_K": [572.4, 0, 325.3, 0, 573.6, 242.0, 0, 0, 1],
                 "depth_scale": 0.1}}
    save_json(tmp_path / "scene_gt.json", gt)
    save_json(tmp_path / "scene_camera.json", cam)
    g = load_scene_gt(str(tmp_path / "scene_gt.json"))
    c = load_scene_camera(str(tmp_path / "scene_camera.json"))
    assert g[0][0]["obj_id"] == 5
    assert g[0][0]["cam_R_m2c"].shape == (3, 3)
    assert c[0]["cam_K"][0, 0] == 572.4


def test_decimate_preserves_bbox():
    rs = np.random.RandomState(1)
    # dense sphere mesh
    n = 2000
    pts = rs.randn(n, 3)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    from scipy.spatial import ConvexHull
    hull = ConvexHull(pts)
    faces = hull.simplices.astype(np.int64)
    dp, df = decimate_mesh(pts, faces, target_faces=500)
    assert len(df) <= 1000  # substantially decimated (allows tolerance)
    assert np.abs(dp).max() <= 1.001
    assert np.abs(dp.min(0) + 1).max() < 0.3  # bbox roughly preserved


def test_model_bank_from_synthetic_dir(tmp_path):
    models_dir = tmp_path / "models"
    os.makedirs(models_dir)
    pts, faces = _cube(scale=30.0)  # mm
    for oid in (1, 2):
        _write_binary_ply(models_dir / f"obj_{oid:06d}.ply", pts, faces)
    info = {
        "1": {"diameter": 103.92, "min_x": -30, "min_y": -30, "min_z": -30,
              "size_x": 60, "size_y": 60, "size_z": 60},
        "2": {"diameter": 103.92, "min_x": -30, "min_y": -30, "min_z": -30,
              "size_x": 60, "size_y": 60, "size_z": 60,
              "symmetries_discrete": [list(np.eye(4).ravel())]},
    }
    save_json(models_dir / "models_info.json", info)
    bank = ModelBank.from_bop_models_dir(str(models_dir), num_points=256, num_fps=8)
    assert bank.verts.shape[0] == 2
    np.testing.assert_allclose(bank.extents[0], [0.06, 0.06, 0.06], atol=1e-6)
    np.testing.assert_allclose(bank.diameters[0], 0.10392, atol=1e-5)
    assert bank.points.shape == (2, 256, 3)
    assert np.abs(bank.points).max() <= 0.0301
    assert bank.fps_points.shape == (2, 8, 3)
    assert bank.sym_rotations[0] is None
    assert bank.sym_rotations[1] is not None
    sb, sm = bank.sym_bank()
    assert sb.shape[0] == 2
