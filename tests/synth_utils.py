"""Shared synthetic BOP dataset builder for integration tests."""

import os
import struct

import numpy as np
import cv2
import jax.numpy as jnp

from gdrnpp_bop2022_tpu.bop.inout import save_json
from gdrnpp_bop2022_tpu.bop.models3d import ModelBank
from gdrnpp_bop2022_tpu.datasets.meta import DatasetMeta
from gdrnpp_bop2022_tpu.ops.rasterizer import render_depth_xyz_batch

W, H = 160, 120
K = np.array([[120.0, 0, 80.0], [0, 120.0, 60.0], [0, 0, 1]], np.float32)


def cube_ply(path, half_mm=30.0):
    pts = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)],
                   np.float64) * half_mm
    faces = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int64)
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


def build_synth_bop(root, split="test", n_images=3, seed=0, scene_id=1):
    """Create a synthetic BOP dataset dir with 2 cube objects; returns dict
    with bank/meta/gt_rows/det_file paths."""
    root = str(root)
    models_dir = os.path.join(root, "models")
    if not os.path.isdir(models_dir):
        os.makedirs(models_dir)
        for oid, half in ((1, 30.0), (2, 20.0)):
            cube_ply(os.path.join(models_dir, f"obj_{oid:06d}.ply"), half)
        info = {}
        for oid, half in ((1, 30.0), (2, 20.0)):
            d = 2 * half * np.sqrt(3)
            info[str(oid)] = {"diameter": d, "min_x": -half, "min_y": -half,
                              "min_z": -half, "size_x": 2 * half,
                              "size_y": 2 * half, "size_z": 2 * half}
        save_json(os.path.join(models_dir, "models_info.json"), info)

    bank = ModelBank.from_bop_models_dir(models_dir, num_points=128, num_fps=8)
    meta = DatasetMeta(name="synth", id2obj={1: "cube", 2: "small_cube"},
                       width=W, height=H, camera_matrix=K)

    rs = np.random.RandomState(seed)
    sdir = os.path.join(root, split, f"{scene_id:06d}")
    for sub in ("rgb", "depth", "mask_visib", "mask"):
        os.makedirs(os.path.join(sdir, sub), exist_ok=True)
    scene_gt, scene_cam, scene_info = {}, {}, {}
    dets = {}
    gt_rows = []
    for im_id in range(n_images):
        gts, infos, im_dets = [], [], []
        depth_acc = np.zeros((H, W), np.float32)
        for inst, (oid, label) in enumerate([(1, 0), (2, 1)]):
            ang = rs.uniform(0, 2 * np.pi)
            c, s = np.cos(ang), np.sin(ang)
            R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32) @ \
                np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float32)
            t = np.array([(-0.06 if inst == 0 else 0.06) + rs.uniform(-0.01, 0.01),
                          rs.uniform(-0.02, 0.02), 0.5 + 0.1 * inst], np.float32)
            depth, _ = render_depth_xyz_batch(
                jnp.asarray(bank.verts[label])[None],
                jnp.asarray(bank.faces[label])[None],
                jnp.asarray(R)[None], jnp.asarray(t)[None],
                jnp.asarray(K)[None], H, W)
            depth = np.asarray(depth[0])
            mask = (depth > 0).astype(np.uint8) * 255
            ys, xs = np.nonzero(mask)
            bbox = [int(xs.min()), int(ys.min()),
                    int(xs.max() - xs.min() + 1), int(ys.max() - ys.min() + 1)]
            cv2.imwrite(os.path.join(sdir, "mask_visib", f"{im_id:06d}_{inst:06d}.png"), mask)
            cv2.imwrite(os.path.join(sdir, "mask", f"{im_id:06d}_{inst:06d}.png"), mask)
            gts.append({"obj_id": oid, "cam_R_m2c": R.ravel().tolist(),
                        "cam_t_m2c": (t * 1000).tolist()})
            infos.append({"bbox_obj": bbox, "bbox_visib": bbox,
                          "visib_fract": 1.0, "px_count_visib": int(len(xs))})
            im_dets.append({"obj_id": oid, "bbox_est": bbox, "score": 0.9,
                            "time": 0.01})
            gt_rows.append({"scene_id": scene_id, "im_id": im_id, "obj_id": oid,
                            "R": R, "t": t, "visib_fract": 1.0, "K": K})
            depth_acc = np.where((depth > 0) & ((depth_acc == 0) | (depth < depth_acc)),
                                 depth, depth_acc)
        rgb = (255 * (depth_acc > 0) * (1.0 - depth_acc / 2.0)).astype(np.uint8)
        cv2.imwrite(os.path.join(sdir, "rgb", f"{im_id:06d}.png"),
                    np.stack([rgb] * 3, -1))
        cv2.imwrite(os.path.join(sdir, "depth", f"{im_id:06d}.png"),
                    (depth_acc * 10000).astype(np.uint16))
        scene_gt[str(im_id)] = gts
        scene_cam[str(im_id)] = {"cam_K": K.ravel().tolist(), "depth_scale": 0.1}
        scene_info[str(im_id)] = infos
        dets[f"{scene_id}/{im_id}"] = im_dets
    save_json(os.path.join(sdir, "scene_gt.json"), scene_gt)
    save_json(os.path.join(sdir, "scene_camera.json"), scene_cam)
    save_json(os.path.join(sdir, "scene_gt_info.json"), scene_info)
    det_file = os.path.join(root, f"{split}_dets.json")
    save_json(det_file, dets)
    return {"root": root, "bank": bank, "meta": meta, "gt_rows": gt_rows,
            "det_file": det_file, "split_dir": os.path.join(root, split)}
