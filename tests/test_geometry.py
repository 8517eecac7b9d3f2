import numpy as np
import jax
import jax.numpy as jnp

from gdrnpp_bop2022_tpu.geometry import camera as C
from gdrnpp_bop2022_tpu.geometry import se3
from gdrnpp_bop2022_tpu.geometry import rotations as R
from gdrnpp_bop2022_tpu.geometry import symmetry as S


def _default_K(b=1):
    K = np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]], np.float32)
    return jnp.asarray(np.tile(K, (b, 1, 1)))


def test_crop_K_maps_center():
    K = _default_K(2)
    boxes = jnp.array([[100.0, 50.0, 200.0, 150.0], [0.0, 0.0, 640.0, 480.0]])
    Kc = C.get_K_crop_resize(K, boxes, (64, 64))
    # a point at the crop center should project to the crop-K center
    assert Kc.shape == (2, 3, 3)
    np.testing.assert_allclose(float(Kc[1, 0, 0]), 572.4 * 64 / 640, rtol=1e-5)


def test_backproject_project_roundtrip():
    K = _default_K(1)
    depth = jnp.ones((1, 8, 8)) * 2.0
    pts = C.backproject_depth(depth, K)
    # re-project (numpy reference math — env default matmul precision is bf16)
    uvw = np.einsum("bij,bhwj->bhwi", np.asarray(K), np.asarray(pts))
    uv = uvw[..., :2] / uvw[..., 2:3]
    us = np.arange(8, dtype=np.float32)
    np.testing.assert_allclose(np.asarray(uv[0, 0, :, 0]), us, atol=1e-4)
    np.testing.assert_allclose(np.asarray(uv[0, :, 0, 1]), us, atol=1e-4)


def test_calc_xyz_from_depth_recovers_object_frame():
    # place a fronto-parallel plane at depth z, with known pose
    K = _default_K(1)
    rot = R.random_rotations(jax.random.PRNGKey(0), 1)
    t = jnp.array([[0.02, -0.01, 0.7]])
    depth = jnp.full((1, 16, 16), 0.7)
    xyz = C.calc_xyz_from_depth(depth, K, rot, t)
    # check inverse: transform object coords back to camera frame
    cam = np.einsum("bij,bhwj->bhwi", np.asarray(rot), np.asarray(xyz)) + np.asarray(t)[:, None, None, :]
    np.testing.assert_allclose(np.asarray(cam[..., 2]), 0.7, atol=1e-5)
    # zero depth -> zero xyz
    xyz0 = C.calc_xyz_from_depth(jnp.zeros((1, 4, 4)), K, rot, t)
    np.testing.assert_allclose(np.asarray(xyz0), 0.0)


def test_site_decode_consistency():
    """SITE decode must invert the GT encoding (trans -> rel centroid/z)."""
    B = 16
    K = _default_K(B)
    key = jax.random.PRNGKey(1)
    rot_ego = R.random_rotations(key, B)
    t = np.random.RandomState(0).uniform(-0.2, 0.2, (B, 3)).astype(np.float32)
    t[:, 2] = np.random.RandomState(1).uniform(0.5, 1.5, B)
    t = jnp.asarray(t)

    # project centroid, build fake bboxes around it
    uvw = jnp.asarray(np.einsum("bij,bj->bi", np.asarray(K), np.asarray(t)))
    centroid_px = uvw[:, :2] / uvw[:, 2:3]
    wh = jnp.full((B, 2), 80.0)
    centers = centroid_px + jnp.asarray(np.random.RandomState(2).uniform(-10, 10, (B, 2)).astype(np.float32))
    out_res = 64
    scale = jnp.full((B,), 120.0)
    resize_ratios = out_res / scale

    # GT encoding (reference data_loader.py:614-644): rel offset + rel z
    centroid_rel = (centroid_px - centers) / wh
    z_rel = t[:, 2] / resize_ratios

    rot_allo = R.ego_to_allo_mat(t, rot_ego)
    r_dec, t_dec = se3.pose_from_centroid_z_rel(
        rot_allo, centroid_rel, z_rel, K, centers, resize_ratios, wh)
    np.testing.assert_allclose(np.asarray(t_dec), np.asarray(t), atol=1e-4)
    np.testing.assert_allclose(np.asarray(r_dec), np.asarray(rot_ego), atol=1e-4)


def test_symmetry_enumeration_continuous():
    info = {"symmetries_continuous": [{"axis": [0, 0, 1], "offset": [0, 0, 0]}]}
    trans = S.get_symmetry_transformations(info, max_sym_disc_step=0.5)
    # ceil(pi/0.5) = 7 steps -> 6 non-identity rotations (BOP toolkit drops
    # the bare identity when continuous symmetries are present)
    assert len(trans) == 6
    for tr in trans:
        np.testing.assert_allclose(tr["R"][2, 2], 1.0, atol=1e-9)


def test_closest_rot_batch_picks_symmetric_gt():
    # 180-deg z symmetry: predict gt flipped by the sym -> closest must be flip
    sym180 = np.diag([-1.0, -1.0, 1.0]).astype(np.float32)
    bank, mask = S.build_sym_bank([None, [np.eye(3, dtype=np.float32), sym180]])
    gt = R.random_rotations(jax.random.PRNGKey(3), 4)
    pred = gt @ jnp.asarray(sym180)[None]
    labels = jnp.array([1, 1, 0, 0])
    closest = S.get_closest_rot_batch(pred, gt, bank, mask, labels)
    # symmetric class: closest == pred (exactly the flipped gt)
    np.testing.assert_allclose(np.asarray(closest[:2]), np.asarray(pred[:2]), atol=1e-5)
    # non-symmetric class: closest == gt
    np.testing.assert_allclose(np.asarray(closest[2:]), np.asarray(gt[2:]), atol=1e-5)


def test_transform_pts():
    pts = jnp.asarray(np.random.RandomState(0).randn(2, 10, 3).astype(np.float32))
    rot = R.random_rotations(jax.random.PRNGKey(4), 2)
    t = jnp.asarray(np.random.RandomState(1).randn(2, 3).astype(np.float32))
    out = se3.transform_pts(pts, rot, t)
    ref = np.einsum("bij,bnj->bni", np.asarray(rot), np.asarray(pts)) + np.asarray(t)[:, None]
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
