"""Pallas rasterizer parity vs the XLA rasterizer (interpret mode, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from gdrnpp_bop2022_tpu.ops.rasterizer import render_depth_xyz_batch
from gdrnpp_bop2022_tpu.ops.pallas_raster import render_depth_xyz_pallas


def _cubes(B, rs):
    verts = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1)
                      for z in (-1, 1)], np.float32) * 0.03
    faces = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int32)
    Q = np.stack([np.linalg.qr(rs.randn(3, 3))[0] for _ in range(B)])
    det = np.linalg.det(Q)
    Q[det < 0, :, 0] *= -1
    t = np.concatenate([rs.uniform(-0.02, 0.02, (B, 2)),
                        rs.uniform(0.4, 0.8, (B, 1))], 1)
    K = np.tile(np.array([[400.0, 0, 32], [0, 400.0, 32], [0, 0, 1]],
                         np.float32), (B, 1, 1))
    return (np.tile(verts[None], (B, 1, 1)), np.tile(faces[None], (B, 1, 1)),
            Q.astype(np.float32), t.astype(np.float32), K)


def test_pallas_raster_matches_xla():
    rs = np.random.RandomState(0)
    B, R = 3, 64
    verts, faces, Q, t, K = _cubes(B, rs)
    d_ref, x_ref = render_depth_xyz_batch(
        jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(Q),
        jnp.asarray(t), jnp.asarray(K), R, R)
    d_pl, x_pl = render_depth_xyz_pallas(
        jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(Q),
        jnp.asarray(t), jnp.asarray(K), R, R,
        tile_p=1024, tile_f=128, interpret=True)
    d_ref, d_pl = np.asarray(d_ref), np.asarray(d_pl)
    x_ref, x_pl = np.asarray(x_ref), np.asarray(x_pl)
    # identical silhouettes
    np.testing.assert_array_equal(d_pl > 0, d_ref > 0)
    # identical depths and attributes where hit
    hit = d_ref > 0
    np.testing.assert_allclose(d_pl[hit], d_ref[hit], atol=1e-5)
    np.testing.assert_allclose(x_pl[hit], x_ref[hit], atol=1e-4)


def test_pallas_raster_ragged_pixels_matches_xla():
    """P = H*W NOT a multiple of tile_p (T-LESS-like ragged shape) + a
    face count that needs tile_f padding: the kernel pads the tail pixel
    tile internally (in-kernel iota coords) and slices it off outside."""
    rs = np.random.RandomState(7)
    B = 2
    verts, faces, Q, t, K = _cubes(B, rs)
    H, W = 54, 72                                # 3888 px, % 1024 != 0
    K = np.tile(np.array([[450.0, 0, 36.0], [0, 450.0, 27.0], [0, 0, 1]],
                         np.float32), (B, 1, 1))
    d_ref, x_ref = render_depth_xyz_batch(
        jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(Q),
        jnp.asarray(t), jnp.asarray(K), H, W)
    d_pl, x_pl = render_depth_xyz_pallas(
        jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(Q),
        jnp.asarray(t), jnp.asarray(K), H, W,
        tile_p=1024, tile_f=128, interpret=True)
    d_ref, d_pl = np.asarray(d_ref), np.asarray(d_pl)
    x_ref, x_pl = np.asarray(x_ref), np.asarray(x_pl)
    np.testing.assert_array_equal(d_pl > 0, d_ref > 0)
    hit = d_ref > 0
    np.testing.assert_allclose(d_pl[hit], d_ref[hit], atol=1e-5)
    np.testing.assert_allclose(x_pl[hit], x_ref[hit], atol=1e-4)


def test_pallas_raster_depth_only_matches_full():
    """with_attrs=False (VSD / depth-refine fast path): depth equals the
    full kernel's bit-for-bit; the attrs slot is None."""
    rs = np.random.RandomState(11)
    B = 2
    verts, faces, Q, t, K = _cubes(B, rs)
    R = 64
    d_full, x_full = render_depth_xyz_pallas(
        jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(Q),
        jnp.asarray(t), jnp.asarray(K), R, R,
        tile_p=1024, tile_f=128, interpret=True)
    d_only, x_none = render_depth_xyz_pallas(
        jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(Q),
        jnp.asarray(t), jnp.asarray(K), R, R,
        tile_p=1024, tile_f=128, interpret=True, with_attrs=False)
    assert x_none is None
    np.testing.assert_array_equal(np.asarray(d_only), np.asarray(d_full))
