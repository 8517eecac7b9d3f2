"""Batched triangle rasterizer producing depth / object-space XYZ maps.

TPU-native replacement for the reference's EGL + CUDA-interop renderer
(reference: lib/egl_renderer/egl_renderer_v3.py:838 `render` with
pc_cam_tensor, used for online XYZ GT in engine_utils.py:131-172) and the
vispy depth renders used by depth refinement (gdrn_evaluator.py:521-561)
and vsd (lib/pysixd/renderer*). Instead of a GL context + per-sample python
loop, this rasterizes ALL ROIs in one compiled program:

  * verts are projected with each ROI's crop-K;
  * triangles are processed in fixed-size chunks via lax.scan, each chunk
    evaluating edge functions for every pixel (VPU-friendly (P, T) blocks)
    and min-reducing a z-buffer — static shapes, no data-dependent loops;
  * barycentrics are perspective-correct (1/z interpolation), attributes
    (object-space coords) are interpolated the same way;
  * meshes live in per-class padded banks; padding faces are degenerate
    (index 0,0,0) so they never win the depth test.

For 64x64 GT crops a few-thousand-triangle decimated mesh is
indistinguishable from the full-resolution model; mesh simplification
happens host-side at bank build time (see models3d.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_BIG = 1e9


def _project_verts(verts_cam: jax.Array, K: jax.Array):
    """verts_cam (V, 3) -> screen (u, v) and camera z. K (3, 3)."""
    z = verts_cam[:, 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = K[0, 0] * verts_cam[:, 0] / safe_z + K[0, 2] + K[0, 1] * verts_cam[:, 1] / safe_z
    v = K[1, 1] * verts_cam[:, 1] / safe_z + K[1, 2]
    return u, v, z


def rasterize_mesh(
    verts_cam: jax.Array,     # (V, 3) camera-space vertices
    attrs: jax.Array,         # (V, A) per-vertex attributes (e.g. object xyz)
    faces: jax.Array,         # (F, 3) int32 vertex indices (padded: 0,0,0)
    K: jax.Array,             # (3, 3) intrinsics (full-image or crop-K)
    height: int,
    width: int,
    chunk: int = 1024,
    pixel_chunk: int = 32768,
):
    """Z-buffer rasterization of one mesh.

    Returns (depth (H, W), attr_map (H, W, A)); depth==0 where no surface.

    pixel_chunk bounds the live (P, T) edge-function block: full-image
    rendering (vsd, depth refine) at e.g. 540x720 x 1024 faces x a vmapped
    pair batch would otherwise materialize tens of GB in one fusion
    (measured: a 25 GB allocation OOM'd the T-LESS full-vsd compile).
    Pixel blocks run under lax.map, so peak memory is
    O(batch * pixel_chunk * chunk) regardless of image size; small targets
    (the 64^2 training crops) stay single-block, single-scan.
    """
    u, v, z = _project_verts(verts_cam, K)
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)

    # pixel centers at integer coords (BOP/OpenCV convention: pixel (i, j)
    # samples at (j + .5? ) — the BOP toolkit renderer samples at integer
    # centers; we use x = j, y = i to match calc_xyz_bp/backprojection).
    px = jnp.arange(width, dtype=jnp.float32)[None, :]
    py = jnp.arange(height, dtype=jnp.float32)[:, None]
    px = jnp.broadcast_to(px, (height, width)).reshape(-1)   # (P,)
    py = jnp.broadcast_to(py, (height, width)).reshape(-1)   # (P,)

    F = faces.shape[0]
    pad = (-F) % chunk
    faces_p = jnp.pad(faces, ((0, pad), (0, 0)))             # padded with 0s
    n_chunks = faces_p.shape[0] // chunk
    faces_c = faces_p.reshape(n_chunks, chunk, 3)

    A = attrs.shape[-1]

    def run_block(pxb, pyb):
        """Face-chunk scan over one block of pixels (Pc,)."""
        init_zbuf = jnp.full(pxb.shape, _BIG, dtype=jnp.float32)
        init_attr = jnp.zeros(pxb.shape + (A,), dtype=jnp.float32)

        def body(carry, face_chunk):
            zbuf, attrbuf = carry
            i0, i1, i2 = face_chunk[:, 0], face_chunk[:, 1], face_chunk[:, 2]
            x0, y0 = u[i0], v[i0]
            x1, y1 = u[i1], v[i1]
            x2, y2 = u[i2], v[i2]

            # signed doubled area; degenerate (padding) triangles: area 0
            area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)    # (T,)
            valid_tri = (jnp.abs(area) > 1e-12) & (z[i0] > 1e-6) & (z[i1] > 1e-6) & (z[i2] > 1e-6)
            inv_area = jnp.where(valid_tri, 1.0 / jnp.where(jnp.abs(area) < 1e-12, 1.0, area), 0.0)

            # edge functions at every pixel of the block: (Pc, T)
            ex = pxb[:, None]
            ey = pyb[:, None]
            w0 = ((x1 - ex) * (y2 - ey) - (x2 - ex) * (y1 - ey)) * inv_area[None, :]
            w1 = ((x2 - ex) * (y0 - ey) - (x0 - ex) * (y2 - ey)) * inv_area[None, :]
            w2 = 1.0 - w0 - w1
            # small tolerance closes seams on shared triangle edges where
            # fp rounding leaves both barycentrics epsilon-negative
            eps = -1e-5
            inside = (w0 >= eps) & (w1 >= eps) & (w2 >= eps) & valid_tri[None, :]

            # perspective-correct depth: 1/z is linear in screen space
            izp = w0 * inv_z[i0][None, :] + w1 * inv_z[i1][None, :] + w2 * inv_z[i2][None, :]
            zp = 1.0 / jnp.maximum(izp, 1e-12)
            zp = jnp.where(inside & (zp > 1e-6), zp, _BIG)           # (Pc, T)

            best = jnp.argmin(zp, axis=1)                            # (Pc,)
            best_z = jnp.take_along_axis(zp, best[:, None], axis=1)[:, 0]

            closer = best_z < zbuf
            # gather the winning triangle's data per pixel
            bi0 = i0[best]; bi1 = i1[best]; bi2 = i2[best]
            bw0 = jnp.take_along_axis(w0, best[:, None], axis=1)[:, 0]
            bw1 = jnp.take_along_axis(w1, best[:, None], axis=1)[:, 0]
            bw2 = 1.0 - bw0 - bw1
            # perspective-correct attribute interp
            iz = bw0 * inv_z[bi0] + bw1 * inv_z[bi1] + bw2 * inv_z[bi2]
            attr_num = (bw0[:, None] * attrs[bi0] * inv_z[bi0][:, None]
                        + bw1[:, None] * attrs[bi1] * inv_z[bi1][:, None]
                        + bw2[:, None] * attrs[bi2] * inv_z[bi2][:, None])
            attr_p = attr_num / jnp.maximum(iz[:, None], 1e-12)

            zbuf = jnp.where(closer, best_z, zbuf)
            attrbuf = jnp.where(closer[:, None], attr_p, attrbuf)
            return (zbuf, attrbuf), None

        (zbuf, attrbuf), _ = jax.lax.scan(body, (init_zbuf, init_attr),
                                          faces_c)
        return zbuf, attrbuf

    P = height * width
    if P <= pixel_chunk:
        zbuf, attrbuf = run_block(px, py)
    else:
        pad_p = (-P) % pixel_chunk
        # padding pixels sit far outside every triangle -> never hit
        pxp = jnp.pad(px, (0, pad_p), constant_values=-1e6)
        pyp = jnp.pad(py, (0, pad_p), constant_values=-1e6)
        n_pb = (P + pad_p) // pixel_chunk
        zbuf, attrbuf = jax.lax.map(
            lambda blk: run_block(blk[0], blk[1]),
            (pxp.reshape(n_pb, pixel_chunk), pyp.reshape(n_pb, pixel_chunk)))
        zbuf = zbuf.reshape(-1)[:P]
        attrbuf = attrbuf.reshape(-1, A)[:P]

    hit = zbuf < _BIG * 0.5
    depth = jnp.where(hit, zbuf, 0.0).reshape(height, width)
    attr_map = jnp.where(hit[:, None], attrbuf, 0.0).reshape(height, width, A)
    return depth, attr_map


@partial(jax.jit, static_argnames=("height", "width", "chunk"))
def render_depth_xyz_batch(
    verts: jax.Array,     # (B, V, 3) object-space vertices (class-gathered)
    faces: jax.Array,     # (B, F, 3) int32
    rots: jax.Array,      # (B, 3, 3)
    transes: jax.Array,   # (B, 3)
    Ks: jax.Array,        # (B, 3, 3) crop intrinsics
    height: int,
    width: int,
    chunk: int = 1024,   # measured sweet spot on v5e (13 ms for 48x1024 faces)
):
    """Render depth + object-space XYZ maps for a batch of posed objects.

    The one-call replacement for the reference's per-sample python loop
    `for i in range(bs): ren.render(...); calc_xyz_bp_batch(...)`
    (engine_utils.py:131-186). Returns (depth (B,H,W), xyz (B,H,W,3)).
    """
    def one(v, f, R, t, K):
        v_cam = v @ R.T + t
        return rasterize_mesh(v_cam, v, f, K, height, width, chunk=chunk)

    return jax.vmap(one)(verts, faces, rots, transes, Ks)


def render_depth_xyz(verts, faces, rots, transes, Ks, height, width,
                     need_xyz=True):
    """Backend dispatcher: the Pallas kernel on TPU (measured faster,
    bit-exact — ops/pallas_raster.py), the XLA scan elsewhere (CPU tests,
    interpret-unfriendly shapes).

    The Pallas kernel tiles the flattened pixel array internally and pads
    the tail tile (pixel coords are rebuilt in-kernel from the flat index),
    so ANY image shape runs on it directly — the historical H*W % 1024
    width-padding dispatch is gone.

    need_xyz=False (VSD / depth-refine: depth is all they read) returns
    (depth, None) and runs the depth-only kernel — no attribute gathers,
    interpolation, or attr output traffic. On the XLA path the unused
    attrs are dead code the compiler already eliminates."""
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    if on_tpu:
        from .pallas_raster import render_depth_xyz_pallas
        return render_depth_xyz_pallas(verts, faces, rots, transes, Ks,
                                       height, width, with_attrs=need_xyz)
    return render_depth_xyz_batch(verts, faces, rots, transes, Ks,
                                  height, width)
