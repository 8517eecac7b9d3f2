"""SE(3) helpers: point transforms and SITE pose decoding.

The SITE (Scale-Invariant Translation Estimation) decode turns the network's
relative centroid offset + relative depth into an absolute translation, and
the allocentric rotation into egocentric, exactly mirroring the reference's
semantics (core/gdrn_modeling/models/pose_from_pred_centroid_z.py:157-243)
while being one fused batched jit-able function.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .rotations import allo_to_ego_mat


def transform_pts(pts: jax.Array, R: jax.Array, t: jax.Array | None = None) -> jax.Array:
    """Apply rigid transform to point sets. pts (B, N, 3), R (B, 3, 3), t (B, 3)."""
    out = jnp.einsum("bij,bnj->bni", R, pts, precision=jax.lax.Precision.HIGHEST)
    if t is not None:
        out = out + t[:, None, :]
    return out


def pose_from_centroid_z_rel(
    rot_allo: jax.Array,
    centroid_rel: jax.Array,
    z_rel: jax.Array,
    roi_cams: jax.Array,
    roi_centers: jax.Array,
    resize_ratios: jax.Array,
    roi_whs: jax.Array,
    eps: float = 1e-4,
    is_allo: bool = True,
    z_type: str = "REL",
):
    """SITE decode: (allo rot6d-mat, rel centroid, rel z) -> (R_ego, t).

    Args:
      rot_allo: (B, 3, 3) allocentric rotation (from rot6d).
      centroid_rel: (B, 2) predicted centroid offset relative to the bbox,
        in units of bbox width/height.
      z_rel: (B,) or (B, 1) predicted depth (relative if z_type=="REL").
      roi_cams: (B, 3, 3) absolute camera intrinsics.
      roi_centers: (B, 2) bbox centers in pixels.
      resize_ratios: (B,) out_res / scale — multiplies the relative z.
      roi_whs: (B, 2) bbox (w, h) in pixels.
    Returns:
      (R_ego (B,3,3), t (B,3))
    """
    z_rel = z_rel.reshape(-1)
    cx = centroid_rel[:, 0] * roi_whs[:, 0] + roi_centers[:, 0]
    cy = centroid_rel[:, 1] * roi_whs[:, 1] + roi_centers[:, 1]
    if z_type == "REL":
        z = z_rel * resize_ratios
    elif z_type == "ABS":
        z = z_rel
    else:
        raise ValueError(f"Unknown z_type: {z_type}")
    # pinhole backprojection of the regressed centroid at depth z
    tx = z * (cx - roi_cams[:, 0, 2]) / roi_cams[:, 0, 0]
    ty = z * (cy - roi_cams[:, 1, 2]) / roi_cams[:, 1, 1]
    trans = jnp.stack([tx, ty, z], axis=-1)
    rot_ego = allo_to_ego_mat(trans, rot_allo, eps=eps) if is_allo else rot_allo
    return rot_ego, trans


def pose_from_centroid_z_abs(rot_allo, centroid_abs, z_abs, roi_cams, eps=1e-4, is_allo=True):
    """SITE decode with absolute 2D centroid and absolute z
    (reference: pose_from_pred_centroid_z_abs.py)."""
    z = z_abs.reshape(-1)
    tx = z * (centroid_abs[:, 0] - roi_cams[:, 0, 2]) / roi_cams[:, 0, 0]
    ty = z * (centroid_abs[:, 1] - roi_cams[:, 1, 2]) / roi_cams[:, 1, 1]
    trans = jnp.stack([tx, ty, z], axis=-1)
    rot_ego = allo_to_ego_mat(trans, rot_allo, eps=eps) if is_allo else rot_allo
    return rot_ego, trans


def pose_from_trans(rot_allo, trans, eps=1e-4, is_allo=True):
    """Direct-translation decode (reference: pose_from_pred.py)."""
    rot_ego = allo_to_ego_mat(trans, rot_allo, eps=eps) if is_allo else rot_allo
    return rot_ego, trans
