"""GDRN training losses — pure, batched, jit-able.

Reference semantics: core/gdrn_modeling/models/GDRN_double_mask.py:287-535
(gdrn_loss), core/gdrn_modeling/losses/{pm_loss,mask_losses,
coor_cross_entropy,rot_loss}.py. All reductions follow the reference
(sum-over-masked / mask-count for dense heads, mean for pose heads).

Layout note: dense tensors are NHWC ((B, H, W, C)); masks are (B, H, W).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..geometry.se3 import transform_pts
from ..geometry.symmetry import get_closest_rot_batch


def masked_xyz_l1_loss(pred: jax.Array, gt: jax.Array, mask: jax.Array) -> jax.Array:
    """L1 over mask, normalized by mask count (reference L1 xyz loss).
    pred/gt: (B, H, W, C); mask: (B, H, W)."""
    m = mask[..., None]
    num = jnp.sum(jnp.abs(pred * m - gt * m))
    return num / jnp.maximum(jnp.sum(mask), 1.0)


def _masked_sum_ce(logits, targets, mask):
    """The reference's masked-CE formulation (GDRN_double_mask.py:341-349,
    :404-409): CE(logits * mask, targets * mask, reduction="sum") / n_mask.
    Zeroing the LOGITS makes every masked-out pixel contribute a constant
    -log_softmax(0)[0] = log(C) with zero gradient (d logits/d params = 0
    there); we add that constant in closed form so loss VALUES match the
    reference's training logs exactly, not just the gradients."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(
        logp, targets[..., None].astype(jnp.int32), axis=-1)[..., 0]
    n_mask = jnp.sum(mask)
    n_out = mask.size - n_mask
    const = n_out * jnp.log(jnp.float32(logits.shape[-1]))
    return (jnp.sum(nll * mask) + const) / jnp.maximum(n_mask, 1.0)


def xyz_ce_loss(logits: jax.Array, gt_bins: jax.Array, mask: jax.Array) -> jax.Array:
    """Cross-entropy heatmap loss for binned coordinates
    (reference: losses/coor_cross_entropy.py via GDRN_double_mask.py:341).
    logits: (B, H, W, bins+1), gt_bins: (B, H, W) int, mask: (B, H, W)."""
    return _masked_sum_ce(logits, gt_bins, mask)


def _soft_dice(probs: jax.Array, gt: jax.Array, eps: float = 0.002) -> jax.Array:
    # per-sample dice over flattened spatial dims (reference
    # mask_losses.py:442-461 soft_dice_loss, smooth=0: plain sums in the
    # denominator — NOT the squared-sum SOLO variant — and eps only in the
    # denominator; value-verified against the reference module in
    # tests/test_reference_model_oracle.py)
    p = probs.reshape(probs.shape[0], -1)
    g = gt.reshape(gt.shape[0], -1)
    inter = jnp.sum(p * g, axis=1)
    denom = jnp.sum(p, axis=1) + jnp.sum(g, axis=1)
    return jnp.mean(1.0 - 2.0 * inter / (denom + eps))


def mask_loss(pred_logits: jax.Array, gt: jax.Array, loss_type: str = "L1") -> jax.Array:
    """Mask loss over a single-channel prediction.
    pred_logits: (B, H, W) raw output; gt: (B, H, W) in [0, 1]."""
    if loss_type == "L1":
        return jnp.mean(jnp.abs(pred_logits - gt))
    if loss_type == "BCE":
        return jnp.mean(
            jnp.maximum(pred_logits, 0) - pred_logits * gt
            + jnp.log1p(jnp.exp(-jnp.abs(pred_logits))))
    if loss_type == "dice":
        return _soft_dice(jax.nn.sigmoid(pred_logits), gt)
    if loss_type == "RW_BCE":
        # weighted_ex_loss_probs (reference mask_losses.py:63-106): split
        # pixels into pos (gt>0) / neg (gt==0) across the WHOLE batch,
        # pos term weighted by the (soft) target value, each side
        # normalized by its own GLOBAL count, then summed (no /2);
        # value-verified against the reference module in
        # tests/test_reference_model_oracle.py
        probs = jnp.clip(jax.nn.sigmoid(pred_logits), 1e-7, 1 - 1e-7)
        pos = (gt > 0).astype(probs.dtype)
        neg = 1.0 - pos
        pos_loss = jnp.sum(-gt * jnp.log(probs) * pos)
        neg_loss = jnp.sum(-jnp.log(1.0 - probs) * neg)
        n_pos = jnp.sum(pos)
        n_neg = jnp.sum(neg)
        return (jnp.where(n_pos > 0, pos_loss / jnp.maximum(n_pos, 1.0), 0.0)
                + jnp.where(n_neg > 0, neg_loss / jnp.maximum(n_neg, 1.0),
                            0.0))
    raise ValueError(f"unknown mask loss type: {loss_type}")


def region_ce_loss(logits: jax.Array, gt_region: jax.Array, mask: jax.Array) -> jax.Array:
    """Region classification CE, masked + count-normalized
    (reference: GDRN_double_mask.py:404-409).
    logits: (B, H, W, R+1), gt_region: (B, H, W) int in [0, R], mask (B, H, W)."""
    return _masked_sum_ce(logits, gt_region, mask)


def _reduced_loss(x: jax.Array, y: jax.Array, loss_type: str,
                  beta: float = 1.0) -> jax.Array:
    """Reduced (scalar) regression loss matching the reference's zoo:
    L1/MSE = elementwise mean; L2 = L2Loss (l2_loss.py:5-27), the mean over
    the batch of the PER-SAMPLE flattened L2 NORM — not MSE."""
    if loss_type in ("l2", "L2"):
        d = (x - y).reshape(x.shape[0], -1)
        return jnp.mean(jnp.sqrt(jnp.sum(d * d, axis=1)))
    return jnp.mean(_elem_loss(x, y, loss_type, beta))


def _elem_loss(x: jax.Array, y: jax.Array, loss_type: str, beta: float = 1.0) -> jax.Array:
    d = x - y
    if loss_type in ("l1", "L1"):
        return jnp.abs(d)
    if loss_type in ("mse", "MSE"):
        return d * d
    if loss_type == "smooth_l1":
        ad = jnp.abs(d)
        return jnp.where(ad < beta, 0.5 * ad * ad / beta, ad - 0.5 * beta)
    raise ValueError(f"loss type {loss_type} not supported")


def point_matching_loss(
    pred_rots: jax.Array,
    gt_rots: jax.Array,
    points: jax.Array,
    pred_transes: Optional[jax.Array] = None,
    gt_transes: Optional[jax.Array] = None,
    extents: Optional[jax.Array] = None,
    sym_bank: Optional[jax.Array] = None,
    sym_mask: Optional[jax.Array] = None,
    labels: Optional[jax.Array] = None,
    loss_type: str = "l1",
    beta: float = 1.0,
    norm_by_extent: bool = True,
    symmetric: bool = True,
    r_only: bool = True,
    disentangle_t: bool = False,
    disentangle_z: bool = False,
    t_loss_use_points: bool = True,
    loss_weight: float = 1.0,
) -> dict:
    """Symmetry-aware point-matching loss (reference: losses/pm_loss.py:20-200).

    points: (B, N, 3) model points; sym_bank/sym_mask/labels: see
    geometry.symmetry.get_closest_rot_batch.
    """
    if symmetric:
        assert sym_bank is not None and labels is not None
        gt_rots = get_closest_rot_batch(pred_rots, gt_rots, sym_bank, sym_mask, labels)

    points_est = transform_pts(points, pred_rots)
    points_tgt = transform_pts(points, gt_rots)

    if norm_by_extent:
        assert extents is not None
        weights = (1.0 / jnp.maximum(extents.max(axis=1), 1e-6))[:, None, None]
    else:
        weights = 1.0

    def red(x, y):
        return jnp.mean(_elem_loss(x, y, loss_type, beta))

    out = {}
    if r_only:
        out["loss_PM_R"] = 3.0 * red(weights * points_est, weights * points_tgt) * loss_weight
        return out

    assert pred_transes is not None and gt_transes is not None
    if disentangle_z:
        if t_loss_use_points:
            tgt_RT = points_tgt + gt_transes[:, None, :]
            est_R = points_est + gt_transes[:, None, :]
            pred_xy = jnp.concatenate([pred_transes[:, :2], gt_transes[:, 2:3]], axis=1)
            est_xy = points_tgt + pred_xy[:, None, :]
            pred_z = jnp.concatenate([gt_transes[:, :2], pred_transes[:, 2:3]], axis=1)
            est_z = points_tgt + pred_z[:, None, :]
            out["loss_PM_R"] = 3.0 * red(weights * est_R, weights * tgt_RT) * loss_weight
            out["loss_PM_xy"] = 3.0 * red(weights * est_xy, weights * tgt_RT) * loss_weight
            out["loss_PM_z"] = 3.0 * red(weights * est_z, weights * tgt_RT) * loss_weight
        else:
            out["loss_PM_R"] = 3.0 * red(weights * points_est, weights * points_tgt) * loss_weight
            out["loss_PM_xy_noP"] = red(pred_transes[:, :2], gt_transes[:, :2])
            out["loss_PM_z_noP"] = red(pred_transes[:, 2], gt_transes[:, 2])
    elif disentangle_t:
        if t_loss_use_points:
            tgt_RT = points_tgt + gt_transes[:, None, :]
            est_R = points_est + gt_transes[:, None, :]
            est_T = points_tgt + pred_transes[:, None, :]
            out["loss_PM_R"] = 3.0 * red(weights * est_R, weights * tgt_RT) * loss_weight
            out["loss_PM_T"] = 3.0 * red(weights * est_T, weights * tgt_RT) * loss_weight
        else:
            out["loss_PM_R"] = 3.0 * red(weights * points_est, weights * points_tgt) * loss_weight
            out["loss_PM_T_noP"] = red(pred_transes, gt_transes)
    else:
        est = points_est + pred_transes[:, None, :]
        tgt = points_tgt + gt_transes[:, None, :]
        out["loss_PM_RT"] = 3.0 * red(weights * est, weights * tgt) * loss_weight
    return out


def angular_rot_loss(pred_rots: jax.Array, gt_rots: jax.Array) -> jax.Array:
    """Reference angular_distance_rot (rot_loss.py:29-43): the smooth
    surrogate (1 - cos)/2 with cos = (tr(R1 R2^T) - 1)/2 — NOT arccos
    (the true geodesic lives in geometry.rotations.angular_distance and is
    eval-only). Value-verified against the reference module in
    tests/test_reference_model_oracle.py."""
    tr = jnp.einsum("...ij,...ij->...", pred_rots, gt_rots,
                    precision=jax.lax.Precision.HIGHEST)
    cos = (tr - 1.0) * 0.5
    return jnp.mean((1.0 - cos) * 0.5)


def compute_gdrn_losses(
    cfg,
    outputs: dict,
    batch: dict,
    sym_bank: Optional[jax.Array] = None,
    sym_mask: Optional[jax.Array] = None,
    log_vars: Optional[dict] = None,
) -> dict:
    """Assemble the full GDRN loss dict from model outputs + batch GT.

    outputs keys (from GDRN.forward with train=True):
      vis_mask, full_mask (B,H,W), coor_x/y/z (B,H,W,C), region (B,H,W,R+1),
      rot_ego (B,3,3), trans (B,3), centroid_rel (B,2), z_rel (B,).
    batch GT keys: gt_xyz (B,H,W,3) [or gt_xyz_bin (B,H,W,3) int],
      gt_mask_trunc/visib/obj/full (B,H,W), gt_region (B,H,W) int,
      gt_rot (B,3,3), gt_trans (B,3), gt_trans_ratio (B,3),
      gt_points (B,N,3), roi_extents (B,3), roi_labels (B,).
    """
    lc = cfg.model.pose_net.loss
    losses = {}
    gt_masks = {
        "trunc": batch["gt_mask_trunc"],
        "visib": batch["gt_mask_visib"],
        "obj": batch.get("gt_mask_obj"),
        "full": batch.get("gt_mask_full"),
    }

    if not cfg.model.pose_net.geo_head.freeze:
        # xyz ------------------------------------------------------------
        m_xyz = gt_masks[lc.xyz_loss_mask_gt]
        if lc.xyz_loss_type == "L1":
            losses["loss_coor_x"] = masked_xyz_l1_loss(
                outputs["coor_x"], batch["gt_xyz"][..., 0:1], m_xyz) * lc.xyz_lw
            losses["loss_coor_y"] = masked_xyz_l1_loss(
                outputs["coor_y"], batch["gt_xyz"][..., 1:2], m_xyz) * lc.xyz_lw
            losses["loss_coor_z"] = masked_xyz_l1_loss(
                outputs["coor_z"], batch["gt_xyz"][..., 2:3], m_xyz) * lc.xyz_lw
        elif lc.xyz_loss_type == "CE_coor":
            gt_bin = batch["gt_xyz_bin"]
            losses["loss_coor_x"] = xyz_ce_loss(outputs["coor_x"], gt_bin[..., 0], m_xyz) * lc.xyz_lw
            losses["loss_coor_y"] = xyz_ce_loss(outputs["coor_y"], gt_bin[..., 1], m_xyz) * lc.xyz_lw
            losses["loss_coor_z"] = xyz_ce_loss(outputs["coor_z"], gt_bin[..., 2], m_xyz) * lc.xyz_lw
        else:
            raise NotImplementedError(lc.xyz_loss_type)

        # masks ------------------------------------------------------------
        losses["loss_mask"] = mask_loss(
            outputs["vis_mask"], gt_masks[lc.mask_loss_gt], lc.mask_loss_type) * lc.mask_lw
        if lc.full_mask_lw > 0 and outputs.get("full_mask") is not None:
            losses["loss_mask_full"] = mask_loss(
                outputs["full_mask"], batch["gt_mask_full"], lc.full_mask_loss_type) * lc.full_mask_lw

        # region ------------------------------------------------------------
        if lc.region_lw > 0 and outputs["region"].shape[-1] > 0:
            # CE is the only region loss the reference implements too
            # (GDRN_double_mask.py:403-412 raises on anything else)
            if lc.region_loss_type != "CE":
                raise NotImplementedError(
                    f"region_loss_type={lc.region_loss_type!r}: only CE")
            m_region = gt_masks[lc.region_loss_mask_gt]
            losses["loss_region"] = region_ce_loss(
                outputs["region"], batch["gt_region"], m_region) * lc.region_lw

    # point matching ------------------------------------------------------
    if lc.pm_lw > 0:
        pm = point_matching_loss(
            pred_rots=outputs["rot_ego"], gt_rots=batch["gt_rot"],
            points=batch["gt_points"],
            pred_transes=outputs["trans"], gt_transes=batch["gt_trans"],
            extents=batch["roi_extents"],
            sym_bank=sym_bank, sym_mask=sym_mask, labels=batch["roi_labels"],
            loss_type=lc.pm_loss_type, beta=lc.pm_smooth_l1_beta,
            norm_by_extent=lc.pm_norm_by_extent, symmetric=lc.pm_loss_sym,
            r_only=lc.pm_r_only, disentangle_t=lc.pm_disentangle_t,
            disentangle_z=lc.pm_disentangle_z, t_loss_use_points=lc.pm_t_use_points,
            loss_weight=lc.pm_lw)
        losses.update(pm)

    # rot -------------------------------------------------------------------
    if lc.rot_lw > 0:
        if lc.rot_loss_type == "angular":
            losses["loss_rot"] = angular_rot_loss(outputs["rot_ego"], batch["gt_rot"]) * lc.rot_lw
        else:
            losses["loss_rot"] = jnp.mean(
                _elem_loss(outputs["rot_ego"], batch["gt_rot"],
                           "mse")) * lc.rot_lw

    # centroid / z ----------------------------------------------------------
    if lc.centroid_lw > 0 and cfg.model.pose_net.pnp_net.trans_type == "centroid_z":
        losses["loss_centroid"] = _reduced_loss(
            outputs["centroid_rel"], batch["gt_trans_ratio"][:, :2],
            lc.centroid_loss_type) * lc.centroid_lw
    if lc.z_lw > 0:
        gt_z = (batch["gt_trans_ratio"][:, 2]
                if cfg.model.pose_net.pnp_net.z_type == "REL" else batch["gt_trans"][:, 2])
        losses["loss_z"] = _reduced_loss(
            outputs["z_rel"][:, None], gt_z[:, None],
            lc.z_loss_type) * lc.z_lw

    # trans -------------------------------------------------------------------
    if lc.trans_lw > 0:
        if lc.trans_loss_disentangle:
            losses["loss_trans_xy"] = _reduced_loss(
                outputs["trans"][:, :2], batch["gt_trans"][:, :2],
                lc.trans_loss_type) * lc.trans_lw
            losses["loss_trans_z"] = _reduced_loss(
                outputs["trans"][:, 2:3], batch["gt_trans"][:, 2:3],
                lc.trans_loss_type) * lc.trans_lw
        else:
            losses["loss_trans_LPnP"] = _reduced_loss(
                outputs["trans"], batch["gt_trans"],
                lc.trans_loss_type) * lc.trans_lw

    # bind: R^T t -------------------------------------------------------------
    if lc.bind_lw > 0:
        pred_bind = jnp.einsum("bji,bj->bi", outputs["rot_ego"], outputs["trans"],
                               precision=jax.lax.Precision.HIGHEST)
        gt_bind = jnp.einsum("bji,bj->bi", batch["gt_rot"], batch["gt_trans"],
                             precision=jax.lax.Precision.HIGHEST)
        losses["loss_bind"] = _reduced_loss(
            pred_bind, gt_bind, lc.bind_loss_type) * lc.bind_lw

    if lc.use_mtl and log_vars is not None:
        # learned task-uncertainty weighting (reference
        # GDRN_double_mask.py:531-535): L*exp(-a) + log(1 + exp(a))
        for k in list(losses):
            lv = log_vars.get(k[len("loss_"):])
            if lv is not None:
                losses[k] = (losses[k] * jnp.exp(-lv)
                             + jnp.log1p(jnp.exp(lv)))
    return losses
