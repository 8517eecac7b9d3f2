"""BOP pose-error metrics, batched.

Reference: lib/pysixd/pose_error.py (BOP-toolkit fork): add :256, adi :274,
re :359, te :406, proj :175, mssd :131, mspd :156. The reference computes
these per-instance in python loops with cKDTree / per-sym lists; here each
metric is one batched jnp computation — symmetry sets are padded banks
(see geometry.symmetry.build_sym_bank) and adi's nearest-neighbor search is
the chamfer matmul (MXU). vsd lives in eval/vsd.py (needs the rasterizer).

Scalar (single-instance, numpy-friendly) wrappers are provided for
API/readability parity; the *_batch forms are the fast path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_HP = jax.lax.Precision.HIGHEST


def _tf(pts, R, t):
    """pts (..., N, 3), R (..., 3, 3), t (..., 3) -> transformed points."""
    return jnp.einsum("...ij,...nj->...ni", R, pts, precision=_HP) + t[..., None, :]


# ---------------------------------------------------------------------------
# batched metrics
# ---------------------------------------------------------------------------

def add_batch(R_est, t_est, R_gt, t_gt, pts):
    """ADD: mean per-point distance. R (B,3,3), t (B,3), pts (B,N,3)."""
    d = _tf(pts, R_est, t_est) - _tf(pts, R_gt, t_gt)
    return jnp.mean(jnp.linalg.norm(d, axis=-1), axis=-1)


def adi_batch(R_est, t_est, R_gt, t_gt, pts):
    """ADD-S: mean nearest-neighbor distance from gt-posed to est-posed."""
    pe = _tf(pts, R_est, t_est)
    pg = _tf(pts, R_gt, t_gt)
    n_e = jnp.sum(pe * pe, axis=-1)
    n_g = jnp.sum(pg * pg, axis=-1)
    cross = jnp.einsum("bnd,bmd->bnm", pg, pe, preferred_element_type=jnp.float32)
    d2 = n_g[:, :, None] + n_e[:, None, :] - 2.0 * cross
    return jnp.mean(jnp.sqrt(jnp.maximum(jnp.min(d2, axis=-1), 0.0)), axis=-1)


def re_batch(R_est, R_gt, degrees: bool = True):
    """Rotation geodesic error (reference pose_error.py:359-377)."""
    tr = jnp.einsum("bij,bij->b", R_est, R_gt, precision=_HP)
    cos = jnp.clip(0.5 * (tr - 1.0), -1.0, 1.0)
    err = jnp.arccos(cos)
    return err * (180.0 / jnp.pi) if degrees else err


def te_batch(t_est, t_gt):
    return jnp.linalg.norm(t_est - t_gt, axis=-1)


def _project(pts, K, R, t):
    cam = _tf(pts, R, t)
    uvw = jnp.einsum("...ij,...nj->...ni", K, cam, precision=_HP)
    return uvw[..., :2] / jnp.maximum(uvw[..., 2:3], 1e-12)


def proj_batch(R_est, t_est, R_gt, t_gt, K, pts):
    """Mean 2D projection distance (Brachmann CVPR'16)."""
    d = _project(pts, K, R_est, t_est) - _project(pts, K, R_gt, t_gt)
    return jnp.mean(jnp.linalg.norm(d, axis=-1), axis=-1)


def _sym_gt_poses(R_gt, t_gt, sym_R, sym_t):
    """Compose gt pose with a padded symmetry bank.
    R_gt (B,3,3), t_gt (B,3); sym_R (B,S,3,3), sym_t (B,S,3).
    Returns R (B,S,3,3), t (B,S,3)."""
    R = jnp.einsum("bij,bsjk->bsik", R_gt, sym_R, precision=_HP)
    t = jnp.einsum("bij,bsj->bsi", R_gt, sym_t, precision=_HP) + t_gt[:, None, :]
    return R, t


def mssd_batch(R_est, t_est, R_gt, t_gt, pts, sym_R, sym_t, sym_valid):
    """Maximum Symmetry-aware Surface Distance: min over syms of the max
    per-point distance. sym_valid (B,S) masks padded symmetries."""
    pe = _tf(pts, R_est, t_est)                                 # (B,N,3)
    Rs, ts = _sym_gt_poses(R_gt, t_gt, sym_R, sym_t)
    pg = _tf(pts[:, None], Rs, ts)                              # (B,S,N,3)
    maxd = jnp.max(jnp.linalg.norm(pe[:, None] - pg, axis=-1), axis=-1)  # (B,S)
    maxd = jnp.where(sym_valid, maxd, jnp.inf)
    return jnp.min(maxd, axis=-1)


def mspd_batch(R_est, t_est, R_gt, t_gt, K, pts, sym_R, sym_t, sym_valid):
    """Maximum Symmetry-aware Projection Distance."""
    prj_e = _project(pts, K, R_est, t_est)                      # (B,N,2)
    Rs, ts = _sym_gt_poses(R_gt, t_gt, sym_R, sym_t)
    prj_g = _project(pts[:, None], K[:, None], Rs, ts)          # (B,S,N,2)
    maxd = jnp.max(jnp.linalg.norm(prj_e[:, None] - prj_g, axis=-1), axis=-1)
    maxd = jnp.where(sym_valid, maxd, jnp.inf)
    return jnp.min(maxd, axis=-1)


def cou_mask(mask_est, mask_gt):
    """Complement-over-union of binary masks (reference pose_error.py:219)."""
    mask_est = mask_est.astype(bool)
    mask_gt = mask_gt.astype(bool)
    union = jnp.sum(mask_est | mask_gt, axis=(-2, -1))
    inter = jnp.sum(mask_est & mask_gt, axis=(-2, -1))
    return 1.0 - inter / jnp.maximum(union, 1)


# ---------------------------------------------------------------------------
# scalar wrappers (single instance, numpy in/out) — API parity
# ---------------------------------------------------------------------------

def _b(x):
    return jnp.asarray(np.asarray(x, dtype=np.float32))[None]


def add(R_est, t_est, R_gt, t_gt, pts):
    return float(add_batch(_b(R_est), _b(np.ravel(t_est)), _b(R_gt),
                           _b(np.ravel(t_gt)), _b(pts))[0])


def adi(R_est, t_est, R_gt, t_gt, pts):
    return float(adi_batch(_b(R_est), _b(np.ravel(t_est)), _b(R_gt),
                           _b(np.ravel(t_gt)), _b(pts))[0])


def re(R_est, R_gt):
    return float(re_batch(_b(R_est), _b(R_gt))[0])


def te(t_est, t_gt):
    return float(te_batch(_b(np.ravel(t_est)), _b(np.ravel(t_gt)))[0])


def proj(R_est, t_est, R_gt, t_gt, K, pts):
    return float(proj_batch(_b(R_est), _b(np.ravel(t_est)), _b(R_gt),
                            _b(np.ravel(t_gt)), _b(K), _b(pts))[0])


def _sym_bank_np(syms):
    """List of {"R","t"} dicts -> (1,S,3,3), (1,S,3), (1,S) arrays."""
    S = max(len(syms), 1)
    R = np.tile(np.eye(3, dtype=np.float32), (1, S, 1, 1))
    t = np.zeros((1, S, 3), np.float32)
    v = np.zeros((1, S), bool)
    for i, s in enumerate(syms):
        R[0, i] = s["R"]
        t[0, i] = np.ravel(s["t"])
        v[0, i] = True
    if not syms:
        v[0, 0] = True
    return jnp.asarray(R), jnp.asarray(t), jnp.asarray(v)


def mssd(R_est, t_est, R_gt, t_gt, pts, syms):
    sR, st, sv = _sym_bank_np(syms)
    return float(mssd_batch(_b(R_est), _b(np.ravel(t_est)), _b(R_gt),
                            _b(np.ravel(t_gt)), _b(pts), sR, st, sv)[0])


def mspd(R_est, t_est, R_gt, t_gt, K, pts, syms):
    sR, st, sv = _sym_bank_np(syms)
    return float(mspd_batch(_b(R_est), _b(np.ravel(t_est)), _b(R_gt),
                            _b(np.ravel(t_gt)), _b(K), _b(pts), sR, st, sv)[0])
