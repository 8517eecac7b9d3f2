"""Batched PnP solvers: DLT initialization + Levenberg-Marquardt refinement
+ fixed-iteration RANSAC, all jit/vmap-friendly.

TPU-native replacements for three reference paths:
  * cv2.solvePnP EPnP/iterative used by the evaluator's PnP modes
    (gdrn_evaluator.py:373-459 process_pnp_ransac, :241-371
    process_net_and_pnp);
  * the ceres Levenberg-Marquardt weighted PnP C++ extension
    (core/csrc/uncertainty_pnp/src/uncertainty_pnp.cpp:7-56 — reprojection
    residuals premultiplied by per-point 2x2 weights) — here the same
    weighted residual drives a fixed-iteration LM loop;
  * the PVNet RANSAC voting CUDA kernels (core/csrc/ransac_voting) in
    spirit: hypotheses are batched minimal subsets scored in parallel.

Everything is static-shape: RANSAC runs a fixed hypothesis count with
masked inlier scoring instead of early exit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_HP = jax.lax.Precision.HIGHEST


def normalize_points_2d(pts2d: jax.Array, K: jax.Array) -> jax.Array:
    """Pixel coords -> normalized camera coords. pts2d (..., N, 2), K (..., 3, 3)."""
    x = (pts2d[..., 0] - K[..., 0, 2, None]) / K[..., 0, 0, None]
    y = (pts2d[..., 1] - K[..., 1, 2, None]) / K[..., 1, 1, None]
    return jnp.stack([x, y], axis=-1)


def dlt_pnp(pts3d: jax.Array, pts2d_norm: jax.Array,
            weights: jax.Array | None = None):
    """Direct Linear Transform PnP on normalized coords (batched).

    Solves for P = [R|t] up to scale from >=6 correspondences via SVD of the
    2N x 12 system, then projects onto SO(3).

    Args: pts3d (B, N, 3), pts2d_norm (B, N, 2), weights (B, N) optional.
    Returns: (R (B, 3, 3), t (B, 3)).
    """
    B, N, _ = pts3d.shape
    X = jnp.concatenate([pts3d, jnp.ones((B, N, 1), pts3d.dtype)], axis=-1)  # (B,N,4)
    u = pts2d_norm[..., 0:1]
    v = pts2d_norm[..., 1:2]
    zero = jnp.zeros_like(X)
    rows_u = jnp.concatenate([X, zero, -u * X], axis=-1)      # (B, N, 12)
    rows_v = jnp.concatenate([zero, X, -v * X], axis=-1)
    A = jnp.concatenate([rows_u, rows_v], axis=1)             # (B, 2N, 12)
    if weights is not None:
        w = jnp.sqrt(jnp.maximum(jnp.concatenate([weights, weights], axis=1), 0.0))
        A = A * w[..., None]
    # smallest right singular vector
    _, _, vt = jnp.linalg.svd(A, full_matrices=False)
    p = vt[..., -1, :]                                        # (B, 12)
    P = p.reshape(B, 3, 4)
    # fix the global sign so the point centroid has positive depth
    # (p is determined only up to sign by the SVD)
    centroid_h = jnp.concatenate(
        [jnp.mean(pts3d, axis=1), jnp.ones((B, 1), pts3d.dtype)], axis=-1)
    w_c = jnp.einsum("bj,bj->b", P[:, 2, :], centroid_h, precision=_HP)
    P = P * jnp.sign(w_c)[:, None, None]
    M = P[:, :, :3]
    # nearest rotation (scaled): SVD projection with reflection guard
    um, sm, vmt = jnp.linalg.svd(M)
    det = jnp.linalg.det(jnp.matmul(um, vmt))
    d = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    R = jnp.einsum("bij,bj,bjk->bik", um, d, vmt, precision=_HP)
    scale = jnp.mean(sm, axis=-1, keepdims=True)
    t = P[:, :, 3] / jnp.maximum(scale, 1e-12)
    return R, t


def _rodrigues(w: jax.Array) -> jax.Array:
    """Axis-angle (B, 3) -> rotation matrices, branch-free small-angle safe."""
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)
    theta = jnp.maximum(theta, 1e-12)
    k = w / theta
    kx, ky, kz = k[..., 0], k[..., 1], k[..., 2]
    zero = jnp.zeros_like(kx)
    Km = jnp.stack([
        jnp.stack([zero, -kz, ky], -1),
        jnp.stack([kz, zero, -kx], -1),
        jnp.stack([-ky, kx, zero], -1)], -2)
    st = jnp.sin(theta)[..., None]
    ct = jnp.cos(theta)[..., None]
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + st * Km + (1 - ct) * jnp.matmul(Km, Km)


def _log_so3(R: jax.Array) -> jax.Array:
    """Rotation matrices (B, 3, 3) -> axis-angle (B, 3)."""
    tr = jnp.clip((R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2] - 1) * 0.5,
                  -1 + 1e-7, 1 - 1e-7)
    theta = jnp.arccos(tr)
    w = jnp.stack([R[..., 2, 1] - R[..., 1, 2],
                   R[..., 0, 2] - R[..., 2, 0],
                   R[..., 1, 0] - R[..., 0, 1]], axis=-1)
    s = theta / jnp.maximum(2.0 * jnp.sin(theta), 1e-9)
    return w * s[..., None]


def _residuals(params, pts3d, pts2d_norm):
    """params (B, 6): [axis-angle, t]. Returns (B, N, 2) residuals."""
    R = _rodrigues(params[:, :3])
    t = params[:, 3:]
    pc = jnp.einsum("bij,bnj->bni", R, pts3d, precision=_HP) + t[:, None, :]
    z = jnp.maximum(pc[..., 2], 1e-9)
    proj = pc[..., :2] / z[..., None]
    return proj - pts2d_norm


@partial(jax.jit, static_argnames=("iters",))
def lm_refine_pnp(R0: jax.Array, t0: jax.Array, pts3d: jax.Array,
                  pts2d_norm: jax.Array, weights: jax.Array | None = None,
                  iters: int = 10, lm_lambda: float = 1e-3):
    """Fixed-iteration Levenberg-Marquardt on weighted reprojection error.

    The jit-able equivalent of the ceres solve in uncertainty_pnp.cpp —
    weights (B, N, 2) or (B, N) multiply the residuals exactly like the
    reference's 2x2 inverse-sqrt-covariance premultiplication (diagonal
    case). Returns (R (B,3,3), t (B,3)).
    """
    B, N, _ = pts3d.shape
    if weights is None:
        w = jnp.ones((B, N, 2), pts3d.dtype)
    elif weights.ndim == 2:
        w = jnp.broadcast_to(weights[..., None], (B, N, 2)).astype(pts3d.dtype)
    else:
        w = weights.astype(pts3d.dtype)

    params0 = jnp.concatenate([_log_so3(R0), t0], axis=-1)    # (B, 6)

    def one(params_i, pts3d_b, pts2d_b, w_b):
        def res_fn(p):
            return (_residuals(p[None], pts3d_b[None], pts2d_b[None])[0]
                    * w_b).reshape(-1)

        def body(carry, _):
            p, lam = carry
            r = res_fn(p)
            J = jax.jacfwd(res_fn)(p)                          # (2N, 6)
            JtJ = J.T @ J
            g = J.T @ r
            H = JtJ + lam * jnp.diag(jnp.diag(JtJ))
            dp = jnp.linalg.solve(H + 1e-12 * jnp.eye(6), g)
            p_new = p - dp
            better = jnp.sum(res_fn(p_new) ** 2) < jnp.sum(r ** 2)
            p = jnp.where(better, p_new, p)
            lam = jnp.where(better, lam * 0.5, lam * 4.0)
            return (p, lam), None

        (p, _), _ = jax.lax.scan(body, (params_i, jnp.asarray(lm_lambda)),
                                 None, length=iters)
        return p

    params = jax.vmap(one)(params0, pts3d, pts2d_norm, w)
    return _rodrigues(params[:, :3]), params[:, 3:]


@partial(jax.jit, static_argnames=("n_hyps", "subset_size", "refine_iters"))
def ransac_pnp(key: jax.Array, pts3d: jax.Array, pts2d: jax.Array,
               K: jax.Array, mask: jax.Array | None = None,
               n_hyps: int = 64, subset_size: int = 8,
               inlier_thresh_px: float = 3.0, refine_iters: int = 10):
    """RANSAC PnP with fixed hypothesis count + masked scoring.

    Args: pts3d (B, N, 3), pts2d (B, N, 2) pixels, K (B, 3, 3),
      mask (B, N) valid correspondences.
    Returns: (R (B,3,3), t (B,3), inlier_frac (B,)).
    """
    B, N, _ = pts3d.shape
    if mask is None:
        mask = jnp.ones((B, N), bool)
    pts2d_norm = normalize_points_2d(pts2d, K)
    thresh_norm = inlier_thresh_px / jnp.maximum(
        jnp.minimum(K[:, 0, 0], K[:, 1, 1]), 1.0)             # (B,)

    # hypothesis subsets: random indices biased to valid points
    logits = jnp.where(mask, 0.0, -1e9)                        # (B, N)
    keys = jax.random.split(key, n_hyps)
    idx = jax.vmap(
        lambda k: jax.vmap(
            lambda kk, lg: jax.random.categorical(kk, lg, shape=(subset_size,))
        )(jax.random.split(k, B), logits)
    )(keys)                                                    # (H, B, S)

    def hyp(idx_hb):
        p3 = jnp.take_along_axis(pts3d, idx_hb[..., None], axis=1)
        p2 = jnp.take_along_axis(pts2d_norm, idx_hb[..., None], axis=1)
        R, t = dlt_pnp(p3, p2)
        return R, t

    Rs, ts = jax.vmap(hyp)(idx)                                # (H, B, 3, 3/3)

    def score(R, t):
        pc = jnp.einsum("bij,bnj->bni", R, pts3d, precision=_HP) + t[:, None, :]
        z = pc[..., 2]
        proj = pc[..., :2] / jnp.maximum(z, 1e-9)[..., None]
        err = jnp.linalg.norm(proj - pts2d_norm, axis=-1)
        ok = (err < thresh_norm[:, None]) & (z > 1e-6) & mask
        return jnp.sum(ok, axis=-1)                            # (B,)

    scores = jax.vmap(score)(Rs, ts)                           # (H, B)
    best = jnp.argmax(scores, axis=0)                          # (B,)
    R0 = jnp.take_along_axis(Rs, best[None, :, None, None], axis=0)[0]
    t0 = jnp.take_along_axis(ts, best[None, :, None], axis=0)[0]

    # refine on inliers of the best hypothesis
    pc = jnp.einsum("bij,bnj->bni", R0, pts3d, precision=_HP) + t0[:, None, :]
    z = pc[..., 2]
    proj = pc[..., :2] / jnp.maximum(z, 1e-9)[..., None]
    err = jnp.linalg.norm(proj - pts2d_norm, axis=-1)
    inl = ((err < thresh_norm[:, None]) & (z > 1e-6) & mask).astype(jnp.float32)
    R, t = lm_refine_pnp(R0, t0, pts3d, pts2d_norm, weights=inl,
                         iters=refine_iters)
    inlier_frac = jnp.sum(inl, axis=-1) / jnp.maximum(jnp.sum(mask, -1), 1)
    return R, t, inlier_frac


def uncertainty_pnp(pts3d: jax.Array, pts2d: jax.Array, weights_2d: jax.Array,
                    K: jax.Array, R0: jax.Array | None = None,
                    t0: jax.Array | None = None, iters: int = 15):
    """Weighted PnP (reference un_pnp_utils.py:11 interface): per-point 2D
    confidence weights; seeds from DLT when no initialization is given."""
    pts2d_norm = normalize_points_2d(pts2d, K)
    if R0 is None or t0 is None:
        w = weights_2d if weights_2d.ndim == 2 else weights_2d.mean(-1)
        R0, t0 = dlt_pnp(pts3d, pts2d_norm, weights=w)
    return lm_refine_pnp(R0, t0, pts3d, pts2d_norm, weights=weights_2d,
                         iters=iters)
