"""PVNet-style RANSAC keypoint voting, batched on device.

Reference: core/csrc/ransac_voting (CUDA kernels generate_hypothesis /
voting_for_hypothesis + the torch wrapper loop ransac_voting_gpu.py:7-220
with confidence-based early stopping and mean/covariance estimation).

TPU formulation: pixels vote with unit direction vectors toward a keypoint;
hypotheses are intersections of random pixel-pairs' voting lines, all
sampled at once (vmap), scored by angular-inlier counting (one big
(H, P) matrix per keypoint), and the best hypothesis is refined by the
inlier-weighted least-squares intersection. Early exit becomes a fixed
hypothesis budget (static shapes).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _line_intersection(p1, d1, p2, d2, eps=1e-8):
    """Intersection of lines p + t*d (2D). Returns (point (2,), ok)."""
    # solve [d1, -d2] [t, s]^T = p2 - p1
    A = jnp.stack([d1, -d2], axis=-1)             # (2, 2)
    det = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
    rhs = p2 - p1
    t = (rhs[0] * A[1, 1] - rhs[1] * A[0, 1]) / jnp.where(
        jnp.abs(det) < eps, jnp.inf, det)
    return p1 + t * d1, jnp.abs(det) > eps


@partial(jax.jit, static_argnames=("n_hyps",))
def ransac_voting_keypoint(
    key: jax.Array,
    coords: jax.Array,       # (P, 2) pixel coordinates of foreground pixels
    directions: jax.Array,   # (P, 2) unit vote directions per pixel
    mask: jax.Array,         # (P,) validity
    n_hyps: int = 128,
    inlier_thresh: float = 0.999,  # cos-angle threshold (reference 0.999)
):
    """Vote one keypoint. Returns (point (2,), inlier_frac, mean, cov)."""
    P = coords.shape[0]
    k1, k2 = jax.random.split(key)
    logits = jnp.where(mask, 0.0, -1e9)
    idx1 = jax.random.categorical(k1, logits, shape=(n_hyps,))
    idx2 = jax.random.categorical(k2, logits, shape=(n_hyps,))

    hyp, ok = jax.vmap(_line_intersection)(
        coords[idx1], directions[idx1], coords[idx2], directions[idx2])

    # score: pixel votes for hypothesis h if cos(angle between its vote
    # direction and (h - pixel)) > thresh
    diff = hyp[:, None, :] - coords[None, :, :]               # (H, P, 2)
    dn = diff / jnp.maximum(jnp.linalg.norm(diff, axis=-1, keepdims=True), 1e-8)
    cos = jnp.sum(dn * directions[None], axis=-1)             # (H, P)
    inlier = (cos > inlier_thresh) & mask[None]
    scores = jnp.where(ok, inlier.sum(-1), -1)
    best = jnp.argmax(scores)

    best_inliers = inlier[best].astype(jnp.float32)           # (P,)
    n_in = jnp.maximum(best_inliers.sum(), 1.0)

    # weighted least-squares refinement: for inlier pixels, the keypoint
    # lies on the line through coord with direction d; minimize sum of
    # squared perpendicular distances -> normal equations with projectors
    n_vec = jnp.stack([-directions[:, 1], directions[:, 0]], axis=-1)  # normals
    w = best_inliers[:, None, None]
    A = jnp.sum(w * n_vec[:, :, None] * n_vec[:, None, :], axis=0)     # (2,2)
    b = jnp.sum(w[:, :, 0] * n_vec * jnp.sum(n_vec * coords, -1, keepdims=True),
                axis=0)
    refined = jnp.linalg.solve(A + 1e-6 * jnp.eye(2), b)

    # mean + covariance of inlier hypotheses (reference
    # estimate_voting_distribution_with_mean)
    hyp_w = jnp.where((scores > 0)[:, None], hyp, 0.0)
    nh = jnp.maximum((scores > 0).sum(), 1)
    mean = hyp_w.sum(0) / nh
    d = jnp.where((scores > 0)[:, None], hyp - mean, 0.0)
    cov = (d.T @ d) / jnp.maximum(nh - 1, 1)
    return refined, n_in / jnp.maximum(mask.sum(), 1), mean, cov


@partial(jax.jit, static_argnames=("n_hyps",))
def ransac_voting_layer(
    key: jax.Array,
    mask: jax.Array,          # (B, H, W) foreground
    vertex: jax.Array,        # (B, H, W, K, 2) per-pixel vote fields
    n_hyps: int = 128,
):
    """Batched multi-keypoint voting (reference ransac_voting_layer_v3).
    Returns keypoints (B, K, 2)."""
    B, H, W, K, _ = vertex.shape
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    coords = jnp.stack([xs, ys], -1).reshape(-1, 2)           # (P, 2)

    def one_img(k, m, v):
        mflat = m.reshape(-1) > 0.5
        def one_kp(kk, vk):
            d = vk.reshape(-1, 2)
            d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
            pt, frac, mean, cov = ransac_voting_keypoint(
                kk, coords, d, mflat, n_hyps=n_hyps)
            return pt
        keys = jax.random.split(k, K)
        return jax.vmap(one_kp)(keys, jnp.moveaxis(v, 2, 0))
    keys = jax.random.split(key, B)
    return jax.vmap(one_img)(keys, mask, vertex)
