"""Bidirectional nearest-neighbor (chamfer) distance.

Reference: core/csrc/torch_nndistance (CUDA kernel + autograd wrapper,
torch_nndistance.py:87). On TPU the pairwise distance matrix IS the right
algorithm: it's one big matmul (‖a‖² + ‖b‖² − 2a·b) that maps straight to
the MXU, with autodiff for free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def chamfer_distance(xyz1: jax.Array, xyz2: jax.Array,
                     mask1: jax.Array | None = None,
                     mask2: jax.Array | None = None):
    """Squared-distance chamfer, both directions.

    Args: xyz1 (B, N, 3), xyz2 (B, M, 3); optional validity masks (B, N)/(B, M)
    for padded point sets.
    Returns: (dist1 (B, N), idx1 (B, N), dist2 (B, M), idx2 (B, M)).
    """
    n1 = jnp.sum(xyz1 * xyz1, axis=-1)                     # (B, N)
    n2 = jnp.sum(xyz2 * xyz2, axis=-1)                     # (B, M)
    cross = jnp.einsum("bnd,bmd->bnm", xyz1, xyz2,
                       preferred_element_type=jnp.float32)  # MXU
    d = n1[:, :, None] + n2[:, None, :] - 2.0 * cross       # (B, N, M)
    if mask2 is not None:
        d = jnp.where(mask2[:, None, :], d, jnp.inf)
    dist1 = jnp.min(d, axis=2)
    idx1 = jnp.argmin(d, axis=2)
    d_t = d if mask1 is None else jnp.where(mask1[:, :, None], d, jnp.inf)
    dist2 = jnp.min(d_t, axis=1)
    idx2 = jnp.argmin(d_t, axis=1)
    if mask1 is not None:
        dist1 = jnp.where(mask1, dist1, 0.0)
    if mask2 is not None:
        dist2 = jnp.where(mask2, dist2, 0.0)
    return dist1, idx1, dist2, idx2
