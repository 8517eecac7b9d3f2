"""Farthest point sampling — JAX scan replacement for the C++ extension.

Reference: core/csrc/fps/src/farthest_point_sampling.cpp:77-165 (greedy
max-min selection, optional centroid-seeded variant) with ctypes wrapper
fps_utils.py:6. Used to pick surface-region seed keypoints and evaluator
sample points. The greedy loop is a lax.scan over a running min-distance
field — O(K·N) fully on device, batchable via vmap.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("num_samples", "init_center"))
def farthest_point_sampling(pts: jax.Array, num_samples: int,
                            init_center: bool = False) -> jax.Array:
    """Greedy farthest point sampling.

    Args:
      pts: (N, 3) points.
      num_samples: K points to select.
      init_center: seed from the point closest to the centroid (matching the
        reference's `..._init_center` variant); otherwise seed from point 0.
    Returns:
      (K, 3) sampled points.
    """
    n = pts.shape[0]
    if init_center:
        centroid = jnp.mean(pts, axis=0)
        first = jnp.argmin(jnp.sum((pts - centroid) ** 2, axis=-1))
    else:
        first = jnp.asarray(0, dtype=jnp.int32)

    d0 = jnp.sum((pts - pts[first]) ** 2, axis=-1)

    def body(carry, _):
        min_d, = carry
        nxt = jnp.argmax(min_d)
        d_new = jnp.sum((pts - pts[nxt]) ** 2, axis=-1)
        return (jnp.minimum(min_d, d_new),), nxt

    (_,), idxs = jax.lax.scan(body, (d0,), None, length=num_samples - 1)
    all_idx = jnp.concatenate([first[None].astype(jnp.int32), idxs.astype(jnp.int32)])
    return pts[all_idx]


def fps_indices(pts, num_samples, init_center=False):
    """Same as farthest_point_sampling but returns indices."""
    out = farthest_point_sampling(pts, num_samples, init_center)
    # recover indices by nearest match (used rarely; host-side convenience)
    d = jnp.sum((pts[None] - out[:, None]) ** 2, axis=-1)
    return jnp.argmin(d, axis=-1)
