"""Object symmetry handling: enumeration (host, numpy) + closest-rotation
selection (device, batched JAX).

Reference semantics: lib/pysixd/misc.py:234-280 (symmetry enumeration from
BOP models_info), core/utils/pose_utils.py:472-528 (closest symmetric GT
rotation). The device side replaces the reference's per-sample python loop
with a padded, masked argmin over a fixed sym-rotation bank — static shapes
so the whole thing lives inside the jitted loss.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _axis_angle_matrix(angle: float, axis: np.ndarray) -> np.ndarray:
    axis = np.asarray(axis, dtype=np.float64)
    axis = axis / np.linalg.norm(axis)
    x, y, z = axis
    c, s = np.cos(angle), np.sin(angle)
    C = 1.0 - c
    return np.array(
        [
            [x * x * C + c, x * y * C - z * s, x * z * C + y * s],
            [y * x * C + z * s, y * y * C + c, y * z * C - x * s],
            [z * x * C - y * s, z * y * C + x * s, z * z * C + c],
        ]
    )


def get_symmetry_transformations(model_info: dict, max_sym_disc_step: float = 0.01):
    """Enumerate symmetry transformations for a BOP object model.

    Returns a list of dicts {"R": 3x3, "t": 3x1} (t in the model's units,
    typically mm) — identity first, mirroring the BOP toolkit behavior.
    """
    trans_disc = [{"R": np.eye(3), "t": np.zeros((3, 1))}]
    for sym in model_info.get("symmetries_discrete", []):
        m = np.reshape(np.asarray(sym, dtype=np.float64), (4, 4))
        trans_disc.append({"R": m[:3, :3], "t": m[:3, 3].reshape(3, 1)})

    trans_cont = []
    for sym in model_info.get("symmetries_continuous", []):
        axis = np.asarray(sym["axis"], dtype=np.float64)
        offset = np.asarray(sym["offset"], dtype=np.float64).reshape(3, 1)
        n_steps = int(np.ceil(np.pi / max_sym_disc_step))
        step = 2.0 * np.pi / n_steps
        for i in range(1, n_steps):
            R = _axis_angle_matrix(i * step, axis)
            trans_cont.append({"R": R, "t": -(R @ offset) + offset})

    out = []
    for td in trans_disc:
        if trans_cont:
            for tc in trans_cont:
                out.append({"R": tc["R"] @ td["R"], "t": tc["R"] @ td["t"] + tc["t"]})
        else:
            out.append(td)
    return out


def get_symmetry_rotations(model_info: dict, max_sym_disc_step: float = 0.01) -> np.ndarray:
    """Rotation-only symmetry bank (K, 3, 3); identity first."""
    return np.stack([t["R"] for t in get_symmetry_transformations(model_info, max_sym_disc_step)])


def build_sym_bank(sym_rots_per_class: list, max_syms: int | None = None):
    """Pack per-class symmetry rotation lists into a fixed (C, S, 3, 3) bank.

    Non-symmetric classes get a single identity; padding repeats the
    identity with a mask so masked entries never win the argmin.

    Returns (bank (C, S, 3, 3) float32, mask (C, S) bool).
    """
    C = len(sym_rots_per_class)
    sizes = [1 if r is None else len(r) for r in sym_rots_per_class]
    S = max_syms or max(sizes + [1])
    bank = np.tile(np.eye(3, dtype=np.float32), (C, S, 1, 1))
    mask = np.zeros((C, S), dtype=bool)
    for c, rots in enumerate(sym_rots_per_class):
        if rots is None:
            mask[c, 0] = True
            continue
        k = min(len(rots), S)
        bank[c, :k] = np.asarray(rots[:k], dtype=np.float32)
        mask[c, :k] = True
    return jnp.asarray(bank), jnp.asarray(mask)


def get_closest_rot_batch(
    pred_rots: jax.Array,
    gt_rots: jax.Array,
    sym_bank: jax.Array,
    sym_mask: jax.Array,
    labels: jax.Array,
) -> jax.Array:
    """Per-sample closest symmetric GT rotation, fully batched.

    For each sample pick gt_rot @ R_sym minimizing the geodesic distance to
    pred_rot over the sample's symmetry bank (m2m convention: gt·sym,
    reference pose_utils.py:490).

    Args:
      pred_rots, gt_rots: (B, 3, 3).
      sym_bank: (C, S, 3, 3); sym_mask: (C, S) bool valid entries.
      labels: (B,) int class ids.
    Returns: (B, 3, 3) closest GT rotations. Gradients do not flow through
      the argmin selection (matching the reference, which detaches).
    """
    syms = sym_bank[labels]          # (B, S, 3, 3)
    valid = sym_mask[labels]         # (B, S)
    gt_sym = jnp.einsum("bij,bsjk->bsik", gt_rots, syms, precision=jax.lax.Precision.HIGHEST)  # (B, S, 3, 3)
    # trace(pred^T gt_sym) is monotone in -geodesic distance
    tr = jnp.einsum("bij,bsij->bs", jax.lax.stop_gradient(pred_rots), gt_sym, precision=jax.lax.Precision.HIGHEST)
    tr = jnp.where(valid, tr, -jnp.inf)
    idx = jnp.argmax(tr, axis=-1)
    return jnp.take_along_axis(gt_sym, idx[:, None, None, None], axis=1)[:, 0]
