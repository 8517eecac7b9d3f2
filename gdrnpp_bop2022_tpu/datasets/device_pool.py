"""Device-resident frame pools with delta upload.

The TPU-native answer to the reference's N-process dataloader
(core/gdrn_modeling/datasets/data_loader.py:842-899): instead of having
host workers assemble and ship ~150 MB of full frames per batch, decoded
frames live in HBM across steps. Training redraws each image ~20x over a
run, so the steady state uploads only the few frames per batch that are
not already resident — the host pipeline's job collapses from
"decode + stack + ship everything" to "decode misses + ship indices",
which is what lets a 1-core host feed a >9 steps/s device
(VERDICT r3 next #2).

The batch-prep program (engine/batching.build_train_batch_online) already
gathers per-sample data from stacked arrays via img_idx/mask_idx, so a
pool drops in as "the stack is persistent and indices are slots".

Capacity is a knob (HBM budget): pools evict LRU — never slots used by
the batch currently being assembled.
"""

from __future__ import annotations

from collections import OrderedDict
from functools import partial
from typing import Callable, Dict, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


@jax.jit
def _scatter(pool: jax.Array, idx: jax.Array, vals: jax.Array) -> jax.Array:
    """pool.at[idx].set(vals), deliberately WITHOUT donation: every update
    produces a new buffer version (an HBM-bandwidth copy, a few ms), so
    batches that snapshotted the previous version (see FramePools.snapshot)
    keep reading consistent content while the prefetch thread races ahead.
    Donation here would delete the buffer under in-flight consumers — the
    copy only happens on upload, and uploads are rare once the pool is
    warm."""
    return pool.at[idx].set(vals)


def _pow2_pad(n: int, cap: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return min(p, cap)


class DevicePool:
    """One LRU pool of fixed-shape items in device memory.

    ensure(keys, fetch) returns int32 slots for `keys`, uploading any
    missing items via fetch(key) -> np.ndarray. Upload batches are padded
    to powers of two so only O(log capacity) scatter programs compile.
    """

    def __init__(self, capacity: int, item_shape: Tuple[int, ...],
                 dtype=jnp.uint8, device=None):
        self.capacity = int(capacity)
        self.item_shape = tuple(item_shape)
        self.buf = jnp.zeros((self.capacity,) + self.item_shape, dtype)
        if device is not None:
            self.buf = jax.device_put(self.buf, device)
        self._slot: "OrderedDict[object, int]" = OrderedDict()  # key->slot, LRU order
        self._free = list(range(self.capacity - 1, -1, -1))
        self.hits = 0
        self.misses = 0

    def __contains__(self, key) -> bool:
        return key in self._slot

    def ensure(self, keys: Sequence, fetch: Callable,
               protect: Sequence = ()) -> np.ndarray:
        """Return (len(keys),) int32 slot array; uploads misses.

        protect: extra keys whose slots must not be evicted — REQUIRED
        when one batch issues several ensure() calls against the same
        pool (visible + amodal masks share the mask pool): without it the
        second call may evict slots the first call just assigned, and the
        batch's snapshot would silently gather the wrong pixels."""
        in_batch = set(keys)
        protected = in_batch | set(protect)
        miss_keys = []
        for k in in_batch:
            if k in self._slot:
                self._slot.move_to_end(k)
                self.hits += 1
            else:
                miss_keys.append(k)
                self.misses += 1
        if miss_keys:
            slots = []
            for k in miss_keys:
                if self._free:
                    s = self._free.pop()
                else:
                    # evict the least-recently-used key that is neither in
                    # this batch nor protected by a sibling ensure() call
                    for old in self._slot:
                        if old not in protected:
                            s = self._slot.pop(old)
                            break
                    else:
                        raise RuntimeError(
                            f"DevicePool capacity {self.capacity} smaller "
                            f"than one batch's unique+protected keys")
                self._slot[k] = s
                slots.append(s)
            vals = np.stack([np.asarray(fetch(k)) for k in miss_keys])
            assert vals.shape[1:] == self.item_shape, (
                vals.shape, self.item_shape)
            n = len(miss_keys)
            pad = _pow2_pad(n, self.capacity)
            if pad > n:
                # repeat the last row; slot repeated too -> same value
                # written twice, harmless
                vals = np.concatenate(
                    [vals, np.repeat(vals[-1:], pad - n, axis=0)])
                slots = slots + [slots[-1]] * (pad - n)
            self.buf = _scatter(self.buf, jnp.asarray(slots, jnp.int32),
                                jnp.asarray(vals, self.buf.dtype))
        return np.asarray([self._slot[k] for k in keys], np.int32)

    @property
    def nbytes(self) -> int:
        return int(np.prod((self.capacity,) + self.item_shape)) * \
            self.buf.dtype.itemsize


class FramePools:
    """The pool set one GDRN training run needs: rgb frames, masks
    (visible + amodal share one pool keyed by file path), optional depth,
    optional background frames."""

    def __init__(self, im_h: int, im_w: int, rgb_frames: int = 512,
                 mask_frames: int = 1024, depth_frames: int = 0,
                 bg_frames: int = 256, device=None):
        self.rgb = DevicePool(rgb_frames, (im_h, im_w, 3), jnp.uint8,
                              device)
        self.mask = DevicePool(mask_frames, (im_h, im_w), jnp.uint8, device)
        self.depth = (DevicePool(depth_frames, (im_h, im_w), jnp.float32,
                                 device)
                      if depth_frames else None)
        self.bg = (DevicePool(bg_frames, (im_h, im_w, 3), jnp.uint8, device)
                   if bg_frames else None)

    @property
    def nbytes(self) -> int:
        total = self.rgb.nbytes + self.mask.nbytes
        if self.depth is not None:
            total += self.depth.nbytes
        if self.bg is not None:
            total += self.bg.nbytes
        return total

    def snapshot(self) -> Dict[str, jax.Array]:
        """The current buffer versions, taken AFTER a batch's ensure()
        calls. A batch must gather from its snapshot, not from the live
        pool attributes: the prefetch thread keeps uploading for later
        batches, and each upload produces a new buffer version."""
        out = {"rgb": self.rgb.buf, "mask": self.mask.buf}
        if self.depth is not None:
            out["depth"] = self.depth.buf
        if self.bg is not None:
            out["bg"] = self.bg.buf
        return out

    def stats(self) -> Dict[str, int]:
        out = {"rgb_hits": self.rgb.hits, "rgb_misses": self.rgb.misses,
               "mask_hits": self.mask.hits, "mask_misses": self.mask.misses}
        if self.depth is not None:
            out.update(depth_hits=self.depth.hits,
                       depth_misses=self.depth.misses)
        if self.bg is not None:
            out.update(bg_hits=self.bg.hits, bg_misses=self.bg.misses)
        return out
