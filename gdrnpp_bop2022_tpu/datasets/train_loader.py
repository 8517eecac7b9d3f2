"""Training data loader: sampled instance records -> host arrays for the
device batch-prep program.

Replaces build_gdrn_train_loader + read_data_train's CPU worker pipeline
(reference: data_loader.py:318-645, :842-899): the host only loads images/
masks and applies DZI jitter; crops, color aug, online GT rendering and
target building all happen in the jitted device program
(engine/batching.py, ops/color_aug.py). A background thread prefetches the
next host batch while the device computes (the reference's worker-pool
role, without the pickle/shared-memory machinery).

Dual-loader sampling ratio (TRAIN2_RATIO, engine.py:181-188,272-275) is
supported by mixing two record lists at sample time.
"""

from __future__ import annotations

import threading
import queue as queue_mod
from collections import OrderedDict
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Sequence

import numpy as np

from .bop_data import InstanceRecord, load_depth, load_image, load_mask
from ..engine.batching import dzi_jitter_host


class GdrnTrainLoader:
    """Infinite sampled loader yielding host batch dicts."""

    def __init__(
        self,
        records: Sequence[InstanceRecord],
        batch_size: int,
        im_width: int,
        im_height: int,
        records2: Optional[Sequence[InstanceRecord]] = None,
        ratio2: float = 0.0,
        dzi_pad_scale: float = 1.5,
        dzi_scale_ratio: float = 0.25,
        dzi_shift_ratio: float = 0.25,
        dzi_type: str = "uniform",
        bbox_type: str = "AMODAL_CLIP",
        seed: int = 0,
        prefetch: int = 2,
        bg_paths: Optional[Sequence[str]] = None,
        truncate_fg: bool = False,
        with_depth: bool = False,
        sampler: str = "random",       # random | repeat_factor
        repeat_thresh: float = 0.01,
        num_workers: int = -1,         # -1: auto = os.cpu_count()
        num_builders: int = 1,
        cache_gb: float = 0.0,
        pools=None,                    # datasets.device_pool.FramePools:
                                       # device-resident frame pools; the
                                       # loader emits slot indices instead
                                       # of stacked pixel arrays
    ):
        """bg_paths: image files for background replacement (reference
        _bg_img_paths from VOC/COCO/SUN, base_data_loader.py:339-460).
        Backgrounds are STREAMED: the prefetch worker loads a fresh random
        background per sample per batch from the full list (reference
        semantics — one random path per item), aspect-preserving crop+resize
        (get_bg_image). truncate_fg: randomly truncate the foreground mask
        before replacement (trunc_mask, base_data_loader.py:454-478).

        Parallelism (reference: N dataloader worker processes,
        data_loader.py:842-899): num_workers threads decode the batch's
        samples concurrently (cv2 png/jpg decode releases the GIL; all RNG
        decisions are drawn sequentially in the builder BEFORE the parallel
        map, so batch content is deterministic in `seed` regardless of
        num_workers). num_builders > 1 additionally overlaps whole-batch
        builds — each builder owns a derived RNG stream, so batch contents
        stay reproducible per-builder but queue ORDER may interleave.

        cache_gb > 0 keeps decoded per-record sample dicts (rgb + masks +
        depth, post-resize) in a host-RAM LRU keyed by rgb path. TPU hosts
        carry ~100+ GB of RAM and training redraws each image ~20x over a
        run, so a warm cache removes nearly all png decode from the steady
        state — the TPU-native substitute for the reference's
        pickle/shared-memory dataset serialization (base_data_loader.py:
        73-83, which caches ENCODED bytes; we cache decoded pixels)."""
        assert len(records) > 0
        self.pools = pools
        if pools is not None:
            # pool slot assignment is stateful; one builder keeps it
            # race-free (decode parallelism still available via num_workers)
            assert num_builders <= 1, "pool mode requires num_builders=1"
        self.records = list(records)
        self._bg_paths = list(bg_paths) if bg_paths else None
        self.truncate_fg = truncate_fg
        self.records2 = list(records2) if records2 else None
        self.ratio2 = ratio2
        self.with_depth = with_depth
        self.batch_size = batch_size
        self.im_w, self.im_h = im_width, im_height
        self.dzi = dict(pad_scale=dzi_pad_scale, scale_ratio=dzi_scale_ratio,
                        shift_ratio=dzi_shift_ratio, dzi_type=dzi_type)
        self.bbox_type = bbox_type
        self.rng = np.random.RandomState(seed)
        # class-imbalance oversampling (reference
        # RepeatFactorTrainingSampler, my_distributed_sampler.py:57 / LVIS
        # appendix B.2): r(c) = max(1, sqrt(thresh / freq(c))), sampling
        # probability proportional to the record's class repeat factor
        self._probs = None
        if sampler == "repeat_factor":
            labels = np.array([r.label for r in self.records])
            freq = np.bincount(labels) / max(len(labels), 1)
            r_cls = np.maximum(1.0, np.sqrt(repeat_thresh
                                            / np.maximum(freq, 1e-12)))
            w = r_cls[labels]
            self._probs = w / w.sum()
        elif sampler != "random":
            raise ValueError(f"unknown sampler: {sampler}")
        if num_workers < 0:
            # auto: one decode thread per core. On a 1-core host this
            # disables the pool entirely — measured 4x SLOWER than serial
            # there (GIL + scheduling overhead with nothing to overlap)
            import os as _os
            num_workers = _os.cpu_count() or 1
        self._pool = (ThreadPoolExecutor(max_workers=num_workers)
                      if num_workers > 1 else None)
        self._cache: "OrderedDict[str, dict]" = OrderedDict()
        self._cache_budget = int(cache_gb * (1 << 30))
        self._cache_bytes = 0
        self._cache_lock = threading.Lock()
        self.cache_hits = 0
        self.cache_misses = 0
        self._queue: queue_mod.Queue = queue_mod.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._threads = []
        for b in range(max(num_builders, 1)):
            rng = self.rng if b == 0 else np.random.RandomState(seed + 7919 * b)
            th = threading.Thread(target=self._worker, args=(rng,),
                                  daemon=True)
            th.start()
            self._threads.append(th)

    def _pick_record(self, rng) -> InstanceRecord:
        if self.records2 and rng.uniform() < self.ratio2:
            return self.records2[rng.randint(len(self.records2))]
        if self._probs is not None:
            return self.records[rng.choice(len(self.records), p=self._probs)]
        return self.records[rng.randint(len(self.records))]

    def _select_bbox(self, rec: InstanceRecord) -> np.ndarray:
        bt = self.bbox_type.upper()
        if bt == "VISIB" or rec.bbox_obj is None:
            b = rec.bbox_visib
        elif bt == "AMODAL":
            b = rec.bbox_obj
        elif bt == "AMODAL_CLIP":
            x1, y1, x2, y2 = rec.bbox_obj
            b = np.array([max(x1, 0), max(y1, 0),
                          min(x2, self.im_w), min(y2, self.im_h)], np.float32)
        else:
            raise ValueError(self.bbox_type)
        if b is None:
            b = np.array([0, 0, self.im_w, self.im_h], np.float32)
        return np.asarray(b, np.float32)

    def _cached(self, key: str, fn):
        """Host-RAM LRU for decoded arrays (returned arrays are shared —
        treat as read-only; every consumer copies via np.stack)."""
        if self._cache_budget <= 0:
            return fn()
        with self._cache_lock:
            if key in self._cache:
                self._cache.move_to_end(key)
                self.cache_hits += 1
                return self._cache[key]
        val = fn()
        # an accidental in-place write by a future consumer must raise, not
        # silently poison every later batch drawing the same file
        val.flags.writeable = False
        with self._cache_lock:
            self.cache_misses += 1
            if key not in self._cache:
                self._cache[key] = val
                self._cache_bytes += val.nbytes
                while (self._cache_bytes > self._cache_budget
                       and len(self._cache) > 1):
                    _, old = self._cache.popitem(last=False)
                    self._cache_bytes -= old.nbytes
        return val

    # -- per-file fetchers (shared by the stacked and pool paths) ---------
    def _fetch_rgb(self, path: str) -> np.ndarray:
        import cv2

        def fn():
            img = load_image(path)
            if img.shape[0] != self.im_h or img.shape[1] != self.im_w:
                img = cv2.resize(img, (self.im_w, self.im_h))
            return img
        return self._cached(path, fn)

    def _fetch_depth(self, r: InstanceRecord) -> np.ndarray:
        """Depth in meters (reference data_loader.py:345-349)."""
        import cv2

        def fn():
            if r.depth_path:
                d = load_depth(r.depth_path, r.depth_scale, 1000.0)
            else:
                d = np.zeros((self.im_h, self.im_w), np.float32)
            if d.shape != (self.im_h, self.im_w):
                d = cv2.resize(d, (self.im_w, self.im_h),
                               interpolation=cv2.INTER_NEAREST)
            return d
        return self._cached(r.depth_path or f"zd:{r.rgb_path}", fn)

    def _fetch_mask(self, path: Optional[str]) -> np.ndarray:
        import cv2

        def fn():
            m = (load_mask(path) if path
                 else np.ones((self.im_h, self.im_w), np.float32))
            if m.shape != (self.im_h, self.im_w):
                m = cv2.resize(m, (self.im_w, self.im_h),
                               interpolation=cv2.INTER_NEAREST)
            return m
        return self._cached(path or f"ones:{self.im_w}x{self.im_h}", fn)

    def _fetch_bg(self, path: str) -> np.ndarray:
        return self._cached(f"bg:{path}", lambda: self._load_bg(path))

    def _load_sample(self, r: InstanceRecord, bg_path: Optional[str]) -> dict:
        """Pure IO/decode for one sample — no RNG; safe to run in parallel
        worker threads (cv2 decode/resize release the GIL). Each FILE is
        cached independently so instances sharing an rgb frame share one
        decoded copy."""
        out = {"image": self._fetch_rgb(r.rgb_path)}
        if self.with_depth:
            out["depth"] = self._fetch_depth(r)
        out["mask_visib"] = self._fetch_mask(r.mask_visib_path)
        out["mask_full"] = (self._fetch_mask(r.mask_full_path)
                            if r.mask_full_path else out["mask_visib"])
        if bg_path is not None:
            out["bg"] = self._fetch_bg(bg_path)
        return out

    def _build_batch(self, rng) -> dict:
        B = self.batch_size
        # --- sequential RNG phase: every random decision happens here, so
        # batch content is a pure function of the rng stream no matter how
        # many decode workers run below -------------------------------------
        recs = [self._pick_record(rng) for _ in range(B)]
        bg_sel = (None if self._bg_paths is None else
                  [self._bg_paths[rng.randint(len(self._bg_paths))]
                   for _ in range(B)])
        trunc_draws = (rng.uniform(size=(B, 2))
                       if (self._bg_paths is not None and self.truncate_fg)
                       else None)
        if self.pools is not None:
            return self._finish_pool_batch(rng, recs, bg_sel, trunc_draws)

        # --- parallel IO/decode phase ---------------------------------------
        if self._pool is not None:
            samples = list(self._pool.map(
                self._load_sample, recs,
                bg_sel if bg_sel is not None else [None] * B))
        else:
            samples = [self._load_sample(r, b) for r, b in
                       zip(recs, bg_sel if bg_sel is not None else [None] * B)]

        boxes = np.stack([self._select_bbox(r) for r in recs])
        centers, scales = dzi_jitter_host(
            rng, boxes, self.im_w, self.im_h,
            pad_scale=self.dzi["pad_scale"],
            scale_ratio=self.dzi["scale_ratio"],
            shift_ratio=self.dzi["shift_ratio"],
            dzi_type=self.dzi["dzi_type"])
        mvs = [s["mask_visib"] for s in samples]
        out = {
            "images": np.stack([s["image"] for s in samples]),
            "img_idx": np.arange(B, dtype=np.int32),
            "centers": centers,
            "scales": scales,
            "bboxes_xyxy": boxes,
            "Ks": np.stack([r.K for r in recs]).astype(np.float32),
            "labels": np.asarray([r.label for r in recs], np.int32),
            "gt_rots": np.stack([r.pose[:, :3] for r in recs]).astype(np.float32),
            "gt_transes": np.stack([r.pose[:, 3] for r in recs]).astype(np.float32),
            "mask_visib": np.stack(mvs),
            "mask_full": np.stack([s["mask_full"] for s in samples]),
            "mask_idx": np.arange(B, dtype=np.int32),
        }
        if self.with_depth:
            out["depths"] = np.stack([s["depth"] for s in samples])
        if self._bg_paths is not None:
            out["bg_images"] = np.stack([s["bg"] for s in samples])
            if self.truncate_fg:
                out["fg_masks"] = np.stack(
                    [self._trunc_mask(m, d) for m, d in
                     zip(mvs, trunc_draws)])
            else:
                out["fg_masks"] = out["mask_visib"]
        return out

    def _finish_pool_batch(self, rng, recs, bg_sel, trunc_draws) -> dict:
        """Pool mode: decode only pool MISSES and emit device slot indices
        + small per-sample arrays — no stacked pixel payload. Foreground
        truncation moves on-device (engine.batching.trunc_mask_batch with
        the same pre-drawn uniforms). Batch CONTENT stays a pure function
        of the rng stream; only slot numbers depend on pool history."""
        pools = self.pools
        # parallel pre-decode of rgb/depth pool misses into the host LRU
        # (ensure()'s fetch then hits the cache) — multi-core hosts overlap
        # the png decodes exactly like the stacked path does
        if self._pool is not None:
            miss_rgb = [p for p in {r.rgb_path for r in recs}
                        if p not in pools.rgb]
            if miss_rgb:
                list(self._pool.map(self._fetch_rgb, miss_rgb))
            if self.with_depth and pools.depth is not None:
                miss_d = {(r.depth_path or f"zd:{r.rgb_path}"): r
                          for r in recs}
                miss_d = [r for k, r in miss_d.items()
                          if k not in pools.depth]
                if miss_d:
                    list(self._pool.map(self._fetch_depth, miss_d))
        img_idx = pools.rgb.ensure([r.rgb_path for r in recs],
                                   self._fetch_rgb)

        def fetch_mask_u8(path):
            m = self._fetch_mask(None if path.startswith("ones:") else path)
            return (m > 0.5).astype(np.uint8)

        mv_keys = [r.mask_visib_path or f"ones:{self.im_w}x{self.im_h}"
                   for r in recs]
        mf_keys = [r.mask_full_path or k for r, k in zip(recs, mv_keys)]
        # visible + amodal masks share one pool: each ensure must protect
        # the other's keys or the second call can evict slots the first
        # just assigned (the snapshot would gather the wrong masks)
        mask_idx = pools.mask.ensure(mv_keys, fetch_mask_u8,
                                     protect=mf_keys)
        mask_full_idx = pools.mask.ensure(mf_keys, fetch_mask_u8,
                                          protect=mv_keys)

        boxes = np.stack([self._select_bbox(r) for r in recs])
        centers, scales = dzi_jitter_host(
            rng, boxes, self.im_w, self.im_h,
            pad_scale=self.dzi["pad_scale"],
            scale_ratio=self.dzi["scale_ratio"],
            shift_ratio=self.dzi["shift_ratio"],
            dzi_type=self.dzi["dzi_type"])
        out = {
            "pool_mode": True,
            "img_idx": img_idx,
            "mask_idx": mask_idx,
            "mask_full_idx": mask_full_idx,
            "centers": centers,
            "scales": scales,
            "bboxes_xyxy": boxes,
            "Ks": np.stack([r.K for r in recs]).astype(np.float32),
            "labels": np.asarray([r.label for r in recs], np.int32),
            "gt_rots": np.stack([r.pose[:, :3]
                                 for r in recs]).astype(np.float32),
            "gt_transes": np.stack([r.pose[:, 3]
                                    for r in recs]).astype(np.float32),
        }
        if self.with_depth:
            assert pools.depth is not None, \
                "with_depth pool mode needs depth_frames > 0"
            dkeys = [r.depth_path or f"zd:{r.rgb_path}" for r in recs]
            by_dkey = {k: r for k, r in zip(dkeys, recs)}
            out["depth_idx"] = pools.depth.ensure(
                dkeys, lambda k: self._fetch_depth(by_dkey[k]))
        if self._bg_paths is not None:
            assert pools.bg is not None, "bg pool mode needs bg_frames > 0"
            out["bg_idx"] = pools.bg.ensure(bg_sel, self._fetch_bg)
            if self.truncate_fg:
                out["trunc_draws"] = trunc_draws.astype(np.float32)
        # snapshot AFTER all ensures: the consumer gathers from these exact
        # buffer versions — the builder thread keeps uploading for later
        # batches and each upload makes a new version
        out["pool_bufs"] = pools.snapshot()
        return out

    def _load_bg(self, path: str) -> np.ndarray:
        """One background, aspect-preserving center-crop + resize
        (reference get_bg_image keeps aspect, base_data_loader.py:480-520)."""
        import cv2
        try:
            img = load_image(path)
        except FileNotFoundError:
            return np.zeros((self.im_h, self.im_w, 3), np.uint8)
        h, w = img.shape[:2]
        target_ar = self.im_w / self.im_h
        if w / h > target_ar:     # too wide: crop width
            cw = max(int(h * target_ar), 1)
            x0 = (w - cw) // 2
            img = img[:, x0:x0 + cw]
        else:                     # too tall: crop height
            ch = max(int(w / target_ar), 1)
            y0 = (h - ch) // 2
            img = img[y0:y0 + ch]
        return cv2.resize(img, (self.im_w, self.im_h))

    def _trunc_mask(self, mask: np.ndarray, draws: np.ndarray) -> np.ndarray:
        """Randomly block one side of the foreground bbox (reference
        trunc_mask, base_data_loader.py:454-478). draws: two pre-drawn
        uniforms (branch selector, cut position) so the data-dependent cut
        stays a pure function of (mask, draws)."""
        m = mask.astype(bool).copy()
        nz = np.nonzero(m)
        if len(nz[0]) == 0:
            return m.astype(np.float32)
        x1, y1 = np.min(nz[0]), np.min(nz[1])
        x2, y2 = np.max(nz[0]), np.max(nz[1])
        c_h = 0.5 * (x1 + x2)
        c_w = 0.5 * (y1 + y2)
        rnd, u = float(draws[0]), float(draws[1])
        if rnd < 0.2:
            m[:int(x1 + u * (c_h - x1)), :] = False
        elif rnd < 0.4:
            m[int(c_h + u * (x2 - c_h)):, :] = False
        elif rnd < 0.6:
            m[:, :int(y1 + u * (c_w - y1))] = False
        elif rnd < 0.8:
            m[:, int(c_w + u * (y2 - c_w)):] = False
        return m.astype(np.float32)

    def _worker(self, rng):
        while not self._stop.is_set():
            try:
                batch = self._build_batch(rng)
            except Exception as e:  # surface loader errors to the consumer
                self._queue.put(e)
                return
            self._queue.put(batch)

    def __iter__(self):
        return self

    def __next__(self) -> dict:
        item = self._queue.get()
        if isinstance(item, Exception):
            raise item
        return item

    def close(self):
        self._stop.set()
        # drain so builders blocked on queue.put can observe the stop flag,
        # then join so no thread is still reading files during teardown
        try:
            while True:
                self._queue.get_nowait()
        except queue_mod.Empty:
            pass
        for th in self._threads:
            while th.is_alive():
                try:
                    while True:
                        self._queue.get_nowait()
                except queue_mod.Empty:
                    pass
                th.join(timeout=0.2)
        if self._pool is not None:
            self._pool.shutdown(wait=False)
