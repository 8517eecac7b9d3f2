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
    ):
        """bg_paths: image files for background replacement (reference
        _bg_img_paths from VOC/COCO/SUN, base_data_loader.py:339-460).
        Backgrounds are STREAMED: the prefetch worker loads a fresh random
        background per sample per batch from the full list (reference
        semantics — one random path per item), aspect-preserving crop+resize
        (get_bg_image). truncate_fg: randomly truncate the foreground mask
        before replacement (trunc_mask, base_data_loader.py:454-478)."""
        assert len(records) > 0
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
        self._queue: queue_mod.Queue = queue_mod.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _pick_record(self) -> InstanceRecord:
        if self.records2 and self.rng.uniform() < self.ratio2:
            return self.records2[self.rng.randint(len(self.records2))]
        if self._probs is not None:
            return self.records[self.rng.choice(len(self.records),
                                                p=self._probs)]
        return self.records[self.rng.randint(len(self.records))]

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

    def _build_batch(self) -> dict:
        B = self.batch_size
        recs = [self._pick_record() for _ in range(B)]
        images, mvs, mfs, depths = [], [], [], []
        boxes, labels, rots, transes, Ks = [], [], [], [], []
        for r in recs:
            img = load_image(r.rgb_path)
            if img.shape[0] != self.im_h or img.shape[1] != self.im_w:
                import cv2
                img = cv2.resize(img, (self.im_w, self.im_h))
            images.append(img)
            if self.with_depth:
                # depth in meters (reference data_loader.py:345-349)
                if r.depth_path:
                    d = load_depth(r.depth_path, r.depth_scale, 1000.0)
                else:
                    d = np.zeros((self.im_h, self.im_w), np.float32)
                if d.shape != (self.im_h, self.im_w):
                    import cv2
                    d = cv2.resize(d, (self.im_w, self.im_h),
                                   interpolation=cv2.INTER_NEAREST)
                depths.append(d)
            mv = (load_mask(r.mask_visib_path) if r.mask_visib_path
                  else np.ones((self.im_h, self.im_w), np.float32))
            mf = (load_mask(r.mask_full_path) if r.mask_full_path else mv)
            if mv.shape != (self.im_h, self.im_w):
                import cv2
                mv = cv2.resize(mv, (self.im_w, self.im_h),
                                interpolation=cv2.INTER_NEAREST)
                mf = cv2.resize(mf, (self.im_w, self.im_h),
                                interpolation=cv2.INTER_NEAREST)
            mvs.append(mv)
            mfs.append(mf)
            boxes.append(self._select_bbox(r))
            labels.append(r.label)
            rots.append(r.pose[:, :3])
            transes.append(r.pose[:, 3])
            Ks.append(r.K)
        boxes = np.stack(boxes)
        centers, scales = dzi_jitter_host(
            self.rng, boxes, self.im_w, self.im_h,
            pad_scale=self.dzi["pad_scale"],
            scale_ratio=self.dzi["scale_ratio"],
            shift_ratio=self.dzi["shift_ratio"],
            dzi_type=self.dzi["dzi_type"])
        out = {
            "images": np.stack(images),
            "img_idx": np.arange(B, dtype=np.int32),
            "centers": centers,
            "scales": scales,
            "bboxes_xyxy": boxes,
            "Ks": np.stack(Ks).astype(np.float32),
            "labels": np.asarray(labels, np.int32),
            "gt_rots": np.stack(rots).astype(np.float32),
            "gt_transes": np.stack(transes).astype(np.float32),
            "mask_visib": np.stack(mvs),
            "mask_full": np.stack(mfs),
            "mask_idx": np.arange(B, dtype=np.int32),
        }
        if self.with_depth:
            out["depths"] = np.stack(depths)
        if self._bg_paths is not None:
            out["bg_images"] = np.stack(
                [self._load_bg() for _ in range(B)])
            if self.truncate_fg:
                out["fg_masks"] = np.stack(
                    [self._trunc_mask(m) for m in mvs])
            else:
                out["fg_masks"] = out["mask_visib"]
        return out

    def _load_bg(self) -> np.ndarray:
        """One random background, aspect-preserving center-crop + resize
        (reference get_bg_image keeps aspect, base_data_loader.py:480-520)."""
        import cv2
        path = self._bg_paths[self.rng.randint(len(self._bg_paths))]
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

    def _trunc_mask(self, mask: np.ndarray) -> np.ndarray:
        """Randomly block one side of the foreground bbox (reference
        trunc_mask, base_data_loader.py:454-478)."""
        m = mask.astype(bool).copy()
        nz = np.nonzero(m)
        if len(nz[0]) == 0:
            return m.astype(np.float32)
        x1, y1 = np.min(nz[0]), np.min(nz[1])
        x2, y2 = np.max(nz[0]), np.max(nz[1])
        c_h = 0.5 * (x1 + x2)
        c_w = 0.5 * (y1 + y2)
        rnd = self.rng.uniform()
        if rnd < 0.2:
            m[:int(self.rng.uniform(x1, c_h)), :] = False
        elif rnd < 0.4:
            m[int(self.rng.uniform(c_h, x2)):, :] = False
        elif rnd < 0.6:
            m[:, :int(self.rng.uniform(y1, c_w))] = False
        elif rnd < 0.8:
            m[:, int(self.rng.uniform(c_w, y2)):] = False
        return m.astype(np.float32)

    def _worker(self):
        while not self._stop.is_set():
            try:
                batch = self._build_batch()
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
        try:
            while True:
                self._queue.get_nowait()
        except queue_mod.Empty:
            pass
