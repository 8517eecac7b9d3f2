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

from .bop_data import InstanceRecord, load_image, load_mask
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
        bg_pool_size: int = 64,
    ):
        """bg_paths: image files for background replacement (reference
        _bg_img_paths from VOC/COCO/SUN, base_data_loader.py:339-460); a
        random pool is kept in memory and shipped with each batch."""
        assert len(records) > 0
        self.records = list(records)
        self._bg_pool = None
        if bg_paths:
            import cv2
            rs = np.random.RandomState(seed + 7)
            picks = rs.choice(len(bg_paths), min(bg_pool_size, len(bg_paths)),
                              replace=False)
            pool = []
            for i in picks:
                img = load_image(bg_paths[int(i)])
                pool.append(cv2.resize(img, (im_width, im_height)))
            self._bg_pool = np.stack(pool)
        self.records2 = list(records2) if records2 else None
        self.ratio2 = ratio2
        self.batch_size = batch_size
        self.im_w, self.im_h = im_width, im_height
        self.dzi = dict(pad_scale=dzi_pad_scale, scale_ratio=dzi_scale_ratio,
                        shift_ratio=dzi_shift_ratio, dzi_type=dzi_type)
        self.bbox_type = bbox_type
        self.rng = np.random.RandomState(seed)
        self._queue: queue_mod.Queue = queue_mod.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _pick_record(self) -> InstanceRecord:
        if self.records2 and self.rng.uniform() < self.ratio2:
            return self.records2[self.rng.randint(len(self.records2))]
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
        images, mvs, mfs = [], [], []
        boxes, labels, rots, transes, Ks = [], [], [], [], []
        for r in recs:
            img = load_image(r.rgb_path)
            if img.shape[0] != self.im_h or img.shape[1] != self.im_w:
                import cv2
                img = cv2.resize(img, (self.im_w, self.im_h))
            images.append(img)
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
        if self._bg_pool is not None:
            out["bg_images"] = self._bg_pool
        return out

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
