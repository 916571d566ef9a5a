"""Batch loaders: host-side assembly of fixed-shape device batches.

Replaces the reference's torch DataLoader + GroupSampler + DataContainer
collate/scatter stack (mmdet/datasets/builder.py:76-147, samplers/
group_sampler.py). Design:

* Batches are ORIENTATION-HOMOGENEOUS: the reference's GroupSampler
  batches same-aspect images so the per-batch pad converges to one of two
  shapes; here that becomes two static canvases (landscape / portrait)
  and each batch is tagged with its orientation so the driver dispatches
  to the matching compiled program.
* TrainLoader: seeded shuffle of whole same-orientation batches,
  dataset-repeat multiplier (RepeatDataset semantics), GT padded to
  max_gt, per-image anchor validity from the /32 pad extent.
* EvalLoader: sequential sweep per orientation group; the tail batch is
  padded to full size and flagged invalid; batches carry their source
  indices so pool scores scatter back to pool order.
* Both prefetch batches on a background thread (double buffering against
  device step time), the host analog of the reference's worker pool.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np

from ..engine.batch import Batch, EvalBatch
from ..ops.anchors import AnchorGenerator, anchor_valid_flags
from ..utils.config import RetinaNetConfig
from .pipeline import PipelineConfig, load_image, prepare_sample

ORIENTATIONS = ("landscape", "portrait")

_SHARED_POOL = None


def _shared_pool(num_workers: int):
    """One process-wide decode pool: loaders are created per AL cycle and
    a per-instance executor would leak threads across cycles."""
    global _SHARED_POOL
    if _SHARED_POOL is None:
        _SHARED_POOL = ThreadPoolExecutor(max(num_workers, 1))
    return _SHARED_POOL


class _Prefetcher:
    """Run a batch-producing generator on a background thread."""

    def __init__(self, gen_fn, depth: int = 3):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._thread = threading.Thread(target=self._worker, args=(gen_fn,), daemon=True)
        self._thread.start()

    def _worker(self, gen_fn):
        try:
            for item in gen_fn():
                self._q.put(item)
        except BaseException as e:  # propagate into the consumer
            self._q.put(e)
        self._q.put(StopIteration)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is StopIteration:
            raise StopIteration
        if isinstance(item, BaseException):
            raise item
        return item


def _pad_gt(samples, max_gt):
    b = len(samples)
    boxes = np.zeros((b, max_gt, 4), np.float32)
    labels = np.zeros((b, max_gt), np.int32)
    valid = np.zeros((b, max_gt), bool)
    for i, s in enumerate(samples):
        n = min(len(s["gt_labels"]), max_gt)
        boxes[i, :n] = s["gt_bboxes"][:n]
        labels[i, :n] = s["gt_labels"][:n]
        valid[i, :n] = True
    return boxes, labels, valid


def transform_proposals(props: np.ndarray, sample: dict) -> np.ndarray:
    """Run ORIGINAL-coordinate proposals through the sample's geometry
    (the same scale/clip/flip applied to gt boxes in prepare_sample —
    the reference transforms loaded proposals alongside bboxes,
    datasets/pipelines/transforms.py Resize/RandomFlip)."""
    props = np.asarray(props, np.float32).reshape(-1, 4) * sample["scale_factor"]
    new_h, new_w = (int(sample["img_shape"][0]), int(sample["img_shape"][1]))
    props[:, 0::2] = np.clip(props[:, 0::2], 0, new_w)
    props[:, 1::2] = np.clip(props[:, 1::2], 0, new_h)
    if sample["flipped"]:
        x1 = props[:, 0].copy()
        props[:, 0] = new_w - props[:, 2]
        props[:, 2] = new_w - x1
    return props


def _pad_proposals(prop_list, num_slots: int):
    b = len(prop_list)
    out = np.zeros((b, num_slots, 4), np.float32)
    valid = np.zeros((b, num_slots), bool)
    for i, p in enumerate(prop_list):
        n = min(len(p), num_slots)
        out[i, :n] = p[:n]
        valid[i, :n] = True
    return out, valid


def _orientation_of(dataset, idx: int) -> str:
    return "landscape" if dataset.aspect_flag(int(idx)) else "portrait"


class TrainLoader:
    """Yields (orientation, Batch) pairs."""

    def __init__(
        self,
        dataset,
        indices: Sequence[int],
        model_cfg: RetinaNetConfig,
        pipeline: PipelineConfig,
        batch_size: int,
        repeat: int = 1,
        seed: int = 20,
        prefetch: bool = True,
        augment_fn=None,
        num_workers: int = 4,
        with_masks: bool = False,
        proposal_source=None,
    ):
        """augment_fn(img, ann, rng) -> (img, ann): pre-resize train-time
        augmentations (the SSD PhotoMetric/Expand/MinIoUCrop chain).
        num_workers: decode/resize thread pool size (cv2 releases the
        GIL; this is the host analog of the reference's worker
        processes, datasets/builder.py:104-147).
        with_masks: yield engine.mask_rcnn.MaskBatch with per-gt
        box-aligned [R, R] rasters (R = cfg.gt_mask_raster). The rasters
        are built from the ann's ORIGINAL-coordinate polygons — the
        box-aligned frame is invariant under the pipeline's axis-aligned
        resize, so only the horizontal flip needs mirroring.
        proposal_source: callable(int dataset_idx) -> [P, 4] float32
        proposals in ORIGINAL image coordinates (the reference's
        proposal_file .pkls, datasets/custom.py:181); when given, yields
        engine.rpn_only.ProposalBatch with the proposals run through the
        same resize/clip/flip as the gt boxes, padded/truncated to
        model_cfg.num_proposals slots (Fast R-CNN)."""
        self.dataset = dataset
        self.indices = np.asarray(indices)
        self.cfg = model_cfg
        self.pipeline = pipeline
        self.batch_size = batch_size
        self.repeat = repeat
        self.rng = np.random.RandomState(seed)
        self.prefetch = prefetch
        self.augment_fn = augment_fn
        self.num_workers = num_workers
        self.with_masks = with_masks
        self.proposal_source = proposal_source
        self._pool = _shared_pool(num_workers) if num_workers > 0 else None
        self._gen = model_cfg.build_anchor_generator()

    def __len__(self):
        n = 0
        for o in ORIENTATIONS:
            k = sum(1 for i in np.repeat(self.indices, self.repeat)
                    if _orientation_of(self.dataset, i) == o)
            n += (k + self.batch_size - 1) // self.batch_size if k else 0
        return n

    def _epoch_batches(self):
        idx = np.repeat(self.indices, self.repeat)
        groups = {o: [] for o in ORIENTATIONS}
        for i in idx:
            groups[_orientation_of(self.dataset, i)].append(i)
        batches = []
        for o, grp in groups.items():
            grp = np.asarray(grp)
            self.rng.shuffle(grp)
            for i in range(0, len(grp), self.batch_size):
                batches.append((o, grp[i:i + self.batch_size]))
        order = self.rng.permutation(len(batches))
        return [batches[i] for i in order]

    def _make_batch(self, orientation: str, batch_idx: np.ndarray) -> Batch:
        # deterministic per-sample seeds drawn in order, then parallel prep
        seeds = [int(self.rng.randint(0, 2 ** 31 - 1)) for _ in batch_idx]

        def prep(i, seed):
            r = np.random.RandomState(seed)
            img = load_image(self.dataset.img_path(int(i)))
            ann = self.dataset.get_ann_info(int(i))
            if self.augment_fn is not None:
                img, ann = self.augment_fn(img, ann, r)
            sample = prepare_sample(img, ann, self.pipeline, rng=r)
            if self.with_masks:
                from ..engine.mask_rcnn import rasterize_gt_masks

                polys = ann.get("masks") or [[] for _ in ann["bboxes"]]
                rast = rasterize_gt_masks(polys, ann["bboxes"],
                                          self.cfg.max_gt,
                                          self.cfg.gt_mask_raster)
                if sample["flipped"]:
                    rast = rast[:, :, ::-1].copy()
                sample["gt_rasters"] = rast
            if self.proposal_source is not None:
                sample["proposals"] = transform_proposals(
                    self.proposal_source(int(i)), sample)
            return sample

        if self._pool is not None:
            samples = list(self._pool.map(prep, batch_idx, seeds))
        else:
            samples = [prep(i, s) for i, s in zip(batch_idx, seeds)]
        while len(samples) < self.batch_size:  # short tail: repeat to keep shape
            samples.append(samples[len(samples) % max(1, len(batch_idx))])
        images = np.stack([s["image"] for s in samples])
        boxes, labels, valid = _pad_gt(samples, self.cfg.max_gt)
        pad_shapes = np.stack([s["pad_shape"] for s in samples])
        sizes = self.cfg.for_orientation(orientation).featmap_sizes()
        av = anchor_valid_flags(self._gen, sizes, pad_shapes)
        shapes = np.stack([s["img_shape"] for s in samples])
        if self.with_masks:
            from ..engine.mask_rcnn import MaskBatch

            rasters = np.stack([s["gt_rasters"] for s in samples])
            return MaskBatch(images, boxes, labels, valid, av, shapes, rasters)
        if self.proposal_source is not None:
            from ..engine.rpn_only import ProposalBatch

            props, pvalid = _pad_proposals(
                [s["proposals"] for s in samples], self.cfg.num_proposals)
            return ProposalBatch(images, boxes, labels, valid, shapes,
                                 props, pvalid)
        return Batch(images, boxes, labels, valid, av, shapes)

    def burn_epochs(self, n: int) -> None:
        """Consume exactly n epochs of RNG draws without decoding any
        image: replays the shuffle + per-sample seed stream so a
        mid-cycle resume sees the identical remaining batch sequence."""
        for _ in range(n):
            for _, bi in self._epoch_batches():
                for _ in bi:
                    self.rng.randint(0, 2 ** 31 - 1)

    def __iter__(self) -> Iterator[Tuple[str, Batch]]:
        plan = self._epoch_batches()

        def gen():
            for o, bi in plan:
                yield o, self._make_batch(o, bi)

        return iter(_Prefetcher(gen)) if self.prefetch else gen()


class EvalLoader:
    """Yields (orientation, EvalBatch, indices) triples, grouped by
    orientation; `indices` maps each row back to the source index."""

    def __init__(
        self,
        dataset,
        indices: Sequence[int],
        pipeline: PipelineConfig,
        batch_size: int,
        prefetch: bool = True,
        num_workers: int = 8,
        transform_fn=None,
        cache=None,
    ):
        """transform_fn(img_bgr_uint8, idx) -> img: post-decode hook
        (e.g. the robustness corruptions, tools/analysis/test_robustness).
        cache: a data.canvas_cache.CanvasCache — decoded canvases are
        read from / written to it, so repeat sweeps of the same immutable
        pool (every AL cycle) skip the JPEG decode entirely. Ignored when
        transform_fn is set (corrupted images must not poison the cache)."""
        self.dataset = dataset
        self.indices = np.asarray(indices)
        self.pipeline = pipeline
        self.batch_size = batch_size
        self.prefetch = prefetch
        self.transform_fn = transform_fn
        self.cache = cache if transform_fn is None else None
        self._pool = _shared_pool(num_workers) if num_workers > 0 else None

    def __len__(self):
        n = 0
        for o in ORIENTATIONS:
            k = sum(1 for i in self.indices if _orientation_of(self.dataset, i) == o)
            n += (k + self.batch_size - 1) // self.batch_size if k else 0
        return n

    def _make_batch(self, batch_idx: np.ndarray) -> EvalBatch:
        def prep(i):
            i = int(i)
            if self.cache is not None:
                s = self.cache.get(i)
                if s is not None:
                    return s
            img = load_image(self.dataset.img_path(i))
            if self.transform_fn is not None:
                img = self.transform_fn(img, i)
            s = prepare_sample(img, None, self.pipeline, flip=False)
            if self.cache is not None:
                self.cache.put(i, s)
            return s

        if self._pool is not None:
            samples = list(self._pool.map(prep, batch_idx))
        else:
            samples = [prep(i) for i in batch_idx]
        valid = [True] * len(samples)
        while len(samples) < self.batch_size:
            samples.append(samples[-1])
            valid.append(False)
        return EvalBatch(
            np.stack([s["image"] for s in samples]),
            np.stack([s["img_shape"] for s in samples]),
            np.stack([s["scale_factor"] for s in samples]),
            np.asarray(valid),
        )

    def __iter__(self):
        groups = {o: [] for o in ORIENTATIONS}
        for i in self.indices:
            groups[_orientation_of(self.dataset, i)].append(int(i))

        def gen():
            for o in ORIENTATIONS:
                grp = np.asarray(groups[o], dtype=np.int64)
                for i in range(0, len(grp), self.batch_size):
                    bi = grp[i:i + self.batch_size]
                    yield o, self._make_batch(bi), bi

        return iter(_Prefetcher(gen)) if self.prefetch else gen()
