"""LVIS v1 dataset + federated evaluation.

Behavioral parity targets (reference, /root/reference):
* mmdet/datasets/lvis.py:697-737 (LVISV1Dataset: COCO-format JSON where
  each image's file name derives from `coco_url` — the trailing
  split/name path — and images carry `neg_category_ids` and
  `not_exhaustive_category_ids`); classes = the 1203 LVIS names in
  category-id order (the JSON is the source of truth here, the
  hardcoded list in the reference is its frozen copy).
* The reference evaluates through the external `lvis` package
  (LVISEval). Its federated protocol, re-implemented over
  utils/coco_eval.py: for category c, ONLY images where c is
  positively annotated or listed in neg_category_ids count — dets of c
  on any other image are neither TP nor FP, and gts elsewhere don't
  exist by construction. On images where c is annotated but listed in
  not_exhaustive_category_ids, unmatched dets of c are IGNORED rather
  than FPs (LVISEval's img_nel -> dt_ig rule; see eval_lvis_map).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from .coco import CocoDataset


class LVISDataset(CocoDataset):
    """LVIS v1 JSON. Adds per-image negative-category sets for the
    federated eval and derives file names from coco_url when file_name
    is absent (lvis.py:731-735)."""

    def __init__(self, ann_file: str, img_prefix: str, **kwargs):
        # LVIS val images may legitimately have no annotations
        kwargs.setdefault("filter_empty_gt", False)
        super().__init__(ann_file, img_prefix, **kwargs)
        for im in self._imgs.values():
            if "file_name" not in im and "coco_url" in im:
                # '.../train2017/000000391895.jpg' -> 'train2017/...jpg'
                im["file_name"] = "/".join(im["coco_url"].split("/")[-2:])

    def eval_image_masks(self) -> np.ndarray:
        """[num_classes, num_images] bool: image counts for class c iff
        c is positively annotated there or in its neg_category_ids."""
        n_cls, n_img = len(self.classes), len(self.img_ids)
        mask = np.zeros((n_cls, n_img), bool)
        for i, img_id in enumerate(self.img_ids):
            im = self._imgs[img_id]
            for cid in im.get("neg_category_ids", ()):
                if cid in self.cat2label:
                    mask[self.cat2label[cid], i] = True
            for a in self._anns_by_img[img_id]:
                c = self.cat2label.get(a.get("category_id"))
                if c is not None:
                    mask[c, i] = True
        return mask

    def nel_image_masks(self) -> np.ndarray:
        """[num_classes, num_images] bool: class c is annotated on the
        image but NOT exhaustively (not_exhaustive_category_ids) — on
        such cells LVISEval ignores unmatched detections instead of
        counting them as false positives (dt_ig via img_nel)."""
        n_cls, n_img = len(self.classes), len(self.img_ids)
        mask = np.zeros((n_cls, n_img), bool)
        for i, img_id in enumerate(self.img_ids):
            for cid in self._imgs[img_id].get("not_exhaustive_category_ids", ()):
                if cid in self.cat2label:
                    mask[self.cat2label[cid], i] = True
        return mask


def eval_lvis_map(det_results: List[List[np.ndarray]],
                  annotations: List[Dict[str, np.ndarray]],
                  eval_masks: np.ndarray,
                  nel_masks: np.ndarray = None) -> Dict:
    """Federated COCO-style mAP: blank out (class, image) cells that
    are not evaluable for that class, then run the standard protocol.

    `nel_masks` (LVISDataset.nel_image_masks) marks cells where the
    class is annotated but not exhaustively: LVISEval ignores unmatched
    detections there (img_nel -> dt_ig). Reproduced by appending a
    whole-image crowd/ignore box of that class — dets first try real
    gts (TP), and only unmatched ones fall back to the ignore region
    (IoF = 1) and drop out of the PR curve, exactly the dt_ig rule."""
    from ..utils.coco_eval import eval_coco_map

    masked = []
    for i, dets in enumerate(det_results):
        row = []
        for c, d in enumerate(dets):
            row.append(d if eval_masks[c, i]
                       else np.zeros((0, 5), np.float32))
        masked.append(row)
    anns = annotations
    if nel_masks is not None and nel_masks.any():
        huge = np.array([0.0, 0.0, 1e8, 1e8], np.float32)  # contains any det
        anns = []
        for i, ann in enumerate(annotations):
            cs = np.nonzero(nel_masks[:, i])[0]
            if len(cs) == 0:
                anns.append(ann)
                continue
            ig_b = ann.get("bboxes_ignore")
            ig_l = ann.get("labels_ignore")
            ig_b = ig_b.reshape(-1, 4) if ig_b is not None else np.zeros((0, 4), np.float32)
            ig_l = ig_l if ig_l is not None else np.zeros((0,), np.int64)
            ann = dict(ann)
            ann["bboxes_ignore"] = np.concatenate(
                [ig_b, np.tile(huge, (len(cs), 1))]).astype(np.float32)
            ann["labels_ignore"] = np.concatenate([ig_l, cs]).astype(ig_l.dtype)
            anns.append(ann)
    # gts of class c only exist on images where c is annotated, which
    # the mask includes by construction — annotations pass unchanged
    out = eval_coco_map(masked, anns)
    out["federated"] = True
    return out
