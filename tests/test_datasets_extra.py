"""LVIS / WIDER Face / DeepFashion datasets + the Cityscapes and
pascal_voc converters (parity targets: mmdet/datasets/{lvis,
wider_face,deepfashion,cityscapes}.py, tools/dataset_converters/* —
cited in data/lvis.py, data/extra_datasets.py)."""

import json
import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

REPO = osp.join(osp.dirname(__file__), "..")


def _lvis_json(path):
    db = dict(
        images=[
            dict(id=1, width=64, height=48, neg_category_ids=[2],
                 coco_url="http://images.cocodataset.org/val2017/0001.jpg"),
            dict(id=2, width=64, height=48, neg_category_ids=[],
                 not_exhaustive_category_ids=[1],
                 coco_url="http://images.cocodataset.org/val2017/0002.jpg"),
        ],
        annotations=[
            dict(id=1, image_id=1, category_id=1, bbox=[4, 4, 20, 20],
                 area=400, iscrowd=0),
            dict(id=2, image_id=2, category_id=3, bbox=[10, 10, 12, 12],
                 area=144, iscrowd=0),
            # cat 1 on image 2 is annotated but NOT exhaustively
            dict(id=3, image_id=2, category_id=1, bbox=[30, 10, 10, 10],
                 area=100, iscrowd=0),
        ],
        categories=[dict(id=1, name="aerosol_can"),
                    dict(id=2, name="air_conditioner"),
                    dict(id=3, name="airplane")],
    )
    with open(path, "w") as f:
        json.dump(db, f)


def test_lvis_dataset_and_federated_mask(tmp_path):
    from aod_meh_hua_tpu.data import LVISDataset, eval_lvis_map

    ann = tmp_path / "lvis.json"
    _lvis_json(ann)
    ds = LVISDataset(str(ann), str(tmp_path))
    assert len(ds) == 2
    # file name from coco_url (lvis.py:731-735)
    assert ds.img_path(0).endswith("val2017/0001.jpg")
    mask = ds.eval_image_masks()
    # img 1: class 0 positive, class 1 negative list; img 2: classes 0+2 pos
    assert mask[0, 0] and mask[1, 0] and not mask[2, 0]
    assert mask[0, 1] and not mask[1, 1] and mask[2, 1]
    nel = ds.nel_image_masks()
    # only (class 0, img 2) is annotated-but-not-exhaustive
    assert nel[0, 1] and not nel[0, 0] and not nel[2, 1]

    anns = [ds.get_ann_info(i) for i in range(2)]
    # a wrong 'airplane' det on image 1 (not evaluable there) must NOT
    # hurt AP under the federated protocol, but does hurt plain COCO
    gt_det = np.array([[4, 4, 24, 24, 0.9]], np.float32)
    bad = np.array([[0, 0, 30, 30, 0.95]], np.float32)
    z = np.zeros((0, 5), np.float32)
    # img 2 class 0: one det matching ann id=3, one UNMATCHED det ranked
    # ABOVE the true positives (so it would dent interpolated AP as an
    # FP) — on a not-exhaustive cell LVISEval ignores it (dt_ig)
    c0_img2 = np.array([[30, 10, 40, 20, 0.85], [2, 30, 12, 38, 0.95]],
                       np.float32)
    dets = [[gt_det, z, bad], [c0_img2, z,
                               np.array([[10, 10, 22, 22, 0.8]], np.float32)]]
    fed = eval_lvis_map(dets, anns, mask, nel_masks=nel)
    assert fed["federated"]
    from aod_meh_hua_tpu.utils.coco_eval import eval_coco_map

    plain = eval_coco_map(dets, anns)
    assert fed["mAP"] > plain["mAP"]
    assert fed["per_class"][2]["ap"] == 1.0  # the FP was masked out
    # the unmatched class-0 det on the nel cell was ignored, not an FP
    assert fed["per_class"][0]["ap"] == 1.0
    no_nel = eval_lvis_map(dets, anns, mask)
    assert no_nel["per_class"][0]["ap"] < 1.0


def test_wider_face_paths(tmp_path):
    from aod_meh_hua_tpu.data import WIDERFaceDataset

    ann_dir = tmp_path / "Annotations"
    ann_dir.mkdir()
    (tmp_path / "JPEGImages").mkdir()
    xml = """<annotation><folder>0--Parade</folder>
    <size><width>100</width><height>80</height></size>
    <object><name>face</name><difficult>0</difficult>
    <bndbox><xmin>10</xmin><ymin>10</ymin><xmax>30</xmax><ymax>30</ymax>
    </bndbox></object></annotation>"""
    (ann_dir / "img1.xml").write_text(xml)
    (tmp_path / "list.txt").write_text("img1\n")
    ds = WIDERFaceDataset(str(tmp_path / "list.txt"), str(tmp_path))
    assert len(ds) == 1
    assert ds.classes == ("face",)
    assert ds.img_path(0).endswith(
        osp.join("JPEGImages", "0--Parade", "img1.jpg"))
    ann = ds.get_ann_info(0)
    assert ann["labels"].tolist() == [0]


def test_cityscapes_converter_roundtrip(tmp_path):
    gt_dir = tmp_path / "gtFine" / "val" / "frankfurt"
    gt_dir.mkdir(parents=True)
    gt = dict(imgHeight=48, imgWidth=64, objects=[
        dict(label="car", polygon=[[4, 4], [24, 4], [24, 20], [4, 20]]),
        dict(label="persongroup",
             polygon=[[30, 10], [40, 10], [40, 30], [30, 30]]),
        dict(label="sky", polygon=[[0, 0], [64, 0], [64, 10], [0, 10]]),
    ])
    (gt_dir / "frankfurt_000000_gtFine_polygons.json").write_text(
        json.dumps(gt))
    out_dir = tmp_path / "annotations"
    r = subprocess.run(
        [sys.executable,
         osp.join(REPO, "tools/dataset_converters/cityscapes.py"),
         str(tmp_path), "--out-dir", str(out_dir), "--splits", "val"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    out = out_dir / "instancesonly_filtered_gtFine_val.json"

    from aod_meh_hua_tpu.data import CocoDataset

    ds = CocoDataset(str(out), str(tmp_path / "leftImg8bit"),
                     test_mode=True)
    assert len(ds) == 1
    ann = ds.get_ann_info(0)
    # the car is a real gt, the persongroup routes to iscrowd/ignore,
    # 'sky' (not an instance class) is dropped
    assert len(ann["bboxes"]) == 1 and len(ann["bboxes_ignore"]) == 1
    np.testing.assert_allclose(ann["bboxes"][0], [4, 4, 24, 20])
    assert ds.classes[ann["labels"][0]] == "car"


def test_pascal_voc_converter_roundtrip(tmp_path):
    sys.path.insert(0, osp.join(REPO, "tests"))
    from test_data import make_voc

    base, _, ids = make_voc(str(tmp_path / "voc"), "VOC2007", n=5, seed=1)
    out = tmp_path / "voc.json"
    r = subprocess.run(
        [sys.executable,
         osp.join(REPO, "tools/dataset_converters/pascal_voc.py"),
         base, "--split", "ImageSets/Main/trainval.txt",
         "--out", str(out)],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr

    from aod_meh_hua_tpu.data import CocoDataset, VOCDataset

    voc = VOCDataset(osp.join(base, "ImageSets/Main/trainval.txt"), base,
                     test_mode=True)
    coco = CocoDataset(str(out), base, test_mode=True)
    assert len(voc) == len(coco)
    for i in range(len(voc)):
        a, b = voc.get_ann_info(i), coco.get_ann_info(i)
        np.testing.assert_allclose(a["bboxes"], b["bboxes"], atol=1e-4)
        np.testing.assert_array_equal(a["labels"], b["labels"])
