"""Data layer tests on a synthesized mini-VOC tree."""

import os
import numpy as np
import pytest

from aod_meh_hua_tpu.data import (
    VOCDataset, VOC_CLASSES, ConcatVOC, PipelineConfig, prepare_sample,
    TrainLoader, EvalLoader, init_split, update_labeled_set,
    save_cycle_state, load_cycle_state,
)
from aod_meh_hua_tpu.ops import AnchorGenerator

cv2 = pytest.importorskip("cv2")

XML_TMPL = """<annotation>
  <size><width>{w}</width><height>{h}</height><depth>3</depth></size>
  {objects}
</annotation>"""
OBJ_TMPL = """<object>
  <name>{name}</name><difficult>{difficult}</difficult>
  <bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox>
</object>"""


def make_voc(root, year="VOC2007", n=6, seed=0):
    rng = np.random.RandomState(seed)
    base = os.path.join(root, year)
    for d in ("JPEGImages", "Annotations", "ImageSets/Main"):
        os.makedirs(os.path.join(base, d), exist_ok=True)
    ids = []
    for i in range(n):
        img_id = f"{year[-2:]}_{i:06d}"
        w, h = int(rng.randint(300, 500)), int(rng.randint(200, 400))
        img = rng.randint(0, 255, (h, w, 3), np.uint8)
        cv2.imwrite(os.path.join(base, "JPEGImages", f"{img_id}.jpg"), img)
        objs = []
        for _ in range(rng.randint(1, 4)):
            x1, y1 = int(rng.randint(1, w - 60)), int(rng.randint(1, h - 60))
            objs.append(OBJ_TMPL.format(
                name=VOC_CLASSES[rng.randint(0, 20)], difficult=int(rng.rand() < 0.2),
                x1=x1, y1=y1, x2=x1 + int(rng.randint(20, 50)), y2=y1 + int(rng.randint(20, 50)),
            ))
        with open(os.path.join(base, "Annotations", f"{img_id}.xml"), "w") as f:
            f.write(XML_TMPL.format(w=w, h=h, objects="\n".join(objs)))
        ids.append(img_id)
    list_path = os.path.join(base, "ImageSets/Main/trainval.txt")
    with open(list_path, "w") as f:
        f.write("\n".join(ids))
    return base, list_path, ids


@pytest.fixture(scope="module")
def voc(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("vocdata"))
    base, lst, ids = make_voc(root)
    return VOCDataset(lst, base), ids


def test_dataset_parsing(voc):
    ds, ids = voc
    assert len(ds) > 0
    ann = ds.get_ann_info(0)
    assert ann["bboxes"].shape[1] == 4
    # -1 shift: parsed coords are 0-based
    total = len(ann["bboxes"]) + len(ann["bboxes_ignore"])
    assert total >= 1
    w, h = ds.image_size(0)
    assert w > 0 and h > 0


def test_difficult_goes_to_ignore(tmp_path):
    base = str(tmp_path)
    for d in ("JPEGImages", "Annotations", "ImageSets/Main"):
        os.makedirs(os.path.join(base, d), exist_ok=True)
    img_id = "x_000001"
    cv2.imwrite(os.path.join(base, "JPEGImages", f"{img_id}.jpg"),
                np.zeros((100, 100, 3), np.uint8))
    objs = (OBJ_TMPL.format(name="dog", difficult=1, x1=10, y1=10, x2=50, y2=50)
            + OBJ_TMPL.format(name="cat", difficult=0, x1=20, y1=20, x2=60, y2=60)
            + OBJ_TMPL.format(name="unknown_thing", difficult=0, x1=1, y1=1, x2=9, y2=9))
    with open(os.path.join(base, "Annotations", f"{img_id}.xml"), "w") as f:
        f.write(XML_TMPL.format(w=100, h=100, objects=objs))
    lst = os.path.join(base, "ImageSets/Main/t.txt")
    with open(lst, "w") as f:
        f.write(img_id)
    ds = VOCDataset(lst, base)
    ann = ds.get_ann_info(0)
    assert len(ann["bboxes"]) == 1 and ann["labels"][0] == VOC_CLASSES.index("cat")
    assert len(ann["bboxes_ignore"]) == 1 and ann["labels_ignore"][0] == VOC_CLASSES.index("dog")
    np.testing.assert_allclose(ann["bboxes"][0], [19, 19, 59, 59])  # -1 shift


def test_pipeline_geometry():
    cfg = PipelineConfig(img_scale=(1000, 600), canvas=(608, 1024))
    img = np.zeros((300, 400, 3), np.uint8)
    ann = {"bboxes": np.array([[10, 20, 110, 120]], np.float32), "labels": np.array([3])}
    out = prepare_sample(img, ann, cfg, flip=False)
    # scale = min(1000/400, 600/300) = 2.0
    np.testing.assert_array_equal(out["img_shape"], [600, 800])
    np.testing.assert_array_equal(out["pad_shape"], [608, 800])
    np.testing.assert_allclose(out["scale_factor"], [2, 2, 2, 2])
    np.testing.assert_allclose(out["gt_bboxes"][0], [20, 40, 220, 240])
    assert out["image"].shape == (608, 1024, 3)
    # pad region is exactly zero
    assert np.abs(out["image"][:, 800:]).max() == 0


def test_pipeline_flip_boxes():
    cfg = PipelineConfig()
    img = np.zeros((300, 500, 3), np.uint8)
    ann = {"bboxes": np.array([[0, 0, 100, 50]], np.float32), "labels": np.array([0])}
    out = prepare_sample(img, ann, cfg, flip=True)
    new_w = out["img_shape"][1]
    np.testing.assert_allclose(out["gt_bboxes"][0], [new_w - 200, 0, new_w, 100])


def test_portrait_uses_transposed_canvas():
    cfg = PipelineConfig()
    img = np.zeros((500, 300, 3), np.uint8)  # portrait: resizes to 600x1000
    out = prepare_sample(img, None, cfg, flip=False)
    assert out["orientation"] == "portrait"
    assert out["image"].shape == (1024, 608, 3)
    np.testing.assert_array_equal(out["img_shape"], [1000, 600])


@pytest.fixture(scope="module")
def small_cfg_bits():
    from aod_meh_hua_tpu.utils.config import tiny_test_config

    cfg = tiny_test_config()  # canvas (128, 256)
    pipe = PipelineConfig(img_scale=(250, 120), canvas=cfg.canvas)
    return cfg, pipe


def test_train_loader(voc, small_cfg_bits):
    ds, _ = voc
    cfg, pipe = small_cfg_bits
    loader = TrainLoader(ds, np.arange(len(ds)), cfg, pipe, batch_size=2,
                         repeat=2, prefetch=False)
    batches = list(loader)
    assert len(batches) == len(loader)
    for o, b in batches:
        ch, cw = pipe.canvas_for(o)
        assert b.images.shape == (2, ch, cw, 3)
        assert b.gt_boxes.shape == (2, cfg.max_gt, 4)
        sizes = cfg.for_orientation(o).featmap_sizes()
        assert b.anchor_valid.shape[1] == sum(h * w * 9 for h, w in sizes)
    # most images carry GT (all-difficult images legitimately have none)
    assert any(b.gt_valid.any() for _, b in batches)


def test_eval_loader_tail_padding(voc, small_cfg_bits):
    ds, _ = voc
    _, pipe = small_cfg_bits
    n = len(ds)
    loader = EvalLoader(ds, np.arange(n), pipe, batch_size=4, prefetch=False)
    batches = list(loader)
    total_valid = sum(int(b.valid.sum()) for _, b, _ in batches)
    assert total_valid == n
    all_idx = np.concatenate([bi[b.valid[: len(bi)]] for _, b, bi in batches])
    assert sorted(all_idx.tolist()) == list(range(n))
    assert all(b.images.shape[0] == 4 for _, b, _ in batches)


def test_prefetcher_propagates_data(voc, small_cfg_bits):
    ds, _ = voc
    cfg, pipe = small_cfg_bits
    loader = TrainLoader(ds, np.arange(len(ds)), cfg, pipe, batch_size=2, prefetch=True)
    assert len(list(loader)) == len(loader)


def test_device_normalize_transport_equivalence():
    """uint8 transport + on-device normalization reproduces the host
    float path exactly (incl. the zero pad region), through prepare_sample
    and a real eval step."""
    import jax
    import jax.numpy as jnp
    from dataclasses import replace as dc_replace

    from aod_meh_hua_tpu.data.pipeline import PipelineConfig, prepare_sample
    from aod_meh_hua_tpu.engine import EvalBatch, make_eval_step
    from aod_meh_hua_tpu.engine.batch import prepare_images
    from aod_meh_hua_tpu.models import init_retinanet
    from aod_meh_hua_tpu.utils.config import tiny_test_config

    rng = np.random.RandomState(0)
    cfg = tiny_test_config()
    img = rng.randint(0, 255, (150, 230, 3), np.uint8)
    pipe_f = PipelineConfig(img_scale=(250, 120), canvas=cfg.canvas)
    pipe_u = PipelineConfig(img_scale=(250, 120), canvas=cfg.canvas,
                            device_normalize=True)
    sf = prepare_sample(img, None, pipe_f, flip=False)
    su = prepare_sample(img, None, pipe_u, flip=False)
    assert su["image"].dtype == np.uint8
    assert sf["image"].dtype == np.float32

    dev = prepare_images(jnp.asarray(su["image"][None]),
                         jnp.asarray(su["img_shape"][None]), cfg)
    np.testing.assert_allclose(np.asarray(dev[0]), sf["image"],
                               rtol=1e-6, atol=1e-5)

    # through the jitted eval step: identical detections
    model, variables = init_retinanet(cfg, jax.random.PRNGKey(1))
    step = make_eval_step(model, cfg)

    def eb(s):
        return EvalBatch(s["image"][None], s["img_shape"][None].astype(np.int32),
                         s["scale_factor"][None], np.ones(1, bool))

    df, du = step(variables, eb(sf)), step(variables, eb(su))
    np.testing.assert_allclose(np.asarray(df.scores), np.asarray(du.scores),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(df.boxes), np.asarray(du.boxes),
                               rtol=1e-4, atol=1e-3)


def test_init_split_semantics():
    rng = np.random.RandomState(20)
    x_l, x_u, x_all = init_split(100, 10, rng)
    assert len(x_l) == 10 and len(x_u) == 10
    assert np.intersect1d(x_l, x_u).size == 0
    assert (np.sort(x_l) == x_l).all()
    assert len(x_all) == 100


def test_update_labeled_set_topk():
    rng = np.random.RandomState(0)
    x_all = np.arange(50)
    x_l = np.arange(10)
    unc = np.linspace(0, 1, 50)
    x_l2, x_u2 = update_labeled_set(unc, x_all, x_l, 5, rng)
    # top-5 of the unlabeled (indices 45..49)
    assert set(range(45, 50)).issubset(set(x_l2))
    assert len(x_l2) == 15
    assert len(x_u2) == min(15, 50 - 15)
    assert np.intersect1d(x_l2, x_u2).size == 0


def test_update_labeled_set_zero_rate():
    rng = np.random.RandomState(0)
    x_all = np.arange(40)
    x_l = np.arange(5)
    unc = np.linspace(0.1, 1, 40)
    unc[5:15] = 0.0  # zero-uncertainty unlabeled images
    x_l2, _ = update_labeled_set(unc, x_all, x_l, 10, rng, zero_rate=0.2)
    zeros_acquired = np.intersect1d(x_l2, np.arange(5, 15))
    assert len(zeros_acquired) >= 1  # zeroRate slice came from the zero pool
    assert len(x_l2) <= 15


def test_cycle_state_roundtrip(tmp_path):
    x_l = np.arange(5)
    x_u = np.arange(5, 9)
    save_cycle_state(str(tmp_path), 3, x_l, x_u, np.ones(9))
    out = load_cycle_state(str(tmp_path), 3)
    assert out is not None
    np.testing.assert_array_equal(out[0], x_l)
    assert load_cycle_state(str(tmp_path), 7) is None


def test_concat_voc(tmp_path):
    b1, l1, _ = make_voc(str(tmp_path), "VOC2007", n=3, seed=1)
    b2, l2, _ = make_voc(str(tmp_path), "VOC2012", n=4, seed=2)
    cat = ConcatVOC([VOCDataset(l1, b1), VOCDataset(l2, b2)])
    assert len(cat) == len(VOCDataset(l1, b1)) + len(VOCDataset(l2, b2))
    assert "VOC2007" in cat.img_path(0)
    assert "VOC2012" in cat.img_path(len(cat) - 1)


# ----- decoded-canvas cache -----

def _cache_pipe():
    return PipelineConfig(img_scale=(250, 120), canvas=(128, 256),
                          device_normalize=True)


def _collect(loader):
    out = []
    for o, batch, idx in loader:
        out.append((o, np.asarray(batch.images).copy(),
                    np.asarray(batch.img_shapes).copy(),
                    np.asarray(batch.scale_factors).copy(),
                    np.asarray(batch.valid).copy(), idx.copy()))
    return out


def _assert_sweeps_equal(a, b):
    assert len(a) == len(b)
    for (o1, i1, s1, f1, v1, x1), (o2, i2, s2, f2, v2, x2) in zip(a, b):
        assert o1 == o2
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_array_equal(s1, s2)
        np.testing.assert_array_equal(f1, f2)
        np.testing.assert_array_equal(v1, v2)
        np.testing.assert_array_equal(x1, x2)


def test_canvas_cache_bit_equal_and_no_redecode(voc, tmp_path, monkeypatch):
    """Cold cached sweep == uncached sweep bit-for-bit; the warm sweep
    never touches the decoder (VERDICT r2 #1: decode once per
    experiment, vs the reference's per-epoch re-decode,
    datasets/pipelines/loading.py:12)."""
    from aod_meh_hua_tpu.data import open_canvas_cache
    from aod_meh_hua_tpu.data import loader as loader_mod

    ds, _ = voc
    pipe = _cache_pipe()
    idx = np.arange(len(ds))
    plain = _collect(EvalLoader(ds, idx, pipe, batch_size=3, num_workers=2))

    cache = open_canvas_cache(str(tmp_path / "cc"), ds, pipe)
    assert cache is not None and cache.n_filled == 0
    cold = _collect(EvalLoader(ds, idx, pipe, batch_size=3, num_workers=2,
                               cache=cache))
    _assert_sweeps_equal(plain, cold)
    assert cache.n_filled == len(ds)

    def boom(path):
        raise AssertionError(f"decode attempted on warm cache: {path}")

    monkeypatch.setattr(loader_mod, "load_image", boom)
    warm = _collect(EvalLoader(ds, idx, pipe, batch_size=3, num_workers=2,
                               cache=cache))
    _assert_sweeps_equal(plain, warm)


def test_canvas_cache_persists_and_invalidates(voc, tmp_path):
    """Reopening with the same pipeline keeps rows; a geometry change
    invalidates the fingerprint and rebuilds."""
    from aod_meh_hua_tpu.data import open_canvas_cache

    ds, _ = voc
    pipe = _cache_pipe()
    d = str(tmp_path / "cc2")
    c1 = open_canvas_cache(d, ds, pipe)
    _collect(EvalLoader(ds, np.arange(len(ds)), pipe, batch_size=4, cache=c1))
    assert c1.n_filled == len(ds)

    c2 = open_canvas_cache(d, ds, pipe)  # same fingerprint: rows survive
    assert c2.n_filled == len(ds)

    import dataclasses
    pipe3 = dataclasses.replace(pipe, img_scale=(200, 100))
    c3 = open_canvas_cache(d, ds, pipe3)
    assert c3.n_filled == 0


def test_canvas_cache_gates(voc, tmp_path):
    """Float-path pipelines and corruption transforms bypass the cache."""
    from aod_meh_hua_tpu.data import open_canvas_cache

    ds, _ = voc
    float_pipe = PipelineConfig(img_scale=(250, 120), canvas=(128, 256))
    assert open_canvas_cache(str(tmp_path / "cc3"), ds, float_pipe) is None

    pipe = _cache_pipe()
    cache = open_canvas_cache(str(tmp_path / "cc4"), ds, pipe)
    tf = lambda img, i: img
    loader = EvalLoader(ds, np.arange(len(ds)), pipe, batch_size=4,
                        cache=cache, transform_fn=tf)
    assert loader.cache is None
    _collect(loader)
    assert cache.n_filled == 0
