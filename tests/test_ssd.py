"""SSD family tests: backbone/neck/head shapes, OHEM loss, score step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aod_meh_hua_tpu.utils.config import SSDConfig, TrainConfig
from aod_meh_hua_tpu.models import init_ssd
from aod_meh_hua_tpu.engine import Batch, EvalBatch, create_train_state, make_train_step
from aod_meh_hua_tpu.engine.score import make_score_step
from aod_meh_hua_tpu.engine.eval import make_eval_step
from aod_meh_hua_tpu.ops import anchor_valid_flags

CFG = SSDConfig(width_mult=0.125, max_gt=8)  # tiny VGG channels, real 300 geometry
TCFG = TrainConfig(batch_size=2)


def test_featmap_and_anchor_geometry():
    sizes = CFG.featmap_sizes()
    assert sizes == [(38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)]
    gen = CFG.build_anchor_generator()
    assert gen.num_base_anchors == [4, 6, 6, 6, 4, 4]
    total = CFG.level_bounds()[-1][1]
    assert total == 38 * 38 * 4 + 19 * 19 * 6 + 100 * 6 + 25 * 6 + 9 * 4 + 4
    # topk caps the two big levels at nms_pre=1000
    tb = CFG.topk_level_bounds()
    assert tb[0] == (0, 1000) and tb[1] == (1000, 2000)


@pytest.fixture(scope="module")
def ssd():
    model, variables = init_ssd(CFG, jax.random.PRNGKey(0))
    return model, variables


def test_ssd_forward_shapes(ssd):
    model, variables = ssd
    imgs = jnp.zeros((2, 300, 300, 3))
    cls, reg, lam = model.apply(variables, imgs)
    total = CFG.level_bounds()[-1][1]
    assert cls.shape == (2, total, 21)
    assert reg.shape == (2, total, 4)
    assert lam.shape == (2, total)


def _ssd_batch(rng, b=2):
    g = CFG.max_gt
    images = rng.randn(b, 300, 300, 3).astype(np.float32) * 0.1
    boxes = np.zeros((b, g, 4), np.float32)
    labels = np.zeros((b, g), np.int32)
    valid = np.zeros((b, g), bool)
    for i in range(b):
        for j in range(2):
            x1, y1 = rng.uniform(0, 200, 2)
            boxes[i, j] = [x1, y1, x1 + rng.uniform(40, 90), y1 + rng.uniform(40, 90)]
            labels[i, j] = rng.randint(0, 20)
            valid[i, j] = True
    shapes = np.tile([[300, 300]], (b, 1)).astype(np.int32)
    av = anchor_valid_flags(CFG.build_anchor_generator(), CFG.featmap_sizes(), shapes)
    return Batch(jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(labels),
                 jnp.asarray(valid), jnp.asarray(av), jnp.asarray(shapes))


def test_ssd_train_step(ssd, rng):
    model, variables = ssd
    fresh = jax.tree.map(jnp.array, variables)
    state, tx = create_train_state(model, fresh, TCFG, frozen_stages=0)
    step = make_train_step(model, CFG, tx)
    batch = _ssd_batch(rng)
    losses = []
    for _ in range(5):
        state, aux = step(state, batch)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert float(aux["loss_meh"]) >= 0


def test_ssd_ohem_matches_transcription(ssd, rng):
    """OHEM pick: hardest 3x negatives per image, transcribed directly."""
    from aod_meh_hua_tpu.engine.train import make_ssd_loss_fn

    model, variables = ssd
    loss_fn, anchors_arg = make_ssd_loss_fn(model, CFG)
    batch = _ssd_batch(rng)
    _, aux = jax.jit(loss_fn)(variables["params"], variables.get("batch_stats", {}), batch, anchors_arg)

    # manual: recompute with numpy from the same forward outputs
    cls, _, _ = model.apply(variables, batch.images)
    from aod_meh_hua_tpu.engine.train import _make_targets_fn
    import aod_meh_hua_tpu.engine.train as T

    gen = CFG.build_anchor_generator()
    anchors = jnp.asarray(np.concatenate(gen.grid_anchors(CFG.featmap_sizes())))
    t = _make_targets_fn(CFG)(anchors, batch.anchor_valid, batch.gt_boxes,
                              batch.gt_labels, batch.gt_valid)
    logits = np.asarray(cls, np.float64)
    labels = np.asarray(t.labels)
    lw = np.asarray(t.label_weights)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    ce = -np.log(np.maximum(p[np.arange(2)[:, None], np.arange(labels.shape[1])[None], labels], 1e-30)) * lw
    total = 0.0
    for i in range(2):
        pos = (labels[i] < 20) & (lw[i] > 0)
        neg = (labels[i] == 20) & (lw[i] > 0)
        k = min(3 * pos.sum(), neg.sum())
        neg_losses = np.sort(ce[i][neg])[::-1][:k]
        total += ce[i][pos].sum() + neg_losses.sum()
    want = total / max(np.asarray(t.num_pos).sum(), 1)
    assert float(aux["loss_cls"]) == pytest.approx(want, rel=2e-3)


def test_ssd_score_and_eval_steps(ssd, rng):
    model, variables = ssd
    b = 2
    images = jnp.asarray(rng.randn(b, 300, 300, 3).astype(np.float32) * 0.1)
    eb = EvalBatch(images, jnp.asarray(np.tile([[300, 300]], (b, 1)).astype(np.int32)),
                   jnp.asarray(np.full((b, 4), 0.75, np.float32)), jnp.ones(b, dtype=bool))
    unc, mconf = make_score_step(model, CFG)(variables, eb)
    assert unc.shape == (b,) and np.isfinite(np.asarray(unc)).all()
    dets = make_eval_step(model, CFG)(variables, eb)
    assert dets.boxes.shape == (b, CFG.test.max_per_img, 4)
    assert int(np.asarray(dets.labels).max()) <= 19  # BG never emitted


def test_ssd_augmentations(rng):
    from aod_meh_hua_tpu.data.ssd_augment import ssd_train_augment

    img = rng.randint(0, 255, (120, 160, 3)).astype(np.uint8)
    ann = {"bboxes": np.array([[10, 10, 60, 60], [80, 40, 140, 100]], np.float32),
           "labels": np.array([3, 7])}
    r = np.random.RandomState(5)
    for _ in range(20):
        out_img, out_ann = ssd_train_augment(img, ann, r)
        assert out_img.ndim == 3 and out_img.shape[2] == 3
        assert len(out_ann["bboxes"]) == len(out_ann["labels"])
        if len(out_ann["bboxes"]):
            b = out_ann["bboxes"]
            assert (b[:, 2] >= b[:, 0]).all() and (b[:, 3] >= b[:, 1]).all()
            assert b[:, 0].min() >= 0 and b[:, 1].min() >= 0
            assert b[:, 2].max() <= out_img.shape[1] and b[:, 3].max() <= out_img.shape[0]
