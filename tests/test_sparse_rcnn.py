"""Sparse R-CNN family: learnable proposals, dynamic instance
interaction, per-stage Hungarian criterion, and the fused train /
NMS-free eval steps (parity targets: reference embedding_rpn_head.py /
dii_head.py / sparse_roi_head.py / match_cost.py, cited in
aod_meh_hua_tpu/models/sparse_rcnn.py and engine/sparse_rcnn.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aod_meh_hua_tpu.utils.config import TrainConfig, tiny_sparse_rcnn_config


def test_init_proposals_cover_whole_image():
    """The learnable boxes start as (0.5, 0.5, 1, 1) normalized cxcywh:
    decoded proposals must equal each image's full extent
    (embedding_rpn_head.py:43-56)."""
    from aod_meh_hua_tpu.api import init_detector
    from aod_meh_hua_tpu.engine.sparse_rcnn import _init_proposals

    cfg = tiny_sparse_rcnn_config()
    _, variables = init_detector(cfg, seed=0)
    init = variables["params"]["init_proposal_bboxes"]
    np.testing.assert_allclose(np.asarray(init),
                               np.tile([0.5, 0.5, 1.0, 1.0],
                                       (cfg.num_proposals, 1)))
    shapes = jnp.asarray([[64, 128], [32, 100]], jnp.int32)
    props = np.asarray(_init_proposals(init, shapes))
    np.testing.assert_allclose(props[0, 0], [0, 0, 128, 64], atol=1e-5)
    np.testing.assert_allclose(props[1, 0], [0, 0, 100, 32], atol=1e-5)


def test_focal_cost_matches_transcription():
    """FocalLossCost (match_cost.py:53-98): pos - neg at the gt label."""
    from aod_meh_hua_tpu.engine.sparse_rcnn import _match_single

    cfg = tiny_sparse_rcnn_config()
    n, c, g = cfg.num_proposals, cfg.num_classes, cfg.max_gt
    rng = np.random.RandomState(0)
    cls_logits = rng.randn(n, c).astype(np.float32)
    # one gt; a proposal that predicts it exactly must win the match
    boxes = np.full((n, 4), 0.0, np.float32)
    boxes[:] = [40, 10, 90, 50]
    boxes[5] = [8, 8, 32, 32]
    cls_logits[5, 2] = 8.0
    gt_boxes = np.zeros((g, 4), np.float32)
    gt_labels = np.zeros((g,), np.int32)
    gt_valid = np.zeros((g,), bool)
    gt_boxes[0] = [8, 8, 32, 32]
    gt_labels[0] = 2
    gt_valid[0] = True
    t = _match_single(jnp.asarray(cls_logits), jnp.asarray(boxes),
                      jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
                      jnp.asarray(gt_valid), jnp.asarray([64, 128], jnp.int32),
                      cfg)
    labels = np.asarray(t.labels)
    assert labels[5] == 2
    assert (labels != c).sum() == 1
    np.testing.assert_allclose(np.asarray(t.bbox_targets)[5], gt_boxes[0])


@pytest.fixture(scope="module")
def sparse_setup():
    from aod_meh_hua_tpu.api import init_detector, make_eval_step_for
    from aod_meh_hua_tpu.engine import Batch, create_train_state
    from aod_meh_hua_tpu.engine.sparse_rcnn import make_sparse_rcnn_train_step
    from aod_meh_hua_tpu.ops import anchor_valid_flags

    cfg = tiny_sparse_rcnn_config()
    model, variables = init_detector(cfg, seed=0)
    tcfg = TrainConfig(optimizer="adamw", lr=2e-3, weight_decay=1e-4,
                       grad_clip=1.0, batch_size=2)
    state, tx = create_train_state(model, variables, tcfg, frozen_stages=0)
    train_step = make_sparse_rcnn_train_step(model, cfg, tx)
    eval_step = make_eval_step_for(model, cfg)

    h, w = cfg.canvas
    g = cfg.max_gt
    rng = np.random.RandomState(0)
    images = np.full((2, h, w, 3), 0.1, np.float32)
    boxes = np.zeros((2, g, 4), np.float32)
    labels = np.zeros((2, g), np.int32)
    images[0, 8:32, 8:32] = rng.randn(24, 24, 3).astype(np.float32) + 2.0
    boxes[0, 0] = [8, 8, 32, 32]
    labels[0, 0] = 1
    images[1, 30:62, 28:60] = rng.randn(32, 32, 3).astype(np.float32) - 2.0
    boxes[1, 0] = [28, 30, 60, 62]
    labels[1, 0] = 3
    gt_valid = np.zeros((2, g), bool)
    gt_valid[:, 0] = True
    shapes = np.tile([[h, w]], (2, 1)).astype(np.int32)
    av = anchor_valid_flags(cfg.build_anchor_generator(), cfg.featmap_sizes(),
                            shapes)
    batch = Batch(images, boxes, labels, gt_valid, av, shapes)
    return cfg, state, train_step, eval_step, batch


def test_sparse_rcnn_train_step_finite_and_updates(sparse_setup):
    cfg, state, train_step, eval_step, batch = sparse_setup
    own = jax.tree.map(jnp.array, state)
    state1, aux = train_step(own, batch, jax.random.PRNGKey(0))
    for k in ("loss", "loss_cls", "loss_bbox", "loss_iou"):
        assert np.isfinite(float(aux[k])), k
    assert float(aux["num_pos"]) == 2.0
    # the learnable proposals themselves train
    b0 = np.asarray(state.params["init_proposal_bboxes"])
    b1 = np.asarray(state1.params["init_proposal_bboxes"])
    assert not np.allclose(b0, b1)
    f0 = np.asarray(state.params["head_0"]["fc_cls"]["kernel"])
    f1 = np.asarray(state1.params["head_0"]["fc_cls"]["kernel"])
    assert not np.allclose(f0, f1)


def test_sparse_rcnn_overfits_and_detects(sparse_setup):
    """400 AdamW steps: both synthetic boxes recovered as the top
    detections of the final stage (IoU > 0.6, no NMS)."""
    from aod_meh_hua_tpu.ops.bbox import bbox_overlaps
    from aod_meh_hua_tpu.engine.batch import EvalBatch

    cfg, state, train_step, eval_step, batch = sparse_setup
    state = jax.tree.map(jnp.array, state)
    key = jax.random.PRNGKey(0)
    for _ in range(400):
        key, k = jax.random.split(key)
        state, aux = train_step(state, batch, k)
    assert float(aux["loss"]) < 3.0

    eb = EvalBatch(batch.images, batch.img_shapes,
                   np.ones((2, 4), np.float32), np.ones(2, bool))
    dets = eval_step({"params": state.params,
                      "batch_stats": state.batch_stats}, eb)
    bx, sc = np.asarray(dets.boxes), np.asarray(dets.scores)
    lb = np.asarray(dets.labels)
    for b, (gt, lab) in enumerate([([8, 8, 32, 32], 1), ([28, 30, 60, 62], 3)]):
        i = sc[b].argmax()
        iou = np.asarray(bbox_overlaps(jnp.asarray([gt], jnp.float32),
                                       jnp.asarray(bx[b, i:i + 1])))[0, 0]
        assert iou > 0.6, (b, bx[b, i], iou)
        assert lb[b, i] == lab
