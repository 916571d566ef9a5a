"""Localization Distillation family (parity targets:
mmdet/models/dense_heads/ld_head.py, losses/kd_loss.py,
detectors/kd_one_stage.py, configs/ld/* — cited in engine/ld.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from aod_meh_hua_tpu.utils.config import TrainConfig, tiny_ld_config


def test_kd_kl_matches_torch_formula():
    """kd loss == T^2 * mean_bins KL(softmax(soft/T) || softmax(pred/T)),
    checked against a direct numpy transcription of kd_loss.py:10-36."""
    from aod_meh_hua_tpu.engine.ld import kd_kl_div

    rng = np.random.RandomState(0)
    pred = rng.randn(5, 9).astype(np.float32)
    soft = rng.randn(5, 9).astype(np.float32)
    T = 10.0

    def softmax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    tgt = softmax(soft / T)
    logp = np.log(softmax(pred / T))
    want = (tgt * (np.log(tgt) - logp)).mean(-1) * T * T
    got = kd_kl_div(jnp.asarray(pred), jnp.asarray(soft), T)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-6)
    # identical logits -> zero loss
    z = kd_kl_div(jnp.asarray(pred), jnp.asarray(pred), T)
    np.testing.assert_allclose(np.asarray(z), 0.0, atol=1e-5)


def test_ld_distills_student_toward_teacher():
    """Training with the LD step (distillation weight cranked up so it
    dominates the gt terms) pulls the student's distribution logits
    toward the frozen teacher's: the probe KL drops, the teacher's
    variables never change, and the student's cls loss still falls."""
    from aod_meh_hua_tpu.api import init_detector
    from aod_meh_hua_tpu.engine import Batch, create_train_state
    from aod_meh_hua_tpu.engine.batch import prepare_images
    from aod_meh_hua_tpu.engine.ld import kd_kl_div, make_ld_train_step
    from aod_meh_hua_tpu.ops import anchor_valid_flags

    cfg = tiny_ld_config(ld_loss_weight=10.0)
    model, variables = init_detector(cfg, seed=0)
    tcfg = cfg.teacher_config()
    teacher_model, teacher_vars = init_detector(tcfg, seed=7)

    train_cfg = TrainConfig(lr=0.01, batch_size=2, grad_clip=35.0)
    state, tx = create_train_state(model, variables, train_cfg,
                                   frozen_stages=0)
    step = make_ld_train_step(model, cfg, tx, teacher_model, tcfg,
                              teacher_vars)

    rng = np.random.RandomState(0)
    h, w = cfg.canvas
    g = cfg.max_gt
    images = np.full((2, h, w, 3), 0.1, np.float32)
    boxes = np.zeros((2, g, 4), np.float32)
    labels = np.zeros((2, g), np.int32)
    images[0, 8:40, 8:40] = rng.randn(32, 32, 3).astype(np.float32) + 2.5
    boxes[0, 0] = [8, 8, 40, 40]
    labels[0, 0] = 1
    images[1, 24:56, 60:92] = rng.randn(32, 32, 3).astype(np.float32) - 2.5
    boxes[1, 0] = [60, 24, 92, 56]
    labels[1, 0] = 3
    gt_valid = np.zeros((2, g), bool)
    gt_valid[:, 0] = True
    shapes = np.tile([[h, w]], (2, 1)).astype(np.int32)
    av = anchor_valid_flags(cfg.build_anchor_generator(), cfg.featmap_sizes(),
                            shapes)
    batch = Batch(images, boxes, labels, gt_valid, av, shapes)

    from aod_meh_hua_tpu.ops.anchors import AnchorGenerator
    from aod_meh_hua_tpu.ops.assigner import atss_assign

    gen = cfg.build_anchor_generator()
    anchors = jnp.asarray(np.concatenate(
        gen.grid_anchors(cfg.featmap_sizes())).astype(np.float32))
    bounds = tuple(cfg.level_bounds())
    pos = np.asarray(jax.vmap(
        lambda gb, gv, av: atss_assign(anchors, bounds, gb, gv,
                                       topk=cfg.atss_topk, anchor_valid=av))(
        jnp.asarray(boxes), jnp.asarray(gt_valid), jnp.asarray(av))) > 0

    def probe_kl(st):
        """Unweighted mean KL between student and teacher distribution
        logits over the POSITIVE anchors (where LD applies)."""
        sv = {"params": st.params, "batch_stats": st.batch_stats}
        ims = prepare_images(jnp.asarray(images), jnp.asarray(shapes), cfg)
        _, s_logits = model.apply(sv, ims)
        _, t_logits = teacher_model.apply(teacher_vars, ims)
        rm = cfg.reg_max
        kl = np.asarray(kd_kl_div(
            s_logits.reshape(s_logits.shape[:2] + (4, rm + 1)),
            t_logits.reshape(t_logits.shape[:2] + (4, rm + 1)),
            cfg.ld_temperature))
        return float(kl[pos].mean())

    def train(weight, steps=150):
        c = tiny_ld_config(ld_loss_weight=weight)
        st, tx2 = create_train_state(model, variables,
                                     TrainConfig(lr=0.01, batch_size=2,
                                                 grad_clip=35.0),
                                     frozen_stages=0)
        stp = make_ld_train_step(model, c, tx2, teacher_model, tcfg,
                                 teacher_vars)
        st = jax.tree.map(jnp.array, st)
        cls0 = None
        for i in range(steps):
            st, aux = stp(st, batch)
            if i == 0:
                cls0 = float(aux["loss_cls"])
            assert np.isfinite(float(aux["loss"]))
        return st, cls0, float(aux["loss_cls"])

    teacher_before = jax.tree.map(np.asarray, teacher_vars)
    st_ld, cls0, cls_end = train(10.0)
    st_no, _, _ = train(0.0)
    # A/B: with LD on, the positive-anchor distributions sit much
    # closer to the teacher's than the LD-off control's do
    kl_ld = probe_kl(st_ld)
    kl_no = probe_kl(st_no)
    assert kl_ld < 0.5 * kl_no, (kl_ld, kl_no)
    assert cls_end < cls0  # the student still learns detection
    # the teacher is untouched by the optimizer
    for a, b in zip(jax.tree.leaves(teacher_before),
                    jax.tree.leaves(jax.tree.map(np.asarray, teacher_vars))):
        np.testing.assert_array_equal(a, b)
