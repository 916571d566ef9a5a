"""MEH-RetinaNet VOC0712 active-learning config.

Reference-compatible plain-python config (the format
utils.config.load_reference_config consumes — same key layout as the
reference's configs/_base_/Config_RetinaNet.py, so that file also loads
directly). Values here reproduce the paper's live RetinaNet experiment.
"""

# -- uncertainty scoring --
uncertainty_pool = "Entropy_NMS"     # Random | Entropy_ALL | Entropy_NMS | Entropy_NoNMS
uncertainty_type = "Epistemic"       # Shannon | Aleatoric | Epistemic | Total
uncertainty_pool2 = "objectSum_scaleMax_classSum"

# -- model --
model = dict(
    type="SSL_L_RetinaNet",
    backbone=dict(type="ResNet", depth=50, frozen_stages=1, norm_eval=True),
    neck=dict(type="FPN", in_channels=[256, 512, 1024, 2048], out_channels=256,
              start_level=1, add_extra_convs="on_input", num_outs=5),
    bbox_head=dict(
        type="Lambda_L2Net",
        num_classes=20,
        in_channels=256,
        stacked_convs=4,
        feat_channels=256,
        anchor_generator=dict(
            type="AnchorGenerator", octave_base_scale=4, scales_per_octave=3,
            ratios=[0.5, 1.0, 2.0], strides=[8, 16, 32, 64, 128],
        ),
        bbox_coder=dict(type="DeltaXYWHBBoxCoder",
                        target_means=[0.0, 0.0, 0.0, 0.0],
                        target_stds=[1.0, 1.0, 1.0, 1.0]),
        loss_cls=dict(type="EDL_Softmax_FocalLoss", last_activation="relu",
                      num_classes=20, annealing_step=10, gamma=2.0, alpha=0.25,
                      loss_weight=1.0),
        loss_bbox=dict(type="L1Loss", loss_weight=1.0),
    ),
    train_cfg=dict(
        assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5, neg_iou_thr=0.4,
                      min_pos_iou=0, ignore_iof_thr=-1),
        allowed_border=-1, bias="uniform", pos_weight=-1,
    ),
    test_cfg=dict(nms_pre=1000, min_bbox_size=0, score_thr=0.05,
                  nms=dict(type="nms", iou_threshold=0.5), max_per_img=100),
)

# -- optimizer / schedule --
optimizer = dict(type="SGD", lr=0.001, momentum=0.9, weight_decay=0.0001)
lr_config = dict(policy="step", step=[2])

# -- data --
data = dict(samples_per_gpu=2, workers_per_gpu=8)

# -- active learning --
X_S_size = 16551 // 40
X_L_0_size = 16551 // 20
cycles = [0, 1, 2, 3, 4, 5, 6]
epoch_ratio = [3, 1]
outer_epoch = 2
X_L_repeat = 2
X_U_repeat = 2
