"""Model zoo: Flax backbones, necks, and detection heads.

TPU-first re-implementations of the reference's live model families
(SURVEY.md section 2.4-2.7): ResNet-50 + FPN + MEH-Retina head, and
SSD-VGG16 + SSDNeck + MEH-SSD head.
"""

from .resnet import ResNet, convert_torchvision_resnet
from .fpn import FPN
from .retina_head import RetinaMEHHead
from .detector import MEHRetinaNet, build_retinanet, init_retinanet
from .vgg import SSDVGG, convert_mmcv_vgg16
from .ssd_neck import SSDNeck
from .ssd_head import SSDMEHHead
from .ssd_detector import MEHSSD, build_ssd, init_ssd
from .fcos import FCOS, FCOSHead, build_fcos, init_fcos
from .autoassign import (AutoAssign, AutoAssignHead, build_autoassign,
                         init_autoassign)
from .free_anchor import (FreeAnchorNet, RetinaHeadPlain, build_free_anchor,
                          init_free_anchor)
from .guided_anchor import (GARetinaNet, build_ga_retinanet,
                            init_ga_retinanet)
from .grid_rcnn import GridRCNN, build_grid_rcnn, init_grid_rcnn
from .htc import HTC, build_htc, init_htc
from .scnet import SCNet, build_scnet, init_scnet
from .nasfcos import NASFCOS, build_nasfcos, init_nasfcos
from .gn_ws import GNWSFasterRCNN, build_gn_ws, init_gn_ws
from .sabl import SABLRetinaNet, build_sabl_retinanet, init_sabl_retinanet
from .yolact import YOLACT, build_yolact, init_yolact
from .fsaf import FSAF, FSAFHead, build_fsaf, init_fsaf
from .vfnet import VFNet, VFNetHead, build_vfnet, init_vfnet
from .atss import ATSS, ATSSHead, build_atss, init_atss
from .gfl import GFL, GFLHead, build_gfl, init_gfl, integral
from .yolo import YOLOV3, Darknet53, YOLOV3Neck, YOLOV3Head, build_yolov3, init_yolov3
from .detr import DETR, build_detr, init_detr, sine_positional_encoding
from .centernet import CenterNet, build_centernet, init_centernet
from .cornernet import CornerNet, init_cornernet
from .centripetal import CentripetalNet, init_centripetalnet
from .deformable_detr import (DeformableDETR, build_deformable_detr,
                              init_deformable_detr)
from .mask_rcnn import MaskRCNN, build_mask_rcnn, init_mask_rcnn
from .point_rend import (CoarseMaskHead, MaskPointHead, PointRend,
                         build_point_rend, init_point_rend)
from .mask_scoring_rcnn import (MaskIoUHead, MaskScoringRCNN,
                                build_mask_scoring_rcnn,
                                init_mask_scoring_rcnn)
from .rpn_only import (FastRCNN, RPNOnly, build_fast_rcnn, build_rpn_only,
                       init_fast_rcnn, init_rpn_only)
from .cascade_rpn import (CascadeRPNNet, build_cascade_rpn,
                          init_cascade_rpn)
from .trident import TridentFasterRCNN, build_trident, init_trident
from .detectors_rs import (DetectoRSCascadeRCNN, build_detectors_rs,
                           init_detectors_rs)
from .reppoints import RepPoints, init_reppoints
from .sparse_rcnn import SparseRCNN, build_sparse_rcnn, init_sparse_rcnn
from .yolof import YOLOF, DilatedEncoder, build_yolof, init_yolof
from .foveabox import FoveaBox, build_foveabox, init_foveabox
from .two_stage import (
    CascadeRCNN,
    DoubleConvFCBBoxHead,
    DoubleHeadRCNN,
    FasterRCNN,
    RPNHead,
    Shared2FCBBoxHead,
    build_cascade_rcnn,
    build_double_head_rcnn,
    build_faster_rcnn,
    init_cascade_rcnn,
    init_double_head_rcnn,
    init_faster_rcnn,
)
