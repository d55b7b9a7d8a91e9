from .blocks import (
    BaseConv,
    DWConv,
    Bottleneck,
    ResLayer,
    SPPBottleneck,
    CSPLayer,
    Focus,
    get_activation,
)
from .boxes import (
    bboxes_iou,
    matrix_iou,
    adjust_box_anns,
    xyxy2xywh,
    xyxy2cxcywh,
    cxcywh2xyxy,
    filter_box,
)
from .nms import nms, batched_class_nms
from .circle_iou import circle_inter, circle_giou_24, pairwise_circle_giou_loss
from .polygon import pts_in_poly, radii_from_points, polygon_points_from_radii
