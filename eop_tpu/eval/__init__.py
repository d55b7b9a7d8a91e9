from .postprocess import (
    Detections,
    postprocess_bbox,
    postprocess_bbox_heads,
    postprocess_24p,
    postprocess_24p_heads,
)
from .coco_eval import COCOeval, COCOeval_opt
from .coco_evaluator import (
    COCOEvaluator,
    per_class_AP_table,
    per_class_AR_table,
)
from .evaluator_24p import Evaluator24P
from .voc_eval import voc_eval
from .voc_evaluator import VOCEvaluator
