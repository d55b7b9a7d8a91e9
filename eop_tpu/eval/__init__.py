from .postprocess import (
    Detections,
    postprocess_bbox,
    postprocess_24p,
)
