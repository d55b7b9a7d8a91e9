"""yolov3 config: YOLOFPN neck over classic Darknet-53
(ref exps/default/yolov3.py)."""

import os

from eop_tpu.exp import Exp as MyExp


class Exp(MyExp):
    def __init__(self):
        super().__init__()
        self.depth = 1.0
        self.width = 1.0
        self.exp_name = os.path.split(os.path.realpath(__file__))[1].split(".")[0]

    def get_model(self, backbone_type=None):
        import jax.numpy as jnp

        from eop_tpu.models import YOLOv3

        dtype = getattr(jnp, self.compute_dtype)
        if getattr(self, "model", None) is None:
            self.model = YOLOv3(
                num_classes=self.num_classes, width=self.width, dtype=dtype
            )
        return self.model
