"""yolov3: YOLOFPN neck over classic Darknet-53 (ref exps/default/yolov3.py)."""

from eop_tpu.exp import Exp as _Scale, config_name


class Exp(_Scale):
    def __init__(self):
        super().__init__()
        self.depth, self.width = 1.0, 1.0
        self.exp_name = config_name(__file__)

    def get_model(self, backbone_type=None):
        if getattr(self, "model", None) is None:
            import jax.numpy as jnp

            from eop_tpu.models import YOLOv3

            self.model = YOLOv3(
                num_classes=self.num_classes,
                width=self.width,
                dtype=getattr(jnp, self.compute_dtype),
            )
        return self.model
