"""yolox-nano: depthwise convs at 416 px (ref exps/default/yolox_nano.py)."""

from eop_tpu.exp import Exp as _Scale, config_name


class Exp(_Scale):
    def __init__(self):
        super().__init__()
        self.depth, self.width = 0.33, 0.25
        self.depthwise = True
        self.input_size = self.test_size = (416, 416)
        self.random_size = (10, 20)
        self.mosaic_scale = (0.5, 1.5)
        self.mosaic_prob = 0.5
        self.enable_mixup = False
        self.exp_name = config_name(__file__)
