"""yolox-x: depth 1.33 / width 1.25 (ref exps/default/yolox_x.py)."""

from eop_tpu.exp import Exp as _Scale, config_name


class Exp(_Scale):
    def __init__(self):
        super().__init__()
        self.depth, self.width = 1.33, 1.25
        self.exp_name = config_name(__file__)
