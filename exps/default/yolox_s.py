"""yolox-s: depth 0.33 / width 0.50 (ref exps/default/yolox_s.py)."""

from eop_tpu.exp import Exp as _Scale, config_name


class Exp(_Scale):
    def __init__(self):
        super().__init__()
        self.depth, self.width = 0.33, 0.50
        self.exp_name = config_name(__file__)
