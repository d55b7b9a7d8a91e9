"""yolox-m: depth 0.67 / width 0.75 (ref exps/default/yolox_m.py)."""

from eop_tpu.exp import Exp as _Scale, config_name


class Exp(_Scale):
    def __init__(self):
        super().__init__()
        self.depth, self.width = 0.67, 0.75
        self.exp_name = config_name(__file__)
