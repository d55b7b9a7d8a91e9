"""yolox-l: depth 1.0 / width 1.0 (ref exps/default/yolox_l.py)."""

from eop_tpu.exp import Exp as _Scale, config_name


class Exp(_Scale):
    def __init__(self):
        super().__init__()
        self.depth, self.width = 1.0, 1.0
        self.exp_name = config_name(__file__)
