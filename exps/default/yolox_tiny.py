"""yolox-tiny: 0.33 / 0.375 scale, 416 px eval (ref exps/default/yolox_tiny.py)."""

from eop_tpu.exp import Exp as _Scale, config_name


class Exp(_Scale):
    def __init__(self):
        super().__init__()
        self.depth, self.width = 0.33, 0.375
        # the reference sets `input_scale` — a typo for input_size that no
        # code reads — so its TRAINING resolution stays at the base 640
        # while only test_size drops to 416; replicated literally for
        # behavioral parity (ref exps/default/yolox_tiny.py:15)
        self.input_scale = (416, 416)
        self.test_size = (416, 416)
        self.random_size = (10, 20)
        self.mosaic_scale = (0.5, 1.5)
        self.enable_mixup = False
        self.exp_name = config_name(__file__)
