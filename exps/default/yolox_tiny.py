"""yolox-tiny config (ref exps/default/yolox_tiny.py)."""

import os

from eop_tpu.exp import Exp as MyExp


class Exp(MyExp):
    def __init__(self):
        super().__init__()
        self.depth = 0.33
        self.width = 0.375
        # the reference sets `input_scale` — a typo for input_size that no
        # code reads — so its TRAINING resolution stays at the base 640
        # while only test_size drops to 416; replicated literally for
        # behavioral parity (ref exps/default/yolox_tiny.py:15)
        self.input_scale = (416, 416)
        self.mosaic_scale = (0.5, 1.5)
        self.random_size = (10, 20)
        self.test_size = (416, 416)
        self.enable_mixup = False
        self.exp_name = os.path.split(os.path.realpath(__file__))[1].split(".")[0]
