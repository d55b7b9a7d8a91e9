"""Custom-dataset nano template (ref exps/example/custom/nano.py)."""

from eop_tpu.exp import Exp as _Scale, config_name


class Exp(_Scale):
    def __init__(self):
        super().__init__()
        self.depth, self.width = 0.33, 0.25
        self.depthwise = True
        self.input_size = self.test_size = (416, 416)
        self.random_size = (10, 20)
        self.mosaic_scale = (0.5, 1.5)
        self.enable_mixup = False
        self.exp_name = config_name(__file__)

        # Point these at your own COCO-format dataset.
        self.data_dir = "datasets/coco128"
        self.num_classes = 71
