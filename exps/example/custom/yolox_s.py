"""Custom-dataset yolox-s template (ref exps/example/custom/yolox_s.py)."""

import os

from eop_tpu.exp import Exp as MyExp


class Exp(MyExp):
    def __init__(self):
        super().__init__()
        self.depth = 0.33
        self.width = 0.50
        self.exp_name = os.path.split(os.path.realpath(__file__))[1].split(".")[0]

        # Point these at your own COCO-format dataset.
        self.data_dir = "datasets/coco128"
        self.train_ann = "instances_train2017.json"
        self.val_ann = "instances_val2017.json"
        self.num_classes = 71
        self.max_epoch = 300
        self.data_num_workers = 4
        self.eval_interval = 1
