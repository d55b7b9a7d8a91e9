"""Custom-dataset yolox-s template (ref exps/example/custom/yolox_s.py)."""

from eop_tpu.exp import Exp as _Scale, config_name


class Exp(_Scale):
    def __init__(self):
        super().__init__()
        self.depth, self.width = 0.33, 0.50
        self.exp_name = config_name(__file__)

        # Point these at your own COCO-format dataset.
        self.data_dir = "datasets/coco128"
        self.train_ann = "instances_train2017.json"
        self.val_ann = "instances_val2017.json"
        self.num_classes = 71
        self.max_epoch = 300
        self.data_num_workers = 4
        self.eval_interval = 1
