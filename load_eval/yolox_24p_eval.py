"""24p eval config (ref yolox_24p/load_eval/yolox_24p_eval.py)."""

from eop_tpu.exp import Exp24P as _Base


class Exp(_Base):
    def __init__(self):
        super().__init__()
        self.exp_name = "yolox_24p"
        self.depth, self.width = 0.33, 0.50
        self.num_classes = 80
        self.data_num_workers = 4
        self.input_size = (640, 640)
