"""24p eval config (ref yolox_24p/load_eval/yolox_24p_eval.py)."""

from eop_tpu.exp import Exp24P as MyExp


class Exp(MyExp):
    def __init__(self):
        super().__init__()
        self.depth = 0.33
        self.width = 0.50
        self.input_size = (640, 640)

        self.num_classes = 80
        self.data_num_workers = 4
        self.exp_name = "yolox_24p"
