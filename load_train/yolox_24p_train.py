"""24p training config (ref yolox_24p/load_train/yolox_24p_train.py:1-19;
the MASTER_ADDR/PORT env exports are NCCL bootstrap, obsolete on TPU)."""

from eop_tpu.exp import Exp24P as MyExp


class Exp(MyExp):
    def __init__(self):
        super().__init__()
        self.depth = 0.33
        self.width = 0.50

        self.num_classes = 80
        self.max_epoch = 2000
        self.L1_epoch = 100
        self.data_num_workers = 4
        self.exp_name = "yolox_24p"
