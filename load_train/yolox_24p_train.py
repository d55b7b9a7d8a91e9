"""24p training config (ref yolox_24p/load_train/yolox_24p_train.py:1-19;
the MASTER_ADDR/PORT env exports there are NCCL bootstrap, obsolete on TPU)."""

from eop_tpu.exp import Exp24P as _Base


class Exp(_Base):
    def __init__(self):
        super().__init__()
        self.exp_name = "yolox_24p"
        self.depth, self.width = 0.33, 0.50
        self.num_classes = 80
        self.data_num_workers = 4
        # reference schedule: 2000 epochs, L1 branch on for the last 100
        self.max_epoch = 2000
        self.L1_epoch = 100
