from .iou_loss import iou_loss, bce_with_logits
from .simota import simota_assign, SimOTAConfig
from .yolox_loss import yolox_losses, YoloxLossConfig
from .loss_24p import (
    Loss24PConfig,
    DWAState,
    simota_assign_24p,
    loss_24p,
)
