from .transforms import letterbox, letterbox_batch_device
