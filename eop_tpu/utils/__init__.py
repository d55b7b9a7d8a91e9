from .demo_utils import demo_postprocess, multiclass_nms, nms
from .logger import catch, logger, setup_logger
from .metric import AverageMeter, MeterBuffer, device_mem_usage
from .model_utils import count_params, fuse_conv_bn, get_model_info
from .setup_env import configure_module, configure_omp
from .visualize import vis, vis_24p
