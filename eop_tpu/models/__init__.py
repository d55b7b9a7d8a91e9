from .darknet import CSPDarknet, Darknet
from .densenet import DenseNet, densenet121
from .head import (
    YOLOXHead,
    decode_outputs,
    flatten_head_outputs,
    make_grids_and_strides,
)
from .pafpn import YOLOFPN, YOLOPAFPN, BACKBONE_TYPES
from .resnet import ResNet, resnet50
from .vgg import VGG, vgg19
from .yolox import YOLOX, YOLOv3, inference_outputs, training_outputs


def init_model(model, rng, sample_input, train: bool = False):
    """Jitted ``model.init`` — eager init dispatches thousands of ops
    one-by-one (catastrophic over a remote-device tunnel); under jit it is
    one compiled program."""
    import functools

    import jax

    return jax.jit(
        functools.partial(model.init, train=train)
    )(rng, sample_input)
