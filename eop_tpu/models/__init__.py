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


def init_model(model, rng, sample_input, train: bool = False,
               on_host: bool = False):
    """Jitted ``model.init`` — eager init dispatches thousands of ops
    one-by-one (catastrophic over a remote-device tunnel); under jit it is
    one compiled program.

    ``on_host=True`` runs the init on the local CPU backend so the
    returned leaves live on the host.  Use it whenever the variables will
    be CLOSED OVER by a jitted program (the CLI infer paths) rather than
    passed as arguments: lowering embeds closed-over arrays as constants
    and fetches each accelerator-resident leaf synchronously — ~400
    serialized round-trips through a remote-device tunnel, minutes of
    apparent hang.  Host-resident constants embed locally.  Trainers keep
    the default: their state is donated through jitted step arguments and
    never embedded."""
    import functools

    import jax

    jit_init = jax.jit(functools.partial(model.init, train=train))
    if on_host:
        with jax.default_device(jax.devices("cpu")[0]):
            return jit_init(rng, sample_input)
    return jit_init(rng, sample_input)
