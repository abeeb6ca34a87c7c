from segtpu.core.layers import (  # noqa: F401
    conv_init,
    conv_apply,
    bn_init,
    bn_apply,
    conv_bn_init,
    conv_bn_apply,
    relu,
    relu6,
    ACTIVATIONS,
)
from segtpu.core.resize import resize_bilinear  # noqa: F401
