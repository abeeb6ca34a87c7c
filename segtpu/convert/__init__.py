from segtpu.convert.torch_import import (  # noqa: F401
    conv_w_to_hwio, load_mbv2_state_dict, load_mbv2_checkpoint)
