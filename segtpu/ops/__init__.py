from segtpu.ops.layer_factory import (  # noqa: F401
    OP_NAMES,
    NUM_OPS,
    AGG_OP_NAMES,
    op_init,
    op_apply,
    op_is_parametric,
)
