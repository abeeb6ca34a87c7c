from segtpu.kernels.upsample_argmax import upsample_argmax  # noqa: F401
