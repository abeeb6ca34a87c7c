from segtpu.utils.helpers import (  # noqa: F401
    IMG_MEAN, IMG_STD, IMG_SCALE, prepare_img, AverageMeter, compute_params)
from segtpu.utils.metrics import confusion_matrix, compute_iu, mean_iou  # noqa: F401
