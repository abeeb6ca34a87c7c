from segtpu.models.encoders import mbv2_init, mbv2_apply, MBV2_TAP_CHANNELS  # noqa: F401
from segtpu.models.micro_decoders import (  # noqa: F401
    micro_decoder_init,
    micro_decoder_apply,
    validate_genotype,
    GenotypeError,
)
from segtpu.models.segmenter import (  # noqa: F401
    segmenter_init,
    segmenter_apply,
    create_segmenter,
)
from segtpu.models.arch_literals import ARCHS  # noqa: F401
