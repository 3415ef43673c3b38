from .duoformer import DuoFormer, DuoFormerLegacy, count_parameters  # noqa: F401
from .projection import ChannelProjectors, Projection  # noqa: F401
from .resnet import ResNet50withFC, ResNetBackbone  # noqa: F401
from .transformer import (  # noqa: F401
    MultiscaleFormer,
    MultiscaleTransformer,
    ScaleFormer,
    num_scale_tokens,
)
