"""L3 core modules."""

from .layers import (
    Conv2dLayer,
    DenseNorm,
    FullyConnectedLayer,
    MinibatchStdLayer,
    ResBlock,
    SelfAttention,
    instance_norm_2d,
    normalize_2nd_moment,
)
from .mapping import MappingNetwork
from .spade import SpadeConv2dLayer, SpadeNormBlock, SpadeResBlock
from .synthesis import (
    SynthesisBlockFull,
    SynthesisLayer,
    SynthesisNetworkFull,
    ToRGBLayer,
    ToRGBLayerFull,
)
from .encoders import (
    ConstEncoderNetwork,
    FeatureEncoder,
    StyleEncoderNetwork,
    StyleEncoderNetworkV16,
)
from .discriminator import Discriminator, DiscriminatorBlock, DiscriminatorEpilogue
