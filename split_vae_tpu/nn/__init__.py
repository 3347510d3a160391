"""flax.linen building blocks for the SPLIT model families."""

from split_vae_tpu.nn.encoders import ConvEncoder, FCEncoder, GMVaeEncoder
from split_vae_tpu.nn.decoders import ConvDecoder
from split_vae_tpu.nn.classifier import Classifier
from split_vae_tpu.nn.spair_nets import (
    ImageEncoder,
    ImageEncoderDense,
    ImageDecoder,
    ImageDecoderDense,
    BackgroundModel,
    ObjEncoder,
    ObjDecoder,
    SpairEncoder,
    SpairDecoder,
    render,
)
