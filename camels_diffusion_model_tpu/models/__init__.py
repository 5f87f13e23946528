from .blocks import ResidualConvBlock, UnetDown, UnetUp, EmbedFC, torch_conv_init
from .context_unet import ContextUnet, count_params

__all__ = [
    "ResidualConvBlock",
    "UnetDown",
    "UnetUp",
    "EmbedFC",
    "torch_conv_init",
    "ContextUnet",
    "count_params",
]
