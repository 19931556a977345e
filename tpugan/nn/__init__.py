from tpugan.nn.core import Module, Sequential  # noqa: F401
from tpugan.nn.layers import (  # noqa: F401
    BatchNorm,
    Conv,
    ConvTranspose,
    Dense,
    Embedding,
    LeakyReLU,
    ReLU,
    Tanh,
)
from tpugan.nn.spectral_norm import SpectralNorm  # noqa: F401
