from tpugan.parity.torch_twin import (  # noqa: F401
    TorchDiscriminator,
    TorchGenerator,
    transplant_d,
    transplant_g,
)
