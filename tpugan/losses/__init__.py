from tpugan.losses.adversarial import (  # noqa: F401
    d_loss_fn,
    g_loss_fn,
    LOSS_KINDS,
)
from tpugan.losses.gradient_penalty import gradient_penalty  # noqa: F401
