from tpugan.losses.adversarial import (  # noqa: F401
    LOSS_KINDS,
    d_loss_fake_fn,
    d_loss_fn,
    d_loss_real_fn,
    g_loss_fn,
)
from tpugan.losses.gradient_penalty import gradient_penalty  # noqa: F401
