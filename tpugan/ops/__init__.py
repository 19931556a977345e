"""tpugan.ops — the compute-kernel seam.

Every hot op in the framework (conv, transpose-conv, normalize+activation
fusions) is a function here with one or more implementations:

- ``impl="xla"``: a ``jax.lax`` formulation tuned for how XLA:TPU tiles onto
  the MXU (always available; the correctness reference).
- ``impl="pallas"``: a hand-written Pallas/Mosaic kernel for the cases where
  we can beat XLA's lowering (registered lazily; falls back to xla when a
  shape is unsupported).

Models never call ``lax.conv*`` directly — they go through this module, so
the kernel backend is switchable per run (``train.kernels`` config).
"""

from tpugan.ops.augment import apply_policy, parse_policy  # noqa: F401
from tpugan.ops.convs import conv2d, conv_transpose2d, set_default_impl  # noqa: F401
from tpugan.ops.fused import bn_act, bias_act  # noqa: F401
from tpugan.ops.pallas_conv_stats import (  # noqa: F401
    conv_bn_stats,
    fuse_stats_enabled,
    set_fuse_stats,
)
