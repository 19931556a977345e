"""Fused normalize + activation epilogues.

These are elementwise chains that XLA fuses into the preceding conv's
epilogue on its own; they exist as named ops so (a) models have a single
audited seam for the BN math, and (b) a Pallas conv kernel can consume the
same scale/shift representation directly in its epilogue.

The affine form: given BN statistics (mean, var) and parameters
(scale, bias),

    y = act((x - mean) * rsqrt(var + eps) * scale + bias)
      = act(x * a + b)   with  a = scale*rsqrt(var+eps),  b = bias - mean*a

so a fused conv kernel only needs a per-channel multiply-add epilogue.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


from tpugan.ops.kernel_common import act as _act  # noqa: E402


def bn_affine(scale, bias, mean, var, eps: float):
    """Fold BN stats+params into per-channel (a, b) for a fused epilogue."""
    a = scale * lax.rsqrt(var + eps)
    return a, bias - mean * a


def bn_act(x, scale, bias, mean, var, *, eps: float = 1e-5,
           act: str = "relu", leak: float = 0.2, out_dtype=None):
    """Apply BN (given stats) then activation; compute in fp32."""
    a, b = bn_affine(scale, bias, mean, var, eps)
    y = _act(x.astype(jnp.float32) * a + b, act, leak)
    return y.astype(out_dtype or x.dtype)


def bias_act(x, bias, *, act: str = "leaky_relu", leak: float = 0.2,
             out_dtype=None):
    """Bias + activation epilogue (for BN-free layers)."""
    y = x.astype(jnp.float32)
    if bias is not None:
        y = y + bias
    y = _act(y, act, leak)
    return y.astype(out_dtype or x.dtype)
