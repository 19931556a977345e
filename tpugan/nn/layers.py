"""Core layers: conv / transpose-conv / dense / batchnorm / embedding.

TPU-first decisions:

- **NHWC everywhere.** TPUs tile the last dimension into 128-wide lanes, so
  channels-last keeps the channel contraction on the MXU without transposes.
  (The reference uses NCHW because cuDNN prefers it; that is exactly the kind
  of hardware idiom we do NOT port.)
- **Transpose conv = input-dilated conv.** XLA has no separate deconv; we
  lower ``ConvTranspose(k, s, p)`` (reference `ConvTranspose2d` semantics,
  out = (in-1)*s - 2p + k) to ``conv_general_dilated`` with
  ``lhs_dilation=s`` and padding ``k-1-p``, with the kernel spatially flipped.
- **bf16 compute, fp32 statistics.** Params live in fp32; layers cast to the
  compute dtype. The MXU accumulates bf16 contractions in fp32 internally
  (convs emit their natural dtype — see ops/convs.py for why forcing an f32
  output dtype breaks the conv VJP). BatchNorm statistics are always fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from tpugan import ops
from tpugan.nn.core import Module

# Reference init idiom: conv/dense weights ~ N(0, 0.02); BN scale ~ N(1, 0.02).
INIT_STD = 0.02


def winit(key, shape, dtype=jnp.float32, std: float = INIT_STD):
    return jax.random.normal(key, shape, dtype) * std


class Conv(Module):
    """Strided 2D convolution, NHWC/HWIO."""

    def __init__(self, cin: int, cout: int, kernel: int = 4, stride: int = 2,
                 padding: int = 1, use_bias: bool = True,
                 dtype=jnp.bfloat16):
        self.cin, self.cout = cin, cout
        self.kernel, self.stride, self.padding = kernel, stride, padding
        self.use_bias = use_bias
        self.dtype = dtype

    def init(self, key):
        p = {"w": winit(key, (self.kernel, self.kernel, self.cin, self.cout))}
        if self.use_bias:
            p["b"] = jnp.zeros((self.cout,), jnp.float32)
        return p, {}

    def apply(self, params, state, x, *, train: bool = False):
        w = params["w"].astype(self.dtype)
        y = ops.conv2d(x.astype(self.dtype), w,
                       stride=self.stride, padding=self.padding)
        if self.use_bias:
            y = y + params["b"]
        return y.astype(self.dtype), {}


class ConvTranspose(Module):
    """Transpose conv with reference ``ConvTranspose2d(k, s, p)`` semantics.

    out_size = (in - 1) * s - 2p + k.  Lowered to an input-dilated regular
    conv: insert (s-1) zeros between input pixels, pad (k-1-p) on every edge,
    then convolve stride-1 with the spatially-flipped kernel. On TPU, XLA
    tiles this straight onto the MXU; there is no dedicated deconv unit to
    target (unlike the reference's cuDNN path).

    Weight layout is HWIO with I=cin, O=cout (already transposed relative to
    the reference's (cin, cout, kh, kw) deconv weights).
    """

    def __init__(self, cin: int, cout: int, kernel: int = 4, stride: int = 2,
                 padding: int = 1, use_bias: bool = True,
                 dtype=jnp.bfloat16):
        if kernel - 1 - padding < 0:
            raise ValueError("require kernel - 1 - padding >= 0")
        self.cin, self.cout = cin, cout
        self.kernel, self.stride, self.padding = kernel, stride, padding
        self.use_bias = use_bias
        self.dtype = dtype

    def init(self, key):
        p = {"w": winit(key, (self.kernel, self.kernel, self.cin, self.cout))}
        if self.use_bias:
            p["b"] = jnp.zeros((self.cout,), jnp.float32)
        return p, {}

    def apply(self, params, state, x, *, train: bool = False):
        w = params["w"].astype(self.dtype)
        y = ops.conv_transpose2d(x.astype(self.dtype), w,
                                 stride=self.stride, padding=self.padding)
        if self.use_bias:
            y = y + params["b"]
        return y.astype(self.dtype), {}


class Dense(Module):
    """Linear layer — used for G's z→4×4 head and D's 4×4→logit tail.

    The reference implements these as 4×4 VALID (de)convolutions on 1×1/4×4
    maps; on TPU a plain matmul is the same contraction shaped for the MXU.
    """

    def __init__(self, din: int, dout: int, use_bias: bool = True,
                 dtype=jnp.bfloat16):
        self.din, self.dout = din, dout
        self.use_bias = use_bias
        self.dtype = dtype

    def init(self, key):
        p = {"w": winit(key, (self.din, self.dout))}
        if self.use_bias:
            p["b"] = jnp.zeros((self.dout,), jnp.float32)
        return p, {}

    def apply(self, params, state, x, *, train: bool = False):
        y = jnp.dot(x.astype(self.dtype), params["w"].astype(self.dtype),
                    preferred_element_type=jnp.float32)
        if self.use_bias:
            y = y + params["b"]
        return y.astype(self.dtype), {}


class BatchNorm(Module):
    """Batch normalization over (N, H, W) with functionally-threaded state.

    Matches the reference semantics: normalize with the *biased* batch
    variance in training; update running stats with the *unbiased* variance
    using momentum 0.1 (running = 0.9*running + 0.1*batch); use running stats
    in eval.  Statistics are computed and stored in fp32 regardless of the
    compute dtype.

    Under data parallelism the batch axis is sharded over the mesh; the
    ``jnp.mean`` here is a global-batch mean, so XLA inserts the cross-replica
    reduction automatically (this replaces SyncBatchNorm-style machinery).
    """

    def __init__(self, num_features: int, eps: float = 1e-5,
                 momentum: float = 0.1, dtype=jnp.bfloat16, axis_reduce=None):
        self.c = num_features
        self.eps = eps
        self.momentum = momentum
        self.dtype = dtype
        self.axis_reduce = axis_reduce  # reserved for explicit shard_map use

    def init(self, key):
        params = {
            "scale": jnp.ones((self.c,), jnp.float32)
            + winit(key, (self.c,), std=INIT_STD),
            "bias": jnp.zeros((self.c,), jnp.float32),
        }
        state = {
            "mean": jnp.zeros((self.c,), jnp.float32),
            "var": jnp.ones((self.c,), jnp.float32),
        }
        return params, state

    def update_running(self, state, mean, var, n: int):
        """Momentum update of the running stats from a batch's (biased)
        mean/var over n elements — shared by the unfused path here and the
        fused conv+stats path in DBlock."""
        unbiased = var * (n / max(n - 1, 1))
        return {
            "mean": (1 - self.momentum) * state["mean"]
            + self.momentum * mean,
            "var": (1 - self.momentum) * state["var"]
            + self.momentum * unbiased,
        }

    def apply(self, params, state, x, *, train: bool = False):
        xf = x.astype(jnp.float32)
        red = tuple(range(x.ndim - 1))  # all but channels
        if train:
            mean = jnp.mean(xf, axis=red)
            # E[x²]−E[x]² can land slightly negative for near-constant
            # channels (fp32 cancellation); rsqrt would then yield NaN.
            var = jnp.maximum(
                jnp.mean(jnp.square(xf), axis=red) - jnp.square(mean), 0.0)
            n = 1
            for a in red:
                n *= x.shape[a]
            new_state = self.update_running(state, mean, var, n)
        else:
            mean, var = state["mean"], state["var"]
            new_state = {}
        inv = lax.rsqrt(var + self.eps) * params["scale"]
        y = (xf - mean) * inv + params["bias"]
        return y.astype(self.dtype), new_state


class Embedding(Module):
    """Label embedding for conditional G/D (reference: ``nn.Embedding``)."""

    def __init__(self, n_classes: int, dim: int, dtype=jnp.bfloat16):
        self.n, self.dim = n_classes, dim
        self.dtype = dtype

    def init(self, key):
        return {"table": jax.random.normal(key, (self.n, self.dim))}, {}

    def apply(self, params, state, y, *, train: bool = False):
        return jnp.take(params["table"], y, axis=0).astype(self.dtype), {}


class ReLU(Module):
    def init(self, key):
        return {}, {}

    def apply(self, params, state, x, *, train: bool = False):
        return jax.nn.relu(x), {}


class LeakyReLU(Module):
    def __init__(self, slope: float = 0.2):
        self.slope = slope

    def init(self, key):
        return {}, {}

    def apply(self, params, state, x, *, train: bool = False):
        return jax.nn.leaky_relu(x, self.slope), {}


class Tanh(Module):
    def init(self, key):
        return {}, {}

    def apply(self, params, state, x, *, train: bool = False):
        return jnp.tanh(x), {}
