"""Generator / discriminator building blocks.

- ``GBlock``: ConvTranspose → BatchNorm → ReLU (the generator's hot stack).
- ``GHead``: Dense z → (4×4 or 7×7) map → BatchNorm → ReLU.  The reference
  expresses this head as a 4×4 VALID deconv on a 1×1 input; on TPU that is a
  plain matmul, so we shape it for the MXU directly.
- ``DBlock``: strided Conv → [BatchNorm] → LeakyReLU (the discriminator's
  hot stack; first block omits BN per the DCGAN idiom).
- ``DTail``: 4×4 feature map → Dense → logit (the reference's final 4×4
  VALID conv).

Each block owns its primitive layers and exposes the same functional
(init, apply) protocol, so fused kernel dispatch stays inside ``tpugan.ops``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpugan.nn.core import Module
from tpugan.nn.layers import (
    BatchNorm,
    Conv,
    ConvTranspose,
    Dense,
    LeakyReLU,
    ReLU,
    Tanh,
)
from tpugan.nn.spectral_norm import SpectralNorm


class GBlock(Module):
    """ConvT(k4,s2,p1) + BN + ReLU; ``final=True`` swaps BN+ReLU for Tanh."""

    def __init__(self, cin, cout, *, batchnorm=True, final=False,
                 kernel=4, stride=2, padding=1, dtype=jnp.bfloat16):
        # BN follows, so the conv bias would be normalized away; final (Tanh)
        # layer keeps its bias.
        self.conv = ConvTranspose(cin, cout, kernel, stride, padding,
                                  use_bias=final or not batchnorm, dtype=dtype)
        self.bn = BatchNorm(cout, dtype=dtype) if (batchnorm and not final) else None
        self.act = Tanh() if final else ReLU()

    def init(self, key):
        k1, k2 = jax.random.split(key)
        params, state = {}, {}
        params["conv"], _ = self.conv.init(k1)
        if self.bn is not None:
            params["bn"], state["bn"] = self.bn.init(k2)
        return params, state

    def apply(self, params, state, x, *, train: bool = False):
        x, _ = self.conv.apply(params["conv"], {}, x, train=train)
        new_state = {}
        if self.bn is not None:
            x, new_state["bn"] = self.bn.apply(
                params["bn"], state["bn"], x, train=train)
        x, _ = self.act.apply({}, {}, x, train=train)
        return x, new_state


class GHead(Module):
    """z (N, nz) → (N, s0, s0, cout) via matmul, then BN + ReLU."""

    def __init__(self, nz, s0, cout, *, batchnorm=True, dtype=jnp.bfloat16):
        self.s0, self.cout = s0, cout
        self.dense = Dense(nz, s0 * s0 * cout, use_bias=not batchnorm,
                           dtype=dtype)
        self.bn = BatchNorm(cout, dtype=dtype) if batchnorm else None

    def init(self, key):
        k1, k2 = jax.random.split(key)
        params, state = {}, {}
        params["dense"], _ = self.dense.init(k1)
        if self.bn is not None:
            params["bn"], state["bn"] = self.bn.init(k2)
        return params, state

    def apply(self, params, state, z, *, train: bool = False):
        x, _ = self.dense.apply(params["dense"], {}, z, train=train)
        x = x.reshape(x.shape[0], self.s0, self.s0, self.cout)
        new_state = {}
        if self.bn is not None:
            x, new_state["bn"] = self.bn.apply(
                params["bn"], state["bn"], x, train=train)
        x = jax.nn.relu(x)
        return x, new_state


class DBlock(Module):
    """Conv(k4,s2,p1) + [BN] + LeakyReLU(0.2); optional spectral norm."""

    def __init__(self, cin, cout, *, batchnorm=False, spectral_norm=False,
                 leak=0.2, kernel=4, stride=2, padding=1, dtype=jnp.bfloat16):
        conv = Conv(cin, cout, kernel, stride, padding,
                    use_bias=not batchnorm, dtype=dtype)
        # Fused conv+BN-stats train path: plain (non-SN) k4/s2/p1 conv
        # followed by BN — ops.conv_bn_stats emits the conv output and the
        # batch statistics in one pass (ops/pallas_conv_stats.py).
        self._fusable = (batchnorm and not spectral_norm
                         and kernel == 4 and stride == 2 and padding == 1)
        self.conv = SpectralNorm(conv) if spectral_norm else conv
        self.bn = BatchNorm(cout, dtype=dtype) if batchnorm else None
        self.act = LeakyReLU(leak)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        params, state = {}, {}
        params["conv"], conv_state = self.conv.init(k1)
        if conv_state:
            state["conv"] = conv_state
        if self.bn is not None:
            params["bn"], state["bn"] = self.bn.init(k2)
        return params, state

    def apply(self, params, state, x, *, train: bool = False):
        from tpugan import ops
        from tpugan.parallel.spatial import spatial_active

        if (train and self._fusable and ops.fuse_stats_enabled()
                and not spatial_active()
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
            dt = self.conv.dtype
            y, mean, var = ops.conv_bn_stats(
                x.astype(dt), params["conv"]["w"].astype(dt))
            n = y.shape[0] * y.shape[1] * y.shape[2]
            out = ops.bn_act(y, params["bn"]["scale"], params["bn"]["bias"],
                             mean, var, eps=self.bn.eps, act="leaky_relu",
                             leak=self.act.slope, out_dtype=dt)
            return out, {"bn": self.bn.update_running(
                state["bn"], mean, var, n)}

        new_state = {}
        x, ns = self.conv.apply(params["conv"], state.get("conv", {}), x,
                                train=train)
        if ns:
            new_state["conv"] = ns
        if self.bn is not None:
            x, new_state["bn"] = self.bn.apply(
                params["bn"], state["bn"], x, train=train)
        x, _ = self.act.apply({}, {}, x, train=train)
        return x, new_state


class DTail(Module):
    """Flatten the final s0×s0 map and project to a single score/logit."""

    def __init__(self, s0, cin, *, spectral_norm=False, dtype=jnp.bfloat16):
        self.s0, self.cin = s0, cin
        dense = Dense(s0 * s0 * cin, 1, use_bias=True, dtype=dtype)
        self.dense = SpectralNorm(dense) if spectral_norm else dense

    def init(self, key):
        params, state = {}, {}
        params["dense"], dense_state = self.dense.init(key)
        if dense_state:
            state["dense"] = dense_state
        return params, state

    def apply(self, params, state, x, *, train: bool = False):
        x = x.reshape(x.shape[0], -1)
        new_state = {}
        x, ns = self.dense.apply(params["dense"], state.get("dense", {}), x,
                                 train=train)
        if ns:
            new_state["dense"] = ns
        return x[:, 0], new_state
