"""Torch twin of the tpugan DCGAN family + weight transplant.

Role (SURVEY.md §4 "Parity"): the reference is a PyTorch GAN playground; this
module is its stand-in built from bare ``torch.nn`` (torchvision is absent in
this container and the reference mount is empty).  The twin implements the
*identical* computation in the reference's own framework so that:

- layer/loss outputs can be compared bit-close after weight transplant,
- per-step loss trajectories of whole training runs can be compared,
- the torch-CPU throughput denominator (BASELINE.md) is measured on the same
  architecture.

Layout conventions (verified by tests/test_layers.py):
  tpugan Conv  HWIO (kh,kw,ci,co)  == torch conv  weight.transpose(3,2,0,1)
  tpugan ConvT HWIO (kh,kw,ci,co)  == torch convT weight.transpose(2,3,0,1)
  tpugan Dense (din,dout)          == torch Linear weight.T
Activations: tpugan NHWC == torch NCHW.transpose(0,2,3,1).
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as tnn

from tpugan.models.dcgan import _d_schedule, _g_schedule


class TorchGenerator(tnn.Module):
    """Mirror of tpugan.models.dcgan.Generator (Dense head variant)."""

    def __init__(self, image_size: int, channels: int, nz: int, ngf: int,
                 batchnorm: bool = True, head_in: int = 0):
        super().__init__()
        s0, chans = _g_schedule(image_size, ngf)
        self.s0, self.c0 = s0, chans[0]
        self.head = tnn.Linear(head_in or nz, s0 * s0 * chans[0],
                               bias=not batchnorm)
        self.head_bn = tnn.BatchNorm2d(chans[0]) if batchnorm else None
        blocks = []
        for cin, cout in zip(chans[:-1], chans[1:]):
            blocks.append(tnn.ConvTranspose2d(cin, cout, 4, 2, 1,
                                              bias=not batchnorm))
            blocks.append(tnn.BatchNorm2d(cout) if batchnorm
                          else tnn.Identity())
            blocks.append(tnn.ReLU(True))
        self.blocks = tnn.Sequential(*blocks)
        self.final = tnn.ConvTranspose2d(chans[-1], channels, 4, 2, 1,
                                         bias=True)

    def forward(self, z):
        x = self.head(z).view(-1, self.s0, self.s0, self.c0)
        x = x.permute(0, 3, 1, 2)  # match tpugan's NHWC reshape order
        if self.head_bn is not None:
            x = self.head_bn(x)
        x = torch.relu(x)
        x = self.blocks(x)
        return torch.tanh(self.final(x))


def _sn_normalize(x):
    """tpugan's exact _l2_normalize: x * rsqrt(sum(x^2) + 1e-12)."""
    return x * torch.rsqrt(torch.sum(x * x) + 1e-12)


class _SNBase(tnn.Module):
    """Spectral norm mirroring tpugan.nn.spectral_norm.SpectralNorm exactly:
    same w_mat orientation (d, cout), same iteration order, same final
    σ = v·(W u) with u,v constant, same iterate-only-in-training rule
    (eval computes σ from the stored u with no power iteration).
    (torch's builtin ``nn.utils.spectral_norm`` computes σ = ‖Wᵀv‖ from the
    pre-update v — equivalent at convergence but not bit-identical, which
    matters for multi-step trajectory parity.)"""

    def _init_u(self, cout: int):
        self.register_buffer("u", torch.randn(cout))
        with torch.no_grad():
            self.u.copy_(_sn_normalize(self.u))

    def _w_mat(self):  # (d, cout), grad-tracked — overridden per layer
        raise NotImplementedError

    def _normed_weight(self):
        w_mat = self._w_mat()
        u = self.u
        with torch.no_grad():
            wm = w_mat.detach()
            if self.training:  # power-iterate in training forwards only
                v = _sn_normalize(wm @ u)
                u = _sn_normalize(wm.t() @ v)
                self.u.copy_(u)
            v = _sn_normalize(wm @ u)
        sigma = v @ (w_mat @ u)  # u, v constants; dσ/dW = v uᵀ
        return self.weight / sigma


class SNConv2d(_SNBase):
    """Conv2d with tpugan-formulation spectral norm on the weight."""

    def __init__(self, cin, cout, kernel, stride, padding, bias=True):
        super().__init__()
        self.stride, self.padding = stride, padding
        self.weight = tnn.Parameter(torch.empty(cout, cin, kernel, kernel))
        tnn.init.normal_(self.weight, 0.0, 0.02)
        self.bias = tnn.Parameter(torch.zeros(cout)) if bias else None
        self._init_u(cout)

    def _w_mat(self):
        # tpugan HWIO w.reshape(-1, cout) == torch OIHW permuted to HWIO
        o = self.weight.shape[0]
        return self.weight.permute(2, 3, 1, 0).reshape(-1, o)

    def forward(self, x):
        return torch.nn.functional.conv2d(
            x, self._normed_weight(), self.bias,
            stride=self.stride, padding=self.padding)


class SNLinear(_SNBase):
    """Linear with tpugan-formulation spectral norm on the weight."""

    def __init__(self, din, dout, bias=True):
        super().__init__()
        self.weight = tnn.Parameter(torch.empty(dout, din))
        tnn.init.normal_(self.weight, 0.0, 0.02)
        self.bias = tnn.Parameter(torch.zeros(dout)) if bias else None
        self._init_u(dout)

    def _w_mat(self):
        return self.weight.t()  # tpugan Dense w is (din, dout)

    def forward(self, x):
        return torch.nn.functional.linear(x, self._normed_weight(),
                                          self.bias)


class TorchDiscriminator(tnn.Module):
    """Mirror of tpugan.models.dcgan.Discriminator (incl. the SNGAN
    variant: spectral norm on every conv + the tail, no BatchNorm)."""

    def __init__(self, image_size: int, channels: int, ndf: int,
                 batchnorm: bool = True, leak: float = 0.2,
                 spectral_norm: bool = False):
        super().__init__()
        s0, chans = _d_schedule(image_size, ndf)
        layers = []
        cin = channels
        for i, cout in enumerate(chans):
            bn = batchnorm and not spectral_norm and i > 0
            if spectral_norm:
                layers.append(SNConv2d(cin, cout, 4, 2, 1, bias=True))
            else:
                layers.append(tnn.Conv2d(cin, cout, 4, 2, 1, bias=not bn))
            if bn:
                layers.append(tnn.BatchNorm2d(cout))
            layers.append(tnn.LeakyReLU(leak, True))
            cin = cout
        self.features = tnn.Sequential(*layers)
        self.s0, self.cl = s0, chans[-1]
        din = s0 * s0 * chans[-1]
        self.tail = (SNLinear(din, 1, bias=True) if spectral_norm
                     else tnn.Linear(din, 1, bias=True))

    def forward(self, x):
        h = self.features(x)
        h = h.permute(0, 2, 3, 1).reshape(h.shape[0], -1)  # NHWC flatten
        return self.tail(h)[:, 0]


class TorchCondGenerator(tnn.Module):
    """Mirror of tpugan.models.cdcgan.CondGenerator (embed + concat z)."""

    def __init__(self, image_size: int, channels: int, nz: int, ngf: int,
                 n_classes: int, embed_dim: int = 50, batchnorm: bool = True):
        super().__init__()
        self.embed = tnn.Embedding(n_classes, embed_dim)
        self.g = TorchGenerator(image_size, channels, nz, ngf,
                                batchnorm=batchnorm,
                                head_in=nz + embed_dim)

    def forward(self, z, y):
        e = self.embed(y)
        return self.g(torch.cat([z, e], dim=-1))


class TorchCondDiscriminator(tnn.Module):
    """Mirror of CondDiscriminator (embed -> dense plane -> extra channel)."""

    def __init__(self, image_size: int, channels: int, ndf: int,
                 n_classes: int, embed_dim: int = 50, batchnorm: bool = True,
                 spectral_norm: bool = False):
        super().__init__()
        self.image_size = image_size
        self.embed = tnn.Embedding(n_classes, embed_dim)
        self.proj = tnn.Linear(embed_dim, image_size * image_size)
        self.d = TorchDiscriminator(image_size, channels + 1, ndf,
                                    batchnorm=batchnorm,
                                    spectral_norm=spectral_norm)

    def forward(self, x, y):
        s = self.image_size
        plane = self.proj(self.embed(y)).view(-1, 1, s, s)
        return self.d(torch.cat([x, plane], dim=1))


@torch.no_grad()
def transplant_cond_g(params, state, tg: TorchCondGenerator) -> None:
    tg.embed.weight.copy_(_t(np.asarray(params["embed"]["table"])))
    transplant_g(params["g"], state.get("g", {}), tg.g)


@torch.no_grad()
def transplant_cond_d(params, state, td: TorchCondDiscriminator) -> None:
    td.embed.weight.copy_(_t(np.asarray(params["embed"]["table"])))
    td.proj.weight.copy_(_t(np.asarray(params["proj"]["w"]).T))
    td.proj.bias.copy_(_t(np.asarray(params["proj"]["b"])))
    transplant_d(params["d"], state.get("d", {}), td.d)


# ---------------------------------------------------------------------------
# Weight transplant (tpugan params pytree -> torch modules)
# ---------------------------------------------------------------------------


def _t(a):
    return torch.from_numpy(np.ascontiguousarray(a))


@torch.no_grad()
def transplant_g(params, state, tg: TorchGenerator) -> None:
    head = params["head"]
    tg.head.weight.copy_(_t(np.asarray(head["dense"]["w"]).T))
    if "b" in head["dense"]:
        tg.head.bias.copy_(_t(np.asarray(head["dense"]["b"])))
    if tg.head_bn is not None:
        _copy_bn(head["bn"], state["head"]["bn"], tg.head_bn)

    convt_layers = [m for m in tg.blocks if isinstance(m, tnn.ConvTranspose2d)]
    bn_layers = [m for m in tg.blocks if isinstance(m, tnn.BatchNorm2d)]
    i = 0
    while f"block{i}" in params:
        blk = params[f"block{i}"]
        convt_layers[i].weight.copy_(
            _t(np.asarray(blk["conv"]["w"]).transpose(2, 3, 0, 1)))
        if "b" in blk["conv"]:
            convt_layers[i].bias.copy_(_t(np.asarray(blk["conv"]["b"])))
        if i < len(bn_layers):
            _copy_bn(blk["bn"], state[f"block{i}"]["bn"], bn_layers[i])
        i += 1
    fin = params["final"]
    tg.final.weight.copy_(
        _t(np.asarray(fin["conv"]["w"]).transpose(2, 3, 0, 1)))
    tg.final.bias.copy_(_t(np.asarray(fin["conv"]["b"])))


@torch.no_grad()
def transplant_d(params, state, td: TorchDiscriminator) -> None:
    convs = [m for m in td.features
             if isinstance(m, (tnn.Conv2d, SNConv2d))]
    bns = [m for m in td.features if isinstance(m, tnn.BatchNorm2d)]
    bn_idx = 0
    i = 0
    while f"block{i}" in params:
        blk = params[f"block{i}"]
        convs[i].weight.copy_(
            _t(np.asarray(blk["conv"]["w"]).transpose(3, 2, 0, 1)))
        if "b" in blk["conv"]:
            convs[i].bias.copy_(_t(np.asarray(blk["conv"]["b"])))
        if "bn" in blk:
            _copy_bn(blk["bn"], state[f"block{i}"]["bn"], bns[bn_idx])
            bn_idx += 1
        blk_state = state.get(f"block{i}", {})
        if isinstance(convs[i], SNConv2d):
            convs[i].u.copy_(_t(np.asarray(blk_state["conv"]["u"])))
        i += 1
    tail = params["tail"]["dense"]
    td.tail.weight.copy_(_t(np.asarray(tail["w"]).T))
    td.tail.bias.copy_(_t(np.asarray(tail["b"])))
    if isinstance(td.tail, SNLinear):
        td.tail.u.copy_(_t(np.asarray(state["tail"]["dense"]["u"])))


@torch.no_grad()
def _copy_bn(bn_params, bn_state, tbn: tnn.BatchNorm2d) -> None:
    tbn.weight.copy_(_t(np.asarray(bn_params["scale"])))
    tbn.bias.copy_(_t(np.asarray(bn_params["bias"])))
    tbn.running_mean.copy_(_t(np.asarray(bn_state["mean"])))
    tbn.running_var.copy_(_t(np.asarray(bn_state["var"])))
