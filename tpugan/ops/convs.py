"""Convolution ops (NHWC / HWIO) with switchable implementations.

XLA path
--------
``conv2d`` is a direct ``conv_general_dilated`` — XLA:TPU turns this into
MXU matmuls with fused elementwise epilogues, which is already near
speed-of-light for the large-channel convs in these models.

``conv_transpose2d`` (reference ``ConvTranspose2d(k, s, p)`` semantics,
``out = (in-1)*s - 2p + k``) lowers to an input-dilated conv with the
spatially-flipped kernel.  The input dilation inserts ``s-1`` zero rows/cols,
so a naive lowering wastes up to ``s²×`` the MXU work on multiplying zeros —
this is the op where a custom kernel can win, and where the Pallas
phase-decomposed implementation (see ``tpugan/ops/pallas_convt.py``) plugs in:
for k=4, s=2 each output pixel parity class (2×2 phases) touches a fixed 2×2
subset of kernel taps, so the deconv splits into 4 dense stride-1 convs whose
outputs interleave — zero wasted FLOPs.
"""

from __future__ import annotations

from jax import lax

DIMS = ("NHWC", "HWIO", "NHWC")

_DEFAULT_IMPL = "xla"


def set_default_impl(impl: str) -> None:
    """Set the process-wide default kernel backend ("xla" | "pallas")."""
    global _DEFAULT_IMPL
    if impl not in ("xla", "pallas"):
        raise ValueError(f"unknown ops impl {impl!r}")
    _DEFAULT_IMPL = impl


def _resolve(impl):
    import jax

    impl = _DEFAULT_IMPL if impl is None else impl
    # Pallas TPU kernels have no CPU/GPU lowering (tests exercise them via
    # interpret mode explicitly); keep non-TPU backends on the XLA path.
    if impl == "pallas" and jax.default_backend() != "tpu":
        return "xla"
    return impl


def conv2d(x, w, *, stride: int, padding: int, impl: str | None = None):
    """Strided conv, fp32 accumulation. x: (N,H,W,Ci) bf16/f32; w: (kh,kw,Ci,Co)."""
    from tpugan.parallel.spatial import maybe_spatial_conv2d

    y = maybe_spatial_conv2d(x, w, stride=stride, padding=padding)
    if y is not None:
        return y
    impl = _resolve(impl)
    if impl == "pallas":
        from tpugan.ops import pallas_conv

        y = pallas_conv.conv2d(x, w, stride=stride, padding=padding)
        if y is not None:
            # the kernel accumulates and emits f32; match the XLA path's
            # output dtype so callers see one contract across impls
            return y.astype(x.dtype)
    # No preferred_element_type: the MXU accumulates bf16 convs in fp32
    # internally and rounds once on output, and a mixed-dtype cotangent in
    # the conv transpose rule breaks autodiff (f32 cotangent vs bf16 weight).
    return lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=[(padding, padding)] * 2,
        dimension_numbers=DIMS,
    )


def conv_transpose2d(x, w, *, stride: int, padding: int,
                     impl: str | None = None):
    """Transpose conv, reference ConvTranspose2d(k,s,p) semantics.

    w is HWIO (I=cin, O=cout), *unflipped*; flipping happens inside the
    lowering.  out = (in-1)*s - 2p + k.
    """
    from tpugan.parallel.spatial import maybe_spatial_conv_transpose2d

    y = maybe_spatial_conv_transpose2d(x, w, stride=stride, padding=padding)
    if y is not None:
        return y
    impl = _resolve(impl)
    if impl == "pallas":
        from tpugan.ops import pallas_convt

        y = pallas_convt.conv_transpose2d(x, w, stride=stride, padding=padding)
        if y is not None:
            return y.astype(x.dtype)  # same contract as the XLA path
    k = w.shape[0]
    pad = k - 1 - padding
    if pad < 0:
        raise ValueError("require kernel - 1 - padding >= 0")
    wf = w[::-1, ::-1, :, :]
    return lax.conv_general_dilated(
        x, wf,
        window_strides=(1, 1),
        padding=[(pad, pad)] * 2,
        lhs_dilation=(stride, stride),
        dimension_numbers=DIMS,
    )
