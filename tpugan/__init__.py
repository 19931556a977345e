"""tpugan — a TPU-native image-synthesis (GAN) framework in JAX.

A ground-up rebuild of the capabilities of ``hermanprawiro/gan-playground``
(classic DCGAN / LSGAN / WGAN-GP / SNGAN / conditional-DCGAN training on
MNIST / CIFAR-10 / CelebA at 28--128 px), designed TPU-first:

- NHWC layouts, bfloat16 compute with float32 statistics, MXU-shaped matmuls.
- One jitted, buffer-donated train step per variant (alternating D/G updates,
  ``n_critic`` inner critic steps as compiled control flow).
- WGAN-GP's gradient-penalty double backward as nested ``jax.grad`` on device.
- Spectral normalization as functional state threaded through the step.
- Data parallelism via ``jax.sharding`` over a device mesh (XLA collectives
  over ICI), not host-side process groups.
- Fused Pallas kernels for the conv(+BN)+activation hot paths, with pure-XLA
  fallbacks selected by config.

See SURVEY.md at the repo root for the blueprint and the provenance of the
reference-behaviour claims (the reference mount was empty; behaviour targets
come from BASELINE.json's driver-verified facts).
"""

__version__ = "0.1.0"

from tpugan.configs import Config, get_preset, list_presets  # noqa: F401
