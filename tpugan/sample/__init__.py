from tpugan.sample.sampler import Sampler  # noqa: F401
