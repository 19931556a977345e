from tpugan.models.dcgan import Discriminator, Generator  # noqa: F401
from tpugan.models.cdcgan import CondDiscriminator, CondGenerator  # noqa: F401
from tpugan.models.registry import build_models  # noqa: F401
