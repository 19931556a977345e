from tpugan.utils.images import make_grid, save_png, to_uint8  # noqa: F401
from tpugan.utils.logging import MetricsLogger  # noqa: F401
