from tpugan.utils.images import (  # noqa: F401
    encode_png,
    make_grid,
    save_png,
    to_uint8,
)
from tpugan.utils.logging import MetricsLogger  # noqa: F401
