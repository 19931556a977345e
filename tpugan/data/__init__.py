from tpugan.data.datasets import load_dataset, DATASETS  # noqa: F401
from tpugan.data.pipeline import make_input_pipeline  # noqa: F401
