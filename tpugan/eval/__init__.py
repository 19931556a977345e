from tpugan.eval.fid import fid_from_features, inception_score  # noqa: F401
from tpugan.eval.evaluate import evaluate  # noqa: F401
