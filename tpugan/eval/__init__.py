from tpugan.eval.fid import (  # noqa: F401
    fid_from_features,
    inception_score,
    prdc_from_features,
)
from tpugan.eval.evaluate import evaluate, evaluate_folders  # noqa: F401
