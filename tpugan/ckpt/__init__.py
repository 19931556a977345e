from tpugan.ckpt.checkpoint import CheckpointManager  # noqa: F401
