from tpugan.serve.server import (  # noqa: F401
    BatchingEngine,
    make_server,
    serve_forever,
)
