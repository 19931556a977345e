from tpugan.serve.server import (  # noqa: F401
    BatchingEngine,
    EngineOverloadedError,
    make_server,
    serve_forever,
)
