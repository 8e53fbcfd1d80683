from .block_parallel import (  # noqa: F401
    make_mesh,
    parallel_deflate,
    parallel_inflate,
    sharded_deflate_step,
    sharded_inflate_step,
)
