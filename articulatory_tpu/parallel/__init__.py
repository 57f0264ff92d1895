from articulatory_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    replicate,
    init_distributed,
)
from articulatory_tpu.parallel.pp import (  # noqa: F401
    PipelinedGenerator,
    even_boundaries,
)
