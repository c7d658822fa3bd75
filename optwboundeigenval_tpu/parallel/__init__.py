from optwboundeigenval_tpu.parallel.mesh import (  # noqa: F401
    init_distributed,
    make_mesh,
    shard_batch,
    replicate,
    batch_sharding,
)
from optwboundeigenval_tpu.parallel.sharding import (  # noqa: F401
    infer_param_specs,
    shard_params,
)
