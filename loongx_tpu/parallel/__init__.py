from loongx_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    param_sharding_rules,
    shard_params,
    shard_batch,
)
