from attentive_dfprior_tpu.parallel.sharding import (  # noqa: F401
    make_mesh,
    shard_rays,
    replicate,
    sharded_mapping_step,
)
