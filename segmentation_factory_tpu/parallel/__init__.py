from segmentation_factory_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    fit_mesh_shape,
    initialize_multihost,
    make_mesh,
    param_shardings,
    shard_channels,
    replicated,
    shard_batch,
)
