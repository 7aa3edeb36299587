from medplib_tpu.parallel.mesh import (  # noqa: F401
    AXIS_DATA,
    AXIS_EXPERT,
    AXIS_MODEL,
    make_mesh,
    local_mesh,
    shard_params,
    param_sharding,
    logical_to_sharding,
)
