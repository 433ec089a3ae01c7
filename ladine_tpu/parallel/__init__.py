from ladine_tpu.parallel.mesh import (
    DATA_AXIS,
    MEMBER_AXIS,
    data_sharding,
    factor_mesh,
    fsdp_shardings,
    make_mesh,
    member_data_sharding,
    member_sharding,
    replicated,
    shard_pytree,
    tree_shardings,
)
from ladine_tpu.parallel.multislice import (
    describe_mesh,
    group_devices_by_slice,
    make_multislice_mesh,
    multislice_factor,
)
