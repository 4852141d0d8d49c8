from fluca_tpu.parallel.mesh import (
    DeviceGrid,
    make_device_grid,
    shard_state,
    state_shardings,
)
