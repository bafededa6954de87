from .mesh import (make_mesh, data_sharding, replicated_sharding,
                   param_partition_specs, shard_batch, host_device_count)
