from gemma_tpu.parallel.mesh import make_mesh, device_count
from gemma_tpu.parallel.shard import (
    sharded_kinship_partial,
    sharded_rotate_and_assoc,
)
