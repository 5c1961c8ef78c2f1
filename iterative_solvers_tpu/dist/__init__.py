from .mesh import make_mesh, initialize_multihost, local_block_shape  # noqa: F401
from .halo import (  # noqa: F401
    halo_exchange_1d, with_halo, sharded_lap_periodic, sharded_sh_operator,
    pdot, shard_field, grid_sharding,
)
