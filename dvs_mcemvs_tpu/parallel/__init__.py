"""Multi-chip distribution: device meshes, sharded voting, collective fusion."""

from .mesh import global_mesh, init_distributed, make_mesh, pick_mesh_shape  # noqa: F401
from .sharded import (  # noqa: F401
    ShardedRigSpec,
    ShardedStepConfig,
    make_sharded_step,
    pad_events_for_sharding,
)
