"""Multi-chip/multi-host parallel layer (SURVEY.md §2.6 'to build')."""
from compv_tpu.parallel.mesh import make_mesh, make_mesh_2d, frame_sharding, replicated, P  # noqa: F401
from compv_tpu.parallel.sharded import (  # noqa: F401
    sharded_detect, sharded_all_pairs_match, make_distributed_ba_step,
    distributed_ba_solve,
)
