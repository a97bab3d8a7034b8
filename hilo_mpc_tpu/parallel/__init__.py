from .sharding import (batch_stats, convergence_stats, make_mesh, replicate,
                       shard_batch, sharded_solve_fn)
from .closed_loop import (ClosedLoopEKFResult, ClosedLoopMHEResult,
                          ClosedLoopResult, fused_closed_loop_ekf_fn,
                          fused_closed_loop_fn, fused_closed_loop_mhe_fn)
from . import distributed
