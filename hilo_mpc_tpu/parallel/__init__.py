from .sharding import (convergence_stats, make_mesh, replicate, shard_batch,
                       sharded_solve_fn)
