"""Multi-chip scale-out: device meshes, shardings, and distributed steps.

The reference has no distributed runtime (SURVEY.md §2.9); here population
sharding over the ICI mesh is first-class: the N x N coupling matmul is
row-sharded over the 'model' axis, trajectory batches are sharded over the
'data' axis, and XLA GSPMD inserts the collectives (all-gather of the source
rates for the coupling matvec, psum of gradients across data shards).
"""

from .diagnostics import collective_stats, sharded_step_collectives
from .sharding import (
    make_mesh,
    shard_network_arrays,
    sharded_run,
    sharded_train_step,
)

__all__ = ["make_mesh", "shard_network_arrays", "sharded_run", "sharded_train_step",
           "collective_stats", "sharded_step_collectives"]
