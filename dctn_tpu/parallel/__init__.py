from .mesh import make_mesh, data_axis_size, initialize_distributed
from .data_parallel import (
    make_parallel_train_step,
    make_parallel_score_fn,
    shard_split,
    replicate,
    ShardedSplit,
)
