from .mesh import make_mesh, data_axis_size, initialize_distributed
from .data_parallel import (
    make_parallel_train_step,
    make_parallel_fast_train_step,
    make_parallel_score_fn,
    make_parallel_predict_fn,
    make_parallel_pixel_train_step,
    make_parallel_pixel_score_fn,
    shard_split,
    shard_pixel_split,
    replicate,
    ShardedSplit,
)
from .spatial_parallel import (
    make_sp_mesh,
    make_sp_train_step,
    make_sp_fast_train_step,
    make_sp_forward,
    make_sp_score_fn,
    sp_shard_batch,
    sp_check_config,
    sp_local_rows,
    pad_rows,
)
from .sp_tp import (
    make_sp_tp_mesh,
    make_sp_tp_train_step,
    make_sp_tp_fast_train_step,
    make_sp_tp_forward,
    make_sp_tp_score_fn,
    sp_tp_shard_batch,
)
from .tensor_parallel import (
    make_tp_mesh,
    make_tp_params,
    merge_tp_params,
    make_tp_train_step,
    make_tp_forward,
    make_tp_fast_params,
    merge_tp_fast_params,
    make_tp_fast_train_step,
    make_tp_fast_score_fn,
)
