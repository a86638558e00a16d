from .optimizers import make_optimizer
from .schedule import every_n_iters_intervals, EvalSchedule
from .evaluation import make_score_fn
from .step import make_train_step
from .loop import (
    TrainLoopState,
    train,
    LastModelsCheckpointer,
    BestModelCheckpointer,
    ValuesNotImprovingEarlyStopper,
    make_stopper_after_n_iters,
    make_stopper_on_nan_loss,
    log_parameters_stats,
)
from .checkpoint import save_pytree, load_pytree
