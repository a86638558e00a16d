from .conv_sbs_model import (
    ConvSBSModelConfig,
    init_conv_sbs_model,
    conv_sbs_model_forward,
    scale_layers_using_batch,
)
from .eps_plus_linear import (
    EPSesPlusLinearConfig,
    init_eps_plus_linear,
    eps_plus_linear_forward,
    epswise_l2_regularizer,
    epses_composition_l2_regularizer,
    intermediate_reps_stats,
)
