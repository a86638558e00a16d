from .eps_plus_linear import (
    EPSesPlusLinearConfig,
    init_eps_plus_linear,
    eps_plus_linear_forward,
    epswise_l2_regularizer,
    epses_composition_l2_regularizer,
    intermediate_reps_stats,
)
