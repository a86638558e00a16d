from .feature_maps import phi_cos_sin_squared_1, apply_feature_map
from .pipeline import (
    Splits,
    load_dataset,
    calc_scaling_factor,
    Batcher,
    DATASET_TYPES,
)
