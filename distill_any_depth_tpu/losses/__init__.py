from distill_any_depth_tpu.losses.distill import (
    combined_distillation_loss,
    distillation_loss,
)
from distill_any_depth_tpu.losses.feature import feature_distillation_loss
from distill_any_depth_tpu.losses.gradient import gradient_preservation_loss
from distill_any_depth_tpu.losses.hdn import (
    get_contexts_dp,
    get_contexts_dr,
    get_contexts_ds,
    hdn_loss,
)
from distill_any_depth_tpu.losses.normalization import (
    global_normalize,
    hybrid_normalize,
    normalize_depth,
)
from distill_any_depth_tpu.losses.ssi import (
    masked_l1_loss,
    masked_shift_and_scale,
    ssi_mae_loss,
)

__all__ = [
    "combined_distillation_loss",
    "distillation_loss",
    "feature_distillation_loss",
    "gradient_preservation_loss",
    "get_contexts_dp",
    "get_contexts_dr",
    "get_contexts_ds",
    "hdn_loss",
    "global_normalize",
    "hybrid_normalize",
    "normalize_depth",
    "masked_l1_loss",
    "masked_shift_and_scale",
    "ssi_mae_loss",
]
