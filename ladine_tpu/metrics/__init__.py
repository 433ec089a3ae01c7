from ladine_tpu.metrics.classification import (
    accuracy_topk,
    brier,
    convert_to_prob,
    ece,
    ensemble_confidence,
    majority_vote,
    nll,
)
from ladine_tpu.metrics.uncertainty import mc_variance_per_class, piw_per_class
