from ladine_tpu.infer.engine import (
    member_mc_sample,
    nested_ensemble_sample,
    stack_members,
    unstack_members,
)
from ladine_tpu.infer.calibrate import (
    calibration_objective,
    temperature_search,
    tune_temperature_nll,
)
from ladine_tpu.infer.evaluator import (
    EvalConfig,
    compute_report,
    evaluate_ensemble,
    make_eval_pipeline,
)
from ladine_tpu.infer.serve import ExportedPredictor, Predictor
from ladine_tpu.infer.batching import MicroBatcher
