from ladine_tpu.infer.engine import (
    member_mc_sample,
    nested_ensemble_sample,
    stack_members,
    unstack_members,
)
