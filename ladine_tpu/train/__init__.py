from ladine_tpu.train.ema import (
    ema_debias,
    ema_init,
    ema_params_from_ckpt,
    ema_read,
    ema_update,
)
from ladine_tpu.train.lowmem import (
    adam_bf16,
    bf16_stochastic_round,
    ema_init_bf16,
    ema_update_sr,
    scale_by_adam_bf16,
)
from ladine_tpu.train.optim import (
    cosine_warm_restarts,
    make_optimizer,
    step_decay,
    warmup_cosine,
)
from ladine_tpu.train.diffusion_trainer import (
    MemberTrainState,
    create_member_state,
    create_member_states,
    make_full_train_step,
    make_joint_train_step,
    make_member_step,
    make_multi_member_step,
)
from ladine_tpu.train.classifier_trainer import (
    TrainState,
    create_mapping_states,
    create_vit_state,
    cross_entropy,
    make_mapping_eval_step,
    make_mapping_train_step,
    make_vit_eval_step,
    make_vit_train_step,
)
