from ladine_tpu.ops.schedules import make_beta_schedule, DiffusionSchedule
from ladine_tpu.ops.diffusion import (
    q_sample,
    p_sample_coefficients,
    p_sample_step,
    p_sample_final,
    p_sample_loop,
    ddim_sample_loop,
    ddim_timesteps,
    antithetic_timesteps,
    y0_reparam,
)
from ladine_tpu.ops.labels import one_hot_and_prototype
