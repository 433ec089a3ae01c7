from ladine_tpu.kernels.attention import flash_attention
from ladine_tpu.kernels.fused_linear import fused_linear_act
from ladine_tpu.kernels.fused_eps import fused_eps
