from ladine_tpu.models.conditional import ConditionalLinear, ConditionalModel, TorchLinear
from ladine_tpu.models.mlp import MappingMLP
from ladine_tpu.models.vit import ViT, Attention, Block
from ladine_tpu.models.guidance import SEViTGuidance
