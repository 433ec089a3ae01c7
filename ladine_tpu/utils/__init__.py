from ladine_tpu.utils.assemble import (
    assemble_guidance,
    export_guidance_stage1,
    split_guidance,
    validate_guidance_tree,
)
from ladine_tpu.utils.checkpoint import (
    best_checkpoint_name,
    load_checkpoint,
    save_checkpoint,
)
from ladine_tpu.utils.logging import (
    ScalarLogger,
    device_memory_stats,
    setup_logging,
    trace,
)
