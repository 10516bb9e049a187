from .flash_sp import make_sp_attention
from .pipeline_parallel import (
    AXIS_PIPE,
    make_pp_executor,
    make_pp_mesh,
    pp_block_shardings,
)
from .sharding import (
    AXIS_DATA,
    AXIS_SEQ,
    AXIS_TENSOR,
    batch_sharding,
    dit_param_shardings,
    initialize_distributed,
    make_hybrid_mesh,
    make_mesh,
    shard_params,
    token_sharding_constraint,
    vae_param_shardings,
)
