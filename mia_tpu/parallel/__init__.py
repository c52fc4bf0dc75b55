from .mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
    pad_to_multiple,
)
from .fsdp import (
    fsdp_param_specs,
    fsdp_shardings,
    shard_state_fsdp,
)
from .tp import (
    prepare_tp_params,
    unprepare_tp_params,
    tp_param_specs,
    tp_shardings,
    make_tp_encoder_forward,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
    "pad_to_multiple",
    "fsdp_param_specs",
    "fsdp_shardings",
    "shard_state_fsdp",
    "prepare_tp_params",
    "unprepare_tp_params",
    "tp_param_specs",
    "tp_shardings",
    "make_tp_encoder_forward",
]
