"""Device mesh + sharding (data-parallel training and serving)."""

from viet_tts_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    data_sharded,
    param_partition_specs,
    shard_params_tp,
    make_hybrid_mesh,
    make_mesh,
    pad_batch_to_devices,
    replicated,
    seq_sharded,
    shard_batch,
    shard_state_fsdp,
    shard_state_zero1,
    shard_train_step,
    zero1_partition_specs,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "data_sharded",
    "param_partition_specs",
    "shard_params_tp",
    "make_hybrid_mesh",
    "make_mesh",
    "pad_batch_to_devices",
    "replicated",
    "seq_sharded",
    "shard_batch",
    "shard_state_fsdp",
    "shard_state_zero1",
    "shard_train_step",
    "zero1_partition_specs",
]
