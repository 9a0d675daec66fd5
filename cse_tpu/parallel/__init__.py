"""Parallelism surface: meshes, shardings, and SPMD step builders.

Convenience re-exports — the implementations live with their owners:
mesh/sharding helpers in :mod:`cse_tpu.core.mesh`, the jitted DP train/eval
steps in :mod:`cse_tpu.train.step`, and the Llama tensor-parallel sharding
rules in :mod:`cse_tpu.models.llama`.
"""

from cse_tpu.core.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    data_sharded,
    distributed_init_if_needed,
    make_mesh,
    replicated,
    shard_batch,
)
from cse_tpu.models.llama import llama_shardings
from cse_tpu.train.step import make_eval_step, make_train_step

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "data_sharded",
    "distributed_init_if_needed",
    "make_mesh",
    "replicated",
    "shard_batch",
    "llama_shardings",
    "make_eval_step",
    "make_train_step",
]
