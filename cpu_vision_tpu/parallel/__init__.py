"""Parallelism: device meshes, data/model-parallel training, spatial sharding.

TPU-native replacement for the reference's NCCL/DDP machinery
(``references/classification/utils.py:245-269``, ``train.py:325``): no
process-group bootstrap — a ``jax.sharding.Mesh`` + sharding annotations let
XLA place collectives on ICI.  ``reduce_across_processes`` becomes
``lax.psum``; ``DistributedSampler`` becomes batch sharding; SyncBatchNorm
is ``axis_name``-aware batch statistics.
"""

from .mesh import create_mesh, default_mesh  # noqa: F401
from .moe import init_moe_params, moe_ffn  # noqa: F401
from .pipeline import pipeline_map  # noqa: F401
from .spatial import halo_exchange, spatial_map  # noqa: F401
from .train_step import make_train_step, replicate, shard_batch, shard_params_tp  # noqa: F401
