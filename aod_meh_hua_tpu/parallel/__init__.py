"""SPMD parallelism: one mesh, sharding helpers.

The reference's entire distributed stack — MMDataParallel/DDP over NCCL,
coalesced allreduce, rank-sharded eval with pickle gathers (SURVEY.md
sections 2.10, 5.8) — collapses into jax.sharding annotations: params
replicated, batch axis sharded over a 'data' mesh axis; XLA inserts the
gradient psum and the score gather rides ICI.
"""

from .mesh import (make_mesh, make_local_mesh, mesh_is_multiprocess,
                   shard_batch, replicate, data_sharding,
                   make_mesh_2d, fsdp_spec, shard_params_fsdp,
                   gather_to_host)
from .dist import rank_indices, allgather_sum, barrier, collect_objects
from .launch import detect_launch_env, init_distributed
