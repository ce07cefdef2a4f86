# gpmp_tpu/parallel/__init__.py
"""Multi-chip layer: device meshes, sharded gram construction, and
data-parallel batched criteria.

This layer has no reference counterpart (the reference is strictly
single-process, SURVEY.md section 2.7); it is the TPU-native scale-out
design: jax.sharding.Mesh over ICI, shard_map + XLA collectives.
"""

from .mesh import make_mesh, default_mesh
from .batched import (
    make_data_parallel_criterion,
    shard_batches,
)
from .gram import sharded_gram, sharded_matvec
from .chol import (
    sharded_cholesky,
    sharded_cholesky_solve,
    sharded_solve_and_logdet,
    blocked_solve_lower,
    blocked_solve_upper_t,
)
from .likelihood import (
    sharded_covariance,
    sharded_negative_log_restricted_likelihood,
    sharded_negative_log_likelihood_zero_mean,
)
from .predict import (
    sharded_predict,
    sharded_cross_covariance,
    sharded_kriging_weights,
    sharded_sample_paths,
)
from .loo import sharded_loo
from .streamed import streamed_mp_solve_and_logdet
from .view import ShardedModelView, auto_shard_block

__all__ = [
    "make_mesh",
    "default_mesh",
    "make_data_parallel_criterion",
    "shard_batches",
    "sharded_gram",
    "sharded_matvec",
    "sharded_cholesky",
    "sharded_cholesky_solve",
    "sharded_solve_and_logdet",
    "blocked_solve_lower",
    "blocked_solve_upper_t",
    "sharded_covariance",
    "sharded_negative_log_restricted_likelihood",
    "sharded_negative_log_likelihood_zero_mean",
    "sharded_predict",
    "sharded_cross_covariance",
    "sharded_loo",
    "ShardedModelView",
    "auto_shard_block",
    "sharded_kriging_weights",
    "sharded_sample_paths",
    "streamed_mp_solve_and_logdet",
]
