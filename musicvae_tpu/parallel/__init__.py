"""Mesh/sharding layer: DP over 'data', optional TP over 'model'."""

from musicvae_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS, MODEL_AXIS,
    batch_sharding, make_mesh, put_global, put_host_local, put_tree,
    replicated, shard_batch,
)
from musicvae_tpu.parallel.distributed import (  # noqa: F401
    assert_hosts_identical, initialize_from_env,
)
from musicvae_tpu.parallel.tp import (  # noqa: F401
    DEFAULT_TP_RULES, param_shardings, shard_params,
)
