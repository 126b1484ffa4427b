from musicvae_tpu.train.preemption import GracefulStop  # noqa: F401
from musicvae_tpu.train.trainer import (  # noqa: F401
    TrainState, create_state, elbo_from_outputs,
    make_optimizer, make_train_step, make_train_step_indexed,
    make_train_step_indexed_multi, make_train_step_multi, train,
)
