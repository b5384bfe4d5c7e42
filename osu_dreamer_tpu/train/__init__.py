"""Training machinery: functional train states, optax optimizers, EMA,
orbax checkpoints, TensorBoard logging, and the per-model train steps.

The reference wraps models in PyTorch-Lightning trainers; here each stage is
a pure jitted train-step function over an explicit ``TrainState`` pytree,
run by a small host loop (``train.loop``) that owns checkpointing/logging —
the pieces Lightning provided are first-class components of this package.
"""

from .state import TrainState, create_train_state, ema_update, make_optimizer

__all__ = ["TrainState", "create_train_state", "ema_update", "make_optimizer"]
