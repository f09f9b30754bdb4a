"""Training (L6): rollout, loss, data-parallel trainer."""
from .rollout import RolloutConfig, rollout_loss, build_static_edges, n_visible  # noqa: F401
from .trainer import make_optimizer, make_train_step, init_train_state, TrainState  # noqa: F401
