from .train_state import TrainState, create_train_state, ema_update
from .train_step import make_train_step, make_eval_step
