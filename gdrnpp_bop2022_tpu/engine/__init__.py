from .train_state import TrainState, create_train_state, ema_update
from .train_step import make_train_step, make_eval_step
from .batching import (build_test_batch, build_train_batch_online,
                       dzi_jitter_host)
from .inference import run_gdrn_inference, results_to_bop_rows
from .checkpoint import CheckpointManager
