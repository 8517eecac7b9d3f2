from .lr_scheduler import flat_and_anneal_schedule, build_lr_scheduler
from .ranger import ranger, build_optimizer
from .optimizers import adabelief, madgrad, sgd_gc
