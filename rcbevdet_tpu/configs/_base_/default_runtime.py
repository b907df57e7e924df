# Runtime defaults (counterpart of configs/_base_/default_runtime.py).
checkpoint_interval = 1  # epochs
log_interval = 50  # iters
seed = 0
work_dir = None
load_from = None
resume_from = None
