from .schedule import set_prune_interval, sparsity_ladder
from . import weight_pruning, head_pruning, row_pruning, distillation
