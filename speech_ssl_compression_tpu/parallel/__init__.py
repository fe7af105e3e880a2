from .mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    param_shardings,
    shard_params,
    shard_batch,
)
from .seqpar import melhubert_extract_seqpar
