from .mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    param_shardings,
    shard_params,
    shard_batch,
)
from .seqpar import (
    make_melhubert_seqpar_distill_step,
    melhubert_extract_seqpar,
)
from .pipeline import (
    pipeline_mesh,
    split_pipeline_params,
    merge_pipeline_params,
    shard_pipeline_params,
    make_melhubert_pipeline_grad_step,
)
