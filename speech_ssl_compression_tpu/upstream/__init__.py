"""Pretrain-expert compatibility layer.

The reference organizes training behind per-upstream "experts"
(upstream/{melhubert,hubert,wav2vec2,melhubert_distiller}/pretrain_expert.py)
with the contract asserted at runner.py:149-152:

    expert.forward(data, global_step, log_step) -> (loss, sample_size)
    expert.load_model(init_ckpt)
    expert.add_state_to_save(all_states)

The TPU framework's runners drive jitted steps directly, but these thin
wrappers expose the same contract for users porting expert-based code.
"""

from .melhubert import MelHuBERTPretrainExpert
from .melhubert_distiller import MelHuBERTDistillerExpert


def get_pretrain_expert(upstream: str):
    """Pluggable-expert dispatch mirroring the reference's importlib lookup
    (runner.py:131-134): resolve ``upstream`` to its module's
    ``UpstreamPretrainExpert`` class."""
    import importlib

    module = importlib.import_module(f".{upstream}", __package__)
    return getattr(module, "UpstreamPretrainExpert")
