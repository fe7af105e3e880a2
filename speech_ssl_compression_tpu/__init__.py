"""speech_ssl_compression_tpu — a TPU-native (JAX/XLA/Pallas) framework for
compressing transformer-based self-supervised speech models.

Re-implements, TPU-first, the full capability surface of the reference
PyTorch framework (dlion168/Speech-SSL-Compression — the official
implementation of "Compressing Transformer-based self-supervised models for
speech processing", arXiv:2211.09949):

  * MelHuBERT pre-training (log-Mel input, masked cluster prediction)
  * four compression methods: weight pruning, head pruning, row pruning
    (FFN low-rank), and knowledge distillation
  * HuBERT and wav2vec 2.0 pre-training paths
  * feature extraction + S3PRL-style downstream adapter

Design notes (vs. reference layer map, see SURVEY.md):
  - params are explicit pytrees; pruning masks are pytrees zipped with params
    (replaces the forward-pre-hook mask engine in pytorch_code/prune.py)
  - structured pruning (heads/rows) produces new static configs + smaller
    param trees and re-jits (replaces in-place nn.Linear surgery)
  - span masking is generated on-device with jax.random under jit
    (replaces host-side NumPy compute_mask_indices)
  - attention is a Pallas flash-attention kernel honoring per-layer head
    counts left over after head pruning
  - multi-device = jax.sharding.Mesh + explicit NamedSharding, bf16 compute
"""

__version__ = "0.1.0"
