"""Multi-host (multi-slice) initialization.

The reference has no multi-node story at all (SURVEY.md §2.8: a commented-out
fairseq ddp block is the only mention). TPU-native scaling beyond one host is
one call: every host runs the same program, jax.distributed wires the DCN
layer, and the same Mesh/shardings from parallel/mesh.py span all chips —
XLA routes intra-slice collectives over ICI and cross-slice over DCN.

Usage (same command on every host):

    from speech_ssl_compression_tpu.parallel.multihost import initialize
    initialize()                      # env-autodetected on Cloud TPU
    mesh = make_mesh()                # now spans all hosts' devices
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """jax.distributed.initialize with Cloud-TPU auto-detection. Safe to call
    on a single host (no-op when there is nothing to join)."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError) as e:
        # only auto-detection in a genuinely single-process environment may
        # fall back silently; an explicit multi-host request must fail loudly
        # (a swallowed failure would run N independent jobs that all think
        # they are primary)
        if (coordinator_address is not None
                or num_processes not in (None, 1)
                or process_id not in (None, 0)):
            raise
        print(f"[multihost] single-process mode ({e})")


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0
