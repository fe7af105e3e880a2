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

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


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


def process_info() -> tuple:
    """(process_index, process_count) — (0, 1) in single-process mode."""
    return jax.process_index(), jax.process_count()


def global_batch(batch: dict, mesh: Mesh) -> dict:
    """Assemble each process's host-local batch into GLOBAL jax.Arrays
    sharded over the mesh's "data" axis.

    This is the multi-process replacement for the runners' device_put path
    (and the TPU-native analog of the data scatter the reference's
    DataParallel did inside one process, runner.py:372-373): every process
    holds a disjoint slice of the global batch — produced by the datasets'
    per-process manifest sharding — and
    ``jax.make_array_from_process_local_data`` stitches them into one
    logical array without any host-side gather. All processes must call
    this with identically-shaped local batches (the datasets guarantee
    lockstep shapes by computing each step's padded length from the
    manifest alone).

    Leaves without a leading batch dimension (scalars) are replicated.
    Lists are mapped elementwise (HuBERT's target_list).
    """
    pc = jax.process_count()

    def put(v):
        if isinstance(v, (list, tuple)):
            return type(v)(put(x) for x in v)
        arr = np.asarray(v)
        if arr.ndim == 0:
            sh = NamedSharding(mesh, P())
            return jax.make_array_from_process_local_data(sh, arr, arr.shape)
        sh = NamedSharding(mesh, P("data", *([None] * (arr.ndim - 1))))
        gshape = (arr.shape[0] * pc,) + arr.shape[1:]
        return jax.make_array_from_process_local_data(sh, arr, gshape)

    return {k: put(v) for k, v in batch.items()}
