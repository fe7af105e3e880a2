"""Sequence packing for extraction/serving throughput.

Padded per-utterance batches waste MXU cycles (the two bundled flacs pad
101-frame and 792-frame utterances to a common length — ~45% padding).
Packing concatenates utterances into fixed-capacity rows with per-frame
segment ids; the attention kernels restrict attention to equal ids
(block-diagonal), so results are identical to the unpacked forward.

The conv positional embedding must NOT cross utterance boundaries, so
packing happens AFTER the encoder prologue (models/encoder.py
encoder_prologue) and before the transformer layers.

Host-side planning (first-fit decreasing) + gather-index construction; the
device just executes two gathers.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def plan_packing(lengths: Sequence[int], capacity: int) -> List[List[int]]:
    """First-fit-decreasing bin packing. Returns rows of utterance indices.
    Capacity must be >= the longest utterance (build_pack_arrays enforces
    this — packing never truncates).
    """
    order = np.argsort(np.asarray(lengths))[::-1]
    rows: List[List[int]] = []
    room: List[int] = []
    for idx in order:
        n = int(lengths[idx])
        placed = False
        for r in range(len(rows)):
            if room[r] >= n:
                rows[r].append(int(idx))
                room[r] -= n
                placed = True
                break
        if not placed:
            rows.append([int(idx)])
            room.append(max(capacity - n, 0))
    return rows


def build_pack_arrays(
    lengths: Sequence[int],
    rows: List[List[int]],
    capacity: int,
    src_time: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Build device-side index arrays.

    Returns (gather_idx, segment_ids, unpack_idx):
      gather_idx   (R, capacity) int32 — flat indices into (B*src_time) rows
                   of the padded source; padding slots point at 0.
      segment_ids  (R, capacity) int32 — 1-based utterance segment per slot,
                   0 for padding (never equal to a real segment).
      unpack_idx   (B, src_time) int32 — flat indices into (R*capacity)
                   recovering each utterance's frames; padding slots -> 0.
    """
    if max(int(l) for l in lengths) > capacity:
        raise ValueError(
            f"capacity {capacity} < longest utterance "
            f"{max(int(l) for l in lengths)}: packing must not truncate"
        )
    for ri, row in enumerate(rows):
        row_sum = sum(int(lengths[u]) for u in row)
        if row_sum > capacity:
            # plan_packing never produces this; guard rows built by hand
            raise ValueError(
                f"packed row {ri} holds {row_sum} frames > capacity "
                f"{capacity}: packing must not truncate"
            )
    r = len(rows)
    gather = np.zeros((r, capacity), np.int64)
    seg = np.zeros((r, capacity), np.int64)
    unpack = np.zeros((len(lengths), src_time), np.int64)

    seg_counter = 0
    for ri, row in enumerate(rows):
        col = 0
        for utt in row:
            n = int(lengths[utt])
            seg_counter += 1
            gather[ri, col:col + n] = utt * src_time + np.arange(n)
            seg[ri, col:col + n] = seg_counter
            unpack[utt, :n] = ri * capacity + np.arange(col, col + n)
            col += n
    return (
        gather.astype(np.int32),
        seg.astype(np.int32),
        unpack.astype(np.int32),
    )


def pack_rows_needed(lengths: Sequence[int], capacity: int) -> int:
    return len(plan_packing(lengths, capacity))
