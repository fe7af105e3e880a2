"""Length-bucketed feature/label batching for MelHuBERT training.

Rebuild of datasets/melhubert_dataset.py (FeatLabelDataset / MelFeatDataset):
CSV manifests (file_path,label_path,length), sort-by-length descending,
greedy buckets of ``bucket_size`` utterances, random fixed-length crops,
-100 label padding, and 20 ms frame-pair stacking.

TPU-first changes:
  * batches are padded up to a small set of static shape buckets
    (multiples of ``pad_multiple`` frames) so jit compiles a bounded number
    of programs instead of one per utterance length (SURVEY.md §5
    "long-context": reference relies on dynamic shapes + GPU kernels);
  * the reference's DataLoader(batch_size=1) + collate hack
    (melhubert_dataset.py:72-75) disappears: a bucket IS a batch;
  * background prefetch uses a double-buffered thread, overlapping host IO
    with device steps.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, List, Optional, Sequence

import numpy as np

from ..ops.fbank import stack_frame_pairs_np


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class MelFeatBuckets:
    """CSV-driven bucketed dataset of (feat.npy, label.npy) pairs."""

    def __init__(
        self,
        frame_period: int,
        sequence_length: int,
        bucket_size: int,
        sets: Sequence[str],
        max_timestep: int = 0,
        pad_multiple: int = 128,
        seed: int = 0,
        process_index: Optional[int] = 0,
        process_count: int = 1,
    ):
        import pandas as pd

        self.frame_period = frame_period
        self.sample_length = sequence_length
        self.bucket_size = bucket_size
        self.pad_multiple = pad_multiple
        # Multi-process sharding (SURVEY §2.8's multi-host path): every
        # process builds the SAME global bucket list; an epoch serves
        # buckets in pc-sized groups — process p loads group member p —
        # so the processes' local batches concatenate into one global
        # batch. process_index=None serves the whole group concatenated
        # on a single process (the exact global-stream replay used by the
        # multi-process equivalence test).
        self.process_index = process_index
        self.process_count = max(1, int(process_count))
        if self.process_count > 1 or process_index is None:
            # the shuffle order must be identical on every process, so it
            # gets its own stream; crops are per-process data augmentation
            self._order_rng = np.random.default_rng(seed)
            self.rng = np.random.default_rng(
                seed + 1000003 * ((process_index or 0) + 1)
            )
            if process_index is None:
                # replay mode reproduces every process's crop stream
                self._member_rngs = [
                    np.random.default_rng(seed + 1000003 * (m + 1))
                    for m in range(self.process_count)
                ]
        else:
            self._order_rng = None
            self.rng = np.random.default_rng(seed)

        tables = [pd.read_csv(s) for s in sets]
        table = pd.concat(tables, ignore_index=True).sort_values(
            by=["length"], ascending=False
        )
        # signed max_timestep: >0 drops longer, <0 drops shorter
        # (melhubert_dataset.py:30-34)
        if max_timestep > 0:
            table = table[table.length < max_timestep]
        elif max_timestep < 0:
            table = table[table.length > (-1 * max_timestep)]

        x = table["file_path"].tolist()
        y = table["label_path"].tolist()
        lens = [int(v) for v in table["length"].tolist()]

        self.buckets: List[tuple] = []
        bucket_lens: List[List[int]] = []
        bx, by, bl = [], [], []
        for xi, yi, li in zip(x, y, lens):
            bx.append(xi)
            by.append(yi)
            bl.append(li)
            if len(bx) == bucket_size:
                self.buckets.append((bx, by))
                bucket_lens.append(bl)
                bx, by, bl = [], [], []
        if len(bx) > 1 and (
            self.process_count <= 1 and process_index is not None
        ):
            # reference drops a trailing singleton (:59); multi-process
            # lockstep additionally needs every bucket batch-dim-equal, so
            # the trailing partial bucket is dropped there entirely
            self.buckets.append((bx, by))
            bucket_lens.append(bl)
        # count only the samples actually served (after singleton drop)
        self.num_samples = sum(len(b[0]) for b in self.buckets)
        # per-bucket padded length derived from the manifest alone, so
        # every process computes each step's batch shape without
        # communication (lockstep shapes are what make
        # jax.make_array_from_process_local_data assembly legal)
        self._bucket_tpad = []
        for ls in bucket_lens:
            eff = max(
                -(-l // 2) if frame_period == 20 else l for l in ls
            )
            if self.sample_length > 0:
                eff = min(eff, self.sample_length)
            self._bucket_tpad.append(_round_up(eff, pad_multiple))

    def __len__(self):
        # in multi-process mode an epoch advances in lockstep groups of
        # process_count buckets (trailing partial group dropped)
        return len(self.buckets) // self.process_count

    def _load_feat(self, path: str) -> np.ndarray:
        feat = np.load(path)
        if self.frame_period == 20:
            feat = stack_frame_pairs_np(feat)
        return np.asarray(feat, np.float32)

    def _load_label(self, path: str, feat_len: int) -> np.ndarray:
        label = np.load(path)
        if self.frame_period == 20 and feat_len != label.shape[0]:
            label = label[::2]
        return np.asarray(label, np.int32)

    def _crop(self, feat, label):
        if self.sample_length <= 0 or len(feat) < self.sample_length:
            return feat, label
        idx = int(self.rng.integers(0, len(feat) - self.sample_length + 1))
        return (
            feat[idx : idx + self.sample_length],
            label[idx : idx + self.sample_length],
        )

    def get_batch(self, index: int, pad_to: Optional[int] = None) -> dict:
        bx, by = self.buckets[index]
        feats, labels = [], []
        for xp, yp in zip(bx, by):
            f = self._load_feat(xp)
            l = self._load_label(yp, f.shape[0])
            f, l = self._crop(f, l)
            feats.append(f)
            labels.append(l)

        lengths = np.array([len(f) for f in feats], np.int32)
        t = _round_up(int(lengths.max()), self.pad_multiple)
        if pad_to is not None:
            assert pad_to >= t, (
                f"lockstep pad target {pad_to} < actual bucket length {t} "
                "(manifest lengths disagree with the stored features)"
            )
            t = pad_to
        b = len(feats)
        d = feats[0].shape[1]
        feat_pad = np.zeros((b, t, d), np.float32)
        label_pad = np.full((b, t), -100, np.int32)
        for i, (f, l) in enumerate(zip(feats, labels)):
            feat_pad[i, : len(f)] = f
            n = min(len(l), len(f))
            label_pad[i, :n] = l[:n]
        pad_mask = (np.arange(t)[None, :] < lengths[:, None]).astype(np.float32)
        return {
            "feat": feat_pad,
            "label": label_pad,
            "pad_mask": pad_mask,
            "length": lengths,
        }

    def epoch(self, shuffle: bool = True) -> Iterator[dict]:
        order = np.arange(len(self.buckets))
        pc = self.process_count
        if pc <= 1 and self.process_index is not None:
            if shuffle:
                self.rng.shuffle(order)
            for i in order:
                yield self.get_batch(int(i))
            return

        # multi-process lockstep: identical order on every process (shared
        # stream), step s serves the pc buckets order[s*pc:(s+1)*pc] — one
        # per process — all padded to the group's manifest-derived length
        if shuffle:
            self._order_rng.shuffle(order)
        steps = len(self.buckets) // pc
        for s in range(steps):
            group = [int(i) for i in order[s * pc : (s + 1) * pc]]
            tpad = max(self._bucket_tpad[g] for g in group)
            if self.process_index is None:
                # global-stream replay: concatenate the whole group, each
                # member loaded under its own process's crop-rng stream
                parts = []
                for m, g in enumerate(group):
                    self.rng = self._member_rngs[m]
                    parts.append(self.get_batch(g, pad_to=tpad))
                yield {
                    k: np.concatenate([p[k] for p in parts], axis=0)
                    for k in parts[0]
                }
            else:
                yield self.get_batch(group[self.process_index], pad_to=tpad)


class PrefetchIterator:
    """Background-thread prefetch (double buffering) around any iterator.

    Early consumer exit (break out of the epoch loop) must not leave the
    worker blocked on a full queue: puts poll a stop event, and the iterator
    stays in the exhausted state once finished."""

    def __init__(self, it: Iterator, depth: int = 2):
        self.q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._done = object()
        self._err: Optional[BaseException] = None
        self._stop = threading.Event()
        self._exhausted = False

        def _put(item) -> bool:
            while not self._stop.is_set():
                try:
                    self.q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for item in it:
                    if not _put(item):
                        return
            except BaseException as e:  # propagate into consumer
                self._err = e
            finally:
                _put(self._done)

        self.t = threading.Thread(target=worker, daemon=True)
        self.t.start()

    def close(self):
        self._stop.set()

    def __del__(self):
        self._stop.set()

    def __iter__(self):
        return self

    def __next__(self):
        if self._exhausted:
            raise StopIteration
        while True:
            if self._stop.is_set():
                # closed: the worker may exit WITHOUT enqueuing the done
                # sentinel (its _put returns False once _stop is set), so
                # an unconditional q.get() would hang forever. Drain
                # whatever is already buffered, then stop.
                try:
                    item = self.q.get_nowait()
                except queue.Empty:
                    self._exhausted = True
                    raise StopIteration from None
            else:
                try:
                    item = self.q.get(timeout=0.1)
                except queue.Empty:
                    continue  # re-check _stop
            if item is self._done:
                self._exhausted = True
                self._stop.set()
                if self._err is not None:
                    raise self._err
                raise StopIteration
            return item
