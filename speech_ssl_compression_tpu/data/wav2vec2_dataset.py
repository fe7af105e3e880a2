"""wav2vec 2.0 raw-audio dataset (reference datasets/wav2vec2_dataset.py:
RawAudioDataset / FileAudioDataset).

TSV manifest raw-audio dataset with crop-or-pad collation (:104-159) and
percentile length bucketing (set_bucket_info :197-214 +
fairseq_code/data_utils.py:313-331 get_buckets). The reference forces
bucketing when task.tpu is set (runner.py:263) — here static-shape bucketing
is simply always on. Zip-slice audio IO (fairseq audio_utils) is not
supported; plain FLAC/WAV files are read with the native decoder.
"""

from __future__ import annotations

import logging
import os
from typing import Iterator, Optional

import numpy as np

from .audio import read_audio

logger = logging.getLogger(__name__)


def get_percentile_buckets(sizes: np.ndarray, num_buckets: int) -> np.ndarray:
    """Bucket boundaries at uniform percentiles of the size distribution
    (reference fairseq_code/data_utils.py:313-331)."""
    buckets = np.unique(
        np.percentile(
            sizes,
            np.linspace(0, 100, num_buckets + 1),
            method="lower",
        )[1:]
    )
    return buckets


class Wav2Vec2AudioDataset:
    def __init__(
        self,
        manifest_path: str,
        sample_rate: int = 16000,
        batch_size: int = 4,
        max_sample_size: Optional[int] = None,
        min_sample_size: int = 0,
        pad: bool = False,
        normalize: bool = False,
        num_buckets: int = 8,
        crop_seq_to_multiple: int = 1,
        seed: int = 0,
        precompute_mask_config: Optional[dict] = None,
        frames_fn=None,  # samples -> conv frames (required with mask config)
        process_index: Optional[int] = 0,
        process_count: int = 1,
    ):
        self.sample_rate = sample_rate
        # multi-process lockstep sharding (see MelFeatBuckets): shared
        # shuffle stream, per-process crop/mask stream
        self.process_index = process_index
        self.process_count = max(1, int(process_count))
        self._multi = self.process_count > 1 or process_index is None
        if self._multi:
            self._order_rng = np.random.default_rng(seed)
            if process_index is None:
                # replay mode reproduces every process's crop/mask stream
                self._member_rngs = [
                    np.random.default_rng(seed + 1000003 * (m + 1))
                    for m in range(self.process_count)
                ]
            seed = seed + 1000003 * ((process_index or 0) + 1)
        else:
            self._order_rng = None
        # int sentinel, not np.inf: every consumer calls int(...) on this
        # (int(np.inf) raises OverflowError)
        self.max_sample_size = (
            int(max_sample_size) if max_sample_size is not None
            else np.iinfo(np.int64).max
        )
        self.pad = pad
        self.normalize = normalize
        self.crop_seq_to_multiple = max(int(crop_seq_to_multiple), 1)
        self.rng = np.random.default_rng(seed)

        # precomputed block masks (reference FileAudioDataset
        # compute_mask=..., datasets/wav2vec2_dataset.py:231-243,314-329):
        # emitted per batch at the final (cropped, static) frame count —
        # the reference generates per-item then crops, same block semantics.
        self.precompute_mask_config = None
        if precompute_mask_config is not None:
            known = {
                "mask_prob", "mask_length", "mask_prob_adjust",
                "inverse_mask", "mask_dropout", "non_overlapping",
                "require_same_masks",
            }
            unknown = {
                k: v for k, v in precompute_mask_config.items()
                if k not in known and v
            }
            if unknown:
                raise NotImplementedError(
                    f"precompute_mask_config keys {sorted(unknown)} are not "
                    "supported (expand_adjacent/clone_batch are data2vec-"
                    "only paths the reference never exercises)"
                )
            assert frames_fn is not None, (
                "precompute_mask_config needs frames_fn to map samples to "
                "conv frames"
            )
            self.precompute_mask_config = {
                k: v for k, v in precompute_mask_config.items() if k in known
            }
            self.frames_fn = frames_fn

        self.names, self.sizes = [], []
        skipped = 0
        with open(manifest_path) as f:
            self.root = f.readline().strip()
            for line in f:
                items = line.strip().split("\t")
                assert len(items) == 2, line
                sz = int(items[1])
                if sz < min_sample_size:
                    skipped += 1
                    continue
                self.names.append(items[0])
                self.sizes.append(sz)
        self.sizes = np.array(self.sizes, np.int64)
        logger.info(
            f"loaded {len(self.names)}, skipped {skipped} short samples"
        )

        # percentile buckets cap each utterance's padded size; batch by
        # sorted size so one batch = one static shape
        capped = np.minimum(self.sizes, int(self.max_sample_size))
        if num_buckets > 0 and len(capped) > 1:
            bounds = get_percentile_buckets(capped, num_buckets)
            self.bucket_bounds = np.asarray(bounds, np.int64)
            self.padded_sizes = bounds[
                np.searchsorted(bounds, capped, side="left")
            ]
        else:
            self.bucket_bounds = np.zeros((0,), np.int64)
            self.padded_sizes = capped

        order = np.argsort(self.padded_sizes)[::-1]
        self.batches = [
            order[i : i + batch_size].tolist()
            for i in range(0, len(order), batch_size)
        ]
        if batch_size > 1 and self.batches and len(self.batches[-1]) < 2:
            # batch_size == 1 legitimately produces singletons
            self.batches.pop()
        if self._multi:
            # lockstep assembly needs every batch batch-dim-equal
            self.batches = [
                b for b in self.batches if len(b) == batch_size
            ]

    def __len__(self):
        return len(self.batches) // self.process_count

    def _batch_target(self, batch_idx: int) -> int:
        """The batch's static source length, from the manifest alone (the
        decoded audio lengths equal the manifest's num_samples column) —
        every process computes each lockstep step's shape without
        communication. Mirrors get_batch's target arithmetic exactly."""
        idxs = self.batches[batch_idx]
        szs = self.sizes[idxs]
        if self.pad:
            target = min(int(szs.max()), int(self.max_sample_size))
            target = int(max(self.padded_sizes[idxs].max(), target))
        else:
            target = min(int(szs.min()), int(self.max_sample_size))
            if len(self.bucket_bounds):
                bi = int(np.searchsorted(self.bucket_bounds, target,
                                         side="right")) - 1
                if bi >= 0:
                    target = int(self.bucket_bounds[bi])
        from ..models.wav2vec2 import crop_to_multiple

        return max(crop_to_multiple(target, self.crop_seq_to_multiple), 1)

    def _get_audio(self, index: int) -> np.ndarray:
        path = os.path.join(self.root, self.names[index])
        wav, sr = read_audio(path)
        assert sr == self.sample_rate, path
        wav = wav[0]
        if self.normalize:
            wav = (wav - wav.mean()) / np.sqrt(wav.var() + 1e-5)
        return wav.astype(np.float32)

    def get_batch(self, batch_idx: int, pad_to: Optional[int] = None) -> dict:
        idxs = self.batches[batch_idx]
        wavs = [self._get_audio(i) for i in idxs]
        # The crop target snaps the raw batch minimum DOWN to a bucket
        # bound: a near-continuous value would recompile the jitted train
        # step for virtually every batch on TPU. Cropping a little more
        # than the reference's exact batch-min is the static-shape trade
        # (reference crops to min anyway; crop_seq_to_multiple per
        # model.py:757-762 is applied at the same boundary).
        target = self._batch_target(batch_idx)
        t_total = target
        if pad_to is not None:
            assert pad_to >= target, (
                f"lockstep pad target {pad_to} < batch target {target}"
            )
            t_total = pad_to

        b = len(idxs)
        source = np.zeros((b, t_total), np.float32)
        lengths = np.zeros((b,), np.int32)
        for i, w in enumerate(wavs):
            if len(w) > target:
                diff = len(w) - target
                start = int(self.rng.integers(0, diff + 1))
                w = w[start : start + target]
            source[i, : len(w)] = w
            lengths[i] = len(w)
        batch = {"source": source, "length": lengths}
        if self.precompute_mask_config is not None:
            from ..ops.block_masking import compute_block_mask_1d

            # masks live at the PADDED frame resolution so the jitted step
            # sees one shape; frames past the batch's own crop target are
            # padding for every item -> never maskable
            t_frames = int(self.frames_fn(t_total))
            mask = compute_block_mask_1d(
                (b, t_frames), rng=self.rng, **self.precompute_mask_config
            )
            if t_total > target:
                mask[:, int(self.frames_fn(target)):] = False
            batch["precomputed_mask"] = mask
        return batch

    def epoch(self, shuffle: bool = True) -> Iterator[dict]:
        order = np.arange(len(self.batches))
        if not self._multi:
            if shuffle:
                self.rng.shuffle(order)
            for i in order:
                yield self.get_batch(int(i))
            return

        # lockstep groups of process_count batches, one per process, all
        # padded to the group's manifest-derived source length
        if shuffle:
            self._order_rng.shuffle(order)
        pc = self.process_count
        for s in range(len(self.batches) // pc):
            group = [int(i) for i in order[s * pc : (s + 1) * pc]]
            tpad = max(self._batch_target(g) for g in group)
            if self.process_index is None:
                # each member loaded under its own process's rng stream
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
