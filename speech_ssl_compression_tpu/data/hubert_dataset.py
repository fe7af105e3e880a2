"""HuBERT waveform dataset (reference datasets/hubert_dataset.py:111-352).

TSV manifest (first line = root, then "rel_path\\tnum_samples"), per-frame
label files with byte-offset lazy reads (load_label_offset, :61-69),
label/audio duration verification (verify_label_lengths, :72-108), random
crop to max_sample_size with aligned label cropping (collater_frm_label,
:285-301).

TPU-first: batches are padded to static shape buckets; audio is decoded with
the native FLAC/WAV reader instead of soundfile.
"""

from __future__ import annotations

import itertools
import logging
import os
from typing import Iterator, List, Optional, Sequence

import numpy as np

from .bucket_dataset import _round_up

from .audio import read_audio

logger = logging.getLogger(__name__)


def load_manifest(manifest_path: str, max_keep: Optional[int],
                  min_keep: Optional[int]):
    names, inds, sizes = [], [], []
    n_long, n_short = 0, 0
    tot = 0
    with open(manifest_path) as f:
        root = f.readline().strip()
        for ind, line in enumerate(f):
            tot = ind + 1
            items = line.strip().split("\t")
            assert len(items) == 2, line
            sz = int(items[1])
            if min_keep is not None and sz < min_keep:
                n_short += 1
            elif max_keep is not None and sz > max_keep:
                n_long += 1
            else:
                names.append(items[0])
                inds.append(ind)
                sizes.append(sz)
    logger.info(
        f"manifest {manifest_path}: kept {len(names)}, "
        f"skipped {n_short} short / {n_long} long"
    )
    return root, names, inds, sizes, tot


def load_label_offsets(label_path: str, inds: Sequence[int], tot: int):
    """Byte offsets of the kept utterances' label lines (reference :61-69)."""
    with open(label_path) as f:
        code_lengths = [len(line.encode("utf-8")) for line in f]
    assert len(code_lengths) == tot, (
        f"label count {len(code_lengths)} != manifest count {tot}"
    )
    offsets = list(itertools.accumulate([0] + code_lengths))
    return [(offsets[i], offsets[i + 1]) for i in inds]


def verify_label_lengths(sizes, label_path, inds, tot, label_rate,
                         sample_rate=16000, tol=0.1):
    """reference :72-108: warn when audio and label durations disagree."""
    if label_rate < 0:
        # sequence labels (reference :81-83): no frame alignment to verify
        logger.info(f"{label_path} is sequence label. skipped")
        return
    with open(label_path) as f:
        lengths = [len(line.rstrip().split()) for line in f]
    assert len(lengths) == tot
    num_invalid = 0
    for i, ind in enumerate(inds):
        dur_from_audio = sizes[i] / sample_rate
        dur_from_label = lengths[ind] / label_rate
        if abs(dur_from_audio - dur_from_label) > tol:
            logger.warning(
                f"audio and label duration differ too much "
                f"({dur_from_audio} vs {dur_from_label}) at index {ind}"
            )
            num_invalid += 1
    if num_invalid > 0:
        logger.warning(f"total {num_invalid} (audio, label) pairs with mismatch")


class HubertWaveDataset:
    """Bucketed (by size) batches of raw audio + frame labels."""

    def __init__(
        self,
        manifest_path: str,
        sample_rate: int,
        label_paths: List[str],
        label_rates,
        batch_size: int = 4,
        max_keep_sample_size: Optional[int] = None,
        min_keep_sample_size: Optional[int] = None,
        max_sample_size: Optional[int] = None,
        pad_audio: bool = False,
        normalize: bool = False,
        random_crop: bool = True,
        single_target: bool = False,
        pad_multiple: int = 2000,
        seed: int = 0,
        label_processors: Optional[List] = None,
        process_index: Optional[int] = 0,
        process_count: int = 1,
    ):
        self.root, self.names, inds, self.sizes, tot = load_manifest(
            manifest_path, max_keep_sample_size, min_keep_sample_size
        )
        self.sample_rate = sample_rate
        self.label_paths = label_paths
        if isinstance(label_rates, (int, float)):
            label_rates = [float(label_rates)] * len(label_paths)
        self.label_rates = [float(r) for r in label_rates]
        self.max_sample_size = max_sample_size or np.inf
        self.pad_audio = pad_audio
        self.normalize = normalize
        self.random_crop = random_crop
        self.single_target = single_target
        self.pad_multiple = pad_multiple
        # multi-process lockstep sharding (see MelFeatBuckets): shared
        # shuffle stream, per-process crop stream, equal-size buckets only
        self.process_index = process_index
        self.process_count = max(1, int(process_count))
        self._multi = self.process_count > 1 or process_index is None
        if self._multi:
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
        # per-label-set line -> int-array encoders (reference's
        # label_processors / LabelEncoder, runner.py:25-34); default =
        # whitespace-separated integers (the .km format)
        self.label_processors = label_processors

        self.label_offsets = [
            load_label_offsets(p, inds, tot) for p in label_paths
        ]
        for p, r in zip(label_paths, self.label_rates):
            verify_label_lengths(self.sizes, p, inds, tot, r, sample_rate)

        order = np.argsort(np.array(self.sizes))[::-1]
        self.buckets = [
            order[i : i + batch_size].tolist()
            for i in range(0, len(order), batch_size)
        ]
        if batch_size > 1 and self.buckets and len(self.buckets[-1]) < 2:
            # a lone leftover in a >1-sized batching is dropped (static
            # shapes); batch_size == 1 legitimately produces singletons
            logger.info("dropping a trailing single-utterance bucket")
            self.buckets.pop()
        if self._multi:
            # lockstep assembly needs every bucket batch-dim-equal
            self.buckets = [
                b for b in self.buckets if len(b) == batch_size
            ]

    def __len__(self):
        return len(self.buckets) // self.process_count

    def _bucket_tpad(self, bucket_idx: int) -> int:
        """Padded source length of a bucket, from the manifest alone —
        every process computes each lockstep step's batch shape without
        communication."""
        szs = [self.sizes[j] for j in self.buckets[bucket_idx]]
        target = max(szs) if self.pad_audio else min(szs)
        if np.isfinite(self.max_sample_size):
            target = min(target, int(self.max_sample_size))
        return _round_up(int(target), self.pad_multiple)

    def _get_audio(self, index: int) -> np.ndarray:
        path = os.path.join(self.root, self.names[index])
        wav, sr = read_audio(path)
        assert sr == self.sample_rate, path
        wav = wav[0]
        if self.normalize:
            wav = (wav - wav.mean()) / np.sqrt(wav.var() + 1e-5)
        return wav.astype(np.float32)

    def _get_labels(self, index: int) -> List[np.ndarray]:
        out = []
        for li, (p, offsets) in enumerate(
            zip(self.label_paths, self.label_offsets)
        ):
            s, e = offsets[index]
            # binary mode: the offsets are BYTE positions; a text-mode
            # f.read(e - s) counts characters and over-reads into the next
            # utterance whenever the file holds any multi-byte sequence
            with open(p, "rb") as f:
                f.seek(s)
                line = f.read(e - s).decode("utf-8")
            if self.label_processors is not None:
                out.append(np.asarray(self.label_processors[li](line)))
            else:
                out.append(np.array(list(map(int, line.split()))))
        return out

    def get_batch(self, bucket_idx: int, pad_to: Optional[int] = None) -> dict:
        idxs = self.buckets[bucket_idx]
        wavs = [self._get_audio(i) for i in idxs]
        labels = [self._get_labels(i) for i in idxs]

        target = (
            max(len(w) for w in wavs) if self.pad_audio
            else min(len(w) for w in wavs)
        )
        if np.isfinite(self.max_sample_size):
            target = min(target, int(self.max_sample_size))

        starts = []
        cropped = []
        for w in wavs:
            diff = len(w) - target
            if diff <= 0:
                start = 0
            elif self.random_crop:
                start = int(self.rng.integers(0, diff + 1))
            else:
                start = 0
            starts.append(start)
            cropped.append(w[start : start + target])

        t_pad = _round_up(target, self.pad_multiple)
        if pad_to is not None:
            assert pad_to >= t_pad, (
                f"lockstep pad target {pad_to} < bucket length {t_pad}"
            )
            t_pad = pad_to
        b = len(idxs)
        source = np.zeros((b, t_pad), np.float32)
        lengths = np.zeros((b,), np.int32)
        for i, w in enumerate(cropped):
            source[i, : len(w)] = w
            lengths[i] = len(w)

        # frame-aligned label crops (reference collater_frm_label :285-301);
        # label_rate == -1 -> sequence labels passed whole (collater_seq_label
        # :303-308 — no crop alignment)
        target_lists = []
        for li, rate in enumerate(self.label_rates):
            if rate < 0:
                target_lists.append([labs[li] for labs in labels])
                continue
            s2f = rate / self.sample_rate
            frm_labels = []
            for bi, labs in enumerate(labels):
                frm_start = int(round(starts[bi] * s2f))
                frm_size = int(round(target * s2f))
                frm_labels.append(labs[li][frm_start : frm_start + frm_size])
            target_lists.append(frm_labels)

        return {
            "source": source,
            "length": lengths,
            "target_lists": target_lists,
            "starts": starts,
            "crop_size": target,
        }

    def epoch(self, shuffle: bool = True) -> Iterator[dict]:
        order = np.arange(len(self.buckets))
        if not self._multi:
            if shuffle:
                self.rng.shuffle(order)
            for i in order:
                yield self.get_batch(int(i))
            return

        # lockstep groups of process_count buckets, one per process, all
        # padded to the group's manifest-derived source length
        if shuffle:
            self._order_rng.shuffle(order)
        pc = self.process_count
        for s in range(len(self.buckets) // pc):
            group = [int(i) for i in order[s * pc : (s + 1) * pc]]
            tpad = max(self._bucket_tpad(g) for g in group)
            if self.process_index is None:
                # global-stream replay: concatenate the whole group, each
                # member loaded under its own process's crop-rng stream
                parts = []
                for m, g in enumerate(group):
                    self.rng = self._member_rngs[m]
                    parts.append(self.get_batch(g, pad_to=tpad))
                yield {
                    "source": np.concatenate(
                        [p["source"] for p in parts], axis=0
                    ),
                    "length": np.concatenate(
                        [p["length"] for p in parts], axis=0
                    ),
                    "target_lists": [
                        sum((p["target_lists"][li] for p in parts), [])
                        for li in range(len(parts[0]["target_lists"]))
                    ],
                    "starts": sum((list(p["starts"]) for p in parts), []),
                    "crop_size": max(p["crop_size"] for p in parts),
                }
            else:
                yield self.get_batch(group[self.process_index], pad_to=tpad)
