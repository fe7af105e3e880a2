"""Feature extraction API — the minimum end-to-end slice (SURVEY.md §7.2).

Mirrors reference extract_feature.py + s3prl_upstream/expert.py: load any of
the five checkpoint flavors (dense / distilled / row-pruned / weight-pruned /
head-pruned), featurize waveforms with the Kaldi-compatible fbank, and run
the encoder with ``no_pred=True, get_hidden=True``.

Checkpoint-flavor handling is uniform here: the state-dict converter already
folds weight_orig*weight_mask ("prune.remove", extract_feature.py:104-114)
and infers per-layer head counts from projection shapes (the reference
instead re-creates nn.Linear modules from Pruned_heads metadata,
extract_feature.py:116-137).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .configs import MelHuBERTConfig
from .models import melhubert_forward
from .models.encoder import encoder_layers_forward, encoder_prologue
from .ops.fbank import kaldi_fbank_np, normalize_fbank, stack_frame_pairs_np
from .ops.packing import build_pack_arrays, plan_packing
from .data.audio import read_audio


def load_mean_std(mean_std_npy_path: str) -> Tuple[np.ndarray, np.ndarray]:
    mean_std = np.load(mean_std_npy_path)
    return mean_std[0].reshape(-1), mean_std[1].reshape(-1)


def wav_to_mel(
    waveform: np.ndarray,  # (n,) float in [-1, 1]
    mean: np.ndarray,
    std: np.ndarray,
    fp: int = 20,
    precision: str = "fast",
) -> np.ndarray:
    """Reference extract_fbank (extract_feature.py:32-53): x 2**15 scaling,
    40-bin Kaldi fbank, per-dim normalize, optional 20 ms stacking.

    ``precision``: "fast" (default) runs the fbank in float32 — ~1.4x more
    host frames/s (tools/bench_data.py) at ~2e-6 relative error, far below
    the 1e-4 parity target; "high" keeps the float64 oracle (what
    tools/parity_check.py pins for the golden-parity number)."""
    dtype = np.float64 if precision == "high" else np.float32
    y = kaldi_fbank_np(np.asarray(waveform, dtype) * (2**15), dtype=dtype)
    y = normalize_fbank(y, mean, std)
    if fp == 20:
        y = stack_frame_pairs_np(y)
    return y.astype(np.float32)


def _check_featurizer(featurizer: str):
    if featurizer not in ("host", "device"):
        raise ValueError(
            f"featurizer must be 'host' or 'device', got {featurizer!r}"
        )


def load_any_checkpoint(path: str):
    """Load either a reference torch .ckpt or our .npz checkpoint.
    Returns (params, cfg, extras)."""
    if path.endswith(".npz"):
        from .utils.checkpoint import load_checkpoint
        from .compress.weight_pruning import apply_masks

        state = load_checkpoint(path)
        meta = state["meta"]
        up = meta.get("Upstream_Config", {})
        # "student" FIRST: a distillation checkpoint stores the student's
        # params, and its config may sit beside a legacy "melhubert"
        # teacher section — same precedence as the distiller expert
        # (upstream/melhubert_distiller.py:29)
        cfg_dict = dict(up.get("student") or up.get("melhubert")
                        or up.get("hubert") or {})
        cfg = MelHuBERTConfig.from_dict(cfg_dict)
        params = state["params"]
        if state["masks"] is not None:
            params = apply_masks(params, state["masks"])
        # architecture may have been pruned: infer static dims from shapes
        from .utils.torch_convert import infer_pruned_dims

        heads, ffns = infer_pruned_dims(params, cfg.head_dim)
        cfg = cfg.with_heads(heads).with_ffn_dims(ffns)
        return params, cfg, meta
    from .utils.torch_convert import load_reference_checkpoint

    params, masks, cfg, extras = load_reference_checkpoint(path)
    # masks folded already by the converter (weight = orig * mask)
    return params, cfg, extras


class MelHuBERTExtractor:
    """S3PRL-style inference wrapper (reference s3prl_upstream/expert.py).

    forward(wavs) -> {"hidden_states": [pre_feat] + layer_hiddens,
                      "last_hidden_state": hidden}
    """

    def __init__(
        self,
        ckpt: str,
        fp: int = 20,
        mean_std_npy_path: Optional[str] = None,
        dtype=jnp.float32,
        pad_multiple: int = 128,
        matmul_precision: str = "highest",
        fbank_precision: str = "fast",
    ):
        self.fp = fp
        self.pad_multiple = pad_multiple
        # host featurizer numerics: "fast" = f32 fbank (~1.4x, ~2e-6 rel
        # err), "high" = the f64 oracle (what parity_check.py pins)
        self.fbank_precision = fbank_precision
        self.dtype = dtype
        self.matmul_precision = matmul_precision
        params, cfg, extras = load_any_checkpoint(ckpt)
        self.cfg = cfg
        self.params = jax.tree.map(
            lambda x: jnp.asarray(x, dtype), params,
            is_leaf=lambda x: not isinstance(x, (dict, list)),
        )
        self.extras = extras
        if mean_std_npy_path is not None:
            self.mean, self.std = load_mean_std(mean_std_npy_path)
        else:
            self.mean = np.zeros(40)
            self.std = np.ones(40)
        self._jit_forward = functools.partial(
            self._forward_impl, self.cfg, self.matmul_precision
        )

    @staticmethod
    @functools.partial(jax.jit, static_argnums=(0, 1))
    def _forward_impl(cfg, precision, params, feat, pad_mask):
        with jax.default_matmul_precision(precision):
            return melhubert_forward(
                params, cfg, feat, pad_mask,
                mask=False, no_pred=True, get_hidden=True,
            )

    def get_downsample_rates(self, key: str = "") -> int:
        return 320 if self.fp == 20 else 160

    def num_params(self) -> int:
        return sum(
            int(np.prod(np.shape(x))) for x in jax.tree.leaves(self.params)
        )

    def featurize(self, wavs: Sequence[np.ndarray]):
        mels = [wav_to_mel(w, self.mean, self.std, self.fp,
                           precision=self.fbank_precision) for w in wavs]
        lengths = [m.shape[0] for m in mels]
        t = max(lengths)
        t_pad = -(-t // self.pad_multiple) * self.pad_multiple
        b = len(mels)
        d = mels[0].shape[1]
        feat = np.zeros((b, t_pad, d), np.float32)
        for i, m in enumerate(mels):
            feat[i, : m.shape[0]] = m
        pad_mask = (
            np.arange(t_pad)[None, :] < np.asarray(lengths)[:, None]
        ).astype(np.float32)
        return feat, pad_mask, lengths

    def featurize_device(self, wavs: Sequence[np.ndarray]):
        """On-device wav -> normalized (stacked) features: fbank +
        normalize + stacking run on the chip (ops/fbank.featurize_batch).
        The host sustains ~45k stacked frames/s per process while the chip
        extracts ~350k (tools/bench_data.py) — this removes the host
        bottleneck from bulk serving. Returns (feat (B, T_pad, D) device
        array, pad_mask, lengths) shaped exactly like :meth:`featurize`
        (parity ~1e-4 rel vs the host f64 path)."""
        batch, n_samp, max_frames, stack, lengths, t_pad = (
            self._assemble_wave_batch(wavs)
        )
        return self._featurize_batch_device(
            batch, n_samp, max_frames, stack, lengths, t_pad
        )

    def _assemble_wave_batch(self, wavs):
        """Host half of :meth:`featurize_device`: scale, pad, and size the
        batch (pure NumPy — safe inside a prefetch worker thread)."""
        from .ops.fbank import num_frames

        n_samp = [int(w.shape[-1]) for w in wavs]
        frames10 = [num_frames(n) for n in n_samp]
        if self.fp == 20:
            t_out = max(-(-f // 2) for f in frames10)
            t_pad = -(-t_out // self.pad_multiple) * self.pad_multiple
            max_frames, stack = 2 * t_pad, True
            lengths = [-(-f // 2) for f in frames10]
        else:
            t_out = max(frames10)
            t_pad = -(-t_out // self.pad_multiple) * self.pad_multiple
            max_frames, stack = t_pad, False
            lengths = frames10
        # snip-edges leftovers: the longest wav may carry up to 159 samples
        # past its last frame's reach (and padded frame counts can land
        # exactly on the pad boundary), so size the buffer to whichever is
        # larger — kaldi_fbank ignores samples past its frame window
        max_samples = max((max_frames - 1) * 160 + 400, max(n_samp))
        batch = np.zeros((len(wavs), max_samples), np.float32)
        for i, w in enumerate(wavs):
            batch[i, : n_samp[i]] = np.asarray(w, np.float32) * (2**15)
        # 16-bit-sourced audio (FLAC/WAV) scales back to exact int16:
        # upload half the bytes, bit-identically (kaldi_fbank casts frames
        # to f32 on-device). Non-exact (synthetic float) audio stays f32.
        if (np.abs(batch).max(initial=0.0) <= 32767.0
                and np.array_equal(batch, np.round(batch))):
            batch = batch.astype(np.int16)
        return batch, n_samp, max_frames, stack, lengths, t_pad

    def _featurize_batch_device(self, batch, n_samp, max_frames, stack,
                                lengths, t_pad):
        """Device half of :meth:`featurize_device` (main-thread only)."""
        from .ops.fbank import featurize_batch

        feat, n_valid = featurize_batch(
            jnp.asarray(batch),
            jnp.asarray(n_samp, jnp.int32),
            jnp.asarray(self.mean, jnp.float32),
            jnp.asarray(self.std, jnp.float32),
            max_frames,
            stack=stack,
        )
        pad_mask = (
            np.arange(t_pad)[None, :] < np.asarray(lengths)[:, None]
        ).astype(np.float32)
        return feat, pad_mask, lengths

    def forward(self, wavs: Sequence[np.ndarray],
                featurizer: str = "host") -> dict:
        _check_featurizer(featurizer)
        if featurizer == "device":
            feat, pad_mask, lengths = self.featurize_device(wavs)
        else:
            feat, pad_mask, lengths = self.featurize(wavs)
        from .ops.attention import attention_mesh

        # serving is single-device: never trace against a (possibly stale,
        # process-global) training mesh installed by a runner
        with attention_mesh(None):
            out = self._jit_forward(
                self.params,
                jnp.asarray(feat, self.dtype),
                jnp.asarray(pad_mask),
            )
        return {
            "hidden_states": [out["pre_feat"]] + list(out["layer_hiddens"]),
            "last_hidden_state": out["hidden"],
            "lengths": lengths,
        }

    def forward_seqpar(self, wav: np.ndarray, mesh,
                       featurizer: str = "host") -> dict:
        """Sequence-parallel long-form extraction of ONE utterance: the
        time axis sharded over ``mesh``'s "data" axis (parallel/seqpar.py).
        Use when a single chip's O(T^2) attention wall-clock is the
        bottleneck; outputs match ``forward`` exactly."""
        _check_featurizer(featurizer)
        if featurizer == "device":
            feat, pad_mask, lengths = self.featurize_device([wav])
        else:
            feat, pad_mask, lengths = self.featurize([wav])
        from .ops.attention import attention_mesh
        from .parallel.seqpar import melhubert_extract_seqpar

        with attention_mesh(None):  # seqpar manages its own shard_map
            hidden = melhubert_extract_seqpar(
                self.params, self.cfg,
                jnp.asarray(feat, self.dtype), jnp.asarray(pad_mask),
                mesh, precision=self.matmul_precision,
            )
        return {"last_hidden_state": hidden, "lengths": lengths}

    def forward_files(self, paths: Sequence[str],
                      featurizer: str = "host") -> dict:
        wavs = []
        for p in paths:
            wav, sr = read_audio(p)
            assert sr == 16000, f"{p}: expected 16 kHz, got {sr}"
            wavs.append(wav[0])
        return self.forward(wavs, featurizer=featurizer)

    # ------------------------------------------------------------------
    # sequence-packed extraction: identical outputs, less padding waste
    # ------------------------------------------------------------------
    @staticmethod
    @functools.partial(jax.jit, static_argnums=(0, 1))
    def _packed_impl(cfg, precision, params, feat, pad_mask, gather_idx,
                     seg_ids, unpack_idx):
        with jax.default_matmul_precision(precision):
            valid = pad_mask.astype(bool)
            x = feat
            if "pre_extract_proj" in params:
                p = params["pre_extract_proj"]
                x = x @ p["kernel"] + p["bias"]
            pre_feat = x
            enc = params["encoder"]
            # prologue per utterance: the conv positional embedding must not
            # cross utterance boundaries
            x = encoder_prologue(x, enc, cfg, padding_mask=~valid)

            b, t, d = x.shape
            r, s = gather_idx.shape
            flat = x.reshape(b * t, d)
            xp = flat[gather_idx.reshape(-1)].reshape(r, s, d)
            hidden_p, layer_hiddens_p, _ = encoder_layers_forward(
                xp, enc, cfg,
                padding_mask=seg_ids == 0,
                segment_ids=seg_ids,
                get_hidden=True,
                # packing keeps each utterance contiguous and in order, so
                # causal-within-segment equals the unpacked causal mask
                causal=cfg.attention_type == "causal",
            )

            def unpack(h):
                hflat = h.reshape(r * s, d)
                out = hflat[unpack_idx.reshape(-1)].reshape(b, t, d)
                return jnp.where(valid[:, :, None], out, 0.0)

            return {
                "hidden": unpack(hidden_p),
                "layer_hiddens": [unpack(h) for h in layer_hiddens_p],
                "pre_feat": pre_feat,
            }

    def forward_packed(self, wavs: Sequence[np.ndarray],
                       capacity: Optional[int] = None,
                       featurizer: str = "host") -> dict:
        """Like :meth:`forward` but packs utterances into fixed-capacity
        rows with segment-masked attention (block-diagonal). Outputs match
        the unpacked path. ``featurizer="device"`` composes the on-chip
        featurizer with packing (lengths come from host-side frame
        arithmetic, so no device sync): the full wav -> packed features ->
        encoder pipeline is then device-resident."""
        _check_featurizer(featurizer)
        if int(self.cfg.encoder_layers) == 0:
            # no encoder params to pack over; the plain path handles the
            # gelu(pre_feat) fallback (melhubert.py:124-137)
            return self.forward(wavs, featurizer=featurizer)
        if featurizer == "device":
            feat, pad_mask, lengths = self.featurize_device(wavs)
        else:
            feat, pad_mask, lengths = self.featurize(wavs)
        return self._pack_and_dispatch(feat, pad_mask, lengths, capacity)

    def _pack_and_dispatch(self, feat, pad_mask, lengths,
                           capacity: Optional[int] = None) -> dict:
        """Shared tail of :meth:`forward_packed` / :meth:`forward_stream`:
        plan packing, dispatch the packed encoder, assemble outputs."""
        b, t, _ = feat.shape
        cap = capacity or t
        cap = max(cap, max(lengths))
        cap = -(-cap // self.pad_multiple) * self.pad_multiple
        rows = plan_packing(lengths, cap)
        gather_idx, seg_ids, unpack_idx = build_pack_arrays(
            lengths, rows, cap, t
        )
        from .ops.attention import attention_mesh

        with attention_mesh(None):  # single-device serving (see forward)
            out = self._packed_impl(
                self.cfg, self.matmul_precision, self.params,
                jnp.asarray(feat, self.dtype), jnp.asarray(pad_mask),
                jnp.asarray(gather_idx), jnp.asarray(seg_ids),
                jnp.asarray(unpack_idx),
            )
        return {
            "hidden_states": [out["pre_feat"]] + list(out["layer_hiddens"]),
            "last_hidden_state": out["hidden"],
            "lengths": lengths,
            "n_packed_rows": len(rows),
        }

    def forward_stream(self, batch_iter, capacity: Optional[int] = None,
                       featurizer: str = "host", depth: int = 2):
        """Pipelined bulk serving: yields :meth:`forward_packed` outputs
        for an iterator of wav batches, overlapping host featurization
        (a background prefetch thread) and device compute (JAX's async
        dispatch — up to ``depth`` batches are in flight before the
        consumer's first fetch fences one).

        The fence-per-call pattern (tools/bench_serve_e2e.py) serializes
        host fbank, upload, and encoder; streaming hides the host work
        behind the chip, so sustained throughput approaches
        max(featurize, encode) instead of their sum. Outputs arrive in
        input order; consume each yielded dict (e.g. np.asarray one
        tensor) to fence it.
        """
        from collections import deque

        from .data.bucket_dataset import PrefetchIterator

        _check_featurizer(featurizer)
        if int(self.cfg.encoder_layers) == 0:
            # no encoder to pack over: per-batch plain forward (the
            # gelu(pre_feat) fallback, melhubert.py:124-137), matching
            # forward_packed's routing
            for b in batch_iter:
                yield self.forward(b, featurizer=featurizer)
            return
        if featurizer == "device":
            # the worker thread does only NumPy assembly; all device calls
            # stay on this thread
            feats = PrefetchIterator(
                (self._assemble_wave_batch(b) for b in batch_iter),
                depth=depth,
            )
        else:
            feats = PrefetchIterator(
                (self.featurize(b) for b in batch_iter), depth=depth
            )
        try:
            pending = deque()
            for item in feats:
                if featurizer == "device":
                    feat, pad_mask, lengths = (
                        self._featurize_batch_device(*item)
                    )
                else:
                    feat, pad_mask, lengths = item
                pending.append(
                    self._pack_and_dispatch(feat, pad_mask, lengths,
                                            capacity)
                )
                if len(pending) >= depth:
                    yield pending.popleft()
            while pending:
                yield pending.popleft()
        finally:
            feats.close()
