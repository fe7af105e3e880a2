"""Streaming causal MelHuBERT inference with per-layer KV caches.

The reference ships a causal attention option (model.py:121-132 builds a
lower-triangular mask with a host loop) but provides no way to *serve* it
incrementally — the only entry points re-run the full forward on the whole
utterance. This module adds online inference as a TPU-native chunked loop:

  * one jitted step of a STATIC chunk of C frames against STATIC-capacity
    per-layer K/V caches (no recompiles as the stream grows; cache writes
    are ``lax.dynamic_update_slice`` at the traced global offset);
  * exact parity with the full causal forward: the conv positional
    embedding (kernel K) is the only non-causal op, so emission lags the
    newest frame by K - 1 - K//2 frames (63 at the default K=128 — 1.26 s
    of audio at the 20 ms frame period) and each chunk's conv runs VALID
    over a (C + K - 1)-frame feature window, reproducing the full
    forward's SamePad arithmetic (module.py:175-188) including its zero
    padding at both stream ends;
  * host-side streaming featurizer: Kaldi fbank ops are strictly
    per-frame (ops/fbank.py), so chunked extraction is bit-identical to
    whole-utterance extraction; the 20 ms frame-stacking carry and the
    odd-final-frame zero pad (extract_feature.py:47-52) are handled at
    flush.

Typical use::

    s = StreamingCausalExtractor("causal.ckpt", fp=20,
                                 mean_std_npy_path=".../mean-std.npy")
    for wav_chunk in microphone:
        hidden = s.push_wav(wav_chunk)["last_hidden_state"]  # (n_new, D)
    tail = s.flush()["last_hidden_state"]
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .configs import MelHuBERTConfig
from .models.encoder import (
    encoder_layer_forward,
    layer_norm,
    pos_conv_weight,
)
from .ops.activations import gelu
from .ops.fbank import (
    kaldi_fbank_np,
    normalize_fbank,
    num_frames,
    stack_frame_pairs_np,
)
from .ops.grouped_conv import grouped_conv1d

NEG_INF = -1e30


def _cached_self_attn(h, lp, cache, n, start, *, num_heads, head_dim,
                      window=None):
    """Causal self-attention of a (B, C, D) chunk at global offset ``n``
    against a (B, H, MAX, d) K/V cache. Returns (out, context, new_cache).

    New keys/values are written into the cache first; the causal mask
    kv_pos <= n + q_row then covers everything — unwritten capacity and any
    stale rows beyond the write live at positions > n + C - 1 and are
    excluded by the same comparison. ``start`` (B,) is each row's stream
    origin: cache positions below it belong to a previous occupant of the
    slot (batched serving reuses rows for new streams mid-run) and are
    masked out the same way. The conv positional embedding is relative, so
    a stream starting at physical offset s behaves identically to one
    starting at 0.

    ``window`` (static int) turns the cache into a RING over the last
    `window` frames for unbounded always-on streams at constant memory:
    the slab is written at n mod MAX (never wraps — the host advances n
    by exactly C per step and MAX is a multiple of C with
    MAX >= window + C), and each slot p's GLOBAL frame index is
    recovered arithmetically as the largest f <= n + C - 1 with
    f == p (mod MAX). Queries attend to frames in
    [max(start, g - window + 1), g] — windowed attention, the standard
    always-on serving approximation (each deeper layer's effective
    receptive field grows by `window`, Transformer-XL style)."""
    b, c, _ = h.shape

    def proj(name):
        p = lp[name]
        y = h @ p["kernel"] + p["bias"]
        return y.reshape(b, c, num_heads, head_dim).transpose(0, 2, 1, 3)

    q = proj("q_proj")
    cap = cache["k"].shape[2]
    wr = n if window is None else jax.lax.rem(n, cap)
    ck = jax.lax.dynamic_update_slice(cache["k"], proj("k_proj"),
                                      (0, 0, wr, 0))
    cv = jax.lax.dynamic_update_slice(cache["v"], proj("v_proj"),
                                      (0, 0, wr, 0))

    scale = 1.0 / (head_dim ** 0.5)
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q * scale, ck, preferred_element_type=jnp.float32
    )  # (B, H, C, MAX)
    kv_pos = jnp.arange(cap)
    g = n + jnp.arange(c)  # global query positions
    if window is None:
        allowed = (
            (kv_pos[None, None, :] <= g[None, :, None])
            & (kv_pos[None, None, :] >= start[:, None, None])
        )  # (B, C, MAX); a fully-masked q row softmaxes to uniform
        # (finite), and its output is dropped on the host
    else:
        # slot p holds global frame f(p): the largest f <= n + C - 1
        # congruent to p mod MAX (every slot below the clock is written
        # every MAX frames; lockstep has no gaps)
        f = kv_pos + ((n + c - 1 - kv_pos) // cap) * cap  # (MAX,)
        allowed = (
            (f[None, None, :] <= g[None, :, None])
            & (f[None, None, :] > g[None, :, None] - window)
            & (f[None, None, :] >= start[:, None, None])
        )
    s = jnp.where(allowed[:, None], s, NEG_INF)
    p_att = jax.nn.softmax(s, axis=-1)
    ctx = jnp.einsum(
        "bhqk,bhkd->bhqd", p_att.astype(h.dtype), cv,
        preferred_element_type=jnp.float32,
    ).astype(h.dtype)  # (1, H, C, d)
    flat = ctx.transpose(0, 2, 1, 3).reshape(b, c, num_heads * head_dim)
    op = lp["out_proj"]
    out = flat @ op["kernel"] + op["bias"]
    return out, ctx, {"k": ck, "v": cv}


def _stream_step(cfg, precision, window, params, feat_win, valid_win,
                 caches, n, start):
    """One streaming step: feat_win (B, C + K - 1, F) raw model-input
    features around the C frames being emitted, valid_win (B, C + K - 1)
    bool (False outside the real stream), caches per layer, n = shared
    global index of the first emitted frame, start (B,) = each row's
    stream origin (attention floor for reused slots), window = static
    ring-attention extent or None (full causal history). Returns (hidden,
    layer_hiddens, pre_feat, new_caches)."""
    with jax.default_matmul_precision(precision):
        x = feat_win
        if "pre_extract_proj" in params:
            p = params["pre_extract_proj"]
            x = x @ p["kernel"] + p["bias"]
        # the full forward zeroes padded positions BEFORE pos_conv
        # (encoder_prologue); stream edges reproduce that zero context
        x = jnp.where(valid_win[:, :, None], x, 0.0)

        enc = params["encoder"]
        k_size = cfg.conv_pos
        left = k_size // 2
        c = x.shape[1] - k_size + 1

        pp = enc["pos_conv"]
        w = pos_conv_weight(pp)  # (D, D//g, K)
        pos = grouped_conv1d(
            x.astype(w.dtype), w.transpose(2, 1, 0), cfg.conv_pos_groups,
            (0, 0),
        ).astype(x.dtype) + pp["bias"][None, None, :]
        # VALID conv over the window == the full forward's SamePad output
        # for exactly these C frames (even-K crop included: output t uses
        # inputs [t - K//2, t + K - 1 - K//2], the window's full extent)
        pos = gelu(pos)

        pre_feat = x[:, left:left + c]
        h = pre_feat + pos
        if not cfg.layer_norm_first:
            h = layer_norm(h, enc["layer_norm"])

        new_caches = []
        hiddens = []
        for i, lp in enumerate(enc["layers"]):
            box = {}

            def attn_fn(hh, lp=lp, i=i, box=box):
                out, ctx, box["cache"] = _cached_self_attn(
                    hh, lp, caches[i], n, start,
                    num_heads=cfg.encoder_attention_heads[i],
                    head_dim=cfg.head_dim,
                    window=window,
                )
                return out, ctx

            h, _ = encoder_layer_forward(
                h, lp,
                num_heads=cfg.encoder_attention_heads[i],
                head_dim=cfg.head_dim,
                layer_norm_first=cfg.layer_norm_first,
                key_padding_mask=None,
                causal=False,  # causality lives in the cache mask
                dropout=0.0,
                attention_dropout=0.0,
                activation_dropout=0.0,
                rng=None,
                deterministic=True,
                attn_fn=attn_fn,
                activation_fn=cfg.activation_fn,
            )
            new_caches.append(box["cache"])
            hiddens.append(h)

        final = layer_norm(h, enc["layer_norm"]) if cfg.layer_norm_first \
            else h
        return final, hiddens, pre_feat, new_caches


class _StreamFeaturizer:
    """Host-side streaming Kaldi featurizer: 16 kHz waveform chunks in,
    normalized model-input frames out (pair-stacked for fp=20). Kaldi
    fbank ops are strictly per-frame, so chunked output is bit-identical
    to whole-utterance extraction; ``flush`` zero-pads the dangling half
    of an odd final pair (extract_feature.py:47-52)."""

    def __init__(self, fp: int, mean, std, precision: str):
        self.fp = fp
        self.mean, self.std = mean, std
        self.precision = precision
        self.reset()

    def reset(self):
        self._audio_tail = np.zeros((0,), np.float32)
        self._mel_carry = np.zeros((0, 40), np.float32)

    @property
    def feat_dim(self) -> int:
        return 80 if self.fp == 20 else 40

    def push(self, wav: np.ndarray) -> np.ndarray:
        wav = np.asarray(wav, np.float32).reshape(-1)
        buf = np.concatenate([self._audio_tail, wav])
        m = num_frames(len(buf))
        if m == 0:
            self._audio_tail = buf
            return np.zeros((0, self.feat_dim), np.float32)
        mel = kaldi_fbank_np(
            buf.astype(
                np.float64 if self.precision == "high" else np.float32
            ) * (2 ** 15),
            dtype=np.float64 if self.precision == "high" else np.float32,
        )
        # frame t covers samples [160t, 160t + 400): keep from sample 160m
        self._audio_tail = buf[160 * m:]
        mel = normalize_fbank(mel, self.mean, self.std).astype(np.float32)
        return self._stack(mel, final=False)

    def flush(self) -> np.ndarray:
        # remaining audio shorter than one 400-sample window carries no
        # frame under snip_edges — identical to whole-utterance extraction
        self._audio_tail = self._audio_tail[:0]
        return self._stack(np.zeros((0, 40), np.float32), final=True)

    def _stack(self, mel: np.ndarray, final: bool) -> np.ndarray:
        if self.fp != 20:
            return mel
        mel = np.concatenate([self._mel_carry, mel], axis=0)
        n_pairs = len(mel) // 2
        stacked = stack_frame_pairs_np(mel[: 2 * n_pairs])
        self._mel_carry = mel[2 * n_pairs:]
        if final and len(self._mel_carry):
            stacked = np.concatenate(
                [stacked, stack_frame_pairs_np(self._mel_carry)], axis=0
            )
            self._mel_carry = self._mel_carry[:0]
        return stacked


def _init_stream_common(self, ckpt, params, cfg, fp, mean_std_npy_path,
                        chunk_frames, dtype, matmul_precision,
                        fbank_precision, get_hidden, window):
    """Constructor body shared by the single-stream and batch extractors:
    checkpoint/param resolution, streamability validation, dtype cast,
    mean/std, conv split, and the jitted step (window statically bound)."""
    if ckpt is not None:
        from .extract import load_any_checkpoint

        params, cfg, _ = load_any_checkpoint(ckpt)
    if params is None or cfg is None:
        raise ValueError("pass either ckpt= or (params= and cfg=)")
    _check_streamable(cfg)

    self.cfg = cfg
    self.fp = fp
    self.chunk = int(chunk_frames)
    self.dtype = dtype
    self.get_hidden = get_hidden
    self.fbank_precision = fbank_precision
    self.params = jax.tree.map(
        lambda x: jnp.asarray(x, dtype), params,
        is_leaf=lambda x: not isinstance(x, (dict, list)),
    )
    if mean_std_npy_path is not None:
        from .extract import load_mean_std

        self.mean, self.std = load_mean_std(mean_std_npy_path)
    else:
        self.mean, self.std = np.zeros(40), np.ones(40)

    k = cfg.conv_pos
    self._left = k // 2
    self._right = k - 1 - self._left
    step = functools.partial(_stream_step, cfg, matmul_precision, window)
    # args after the partial: (params, feat_win, valid_win, caches, n,
    # start); caches donated so each step updates the KV buffers in place
    donate = (3,) if jax.default_backend() == "tpu" else ()
    self._step = jax.jit(step, donate_argnums=donate)


def _check_streamable(cfg: MelHuBERTConfig):
    if cfg.attention_type != "causal":
        raise ValueError(
            "streaming requires attention_type: causal (got "
            f"{cfg.attention_type!r}); a bidirectional model's outputs "
            "depend on future frames"
        )
    if cfg.pos_emb_type != "conv" or getattr(cfg, "pos_conv_depth", 1) != 1:
        raise NotImplementedError(
            "streaming supports the depth-1 conv positional embedding"
        )
    if cfg.encoder_layers <= 0:
        raise ValueError("streaming needs at least one encoder layer")


class StreamingCausalExtractor:
    """Online causal feature extraction with constant-shape chunk steps.

    Parameters mirror :class:`extract.MelHuBERTExtractor`; the model must
    have ``attention_type: causal`` (the reference's option at
    model.py:121-132) — a bidirectional model cannot be streamed without
    changing its outputs, so anything else raises.

    ``push_wav`` / ``push_feat`` buffer input and run as many C-frame steps
    as the conv lookahead allows, returning newly emitted frames;
    ``flush`` drains the tail (zero right-context, as in the full
    forward) and FINALIZES the stream — further pushes raise until
    ``reset()`` (the post-flush offset may sit mid-chunk, where a resumed
    step would overlap the stale cache slab). Outputs are bitwise-stable
    against chunk boundaries and match the full causal forward to float
    tolerance.
    """

    def __init__(
        self,
        ckpt: Optional[str] = None,
        *,
        params: Optional[dict] = None,
        cfg: Optional[MelHuBERTConfig] = None,
        fp: int = 20,
        mean_std_npy_path: Optional[str] = None,
        chunk_frames: int = 128,
        max_frames: int = 3072,
        dtype=jnp.float32,
        matmul_precision: str = "highest",
        fbank_precision: str = "fast",
        get_hidden: bool = False,
    ):
        _init_stream_common(
            self, ckpt, params, cfg, fp, mean_std_npy_path, chunk_frames,
            dtype, matmul_precision, fbank_precision, get_hidden, None,
        )
        self.max_frames = int(max_frames)
        # cache capacity rounded up to a whole chunk: every step writes a
        # full C-frame slab at the current offset, and dynamic_update_slice
        # CLAMPS an out-of-range start (silently overwriting valid rows) —
        # a chunk-multiple capacity keeps the write in bounds for any
        # stream up to max_frames real frames
        self._cap = -(-self.max_frames // self.chunk) * self.chunk
        self.reset()

    # ------------------------------------------------------------------ #

    def reset(self):
        cfg, d = self.cfg, self.dtype
        self._caches = [
            {
                "k": jnp.zeros(
                    (1, cfg.encoder_attention_heads[i], self._cap,
                     cfg.head_dim), d,
                ),
                "v": jnp.zeros(
                    (1, cfg.encoder_attention_heads[i], self._cap,
                     cfg.head_dim), d,
                ),
            }
            for i in range(cfg.encoder_layers)
        ]
        feat_dim = self.cfg.feat_emb_dim
        self._ctx = np.zeros((self._left, feat_dim), np.float32)
        self._pending = np.zeros((0, feat_dim), np.float32)
        self._emitted = 0   # frames already run through the encoder
        self._total = 0     # real feature frames received
        self._finished = False
        self._feat = _StreamFeaturizer(
            self.fp, self.mean, self.std, self.fbank_precision
        )

    # ------------------------------------------------------------------ #
    # feature-level streaming

    def push_feat(self, feat: np.ndarray) -> dict:
        """feat: (m, feat_emb_dim) final model-input frames (normalized;
        already pair-stacked for fp=20)."""
        if self._finished:
            raise ValueError(
                "stream was flushed; reset() to start a new one"
            )
        feat = np.asarray(feat, np.float32)
        if feat.ndim != 2 or feat.shape[1] != self.cfg.feat_emb_dim:
            raise ValueError(
                f"expected (m, {self.cfg.feat_emb_dim}) features, got "
                f"{feat.shape}"
            )
        # validate at buffer time: nothing is consumed on failure, and the
        # drain loop can never raise after emitting part of a poll
        if self._total + len(feat) > self.max_frames:
            raise ValueError(
                f"stream ({self._total + len(feat)} frames) exceeds "
                f"max_frames={self.max_frames}; raise max_frames or reset()"
            )
        self._pending = np.concatenate([self._pending, feat], axis=0)
        self._total += len(feat)
        return self._drain(final=False)

    def flush(self) -> dict:
        """Emit every remaining frame (zero right-context at the stream
        end, matching the full forward's padding) and FINALIZE the
        stream (idempotent; reset() starts a new one)."""
        if self._finished:
            return _empty_out(self.cfg, self.get_hidden)
        feat = self._feat.flush()
        out = (
            self.push_feat(feat) if len(feat)
            else _empty_out(self.cfg, self.get_hidden)
        )
        tail = self._drain(final=True)
        self._finished = True
        return _merge_out(out, tail)

    # ------------------------------------------------------------------ #
    # waveform-level streaming

    def push_wav(self, wav: np.ndarray) -> dict:
        """wav: (n,) float32 in [-1, 1] at 16 kHz, any chunk size."""
        if self._finished:
            raise ValueError(
                "stream was flushed; reset() to start a new one"
            )
        feat = self._feat.push(wav)
        if len(feat) == 0:
            return _empty_out(self.cfg, self.get_hidden)
        return self.push_feat(feat)

    # ------------------------------------------------------------------ #

    def _drain(self, final: bool) -> dict:
        cfg, c = self.cfg, self.chunk
        outs = []
        while True:
            if final:
                if self._emitted >= self._total:
                    break
            elif len(self._pending) < c + self._right:
                break
            # invariant, not a user-facing check (push_feat validates at
            # buffer time so this loop never raises after emitting): total
            # <= max_frames and flush-finalization keep emitted chunk-
            # aligned while draining, so the slab write [emitted,
            # emitted + c) stays within the chunk-multiple capacity
            assert self._emitted + c <= self._cap, (
                self._emitted, c, self._cap
            )
            need = c + self._right
            window = self._pending[:need]
            if len(window) < need:
                pad = np.zeros((need - len(window), window.shape[1]),
                               np.float32)
                window = np.concatenate([window, pad], axis=0)
            feat_win = np.concatenate([self._ctx, window], axis=0)[None]
            start = self._emitted - self._left
            pos = start + np.arange(feat_win.shape[1])
            valid = (pos >= 0) & (pos < self._total)

            hidden, hiddens, pre_feat, self._caches = self._step(
                self.params,
                jnp.asarray(feat_win, self.dtype),
                jnp.asarray(valid[None]),
                self._caches,
                jnp.asarray(self._emitted, jnp.int32),
                jnp.zeros((1,), jnp.int32),
            )
            n_real = min(c, self._total - self._emitted)
            entry = {"last_hidden_state": np.asarray(hidden[0, :n_real])}
            if self.get_hidden:
                entry["hidden_states"] = [
                    np.asarray(pre_feat[0, :n_real])
                ] + [np.asarray(h[0, :n_real]) for h in hiddens]
            outs.append(entry)

            # next window's left context = the last `left` frames of the
            # chunk just emitted (zeros beyond the stream are masked by the
            # validity positions, so their content never matters)
            full_win = feat_win[0]
            self._ctx = full_win[c:c + self._left].copy()
            self._pending = self._pending[c:]
            self._emitted += n_real
        if not outs:
            return _empty_out(cfg, self.get_hidden)
        return functools.reduce(_merge_out, outs)


class StreamingCausalBatchExtractor:
    """N concurrent causal streams served in LOCKSTEP chunk steps.

    One jitted step advances every slot by the same C-frame window against
    a batched (N, H, MAX, d) KV cache — N realtime streams cost one chunk
    step instead of N, which matters when the per-step latency is
    dispatch/RTT-dominated (BASELINE.md: the single-stream push is ~57 ms
    over the axon tunnel, far above chunk compute). Lockstep is the
    natural shape for realtime serving: every live audio source produces
    frames at the same wall rate.

    Semantics per slot are identical to :class:`StreamingCausalExtractor`
    (same ``_stream_step``, parity-tested): pushes buffer on the host,
    ``poll()`` runs as many lockstep steps as every UNFINISHED slot's
    buffered right-context allows (a lagging live stream gates the batch —
    by design), ``finish(i)`` marks a stream ended so its tail drains with
    zero right-context, and ``open_stream(i)`` re-arms a finished, fully
    drained slot for a NEW stream at the current physical offset
    (continuous batching): the slot's stale cache rows are masked off by
    the per-row ``start`` attention floor, and since the conv positional
    embedding is relative, a stream starting at physical offset s is
    bit-equivalent to one starting at 0.

    The ``max_frames`` capacity bounds the SHARED physical timeline (the
    longest-running slot), not the per-stream total — reused slots ride
    the same clock. When the timeline is exhausted, ``reset()`` starts a
    new one (drain any live streams first).

    ``window_frames`` switches to UNBOUNDED always-on serving at constant
    memory: the KV cache becomes a ring over the last ``window_frames``
    frames and attention is windowed to them (the standard always-on
    approximation — each deeper layer's effective receptive field grows
    by one window, Transformer-XL style; with a window no shorter than
    any stream it is exactly the full causal computation). ``max_frames``
    is ignored; the shared clock is bounded only by int32 (2^31 frames =
    ~1.4 years of 20 ms audio — ``reset()`` before that).

    Every slot starts LIVE: with fewer streams than ``batch``, call
    ``finish(i)`` on the unused slots so they don't gate ``poll()``
    (an empty finished slot costs nothing and can be ``open_stream``-ed
    later).
    """

    def __init__(
        self,
        ckpt: Optional[str] = None,
        *,
        params: Optional[dict] = None,
        cfg: Optional[MelHuBERTConfig] = None,
        batch: int = 8,
        fp: int = 20,
        mean_std_npy_path: Optional[str] = None,
        chunk_frames: int = 128,
        max_frames: int = 3072,
        window_frames: Optional[int] = None,
        dtype=jnp.float32,
        matmul_precision: str = "highest",
        fbank_precision: str = "fast",
        get_hidden: bool = False,
    ):
        if batch < 1:
            raise ValueError(f"batch must be >= 1, got {batch}")
        self.window = None if window_frames is None else int(window_frames)
        if self.window is not None and self.window < 1:
            raise ValueError(
                f"window_frames must be >= 1, got {self.window}"
            )
        _init_stream_common(
            self, ckpt, params, cfg, fp, mean_std_npy_path, chunk_frames,
            dtype, matmul_precision, fbank_precision, get_hidden,
            self.window,
        )
        self.batch = int(batch)
        if self.window is None:
            self.max_frames = int(max_frames)
            self._cap = -(-self.max_frames // self.chunk) * self.chunk
        else:
            # ring capacity: a chunk multiple holding window + one chunk,
            # so the slab write never wraps and the oldest frame a query
            # can attend (g - window + 1) is never yet overwritten
            self.max_frames = None
            self._cap = (
                -(-(self.window + self.chunk) // self.chunk) * self.chunk
            )
        self._featurizers = [
            _StreamFeaturizer(fp, self.mean, self.std, fbank_precision)
            for _ in range(self.batch)
        ]
        self.reset()

    # ------------------------------------------------------------------ #

    def reset(self):
        cfg, d, nb = self.cfg, self.dtype, self.batch
        self._caches = [
            {
                "k": jnp.zeros(
                    (nb, cfg.encoder_attention_heads[i], self._cap,
                     cfg.head_dim), d,
                ),
                "v": jnp.zeros(
                    (nb, cfg.encoder_attention_heads[i], self._cap,
                     cfg.head_dim), d,
                ),
            }
            for i in range(cfg.encoder_layers)
        ]
        feat_dim = cfg.feat_emb_dim
        self._ctx = np.zeros((nb, self._left, feat_dim), np.float32)
        self._pending = [
            np.zeros((0, feat_dim), np.float32) for _ in range(nb)
        ]
        self._emitted = 0                        # shared physical offset
        self._start = np.zeros(nb, np.int64)     # per-slot stream origin
        self._total = np.zeros(nb, np.int64)     # per-slot physical end
        self._finished = np.zeros(nb, bool)
        for f in self._featurizers:
            f.reset()

    def _check_slot(self, slot: int):
        if not 0 <= slot < self.batch:
            raise ValueError(f"slot {slot} out of range [0, {self.batch})")

    # ------------------------------------------------------------------ #
    # per-slot input

    def push_feat(self, slot: int, feat: np.ndarray) -> None:
        """Buffer (m, feat_emb_dim) model-input frames for one slot
        (normalized; already pair-stacked for fp=20). Run ``poll()`` to
        advance the batch."""
        self._check_slot(slot)
        if self._finished[slot]:
            raise ValueError(
                f"slot {slot} is finished; open_stream({slot}) first"
            )
        feat = np.asarray(feat, np.float32)
        if feat.ndim != 2 or feat.shape[1] != self.cfg.feat_emb_dim:
            raise ValueError(
                f"expected (m, {self.cfg.feat_emb_dim}) features, got "
                f"{feat.shape}"
            )
        # validate at buffer time: nothing is consumed on failure, and
        # poll() never raises after running part of its lockstep steps
        # (window mode is unbounded — no check)
        if (self.window is None
                and self._total[slot] + len(feat) > self.max_frames):
            raise ValueError(
                f"slot {slot} would end at frame "
                f"{self._total[slot] + len(feat)} > "
                f"max_frames={self.max_frames} (the SHARED timeline); "
                "raise max_frames, use window_frames=, or reset()"
            )
        self._pending[slot] = np.concatenate(
            [self._pending[slot], feat], axis=0
        )
        self._total[slot] += len(feat)

    def push_wav(self, slot: int, wav: np.ndarray) -> None:
        """Buffer a 16 kHz float32 waveform chunk for one slot."""
        self._check_slot(slot)
        feat = self._featurizers[slot].push(wav)
        if len(feat):
            self.push_feat(slot, feat)

    def finish(self, slot: int) -> None:
        """Mark a slot's stream ended: its featurizer tail is flushed and
        its remaining frames drain with zero right-context on subsequent
        ``poll()`` calls (same edge semantics as the full forward)."""
        self._check_slot(slot)
        if self._finished[slot]:
            return
        feat = self._featurizers[slot].flush()
        if len(feat):
            self.push_feat(slot, feat)
        self._finished[slot] = True

    def open_stream(self, slot: int) -> None:
        """Re-arm a finished, fully drained slot for a new stream starting
        at the current physical offset (continuous batching)."""
        self._check_slot(slot)
        if not self._finished[slot]:
            raise ValueError(f"slot {slot} is still streaming; finish() it")
        if self._total[slot] > self._emitted:
            raise ValueError(
                f"slot {slot} has {self._total[slot] - self._emitted} "
                "undrained frames; poll() until empty before reusing"
            )
        self._start[slot] = self._total[slot] = self._emitted
        self._finished[slot] = False
        self._pending[slot] = self._pending[slot][:0]
        self._ctx[slot] = 0.0
        self._featurizers[slot].reset()

    def slot_finished(self, slot: int) -> bool:
        """True once a slot is finished AND fully drained (reusable)."""
        self._check_slot(slot)
        return bool(
            self._finished[slot] and self._total[slot] <= self._emitted
        )

    # ------------------------------------------------------------------ #
    # lockstep advance

    def _ready(self) -> bool:
        if not (self._total > self._emitted).any():
            return False  # nothing new to emit anywhere
        need = self.chunk + self._right
        for i in range(self.batch):
            if (not self._finished[i]
                    and self._total[i] - self._emitted < need):
                return False  # a live stream hasn't buffered the window yet
        return True

    def poll(self) -> list:
        """Run as many lockstep steps as buffering allows; return one dict
        per slot with the frames newly emitted for it (possibly 0 rows)."""
        cfg, c = self.cfg, self.chunk
        outs = [_empty_out(cfg, self.get_hidden) for _ in range(self.batch)]
        while self._ready():
            if self.window is None:
                # invariant, not a user-facing check (push_feat bounds
                # every total at buffer time): emitted stays chunk-aligned
                # and below some total <= max_frames <= cap, so the slab
                # write [emitted, emitted + c) is in capacity
                assert self._emitted + c <= self._cap, (
                    self._emitted, c, self._cap
                )
            need = c + self._right
            window = np.zeros(
                (self.batch, need, cfg.feat_emb_dim), np.float32
            )
            for i in range(self.batch):
                w = self._pending[i][:need]
                window[i, :len(w)] = w
            feat_win = np.concatenate([self._ctx, window], axis=1)
            pos = (self._emitted - self._left) + np.arange(feat_win.shape[1])
            valid = (
                (pos[None, :] >= self._start[:, None])
                & (pos[None, :] < self._total[:, None])
            )

            hidden, hiddens, pre_feat, self._caches = self._step(
                self.params,
                jnp.asarray(feat_win, self.dtype),
                jnp.asarray(valid),
                self._caches,
                jnp.asarray(self._emitted, jnp.int32),
                jnp.asarray(self._start, jnp.int32),
            )
            hidden = np.asarray(hidden)
            if self.get_hidden:
                pre_feat = np.asarray(pre_feat)
                hiddens = [np.asarray(h) for h in hiddens]
            for i in range(self.batch):
                n_real = int(
                    min(c, max(0, int(self._total[i]) - self._emitted))
                )
                entry = {"last_hidden_state": hidden[i, :n_real]}
                if self.get_hidden:
                    entry["hidden_states"] = [pre_feat[i, :n_real]] + [
                        h[i, :n_real] for h in hiddens
                    ]
                outs[i] = _merge_out(outs[i], entry)
                self._pending[i] = self._pending[i][c:]
            self._ctx = feat_win[:, c:c + self._left].copy()
            self._emitted += c
        return outs

    def flush(self) -> list:
        """Finish every slot and drain all remaining frames."""
        for i in range(self.batch):
            self.finish(i)
        return self.poll()


def _empty_out(cfg, get_hidden: bool) -> dict:
    d = cfg.encoder_embed_dim
    out = {"last_hidden_state": np.zeros((0, d), np.float32)}
    if get_hidden:
        out["hidden_states"] = [
            np.zeros((0, d), np.float32)
            for _ in range(cfg.encoder_layers + 1)
        ]
    return out


def _merge_out(a: dict, b: dict) -> dict:
    out = {
        "last_hidden_state": np.concatenate(
            [a["last_hidden_state"], b["last_hidden_state"]], axis=0
        )
    }
    if "hidden_states" in a:
        out["hidden_states"] = [
            np.concatenate([x, y], axis=0)
            for x, y in zip(a["hidden_states"], b["hidden_states"])
        ]
    return out
