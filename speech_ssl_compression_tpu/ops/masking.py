"""On-device HuBERT-style span masking.

The reference generates mask spans on the host with NumPy every step
(fairseq_code/data_utils.py:20-153, called from model.py:66-78, 244-262,
564-612) — a host sync per step. Here the same *distributions* are produced
inside jit with jax.random and fully static shapes:

  * per-row mask count with probabilistic rounding:
      num_mask = floor(mask_prob * sz / mask_length + U[0,1)), min ``min_masks``
    (reference data_utils.py:57-74)
  * span lengths by ``mask_selection`` (reference data_utils.py:80-93):
      'static'  — every span is exactly mask_length
      'uniform' — randint[mask_other, 2*mask_length]
      'normal'  — max(1, round(N(mask_length, mask_other)))
      'poisson' — round(Poisson(mask_length))
  * start positions drawn uniformly without replacement from
    [0, sz - min(lengths)) (reference :125-129 — top-k of i.i.d. uniform
    scores over valid starts is exactly a uniform sample w/o replacement)
  * spans may overlap; indices >= sz never masked (reference :139)
  * ``require_same_masks`` subsamples every row's masked set down to the
    batch-wide minimum count, and ``mask_dropout`` then drops a further
    ``rint(count * mask_dropout)`` positions (reference :141-150; fairseq
    defaults require_same_masks=True — HuBERT/wav2vec2 use the default,
    but MelHuBERT explicitly passes False, reference model.py:76).

``no_overlap=True`` selects the reference's recursive interval-splitting
placement (data_utils.py:103-124), which is inherently sequential and
data-dependent — hostile to XLA. That mode runs on the host via
``jax.pure_callback`` into :func:`compute_mask_indices_np` (also the test
oracle for the on-device modes); the callback is jit-safe but costs a host
sync per step, exactly like the reference's own host-side generation.

Shape-static trick for the on-device path: we draw up to ``max_spans``
candidate starts (a static upper bound) and keep the first ``num_mask`` of
them; the span union is built with a +1/-1 boundary scatter + cumulative sum
instead of per-index scatter.

Unknown ``mask_selection`` values raise ValueError at trace time — the
reference raises too (data_utils.py:92-93); silently treating them as
'static' (round-1 behavior) is a config-corruption hazard.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

_SELECTIONS = ("static", "uniform", "normal", "poisson")


def max_spans_upper_bound(max_len: int, mask_prob: float, mask_length: int,
                          min_masks: int = 2) -> int:
    """Static upper bound on per-row span count."""
    return max(min_masks, int(mask_prob * max_len / float(mask_length)) + 1)


def _max_span_len(mask_selection: str, mask_length: int,
                  mask_other: float) -> int:
    """Static clamp on a single span's length (tail lengths beyond it are
    truncated; the normal/poisson tails past these bounds are negligible)."""
    if mask_selection == "static":
        return mask_length
    if mask_selection == "uniform":
        return 2 * mask_length
    if mask_selection == "normal":
        return int(math.ceil(mask_length + 4.0 * max(mask_other, 0.0))) + 1
    if mask_selection == "poisson":
        # P[Poisson(L) > 3L+10] is astronomically small for any practical L
        return 3 * mask_length + 10
    raise ValueError(
        f"unknown mask_selection {mask_selection!r}; expected one of "
        f"{_SELECTIONS} (reference data_utils.py:92)"
    )


def _sample_lengths(key, shape, mask_selection: str, mask_length: int,
                    mask_other: float):
    """Per-span lengths (int32) for the four reference length distributions."""
    if mask_selection == "static":
        return jnp.full(shape, mask_length, jnp.int32)
    if mask_selection == "uniform":
        low = int(mask_other)
        if low > 2 * mask_length:
            # np.random.randint raises for an inverted range (the host
            # oracle does); jax.random.randint would sample garbage
            raise ValueError(
                f"uniform mask_selection: mask_other ({low}) must be <= "
                f"2 * mask_length ({2 * mask_length})"
            )
        return jax.random.randint(key, shape, low, 2 * mask_length + 1,
                                  jnp.int32)
    if mask_selection == "normal":
        x = jax.random.normal(key, shape) * mask_other + mask_length
        return jnp.maximum(jnp.round(x), 1).astype(jnp.int32)
    if mask_selection == "poisson":
        x = jax.random.poisson(key, float(mask_length), shape)
        return x.astype(jnp.int32)
    raise ValueError(
        f"unknown mask_selection {mask_selection!r}; expected one of "
        f"{_SELECTIONS} (reference data_utils.py:92)"
    )


@functools.partial(
    jax.jit,
    static_argnums=(2,),
    static_argnames=(
        "mask_prob", "mask_length", "mask_selection", "mask_other",
        "min_masks", "no_overlap", "min_space", "require_same_masks",
        "mask_dropout", "shared_rounding",
    ),
)
def compute_span_mask(
    rng: jax.Array,
    lengths: jax.Array,
    max_len: int | None = None,
    *,
    mask_prob: float,
    mask_length: int,
    mask_selection: str = "static",
    mask_other: float = 0.0,
    min_masks: int = 2,
    no_overlap: bool = False,
    min_space: int = 1,
    require_same_masks: bool = True,
    mask_dropout: float = 0.0,
    shared_rounding: bool = False,
) -> jax.Array:
    """Sample a (B, T) bool span mask on device.

    Args:
      rng: PRNG key.
      lengths: (B,) int32 valid lengths per row (sz).
      max_len: static T (callers pass the padded time dim).
      mask_prob / mask_length / min_masks / mask_selection / mask_other /
        no_overlap / min_space / require_same_masks / mask_dropout: as in the
        reference ``compute_mask_indices`` (fairseq_code/data_utils.py:20-51);
        note require_same_masks defaults True there too.
      shared_rounding: use ONE probabilistic-rounding draw for the span
        count across all rows — the reference's behavior when padding_mask
        is None (data_utils.py:57-62), e.g. the channel-mask call sites.
        Per-row draws would make require_same_masks take a min over B
        independent draws, biasing counts low.

    Returns:
      (B, T) bool; True = masked. No True beyond each row's length.
    """
    assert max_len is not None
    _ = _max_span_len(mask_selection, mask_length, mask_other)  # validate early
    b = lengths.shape[0]
    t = max_len

    if no_overlap:
        # Recursive non-overlapping placement is host-side (see module doc).
        seed = jax.random.bits(rng, dtype=jnp.uint32)

        def _host(seed_, lengths_):
            return compute_mask_indices_np(
                (b, t),
                None if shared_rounding else np.asarray(lengths_),
                mask_prob=mask_prob, mask_length=mask_length,
                mask_selection=mask_selection, mask_other=mask_other,
                min_masks=min_masks, no_overlap=True, min_space=min_space,
                require_same_masks=require_same_masks,
                mask_dropout=mask_dropout,
                rng=np.random.default_rng(int(seed_)),
            )

        out = jax.pure_callback(
            _host, jax.ShapeDtypeStruct((b, t), jnp.bool_), seed, lengths,
            vmap_method="sequential",
        )
        # shared_rounding models fairseq's padding_mask=None path (full-
        # length rows); if a caller nevertheless passes ragged lengths,
        # confine the masks like the overlapping branch does so the "no
        # True beyond each row's length" contract holds
        return out & (jnp.arange(t)[None, :] < lengths[:, None])

    n_spans = max_spans_upper_bound(t, mask_prob, mask_length, min_masks)
    k_count, k_lens, k_starts, k_subset = jax.random.split(rng, 4)
    sz = lengths.astype(jnp.float32)

    # Probabilistic rounding of the span count (per row, or one shared
    # draw when the caller has no padding — reference data_utils.py:57-74).
    if shared_rounding:
        u = jnp.broadcast_to(jax.random.uniform(k_count, ()), (b,))
    else:
        u = jax.random.uniform(k_count, (b,))
    num_mask = jnp.floor(mask_prob * sz / float(mask_length) + u).astype(jnp.int32)
    num_mask = jnp.maximum(num_mask, min_masks)
    num_mask = jnp.minimum(num_mask, n_spans)

    # Per-span lengths; only the first num_mask slots per row are "kept".
    span_len = _sample_lengths(k_lens, (b, n_spans), mask_selection,
                               mask_length, mask_other)
    lmax = _max_span_len(mask_selection, mask_length, mask_other)
    span_len = jnp.clip(span_len, 0, lmax)
    keep = jnp.arange(n_spans)[None, :] < num_mask[:, None]

    # Reference edge case (data_utils.py:95-96): if every sampled length is 0
    # (possible under poisson/uniform), force slot 0 to min(mask_length, sz-1).
    total_len = jnp.sum(jnp.where(keep, span_len, 0), axis=1)
    fallback = jnp.minimum(
        mask_length, jnp.maximum(lengths - 1, 0)
    ).astype(jnp.int32)
    span_len = span_len.at[:, 0].set(
        jnp.where(total_len == 0, fallback, span_len[:, 0])
    )

    # Valid start positions: [0, sz - min_len) with the reference's adjustment
    # min_len -> sz - num_mask - 1 when the range is too tight for a
    # without-replacement draw (data_utils.py:125-129).
    min_len = jnp.min(
        jnp.where(keep, span_len, jnp.iinfo(jnp.int32).max), axis=1
    )
    min_len = jnp.where(num_mask > 0, min_len, mask_length)
    n_starts = lengths - min_len
    n_starts = jnp.where(
        n_starts <= num_mask, jnp.minimum(num_mask + 1, lengths), n_starts
    )
    n_starts = jnp.maximum(n_starts, 1)
    # Short rows: never request more spans than valid start positions
    # (top_k would otherwise pick -inf-scored invalid starts; the reference
    # instead shrinks the span length — clamping the count keeps short rows
    # partially unmasked, which is the intent).
    num_mask = jnp.minimum(num_mask, n_starts)
    keep = jnp.arange(n_spans)[None, :] < num_mask[:, None]
    # Re-apply the all-zero-length fallback on the CLAMPED slot set: a
    # short row may have kept only zero-length spans (poisson/uniform),
    # which would yield an empty mask — and under require_same_masks an
    # empty batch-wide target. Slot 0 is always kept when num_mask >= 1.
    total_len = jnp.sum(jnp.where(keep, span_len, 0), axis=1)
    span_len = span_len.at[:, 0].set(
        jnp.where(total_len == 0, fallback, span_len[:, 0])
    )

    # Uniform sample w/o replacement via top-k of uniform scores over valid
    # positions; invalid positions get score -inf so they are never picked.
    scores = jax.random.uniform(k_starts, (b, t))
    pos = jnp.arange(t)[None, :]
    valid = pos < n_starts[:, None]
    scores = jnp.where(valid, scores, -jnp.inf)
    _, start_idx = jax.lax.top_k(scores, n_spans)  # (B, n_spans)

    # Union of variable-length spans via +1/-1 boundary scatter + cumsum.
    # Span j covers [start_j, min(start_j + len_j, sz)) (reference clips
    # indices >= sz, data_utils.py:139).
    end_idx = jnp.minimum(start_idx + span_len, lengths[:, None])
    end_idx = jnp.maximum(end_idx, start_idx)  # zero-length spans vanish
    inc = keep.astype(jnp.int32)
    width = t + lmax + 1

    def _scatter_row(si, ei, w):
        d = jnp.zeros((width,), jnp.int32)
        d = d.at[si].add(w)
        d = d.at[ei].add(-w)
        return d

    delta = jax.vmap(_scatter_row)(start_idx, end_idx, inc)
    mask = jnp.cumsum(delta, axis=1)[:, :t] > 0
    mask = mask & (pos < lengths[:, None])

    if require_same_masks or mask_dropout > 0.0:
        count = jnp.sum(mask, axis=1)
        target = jnp.min(count) if require_same_masks else count
        target = jnp.broadcast_to(target, (b,))
        if mask_dropout > 0.0:
            target = target - jnp.rint(
                target.astype(jnp.float32) * mask_dropout
            ).astype(jnp.int32)
        # Keep a uniform random subset of exactly `target` masked positions
        # per row: rank masked positions by i.i.d. scores and keep the top
        # `target` by RANK — a float threshold (sub >= thr) would keep
        # target+1 whenever two f32 draws collide at the threshold (~1.7%
        # of rows at T=768), breaking the exact-equal-count guarantee.
        sub = jnp.where(mask, jax.random.uniform(k_subset, (b, t)), -1.0)
        order_idx = jnp.argsort(-sub, axis=1)
        rank = jnp.argsort(order_idx, axis=1)
        mask = mask & (rank < target[:, None]) & (target > 0)[:, None]

    return mask


def compute_channel_mask(
    rng: jax.Array,
    batch: int,
    channels: int,
    *,
    mask_prob: float,
    mask_length: int,
    mask_selection: str = "static",
    mask_other: float = 0.0,
    no_overlap: bool = False,
    min_space: int = 1,
) -> jax.Array:
    """(B, C) bool feature-channel mask — the reference's channel calls
    (model.py:574-583) pass no padding mask and min_masks=0 and rely on
    require_same_masks' default True."""
    return compute_span_mask(
        rng, jnp.full((batch,), channels, jnp.int32), channels,
        mask_prob=mask_prob, mask_length=mask_length,
        mask_selection=mask_selection, mask_other=mask_other,
        min_masks=0, no_overlap=no_overlap, min_space=min_space,
        require_same_masks=True, mask_dropout=0.0,
        # no padding mask at the channel call sites -> the reference uses
        # one shared count draw (all_num_mask) for every row
        shared_rounding=True,
    )


# ---------------------------------------------------------------------------
# Host-side NumPy generator: full reference parity, used for the no_overlap
# mode (via pure_callback above) and as the distribution oracle in tests.
# ---------------------------------------------------------------------------

def _np_lengths(rng: np.random.Generator, n: int, mask_selection: str,
                mask_length: int, mask_other: float) -> np.ndarray:
    if mask_selection == "static":
        return np.full(n, mask_length, np.int64)
    if mask_selection == "uniform":
        return rng.integers(int(mask_other), 2 * mask_length + 1, size=n)
    if mask_selection == "normal":
        x = np.round(rng.normal(mask_length, mask_other, size=n)).astype(np.int64)
        return np.maximum(x, 1)
    if mask_selection == "poisson":
        return np.round(rng.poisson(mask_length, size=n)).astype(np.int64)
    raise ValueError(f"unknown mask_selection {mask_selection!r}")


def _np_place_no_overlap(rng: np.random.Generator, sz: int,
                         span_lens: np.ndarray, min_space: int) -> np.ndarray:
    """Reference's recursive interval-splitting placement
    (data_utils.py:103-124): place spans longest-first into free intervals
    chosen proportionally to their usable size, keeping min_space gaps."""
    chosen: list = []
    free = [(0, sz)]
    shortest = int(span_lens.min()) if len(span_lens) else 0
    for length in sorted((int(x) for x in span_lens), reverse=True):
        usable = np.array(
            [e - s if (e - s) >= length + min_space else 0 for s, e in free],
            np.int64,
        )
        if usable.sum() == 0:
            break
        pick = rng.choice(len(free), p=usable / usable.sum())
        s, e = free.pop(pick)
        start = int(rng.integers(s, e - length))
        chosen.extend(range(start, start + length))
        if start - s - min_space >= shortest:
            free.append((s, start - min_space + 1))
        if e - start - length - min_space > shortest:
            free.append((start + length + min_space, e))
    return np.asarray(chosen, np.int64)


def compute_mask_indices_np(
    shape: tuple,
    lengths: np.ndarray | None,
    *,
    mask_prob: float,
    mask_length: int,
    mask_selection: str = "static",
    mask_other: float = 0.0,
    min_masks: int = 0,
    no_overlap: bool = False,
    min_space: int = 0,
    require_same_masks: bool = True,
    mask_dropout: float = 0.0,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Host NumPy span-mask generator with full reference semantics
    (fairseq_code/data_utils.py:20-153), re-derived: per-row probabilistic
    count rounding, four length distributions, overlapping or recursive
    non-overlapping placement, >=sz clipping, batch-min equalization and
    mask dropout. ``lengths`` is (B,) valid sizes (None -> all full)."""
    rng = rng or np.random.default_rng()
    b, t = shape
    sizes = (np.full(b, t, np.int64) if lengths is None
             else np.asarray(lengths, np.int64))
    mask = np.zeros((b, t), bool)

    # Reference (data_utils.py:57-74): ONE shared count draw when there is
    # no padding mask; per-row draws only for per-row valid sizes.
    shared_num_mask = None
    if lengths is None:
        shared_num_mask = max(
            min_masks, int(mask_prob * t / float(mask_length) + rng.random())
        )

    rows: list = []
    for i in range(b):
        sz = int(sizes[i])
        if shared_num_mask is None:
            num_mask = int(mask_prob * sz / float(mask_length) + rng.random())
            num_mask = max(min_masks, num_mask)
        else:
            num_mask = shared_num_mask
        span_lens = _np_lengths(rng, num_mask, mask_selection, mask_length,
                                mask_other)
        if num_mask and span_lens.sum() == 0:
            span_lens[0] = min(mask_length, sz - 1)

        if no_overlap:
            idx = _np_place_no_overlap(rng, sz, span_lens, min_space)
        elif num_mask == 0:
            idx = np.empty(0, np.int64)
        else:
            shortest = int(span_lens.min())
            if sz - shortest <= num_mask:
                shortest = sz - num_mask - 1
            starts = rng.choice(max(sz - shortest, 1), num_mask, replace=False)
            idx = np.concatenate(
                [s + np.arange(l) for s, l in zip(starts, span_lens)]
            ) if num_mask else np.empty(0, np.int64)
        rows.append(np.unique(idx[idx < sz]))

    fewest = min(len(r) for r in rows) if rows else 0
    for i, idx in enumerate(rows):
        if require_same_masks and len(idx) > fewest:
            idx = rng.choice(idx, fewest, replace=False)
        if mask_dropout > 0:
            holes = int(np.rint(len(idx) * mask_dropout))
            idx = rng.choice(idx, len(idx) - holes, replace=False)
        mask[i, idx.astype(np.int64)] = True
    return mask
