"""On-device HuBERT-style span masking.

The reference generates mask spans on the host with NumPy every step
(fairseq_code/data_utils.py:20-153, called from model.py:66-78) — a host
sync per step. Here the same *distribution* is produced inside jit with
jax.random and fully static shapes:

  * per-row mask count with probabilistic rounding:
      num_mask = floor(mask_prob * sz / mask_length + U[0,1)), min ``min_masks``
    (reference data_utils.py:57-74)
  * 'static' span length = mask_length; start positions drawn uniformly
    without replacement from [0, sz - mask_length) (reference :125-129 —
    top-k of i.i.d. uniform scores over valid starts is exactly a uniform
    sample without replacement)
  * spans may overlap; indices >= sz never masked (reference :139)

Shape-static trick: we draw up to ``max_spans`` candidate starts (a static
upper bound) and keep the first ``num_mask`` of them; the span union is built
with a cumulative-sum sliding window instead of scatter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def max_spans_upper_bound(max_len: int, mask_prob: float, mask_length: int,
                          min_masks: int = 2) -> int:
    """Static upper bound on per-row span count."""
    return max(min_masks, int(mask_prob * max_len / float(mask_length)) + 1)


@functools.partial(
    jax.jit,
    static_argnums=(2,),
    static_argnames=("mask_prob", "mask_length", "min_masks"),
)
def compute_span_mask(
    rng: jax.Array,
    lengths: jax.Array,
    max_len: int | None = None,
    *,
    mask_prob: float,
    mask_length: int,
    min_masks: int = 2,
) -> jax.Array:
    """Sample a (B, T) bool span mask on device.

    Args:
      rng: PRNG key.
      lengths: (B,) int32 valid lengths per row (sz).
      max_len: static T (defaults from lengths' shape is not possible —
        callers pass the padded time dim).
      mask_prob / mask_length / min_masks: as in the reference config
        (e.g. 0.70 / 5 / 2 for MelHuBERT-20ms).

    Returns:
      (B, T) bool; True = masked. No True beyond each row's length.
    """
    assert max_len is not None
    b = lengths.shape[0]
    t = max_len
    n_spans = max_spans_upper_bound(t, mask_prob, mask_length, min_masks)

    k_count, k_starts = jax.random.split(rng)
    sz = lengths.astype(jnp.float32)

    # Probabilistic rounding of the span count (per row).
    u = jax.random.uniform(k_count, (b,))
    num_mask = jnp.floor(mask_prob * sz / float(mask_length) + u).astype(jnp.int32)
    num_mask = jnp.maximum(num_mask, min_masks)
    num_mask = jnp.minimum(num_mask, n_spans)

    # Valid start positions: [0, sz - mask_length). Reference draws starts
    # from np.random.choice(sz - min_len) (data_utils.py:129). Guard tiny rows.
    n_starts = jnp.maximum(lengths - mask_length, 1)  # (B,)
    # Short rows: never request more spans than valid start positions
    # (top_k would otherwise pick -inf-scored invalid starts; the reference
    # instead shrinks the span length, data_utils.py:126-127 — clamping the
    # count keeps short rows partially unmasked, which is the intent).
    num_mask = jnp.minimum(num_mask, n_starts)

    # Uniform sample w/o replacement via top-k of uniform scores over valid
    # positions; invalid positions get score -inf so they are never picked.
    scores = jax.random.uniform(k_starts, (b, t))
    pos = jnp.arange(t)[None, :]
    valid = pos < n_starts[:, None]
    scores = jnp.where(valid, scores, -jnp.inf)
    # Take the n_spans best; of those keep the first num_mask per row.
    _, start_idx = jax.lax.top_k(scores, n_spans)  # (B, n_spans)
    keep = jnp.arange(n_spans)[None, :] < num_mask[:, None]

    # Union of spans via one-hot + sliding-window cumsum:
    # onehot[t] = #spans starting at t; mask[t] = any start in (t-L, t].
    onehot = jnp.zeros((b, t), jnp.int32)
    onehot = jax.vmap(lambda oh, si, kp: oh.at[si].add(kp.astype(jnp.int32)))(
        onehot, start_idx, keep
    )
    csum = jnp.cumsum(onehot, axis=1)
    shifted = jnp.pad(csum, ((0, 0), (mask_length, 0)))[:, :t]
    mask = (csum - shifted) > 0

    # Never mask padding (starts are < sz - L so spans end < sz, but guard
    # the tiny-row clamp path).
    mask = mask & (pos < lengths[:, None])
    return mask
