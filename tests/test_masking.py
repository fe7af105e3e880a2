import numpy as np
import jax
import jax.numpy as jnp

from speech_ssl_compression_tpu.ops.masking import compute_span_mask


def test_mask_respects_lengths():
    rng = jax.random.PRNGKey(0)
    lengths = jnp.array([100, 37, 5], jnp.int32)
    mask = compute_span_mask(rng, lengths, 100, mask_prob=0.7, mask_length=5)
    mask = np.asarray(mask)
    assert mask.shape == (3, 100)
    pos = np.arange(100)[None, :]
    assert not (mask & (pos >= np.asarray(lengths)[:, None])).any()
    assert mask.any(axis=1).all()  # min_masks guarantees >=1 span per row


def test_mask_ratio_close_to_prob():
    rng = jax.random.PRNGKey(1)
    b, t = 64, 400
    lengths = jnp.full((b,), t, jnp.int32)
    mask = compute_span_mask(rng, lengths, t, mask_prob=0.7, mask_length=5)
    # overlaps reduce the realized ratio below mask_prob (same as reference)
    ratio = float(np.asarray(mask).mean())
    assert 0.40 < ratio <= 0.72, ratio


def test_mask_spans_have_expected_length_structure():
    rng = jax.random.PRNGKey(2)
    lengths = jnp.full((8,), 200, jnp.int32)
    mask = np.asarray(
        compute_span_mask(rng, lengths, 200, mask_prob=0.1, mask_length=7)
    )
    # with low prob, spans rarely merge: run lengths should be multiples >= 7
    for row in mask:
        padded = np.concatenate([[0], row.astype(int), [0]])
        diff = np.diff(padded)
        starts = np.where(diff == 1)[0]
        ends = np.where(diff == -1)[0]
        runs = ends - starts
        assert (runs >= 7).all(), runs


def test_mask_deterministic_given_key():
    rng = jax.random.PRNGKey(3)
    lengths = jnp.array([50, 60], jnp.int32)
    a = compute_span_mask(rng, lengths, 64, mask_prob=0.65, mask_length=10)
    b = compute_span_mask(rng, lengths, 64, mask_prob=0.65, mask_length=10)
    assert (np.asarray(a) == np.asarray(b)).all()


def test_block_mask_1d():
    from speech_ssl_compression_tpu.ops.block_masking import (
        compute_block_mask_1d,
    )

    rng = np.random.default_rng(0)
    m = compute_block_mask_1d((4, 100), 0.5, 5, rng=rng)
    assert m.shape == (4, 100)
    # require_same_masks: exactly int(L * p) per row
    assert (m.sum(1) == 50).all()

    m2 = compute_block_mask_1d((4, 100), 0.5, 5, inverse_mask=True, rng=rng)
    assert (m2.sum(1) == 50).all()

    m3 = compute_block_mask_1d(
        (2, 100), 0.3, 5, non_overlapping=True, require_same_masks=False,
        rng=rng,
    )
    # non-overlapping grid blocks: runs are multiples of mask_length
    for row in m3:
        padded = np.concatenate([[0], row.astype(int), [0]])
        diff = np.diff(padded)
        runs = np.where(diff == -1)[0] - np.where(diff == 1)[0]
        assert all(r % 5 == 0 for r in runs), runs


def test_short_rows_not_fully_masked():
    """Regression: rows with sz <= mask_length+1 used to be 100% masked
    (top_k picked -inf-scored invalid starts); the span count is now clamped
    to the number of valid start positions."""
    rng = jax.random.PRNGKey(0)
    lengths = jnp.array([11, 12, 64], jnp.int32)
    for seed in range(5):
        m = np.asarray(
            compute_span_mask(
                jax.random.PRNGKey(seed), lengths, 64,
                mask_prob=0.8, mask_length=10, min_masks=2,
            )
        )
        # short rows keep at least one unmasked valid frame
        assert m[0, :11].sum() < 11, m[0]
        assert m[1, :12].sum() < 12, m[1]
