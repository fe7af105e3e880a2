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
