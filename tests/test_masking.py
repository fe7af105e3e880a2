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
    # require_same_masks (the reference default) subsets positions and breaks
    # runs; disable it to observe raw span structure.
    mask = np.asarray(
        compute_span_mask(rng, lengths, 200, mask_prob=0.1, mask_length=7,
                          require_same_masks=False)
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


def test_short_rows_mask_only_valid_frames():
    """Regression: top_k used to pick -inf-scored INVALID starts (past the
    row end) for rows with sz <= mask_length+1, leaking masks into padding.
    Valid clipped spans may legitimately cover a short row entirely — the
    reference's min_len adjustment (data_utils.py:126-127) allows it — but
    no position at or beyond the row length may ever be masked."""
    lengths = jnp.array([11, 12, 64], jnp.int32)
    szs = np.asarray(lengths)
    pos = np.arange(64)[None, :]
    for seed in range(5):
        m = np.asarray(
            compute_span_mask(
                jax.random.PRNGKey(seed), lengths, 64,
                mask_prob=0.8, mask_length=10, min_masks=2,
            )
        )
        assert not (m & (pos >= szs[:, None])).any(), m
        # the long row always keeps unmasked context
        assert m[2, :64].sum() < 64


# ---------------------------------------------------------------------------
# Round-2 coverage: mask_selection modes, no_overlap, require_same_masks,
# mask_dropout (reference fairseq_code/data_utils.py:75-150) with the host
# NumPy generator as the distribution oracle.
# ---------------------------------------------------------------------------

from speech_ssl_compression_tpu.ops.masking import (
    compute_channel_mask,
    compute_mask_indices_np,
)
import pytest


@pytest.mark.parametrize(
    "sel,other",
    [("static", 0.0), ("uniform", 2.0), ("normal", 3.0), ("poisson", 0.0)],
)
def test_selection_modes_match_numpy_oracle_distribution(sel, other):
    b, t, seeds = 16, 400, 6
    lengths = jnp.full((b,), t, jnp.int32)
    dev = np.mean([
        np.asarray(compute_span_mask(
            jax.random.PRNGKey(s), lengths, t, mask_prob=0.65, mask_length=10,
            mask_selection=sel, mask_other=other,
        )).mean()
        for s in range(seeds)
    ])
    ref = np.mean([
        compute_mask_indices_np(
            (b, t), None, mask_prob=0.65, mask_length=10, mask_selection=sel,
            mask_other=other, min_masks=2, rng=np.random.default_rng(s),
        ).mean()
        for s in range(seeds)
    ])
    assert abs(dev - ref) < 0.05, (sel, dev, ref)


def test_require_same_masks_equalizes_counts():
    lengths = jnp.full((32,), 300, jnp.int32)
    m = np.asarray(compute_span_mask(
        jax.random.PRNGKey(0), lengths, 300, mask_prob=0.6, mask_length=8,
        require_same_masks=True,
    ))
    assert len(set(m.sum(1).tolist())) == 1
    m2 = np.asarray(compute_span_mask(
        jax.random.PRNGKey(0), lengths, 300, mask_prob=0.6, mask_length=8,
        require_same_masks=False,
    ))
    assert len(set(m2.sum(1).tolist())) > 1


def test_mask_dropout_reduces_count():
    lengths = jnp.full((16,), 400, jnp.int32)
    base = np.asarray(compute_span_mask(
        jax.random.PRNGKey(5), lengths, 400, mask_prob=0.65, mask_length=10,
    ))
    dropped = np.asarray(compute_span_mask(
        jax.random.PRNGKey(5), lengths, 400, mask_prob=0.65, mask_length=10,
        mask_dropout=0.25,
    ))
    per_row = base.sum(1)
    want = per_row - np.rint(per_row * 0.25).astype(int)
    np.testing.assert_array_equal(dropped.sum(1), want)
    # dropped positions are a subset of the base mask
    assert not (dropped & ~base).any()


def test_no_overlap_spans_keep_min_space():
    # require_same_masks=False keeps spans intact so the structure is testable:
    # static lengths -> every run exactly mask_length, gaps >= min_space.
    lengths = jnp.full((6,), 300, jnp.int32)
    m = np.asarray(compute_span_mask(
        jax.random.PRNGKey(7), lengths, 300, mask_prob=0.4, mask_length=6,
        no_overlap=True, min_space=2, require_same_masks=False,
    ))
    for row in m:
        padded = np.concatenate([[0], row.astype(int), [0]])
        diff = np.diff(padded)
        starts = np.where(diff == 1)[0]
        ends = np.where(diff == -1)[0]
        assert ((ends - starts) == 6).all(), (starts, ends)
        if len(starts) > 1:
            gaps = starts[1:] - ends[:-1]
            assert (gaps >= 2).all(), gaps


def test_unknown_selection_raises():
    lengths = jnp.full((2,), 50, jnp.int32)
    with pytest.raises(ValueError, match="mask_selection"):
        compute_span_mask(
            jax.random.PRNGKey(0), lengths, 50, mask_prob=0.5, mask_length=5,
            mask_selection="bogus",
        )
    with pytest.raises(ValueError, match="mask_selection"):
        compute_mask_indices_np(
            (2, 50), None, mask_prob=0.5, mask_length=5,
            mask_selection="bogus",
        )


def test_channel_mask_shape_and_rows():
    ch = np.asarray(compute_channel_mask(
        jax.random.PRNGKey(1), 4, 512, mask_prob=0.5, mask_length=10,
    ))
    assert ch.shape == (4, 512)
    assert 0.2 < ch.mean() < 0.6
    # require_same_masks (reference default) equalizes per-row channel counts
    assert len(set(ch.sum(1).tolist())) == 1


def test_shared_rounding_count_matches_reference_no_padding():
    """Reference compute_mask_indices with padding_mask=None draws ONE
    shared count for all rows (data_utils.py:57-74); per-row draws +
    require_same_masks' batch-min would bias counts low. Channel masks
    use that path (shared_rounding=True)."""
    b, c, L, p = 8, 512, 10, 0.5
    seeds = 24

    def mean_count(**kw):
        return np.mean([
            np.asarray(compute_span_mask(
                jax.random.PRNGKey(s), jnp.full((b,), c, jnp.int32), c,
                mask_prob=p, mask_length=L, min_masks=0, **kw,
            )).sum(1).mean()
            for s in range(seeds)
        ])

    shared = mean_count(shared_rounding=True)
    ref = np.mean([
        compute_mask_indices_np(
            (b, c), None, mask_prob=p, mask_length=L, min_masks=0,
            rng=np.random.default_rng(s),
        ).sum(1).mean()
        for s in range(seeds)
    ])
    # shared device path tracks the reference oracle...
    assert abs(shared - ref) / ref < 0.05, (shared, ref)
    # ...and the per-row batch-min bias is real and visible
    per_row = mean_count(shared_rounding=False)
    assert per_row < shared, (per_row, shared)


@pytest.mark.slow
def test_melhubert_masks_not_batch_min_subsampled():
    """The reference MelHuBERT passes require_same_masks=False explicitly
    (model.py:76): a short utterance must NOT cut the long rows' mask
    counts to the batch minimum."""
    import jax

    from speech_ssl_compression_tpu.configs import MelHuBERTConfig
    from speech_ssl_compression_tpu.models import (
        init_melhubert_params,
        melhubert_forward,
    )

    cfg = MelHuBERTConfig.from_dict({
        "feat_emb_dim": 16, "encoder_layers": 1, "encoder_embed_dim": 32,
        "encoder_attention_heads": 4, "head_dim": 8,
        "encoder_ffn_embed_dim": 64, "num_cluster": 8,
        "conv_pos": 8, "conv_pos_groups": 2,
        "mask_prob": 0.5, "mask_length": 4,
        "dropout": 0.0, "attention_dropout": 0.0, "activation_dropout": 0.0,
    })
    params = init_melhubert_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    t = 200
    feat = jnp.asarray(rng.standard_normal((2, t, 16)), jnp.float32)
    pad = np.zeros((2, t), np.float32)
    pad[0, :] = 1.0     # full-length row
    pad[1, :16] = 1.0   # short row
    counts = []
    for seed in range(8):
        out = melhubert_forward(
            params, cfg, feat, jnp.asarray(pad), mask=True,
            rng=jax.random.PRNGKey(seed), deterministic=True,
            attn_impl="dense",
        )
        m = np.asarray(out["mask_indices"])
        counts.append((m[0].sum(), m[1].sum()))
    # long row keeps a proportional count (~0.5*200 frames area), far
    # above the short row's (require_same_masks=True would pin them equal)
    long_avg = np.mean([c[0] for c in counts])
    short_max = max(c[1] for c in counts)
    assert long_avg > 3 * short_max, counts
    assert all(c0 != c1 for c0, c1 in counts)


def test_no_overlap_shared_rounding_confined_to_lengths():
    """shared_rounding + no_overlap with ragged lengths: masks must still
    never land beyond a row's length."""
    lengths = jnp.asarray([50, 256], jnp.int32)
    m = np.asarray(compute_span_mask(
        jax.random.PRNGKey(0), lengths, 256,
        mask_prob=0.65, mask_length=10, mask_selection="static",
        mask_other=0.0, min_masks=2, no_overlap=True, min_space=1,
        shared_rounding=True,
    ))
    assert not m[0, 50:].any()
    assert m[1].sum() > 0


def test_zero_length_spans_after_clamp_still_mask():
    """A short row whose clamped slots all sampled zero-length spans must
    still receive the slot-0 fallback span (empty masks would collapse
    the whole batch under require_same_masks)."""
    rng = jax.random.PRNGKey(0)
    for seed in range(32):
        m = np.asarray(compute_span_mask(
            jax.random.fold_in(rng, seed),
            jnp.asarray([6, 256], jnp.int32), 256,
            mask_prob=0.9, mask_length=3, mask_selection="poisson",
            mask_other=0.2, min_masks=2, no_overlap=False, min_space=1,
            require_same_masks=False,
        ))
        assert m[0, :6].sum() > 0, seed
        assert not m[0, 6:].any()
