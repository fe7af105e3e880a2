"""TPU-native mini-batch k-means for HuBERT label generation.

The reference consumes precomputed cluster labels (preprocess/
tidy_libri960_kaldi_data.py:31-53 reads `stage2-cluster-*` scp/ark dirs;
datasets/hubert_dataset.py reads .km files) but ships no trainer — users
must bring labels from an external pipeline. This module closes the loop
on-chip: assignment is one (B, K) distance matmul on the MXU, updates are
segment-sums, and the whole step is a single jit. Mini-batch EMA updates
(Sculley 2010) with dead-center reseeding keep memory flat for
corpus-scale feature sets.

Layout: features (B, D) rows on the batch dim, centers (K, D) — K=100/500
and D=39 (MFCC) or 768 (hidden states) both tile fine; distances use
||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2 and drop the x-norm (argmin-
invariant), so the hot op is x @ centers.T.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=())
def kmeans_assign(x: jax.Array, centers: jax.Array) -> jax.Array:
    """(B, D), (K, D) -> (B,) int32 nearest-center ids."""
    score = 2.0 * (x @ centers.T) - jnp.sum(
        centers.astype(jnp.float32) ** 2, axis=-1
    )[None, :]
    return jnp.argmax(score, axis=-1).astype(jnp.int32)


@jax.jit
def _minibatch_step(centers, counts, x, valid):
    """One Sculley mini-batch update. x (B, D) f32, valid (B,) bool.

    Per-center learning rate 1/counts (counts accumulate batch
    multiplicities), matching sklearn's MiniBatchKMeans update rule.
    Returns (centers, counts, assignment, batch_inertia).
    """
    k = centers.shape[0]
    assign = kmeans_assign(x, centers)
    one_hot = (
        jax.nn.one_hot(assign, k, dtype=jnp.float32)
        * valid[:, None].astype(jnp.float32)
    )  # (B, K)
    # inertia of THIS assignment against the centers that produced it
    # (sklearn's definition) — before the update below moves them
    diff = x - centers[assign]
    inertia = jnp.sum(
        jnp.sum(diff * diff, axis=-1)
        * valid.astype(jnp.float32)
    )
    batch_counts = jnp.sum(one_hot, axis=0)              # (K,)
    batch_sums = one_hot.T @ x                           # (K, D)
    new_counts = counts + batch_counts
    # centers <- centers + (mean_batch - centers) * batch_count/new_count
    safe = jnp.maximum(new_counts, 1.0)
    centers = centers + (
        batch_sums - batch_counts[:, None] * centers
    ) / safe[:, None]
    return centers, new_counts, assign, inertia


def kmeans_fit(
    rng,
    batches,                 # iterable of np.ndarray (B, D) feature chunks
    k: int,
    *,
    epochs: int = 1,
    reseed_every: int = 50,
    verbose: bool = False,
):
    """Mini-batch k-means over an iterable of feature chunks.

    ``batches`` is re-iterated ``epochs`` times — pass a list or a
    RE-ITERABLE (an object whose __iter__ restarts); a one-shot generator
    raises on the second epoch instead of silently under-training. Chunks
    may be (B, D) arrays or (x (B, D), n_valid int) pairs — padded rows
    past n_valid are masked out (keeps chunk shapes static, one compile).
    Init: k rows sampled from the first chunk (k-means++ D^2 seeding
    within it). Dead centers (zero count after ``reseed_every`` steps)
    are reseeded to the farthest points of the current chunk.
    Returns (centers (K, D) float32, final mean inertia/row).
    """
    rng = np.random.default_rng(rng)
    centers = None
    counts = None
    step = 0
    last_inertia = []
    for epoch in range(epochs):
        epoch_chunks = 0
        for chunk in batches:
            if isinstance(chunk, tuple):
                x, n_valid = chunk
            else:
                x, n_valid = chunk, None
            x = np.asarray(x, np.float32)
            if x.ndim != 2:
                raise ValueError(f"feature chunk must be (B, D), got {x.shape}")
            b = x.shape[0]
            if n_valid is None:
                n_valid = b
            if centers is None:
                centers = _dsq_seed(rng, x[:n_valid], k)
                counts = jnp.zeros((k,), jnp.float32)
            valid = jnp.arange(b) < n_valid
            centers, counts, assign, inertia = _minibatch_step(
                centers, counts, jnp.asarray(x), valid
            )
            step += 1
            epoch_chunks += 1
            last_inertia.append(float(inertia) / max(int(n_valid), 1))
            if len(last_inertia) > 20:
                last_inertia.pop(0)
            if reseed_every and step % reseed_every == 0:
                centers, counts = _reseed_dead(
                    rng, centers, counts, x[:n_valid]
                )
            if verbose and step % 100 == 0:
                print(f"[kmeans] step {step}: inertia/row "
                      f"{np.mean(last_inertia):.4f}", flush=True)
        if epoch_chunks == 0:
            raise ValueError(
                "kmeans_fit: no chunks in epoch "
                f"{epoch} — `batches` must be re-iterable (a one-shot "
                "generator exhausts after the first epoch)"
            )
    return np.asarray(centers), float(np.mean(last_inertia))


def _dsq_seed(rng, x, k):
    """k-means++ (D^2) seeding from one chunk."""
    n = x.shape[0]
    if n < k:
        raise ValueError(f"first chunk has {n} rows < k={k}")
    idx = [int(rng.integers(n))]
    d2 = np.sum((x - x[idx[0]]) ** 2, axis=-1)
    for _ in range(k - 1):
        tot = d2.sum()
        if tot <= 0:
            # fewer than k distinct rows in the chunk (e.g. digital
            # silence): fall back to uniform draws — duplicate seeds are
            # resolved by the dead-center reseeding during fitting
            idx.append(int(rng.integers(n)))
            continue
        p = d2 / tot
        idx.append(int(rng.choice(n, p=p)))
        d2 = np.minimum(d2, np.sum((x - x[idx[-1]]) ** 2, axis=-1))
    return jnp.asarray(x[idx], jnp.float32)


def _reseed_dead(rng, centers, counts, x):
    """Replace zero-count centers with the current chunk's farthest rows.

    np.array (forced copies): np.asarray of a jax.Array returns the
    READ-ONLY cached buffer — writing into it raises ValueError.
    """
    counts_np = np.array(counts)
    dead = np.flatnonzero(counts_np == 0)
    if dead.size == 0:
        return centers, counts
    assign = np.asarray(kmeans_assign(jnp.asarray(x), centers))
    d2 = np.sum((x - np.asarray(centers)[assign]) ** 2, axis=-1)
    n_take = min(dead.size, x.shape[0])
    far = np.argsort(-d2)[:n_take]
    centers_np = np.array(centers)
    centers_np[dead[:n_take]] = x[far]
    counts_np[dead[:n_take]] = 1.0
    return jnp.asarray(centers_np), jnp.asarray(counts_np)
