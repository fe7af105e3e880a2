"""TPU-native k-means (ops/kmeans.py) and the cluster.py label CLI."""

import subprocess
import sys

import numpy as np
import jax.numpy as jnp

from speech_ssl_compression_tpu.ops.kmeans import (
    kmeans_assign,
    kmeans_fit,
)


def _blobs(rng, n_per, centers, scale=0.05):
    xs = [c + scale * rng.standard_normal((n_per, len(c)))
          for c in centers]
    x = np.concatenate(xs).astype(np.float32)
    rng.shuffle(x)
    return x


def test_kmeans_recovers_blobs():
    rng = np.random.default_rng(0)
    true = np.asarray([[0, 0, 0, 0], [5, 5, 0, 0], [0, 5, 5, 0],
                       [5, 0, 0, 5]], np.float32)
    x = _blobs(rng, 400, true)
    chunks = [x[i:i + 256] for i in range(0, len(x), 256)]
    centers, inertia = kmeans_fit(0, chunks, 4, epochs=5)
    # each true center has a learned center within the blob scale
    d = np.linalg.norm(true[:, None, :] - centers[None, :, :], axis=-1)
    assert (d.min(axis=1) < 0.2).all(), d.min(axis=1)
    assert inertia < 0.1

    ids = np.asarray(kmeans_assign(jnp.asarray(x), jnp.asarray(centers)))
    # points from one blob agree on a single label
    first_blob = _blobs(np.random.default_rng(1), 50, true[:1])
    fids = np.asarray(
        kmeans_assign(jnp.asarray(first_blob), jnp.asarray(centers))
    )
    assert len(set(fids.tolist())) == 1
    assert ids.dtype == np.int32


def test_kmeans_reseeds_dead_centers():
    rng = np.random.default_rng(2)
    # k=8 but only 2 real modes in tiny chunks: without reseeding several
    # centers would stay at their (possibly unlucky) init forever
    true = np.asarray([[0.0, 0.0], [8.0, 8.0]], np.float32)
    x = _blobs(rng, 600, true)
    chunks = [x[i:i + 128] for i in range(0, len(x), 128)]
    centers, _ = kmeans_fit(3, chunks, 8, epochs=3, reseed_every=2)
    ids = np.asarray(kmeans_assign(jnp.asarray(x), jnp.asarray(centers)))
    # every point is well explained
    d = np.linalg.norm(x - centers[ids], axis=-1)
    assert float(d.mean()) < 0.25


def test_cluster_cli_roundtrip(tmp_path):
    """cluster.py writes centers + fairseq-format .km/.len labels that the
    fairseq-dump reader consumes."""
    rng = np.random.default_rng(4)
    true = np.asarray([[0, 0], [6, 6], [0, 6]], np.float32)
    paths = []
    lens = []
    for i in range(6):
        t = int(rng.integers(40, 80))
        lab = rng.integers(0, 3, t)
        x = true[lab] + 0.05 * rng.standard_normal((t, 2))
        p = tmp_path / f"u{i}.npy"
        np.save(p, x.astype(np.float32))
        paths.append(str(p))
        lens.append(t)
    csv = tmp_path / "feats.csv"
    csv.write_text("file_path\n" + "\n".join(paths) + "\n")

    out = tmp_path / "out"
    r = subprocess.run(
        [sys.executable, "cluster.py", "-f", str(csv), "-k", "3",
         "-o", str(out), "--epochs", "6", "--chunk-rows", "128",
         "--backend", "cpu"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    centers = np.load(out / "centers.npy")
    assert centers.shape == (3, 2)
    km = (out / "labels.km").read_text().splitlines()
    ln = [int(v) for v in (out / "labels.len").read_text().split()]
    assert ln == lens
    assert [len(line.split()) for line in km] == lens
    # labels are consistent: same-blob frames share an id within an utt
    x0 = np.load(paths[0])
    ids0 = np.asarray([int(v) for v in km[0].split()])
    d = np.linalg.norm(x0 - centers[ids0], axis=-1)
    assert float(d.mean()) < 0.25


def test_mfcc39():
    """MFCC-39 shape/determinism + construction identities (DCT
    orthonormality and the delta regression filter are unit-checked in
    their own right; no external oracle exists in this environment)."""
    from speech_ssl_compression_tpu.ops.fbank import (
        _dct_matrix,
        _deltas,
        mfcc39_np,
    )

    rng = np.random.default_rng(0)
    wav = rng.standard_normal(16000).astype(np.float64) * 2**13
    m = mfcc39_np(wav)
    assert m.shape == (98, 39) and m.dtype == np.float32
    assert np.isfinite(m).all()
    np.testing.assert_allclose(m, mfcc39_np(wav), atol=0)

    d = _dct_matrix(23, 23)
    np.testing.assert_allclose(d @ d.T, np.eye(23), atol=1e-12)
    ramp = np.outer(np.arange(50, dtype=np.float64), np.ones(3))
    np.testing.assert_allclose(_deltas(ramp)[5:-5], 1.0, atol=1e-12)


def test_cluster_cli_from_audio(tmp_path):
    """--audio mfcc trains labels straight from FLAC files via a fairseq
    manifest (the full wav -> labels -> train.py hubert loop)."""
    import pytest
    EXAMPLES = __import__("pathlib").Path("/root/reference/example")
    if not EXAMPLES.exists():
        pytest.skip("example assets missing")
    tsv = tmp_path / "manifest.tsv"
    tsv.write_text(
        f"{EXAMPLES}\n100-121669-0000.flac\t0\n1001-134707-0000.flac\t0\n"
    )
    out = tmp_path / "out"
    r = subprocess.run(
        [sys.executable, "cluster.py", "-f", str(tsv), "--audio", "mfcc",
         "-k", "8", "-o", str(out), "--epochs", "4", "--backend", "cpu"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    km = (out / "labels.km").read_text().splitlines()
    ln = [int(v) for v in (out / "labels.len").read_text().split()]
    assert len(km) == 2 and all(n > 50 for n in ln)
    assert [len(line.split()) for line in km] == ln
    ids = {int(v) for line in km for v in line.split()}
    assert ids <= set(range(8)) and len(ids) > 1


def test_kmeans_dead_center_reseed_executes():
    """A k larger than the number of distinct rows in the seed chunk
    guarantees zero-count centers at the reseed checkpoint; the reseed
    path must actually execute (np.asarray of a jax.Array is read-only —
    an earlier build crashed with 'assignment destination is read-only')."""
    rng = np.random.default_rng(7)
    # one tight blob: most of k=16 centers stay unassigned
    x = (0.01 * rng.standard_normal((64, 4))).astype(np.float32)
    chunks = [(x, 64)] * 6
    centers, _ = kmeans_fit(0, chunks, 16, epochs=1, reseed_every=1)
    assert np.isfinite(centers).all()


def test_kmeans_rejects_one_shot_generator():
    import pytest

    rng = np.random.default_rng(8)
    x = rng.standard_normal((256, 4)).astype(np.float32)
    gen = (x[i:i + 64] for i in range(0, 256, 64))
    with pytest.raises(ValueError, match="re-iterable"):
        kmeans_fit(0, gen, 4, epochs=2)


def test_kmeans_padded_chunks_match_unpadded():
    """(x, n_valid) padded chunks give the same centers as exact chunks."""
    rng = np.random.default_rng(9)
    true = np.asarray([[0, 0], [4, 4]], np.float32)
    x = np.concatenate([
        true[rng.integers(0, 2, 500)]
        + 0.05 * rng.standard_normal((500, 2))
    ]).astype(np.float32)
    exact = [x[i:i + 100] for i in range(0, 500, 100)]
    padded = [(np.pad(c, ((0, 28), (0, 0))), 100) for c in exact]
    c1, _ = kmeans_fit(1, exact, 2, epochs=3)
    c2, _ = kmeans_fit(1, padded, 2, epochs=3)
    np.testing.assert_allclose(c1, c2, atol=1e-5)
