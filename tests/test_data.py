"""Data-layer tests: kaldi ark parsing (golden cross-validated against the
reference parser), preprocessing pipeline, fairseq-dump dataset, bucketing."""

import io
import pathlib

import numpy as np
import pytest

from speech_ssl_compression_tpu.data import kaldi_io

GOLDEN = pathlib.Path(__file__).parent / "golden" / "kaldi_ark.npz"


def test_kaldi_uncompressed_golden():
    g = np.load(GOLDEN)
    buf = io.BytesIO(g["fm_bytes"].tobytes())
    mat = kaldi_io.parse_feat_matrix(buf)
    np.testing.assert_allclose(mat, g["mat"], atol=1e-6)


def test_kaldi_compressed_golden():
    g = np.load(GOLDEN)
    buf = io.BytesIO(g["cm_bytes"].tobytes())
    mat = kaldi_io.parse_feat_matrix(buf)
    # cm_expected was produced by the REFERENCE parser on the same bytes
    np.testing.assert_allclose(mat, g["cm_expected"], atol=1e-12)


def test_kaldi_cm2_roundtrip():
    rng = np.random.default_rng(1)
    mat = rng.standard_normal((20, 8))
    import struct

    buf = io.BytesIO()
    buf.write(b"\x00B" + b"CM2 ")
    mn, rg = float(mat.min()), float(mat.max() - mat.min())
    buf.write(struct.pack("<ffii", mn, rg, *mat.shape))
    codes = np.clip(
        np.round((mat - mn) / rg * 65535), 0, 65535
    ).astype("<u2")
    buf.write(codes.tobytes())
    buf.seek(0)
    out = kaldi_io.parse_feat_matrix(buf)
    np.testing.assert_allclose(out, mat, atol=rg / 65535 + 1e-9)


def test_read_mean_var(tmp_path):
    s = np.array([10.0, 20.0])
    sq = np.array([30.0, 90.0])
    n = 5
    p = tmp_path / "mv"
    p.write_text(
        "[" + ",".join(map(str, s)) + "]\n"
        "[" + ",".join(map(str, sq)) + "]\n"
        f"{n}\n"
    )
    mean, std = kaldi_io.read_mean_var(str(p))
    np.testing.assert_allclose(mean, s / n)
    np.testing.assert_allclose(std, np.sqrt(sq / n - (s / n) ** 2))


def test_preprocess_pipeline(tmp_path):
    """Synthetic kaldi-style release -> npy + CSV, end to end."""
    from speech_ssl_compression_tpu.data.preprocess import tidy_kaldi_data

    data_dir = tmp_path / "release"
    fbank = data_dir / "fbank"
    cl20 = data_dir / "stage2-cluster-20ms"
    fbank.mkdir(parents=True)
    cl20.mkdir(parents=True)

    rng = np.random.default_rng(0)
    utts = {"utt1": 37, "utt2": 24}
    ark_path = fbank / "feats.ark"
    scp_lines = []
    total_sum = np.zeros(8)
    total_sq = np.zeros(8)
    total_n = 0
    with open(ark_path, "wb") as f:
        for key, n in utts.items():
            offset = f.tell()
            mat = rng.standard_normal((n, 8)) * 2 + 1
            kaldi_io.write_feat_matrix(f, mat, compress=False)
            scp_lines.append(f"{key} {ark_path}:{offset}")
            total_sum += mat.sum(0)
            total_sq += (mat**2).sum(0)
            total_n += n
    (fbank / "train-960.scp").write_text("\n".join(scp_lines) + "\n")
    (fbank / "train-960.mean-var").write_text(
        "[" + ",".join(map(str, total_sum)) + "]\n"
        "[" + ",".join(map(str, total_sq)) + "]\n"
        f"{total_n}\n"
    )

    lab_path = cl20 / "labels.txt"
    lab_scp = []
    with open(lab_path, "w") as f:
        for key, n in utts.items():
            offset = f.tell()
            labs = rng.integers(0, 512, n // 2)
            f.write(" ".join(map(str, labs)) + "\n")
            lab_scp.append(f"{key} {lab_path}:{offset}")
    (cl20 / "train_960.hubert8.bas.scp").write_text("\n".join(lab_scp) + "\n")

    out = tmp_path / "out"
    tidy_kaldi_data(
        str(data_dir), str(out),
        cluster_dirs={"20ms": "stage2-cluster-20ms"},
    )
    assert (out / "mean-std.npy").exists()
    csv = out / "libri960-stg2-20ms.csv"
    assert csv.exists()
    lines = csv.read_text().strip().split("\n")
    assert lines[0] == "file_path,label_path,length"
    assert len(lines) == 3
    # normalized features have ~zero mean over the corpus
    feats = [np.load(l.split(",")[0]) for l in lines[1:]]
    allf = np.concatenate(feats)
    assert np.abs(allf.mean(0)).max() < 0.2


def test_fairseq_dump_dataset(tmp_path):
    from speech_ssl_compression_tpu.data.fairseq_dump import FairseqDumpBuckets

    rng = np.random.default_rng(0)
    lengths = [40, 30, 26, 20]
    feats = [rng.standard_normal((n, 8)).astype(np.float32) for n in lengths]
    np.save(tmp_path / "train.npy", np.concatenate(feats))
    (tmp_path / "train.len").write_text("\n".join(map(str, lengths)) + "\n")
    labels = [" ".join(map(str, rng.integers(0, 5, n))) for n in lengths]
    (tmp_path / "train.km").write_text("\n".join(labels) + "\n")
    ms = np.stack([np.zeros(8), np.ones(8)])
    np.save(tmp_path / "ms.npy", ms)

    ds = FairseqDumpBuckets(
        frame_period=20, sequence_length=0, bucket_size=2,
        feat_dir=str(tmp_path), label_dir=str(tmp_path), split="train",
        mean_std_pth=str(tmp_path / "ms.npy"), pad_multiple=8,
    )
    assert len(ds) == 2
    batch = ds.get_batch(0)
    assert batch["feat"].shape[0] == 2
    assert batch["feat"].shape[2] == 16  # 20ms stacking doubles dims
    assert batch["feat"].shape[1] % 8 == 0
    assert (batch["label"][batch["pad_mask"] == 0] == -100).all()


def test_mel_bucket_dataset_pad_and_sort(tmp_path):
    from speech_ssl_compression_tpu.data.bucket_dataset import MelFeatBuckets

    rng = np.random.default_rng(0)
    rows = []
    for i, n in enumerate([50, 45, 31, 18]):
        f = tmp_path / f"f{i}.npy"
        l = tmp_path / f"l{i}.npy"
        np.save(f, rng.standard_normal((n, 4)).astype(np.float32))
        np.save(l, rng.integers(0, 5, n))
        rows.append(f"{f},{l},{n}")
    csv = tmp_path / "t.csv"
    csv.write_text("file_path,label_path,length\n" + "\n".join(rows) + "\n")

    ds = MelFeatBuckets(
        frame_period=10, sequence_length=0, bucket_size=2, sets=[str(csv)],
        pad_multiple=16,
    )
    assert len(ds) == 2
    b0 = ds.get_batch(0)  # longest utterances first (sorted desc)
    assert b0["length"].tolist() == [50, 45]
    assert b0["feat"].shape[1] == 64  # padded to multiple of 16
    assert (b0["label"][0, 50:] == -100).all()

    # signed max_timestep filtering
    ds2 = MelFeatBuckets(10, 0, 2, [str(csv)], max_timestep=40)
    assert ds2.num_samples == 2
    ds3 = MelFeatBuckets(10, 0, 2, [str(csv)], max_timestep=-40)
    assert ds3.num_samples == 2


def test_dictionary():
    from speech_ssl_compression_tpu.data.dictionary import (
        Dictionary,
        LabelEncoder,
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "dict.km.txt")
        with open(p, "w") as f:
            for c in range(5):
                f.write(f"{c} 10\n")
        dic = Dictionary.load(p)
        assert len(dic) == 9  # 4 specials + 5 symbols
        assert dic.pad() == 1
        enc = LabelEncoder(dic)
        np.testing.assert_array_equal(enc("0 3 4"), [4, 7, 8])
        np.testing.assert_array_equal(enc("0 99"), [4, dic.unk()])


def test_build_label_lookup_ignores_negative_symbols(tmp_path):
    """A '-1' noise symbol in dict.km.txt must not corrupt the table via
    Python negative indexing (it would overwrite the HIGHEST cluster's
    entry); negative raw ids resolve to <unk> through callers' oob guard."""
    from speech_ssl_compression_tpu.data.dictionary import (
        Dictionary,
        build_label_lookup,
    )

    p = str(tmp_path / "dict.km.txt")
    # frequency-sorted fairseq-style dict with a noise label
    with open(p, "w") as f:
        for sym, cnt in [("2", 900), ("-1", 500), ("0", 400), ("1", 100)]:
            f.write(f"{sym} {cnt}\n")
    d = Dictionary.load(p)
    lut = build_label_lookup(d)
    assert len(lut) == 3
    assert lut[2] == d.index["2"]   # NOT clobbered by the "-1" symbol
    assert lut[0] == d.index["0"]
    assert lut[1] == d.index["1"]


def test_prefetch_iterator_close_then_next_does_not_hang():
    """close() while the worker is blocked on a full queue exits the
    worker WITHOUT enqueuing the done sentinel; a subsequent next() must
    drain what's buffered and raise StopIteration, not block forever."""
    import itertools
    import threading

    from speech_ssl_compression_tpu.data.bucket_dataset import (
        PrefetchIterator,
    )

    it = PrefetchIterator(itertools.count(), depth=2)  # infinite source
    first = next(it)
    assert first == 0
    # let the worker fill the queue and block on put
    import time
    time.sleep(0.3)
    it.close()

    result = {}

    def consume():
        drained = []
        try:
            while True:
                drained.append(next(it))
        except StopIteration:
            result["drained"] = drained

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    t.join(timeout=5.0)
    assert not t.is_alive(), "next() after close() hung"
    assert "drained" in result


def test_prefetch_iterator_normal_exhaustion_and_error():
    from speech_ssl_compression_tpu.data.bucket_dataset import (
        PrefetchIterator,
    )

    assert list(PrefetchIterator(iter([1, 2, 3]))) == [1, 2, 3]

    def boom():
        yield 1
        raise RuntimeError("source failed")

    it = PrefetchIterator(boom())
    assert next(it) == 1
    import pytest
    with pytest.raises(RuntimeError, match="source failed"):
        next(it)


def test_hubert_dataset_sequence_labels(tmp_path):
    """label_rate == -1 -> sequence labels: duration verification skipped
    and labels collated whole, without frame-crop alignment (reference
    hubert_dataset.py:81-83, collater_seq_label :303-308)."""
    from tests.test_wave_runner import make_wav_dataset

    from speech_ssl_compression_tpu.data.hubert_dataset import (
        HubertWaveDataset,
    )

    data = make_wav_dataset(tmp_path, n_utts=4)
    # the .km file holds 50 Hz labels; with rate=-1 they are "sequence"
    # labels and must come through uncropped
    ds = HubertWaveDataset(
        manifest_path=f"{data}/train.tsv",
        sample_rate=16000,
        label_paths=[f"{data}/train.km"],
        label_rates=-1,
        batch_size=2,
        max_keep_sample_size=None,
        min_keep_sample_size=None,
        max_sample_size=3200,   # forces crops on most utterances
        pad_audio=False,
        normalize=False,
        random_crop=True,
        seed=0,
    )
    raw_lines = open(f"{data}/train.km").read().splitlines()
    raw_lens = {len(l.split()) for l in raw_lines}
    batch = next(ds.epoch(shuffle=False))
    for labs in batch["target_lists"][0]:
        # audio was cropped to 3200 samples, labels stayed whole
        assert len(labs) in raw_lens
        assert len(labs) > int(round(3200 / 16000 * 50))
