import pathlib

import numpy as np
import pytest

from speech_ssl_compression_tpu.data.audio import read_audio, read_flac

EXAMPLES = pathlib.Path("/root/reference/example")


@pytest.mark.skipif(not EXAMPLES.exists(), reason="example assets missing")
def test_flac_decode_md5_verified():
    # read_flac verifies decoded PCM against the FLAC STREAMINFO MD5; a
    # decoding bug raises. Both bundled LibriSpeech files must decode.
    wav, sr = read_flac(EXAMPLES / "100-121669-0000.flac")
    assert sr == 16000
    assert wav.shape[0] == 1
    assert wav.shape[1] == 32640
    assert np.abs(wav).max() <= 1.0

    wav2, sr2 = read_flac(EXAMPLES / "1001-134707-0000.flac")
    assert sr2 == 16000 and wav2.shape[1] == 253280


@pytest.mark.skipif(not EXAMPLES.exists(), reason="example assets missing")
def test_read_audio_dispatch():
    wav, sr = read_audio(EXAMPLES / "100-121669-0000.flac")
    assert wav.dtype == np.float32


def test_wav_roundtrip(tmp_path):
    from scipy.io import wavfile

    rng = np.random.default_rng(0)
    pcm = (rng.uniform(-0.5, 0.5, 8000) * 32767).astype(np.int16)
    path = tmp_path / "t.wav"
    wavfile.write(path, 16000, pcm)
    wav, sr = read_audio(path)
    assert sr == 16000
    np.testing.assert_allclose(wav[0], pcm.astype(np.float32) / 32768.0)
