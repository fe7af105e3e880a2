"""TBLogger (shared by Runner and WaveRunner, reference runner.py:42,430-446
tensorboardX scalars)."""

import os


def test_tblogger_writes_event_file(tmp_path):
    from speech_ssl_compression_tpu.utils.tb import TBLogger

    lg = TBLogger(str(tmp_path))
    lg.scalar("melhubert/train-loss", 1.25, 10)
    lg.scalar("melhubert/train-gradient norm", 0.5, 10)
    lg.close()
    try:
        import tensorboardX  # noqa: F401
    except Exception:
        return  # degraded no-op mode is the contract without tensorboardX
    assert any("tfevents" in f for f in os.listdir(tmp_path))


def test_tblogger_noop_without_writer(tmp_path):
    from speech_ssl_compression_tpu.utils import tb

    lg = tb.TBLogger(str(tmp_path))
    lg._writer = None  # simulate missing tensorboardX
    lg.scalar("x", 1.0, 1)  # must not raise
    lg.close()
