"""txr/utils/tpu_wait.py — bounded backend-availability wait.

The probe body is swapped for stand-ins so the test exercises the retry /
deadline / hang-kill machinery without depending on any real backend (the
axon relay's health is exactly what this helper exists to ride out).
"""

import time

import pytest

from txr.utils import tpu_wait


class TestWaitForBackend:
    def test_success_first_probe(self, monkeypatch):
        monkeypatch.setattr(tpu_wait, "_PROBE", "print('probe-ok mock 1.0')")
        assert tpu_wait.wait_for_backend(max_wait_s=30, probe_timeout_s=10)

    def test_deadline_returns_false(self, monkeypatch):
        monkeypatch.setattr(tpu_wait, "_PROBE", "import sys; sys.exit(3)")
        msgs = []
        t0 = time.time()
        ok = tpu_wait.wait_for_backend(max_wait_s=1, probe_timeout_s=10,
                                       log=msgs.append)
        assert not ok
        assert time.time() - t0 < 30
        assert any("proceeding anyway" in m for m in msgs)

    def test_hung_probe_is_killed(self, monkeypatch):
        monkeypatch.setattr(tpu_wait, "_PROBE",
                            "import time; time.sleep(600)")
        msgs = []
        t0 = time.time()
        ok = tpu_wait.wait_for_backend(max_wait_s=1, probe_timeout_s=3,
                                       log=msgs.append)
        assert not ok
        assert time.time() - t0 < 30, "hung probe was not killed by timeout"
        assert any("hung" in m for m in msgs)

    def test_disabled_by_env(self, monkeypatch):
        monkeypatch.setenv("TXR_WAIT_TPU_S", "0")
        # Would loop if the (failing) probe ran; disabled path returns
        # immediately without spawning anything.
        monkeypatch.setattr(tpu_wait, "_PROBE", "import sys; sys.exit(1)")
        t0 = time.time()
        assert tpu_wait.wait_for_backend()
        assert time.time() - t0 < 1
