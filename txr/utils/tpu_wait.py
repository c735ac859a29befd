"""Bounded wait for a usable accelerator backend.

The bench box reaches its single v5e through the axon relay, which is
occasionally unavailable mid-rolling-upgrade: backend init then either
raises UNAVAILABLE or hangs indefinitely inside ``jax.devices()``
(observed 2026-08-18: ~90 min outage). ``bench.py`` and the driver's
``__graft_entry__.entry()`` compile check both run unattended at round
boundaries, so a transient outage at the wrong moment would zero the
round's artifacts.

``wait_for_backend`` probes backend init in a *subprocess* (so a hang is
killable via timeout) and retries until the probe succeeds or a deadline
passes. It never raises: after the deadline it returns False and the
caller proceeds, letting the real failure surface with its own traceback.
"""

import os
import subprocess
import sys
import time

_PROBE = (
    "import jax, jax.numpy as jnp\n"
    # float() forces a full device round trip; block_until_ready does not
    # block through the relay (CLAUDE.md).
    "v = float(jnp.sum(jnp.ones((8, 128))))\n"
    "print('probe-ok', jax.devices()[0], v)\n"
)


def wait_for_backend(max_wait_s=None, probe_timeout_s=120, log=None):
    """Block until a throwaway subprocess can run one op on the default
    JAX backend. Returns True if a probe succeeded, False on deadline.

    Controlled by TXR_WAIT_TPU_S (seconds, default 2700; 0 disables).
    The default is sized to the observed relay outages (2026-08-18: one
    ~90 min and one multi-hour window) — an unattended round-boundary
    bench that gives up early records a zero for the whole round, so
    waiting long is the cheaper failure mode.
    """
    if max_wait_s is None:
        max_wait_s = float(os.environ.get("TXR_WAIT_TPU_S", "2700"))
    if max_wait_s <= 0:
        return True
    if log is None:
        def log(msg):
            print(msg, file=sys.stderr, flush=True)

    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, "-c", _PROBE],
                capture_output=True, text=True, timeout=probe_timeout_s)
            if proc.returncode == 0 and "probe-ok" in proc.stdout:
                if attempt > 1:
                    log(f"tpu_wait: backend healthy after {attempt} probes")
                return True
            err = (proc.stderr or "").strip().splitlines()
            detail = err[-1] if err else f"rc={proc.returncode}"
        except subprocess.TimeoutExpired:
            detail = f"probe hung >{probe_timeout_s}s"
        remaining = deadline - time.time()
        if remaining <= 0:
            log(f"tpu_wait: backend still unavailable after {max_wait_s:.0f}s "
                f"({attempt} probes; last: {detail}) — proceeding anyway")
            return False
        log(f"tpu_wait: probe {attempt} failed ({detail}); "
            f"retrying, {remaining:.0f}s left")
        time.sleep(min(60, max(5, probe_timeout_s - (time.time() - t0))))
