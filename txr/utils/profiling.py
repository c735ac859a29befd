"""Profiling and throughput instrumentation.

The reference's only observability is an FPS counter logged every 10 frames
(depth_processor.py:892-895) — kept by the pipelines. This module adds the
TPU-side story: jax.profiler traces gated by TXR_TRACE_DIR, and an
FPSCounter with the same every-N logging contract.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def maybe_trace(name: str = "txr"):
    """Capture a jax.profiler trace when TXR_TRACE_DIR is set.

    View with: tensorboard --logdir $TXR_TRACE_DIR (or xprof).
    """
    trace_dir = os.environ.get("TXR_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    path = os.path.join(trace_dir, name)
    os.makedirs(path, exist_ok=True)
    with jax.profiler.trace(path):
        logger.info("jax.profiler trace -> %s", path)
        yield


class FPSCounter:
    """Wall-clock FPS with every-N logging (reference contract)."""

    def __init__(self, log_every: int = 10, name: str = "pipeline"):
        self.log_every = log_every
        self.name = name
        self.count = 0
        self.start = time.time()

    def tick(self) -> float:
        self.count += 1
        elapsed = max(time.time() - self.start, 1e-9)
        fps = self.count / elapsed
        if self.count % self.log_every == 0:
            logger.info("%s: processed %d frames (%.1f fps)",
                        self.name, self.count, fps)
        return fps

    def summary(self) -> str:
        elapsed = max(time.time() - self.start, 1e-9)
        return (f"{self.name}: {self.count} frames in {elapsed:.1f}s "
                f"({self.count / elapsed:.1f} fps)")
