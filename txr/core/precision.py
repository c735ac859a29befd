"""Full-f32 matmul precision for the geometry path.

On TPU, float32 matmuls run on the MXU at DEFAULT precision, which
truncates the inputs to bfloat16 (8 mantissa bits) before multiplying.
That is the right trade for the depth network (bf16 by design) and the
fusion ops (distance statistics), but it is catastrophic for the sparse
geometry stack: normal equations (A^T A), DLT triangulation, Sampson
residuals, and Gauss-Newton steps lose ~3 significant digits before the
solve even starts. Measured on the golden scene (round 4): the fusion CLI
recovered depth scale 64.7 on the TPU vs 59.92 on CPU — an 8% metric-scale
error with a 3% per-view spread that triple-images every fused plane —
purely from bf16 matmul inputs.

`f32_dots` wraps a function so everything traced inside it uses
jax.default_matmul_precision("highest") (full float32 on the MXU via
multi-pass bf16). Apply it UNDER jax.jit:

    @jax.jit
    @f32_dots
    def fn(...)

so `fn.__wrapped__` (the `_raw` composition pattern used by the pipelines)
still carries the precision context. The geometry matrices are tiny —
the extra MXU passes are noise next to a single dispatch.
"""

from __future__ import annotations

from functools import wraps

import jax


def f32_dots(fn):
    """Trace-time decorator: full-f32 matmul/conv precision inside ``fn``.

    TXR_F32_DOTS=0 disables the context (bench attribution only — it
    reintroduces the 8% TPU metric-scale error; never ship with it set)."""
    import os
    if os.environ.get("TXR_F32_DOTS", "1") == "0":
        return fn

    @wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapper
