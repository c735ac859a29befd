"""Compare pair_step + scale estimation CPU vs TPU on identical inputs.

Usage: python tools/probe_pair_precision.py [cpu|tpu] — dumps results to
/tmp/pair_probe_{cpu,tpu}.npz; run both, then `compare` to diff.
"""
import sys
import tempfile

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

mode = sys.argv[1] if len(sys.argv) > 1 else "cpu"

import jax

if mode == "cpu":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np


def compare():
    a = np.load("/tmp/pair_probe_cpu.npz")
    b = np.load("/tmp/pair_probe_tpu.npz")
    for k in a.files:
        x, y = a[k], b[k]
        if x.shape != y.shape:
            print(f"{k}: SHAPE {x.shape} vs {y.shape}")
            continue
        if x.dtype == bool:
            print(f"{k}: agree {(x == y).mean():.4f} (sum {x.sum()} vs {y.sum()})")
        else:
            d = np.abs(x.astype(np.float64) - y.astype(np.float64))
            print(f"{k}: max|d| {d.max():.3e}  cpu_norm {np.abs(x).max():.3e}")
    sys.exit(0)


if mode == "compare":
    compare()

from test_golden import build_scene, FX, FY, CX, CY
from txr.geometry.features import SIFTDetector, match_features
from txr.pipelines.fusion_pipeline import pair_step, sparse_to_world
from txr.geometry.scale import estimate_scale
import cv2
import os

td = tempfile.mkdtemp()
rgb_dir, dep_dir = build_scene(td)
img0 = cv2.imread(os.path.join(rgb_dir, "f_000.png"))
img1 = cv2.imread(os.path.join(rgb_dir, "f_001.png"))
dep1 = np.load(os.path.join(dep_dir, "f_001_depth.npy"))

det = SIFTDetector(capacity=4096, backend="cv2")
f0, f1 = det.detect(img0), det.detect(img1)
uv1, uv2, mask = match_features(f0, f1, ratio=0.75)
print("matches:", mask.sum())

K = jnp.asarray(np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]], np.float32))
key = jax.random.PRNGKey(7)
R, t, X, valid, n_inl = pair_step(jnp.asarray(uv1), jnp.asarray(uv2),
                                  jnp.asarray(mask), K, key,
                                  2.0, 0.1, 500.0)
s = estimate_scale(X @ jnp.asarray(R).T + jnp.asarray(t), jnp.asarray(uv2),
                   valid, jnp.asarray(dep1))
out = dict(R=np.asarray(R), t=np.asarray(t), X=np.asarray(X),
           valid=np.asarray(valid), n_inl=np.asarray(n_inl),
           scale=np.asarray(s), uv1=uv1, uv2=uv2, mask=mask)
np.savez(f"/tmp/pair_probe_{mode}.npz", **out)
print(mode, "n_inl:", int(n_inl), "scale:", float(s),
      "R[0]:", np.asarray(R)[0], "t:", np.asarray(t))
