"""Converter robustness at REAL model scale (VERDICT r1 item 6).

The round-1 oracle (tests/test_models.py) validated the HF-torch comparison
only on a 4-layer hidden-32 model. These tests exercise the converter at the
shapes the first real checkpoint load will see — ViT-L's 24 layers / hidden
1024 / real DPT neck dims (reference loader matrix:
/root/reference/depth_processor.py:209-285) — plus the original-DA naming
scheme (`pretrained.*`/`depth_head.*`) with fused qkv at 24 layers, and the
vitg SwiGLU path at its real depth of 40 layers.

Input resolution is kept small (56x56 -> 4x4 patches): the converter risk is
in layer counts / dims / naming, not sequence length.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# Full ViT-L/vitg-scale converter builds take minutes on the 1-CPU test
# box: slow tier (run once per round).
pytestmark = pytest.mark.slow

from txr.models.vit import ViTConfig
from txr.models.dpt import DPTConfig
from txr.models.depth_anything import DepthAnythingFlax, build_model
from txr.models.convert import convert_state_dict

torch = pytest.importorskip("torch")

VITL = dict(hidden=1024, layers=24, heads=16,
            out_indices=(5, 12, 18, 24), neck=(256, 512, 1024, 1024),
            fusion=256)


def make_vitl_pair(metric=False, perturb=0.02, seed=0):
    """Matched (torch, flax, params) at real ViT-L dims, 56x56 input."""
    from transformers import (DepthAnythingConfig,
                              DepthAnythingForDepthEstimation)
    from transformers.models.dinov2 import Dinov2Config

    c = VITL
    bc = Dinov2Config(
        hidden_size=c["hidden"], num_hidden_layers=c["layers"],
        num_attention_heads=c["heads"], patch_size=14, image_size=56,
        layerscale_value=1.0, out_indices=list(c["out_indices"]),
        apply_layernorm=True, reshape_hidden_states=False,
    )
    cfg = DepthAnythingConfig(
        backbone_config=bc, reassemble_hidden_size=c["hidden"],
        neck_hidden_sizes=list(c["neck"]), fusion_hidden_size=c["fusion"],
        head_hidden_size=32, patch_size=14,
        depth_estimation_type="metric" if metric else "relative",
        max_depth=20.0 if metric else 1,
    )
    torch.manual_seed(seed)
    tm = DepthAnythingForDepthEstimation(cfg).eval()
    # Small perturbation: at 24 residual layers a 0.1-sigma kick compounds
    # to overflow; 0.02 keeps activations O(1)-ish while still exposing any
    # layout/transpose bug (verified non-degenerate by the std assert below).
    with torch.no_grad():
        for p in tm.parameters():
            p.add_(torch.randn_like(p) * perturb)
        tm.head.conv3.bias.add_(1.0)

    vit = ViTConfig(hidden_size=c["hidden"], num_layers=c["layers"],
                    num_heads=c["heads"], patch_size=14, pos_embed_size=4,
                    out_layers=tuple(i - 1 for i in c["out_indices"]),
                    use_flash=False)
    dpt = DPTConfig(features=c["fusion"], out_channels=tuple(c["neck"]),
                    head_hidden=32, metric=metric, max_depth=20.0)
    fm = DepthAnythingFlax(vit=vit, dpt=dpt)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = convert_state_dict(sd, num_layers=c["layers"])
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return tm, fm, params, sd


@pytest.fixture(scope="module")
def vitl_pair():
    return make_vitl_pair()


class TestViTLFullScale:
    def test_forward_matches_hf(self, vitl_pair):
        tm, fm, params, _ = vitl_pair
        x = np.random.default_rng(0).normal(size=(1, 56, 56, 3)).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).predicted_depth.numpy()
        got = np.asarray(fm.apply({"params": params}, jnp.asarray(x)))
        assert got.shape == ref.shape
        assert ref.std() > 1e-3, "degenerate reference output — test is vacuous"
        np.testing.assert_allclose(got, ref, rtol=2e-3, atol=1e-3)

    def test_structure_matches_init(self, vitl_pair):
        """Converted tree must be drop-in for the model's own init tree."""
        _, fm, params, _ = vitl_pair
        init = fm.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 56, 56, 3), jnp.float32))["params"]
        flat_c = dict(jax.tree_util.tree_leaves_with_path(params))
        flat_i = dict(jax.tree_util.tree_leaves_with_path(init))
        assert flat_c.keys() == flat_i.keys()
        for k in flat_i:
            assert flat_c[k].shape == flat_i[k].shape, k

    def test_original_naming_fused_qkv_24_layers(self, vitl_pair):
        """Original-DA names with pre-fused qkv at real depth convert to the
        identical tree as HF names (the qkv concat order is the risk)."""
        _, _, params_hf, sd = vitl_pair
        orig = {}
        for i in range(VITL["layers"]):
            b = f"backbone.encoder.layer.{i}.attention.attention."
            orig[f"pretrained.blocks.{i}.attn.qkv.weight"] = np.concatenate(
                [sd[b + f"{n}.weight"] for n in ("query", "key", "value")], axis=0)
            orig[f"pretrained.blocks.{i}.attn.qkv.bias"] = np.concatenate(
                [sd[b + f"{n}.bias"] for n in ("query", "key", "value")])
        for k, v in sd.items():
            if ".attention.attention." in k:
                continue
            orig[_to_original(k)] = v
        params_o = convert_state_dict(orig, num_layers=VITL["layers"])
        flat_hf = jax.tree_util.tree_leaves_with_path(params_hf)
        flat_o = dict(jax.tree_util.tree_leaves_with_path(
            jax.tree_util.tree_map(np.asarray, params_o)))
        for path, leaf in flat_hf:
            np.testing.assert_array_equal(flat_o[path], np.asarray(leaf),
                                          err_msg=str(path))


def _to_original(k):
    """HF state-dict key → original-DA-repo key (inverse of the converter's
    _normalize_names; mirrors tests/test_models.py::to_original)."""
    k = (k.replace("backbone.embeddings.cls_token", "pretrained.cls_token")
          .replace("backbone.embeddings.position_embeddings", "pretrained.pos_embed")
          .replace("backbone.embeddings.patch_embeddings.projection.",
                   "pretrained.patch_embed.proj.")
          .replace("backbone.layernorm.", "pretrained.norm."))
    if k.startswith("backbone.encoder.layer."):
        rest = k[len("backbone.encoder.layer."):]
        i, sub = rest.split(".", 1)
        sub = (sub.replace("attention.output.dense.", "attn.proj.")
                  .replace("layer_scale1.lambda1", "ls1.gamma")
                  .replace("layer_scale2.lambda1", "ls2.gamma"))
        k = f"pretrained.blocks.{i}.{sub}"
    if k.startswith("neck.reassemble_stage.layers."):
        rest = k[len("neck.reassemble_stage.layers."):]
        i, sub = rest.split(".", 1)
        sub = sub.replace("projection.", "")
        if sub.startswith("resize."):
            k = f"depth_head.resize_layers.{i}.{sub[len('resize.'):]}"
        else:
            k = f"depth_head.projects.{i}.{sub}"
    if k.startswith("neck.convs."):
        i = int(k.split(".")[2])
        k = f"depth_head.scratch.layer{i + 1}_rn.weight"
    if k.startswith("neck.fusion_stage.layers."):
        rest = k[len("neck.fusion_stage.layers."):]
        j, sub = rest.split(".", 1)
        sub = (sub.replace("residual_layer1.", "resConfUnit1.")
                  .replace("residual_layer2.", "resConfUnit2.")
                  .replace("convolution1.", "conv1.")
                  .replace("convolution2.", "conv2.")
                  .replace("projection.", "out_conv."))
        k = f"depth_head.scratch.refinenet{4 - int(j)}.{sub}"
    if k.startswith("head.conv1."):
        k = k.replace("head.conv1.", "depth_head.scratch.output_conv1.")
    if k.startswith("head.conv2."):
        k = k.replace("head.conv2.", "depth_head.scratch.output_conv2.0.")
    if k.startswith("head.conv3."):
        k = k.replace("head.conv3.", "depth_head.scratch.output_conv2.2.")
    return k


class TestViTGSwiGLUDepth:
    def test_swiglu_40_layers_converts_and_runs(self):
        """Original-DA-named vitg-style dict (SwiGLU w12/w3, depth 40)
        converts to a tree structurally identical to the model's init and
        produces a finite forward. Dims are reduced (hidden 64) — the risk at
        vitg is naming/mapping over 40 SwiGLU blocks, not width."""
        layers, hidden, heads = 40, 64, 4
        # DINOv2 SwiGLU hidden: 2/3 of mlp hidden, rounded up to multiple of 8
        # (txr/models/vit.py:150).
        mlp_hidden = (int(hidden * 4 * 2 / 3) + 7) // 8 * 8
        vit = ViTConfig(hidden_size=hidden, num_layers=layers,
                        num_heads=heads, patch_size=14, pos_embed_size=4,
                        out_layers=(9, 19, 29, 39), use_swiglu=True,
                        use_flash=False)
        dpt = DPTConfig(features=32, out_channels=(16, 32, 64, 64),
                        head_hidden=16)
        fm = DepthAnythingFlax(vit=vit, dpt=dpt)
        init = fm.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 56, 56, 3), jnp.float32))["params"]

        rng = np.random.default_rng(0)

        def r(*shape):
            return (rng.normal(size=shape) * 0.02).astype(np.float32)

        sd = {
            "pretrained.cls_token": r(1, 1, hidden),
            "pretrained.pos_embed": r(1, 17, hidden),
            "pretrained.patch_embed.proj.weight": r(hidden, 3, 14, 14),
            "pretrained.patch_embed.proj.bias": r(hidden),
            "pretrained.norm.weight": 1 + r(hidden),
            "pretrained.norm.bias": r(hidden),
        }
        for i in range(layers):
            b = f"pretrained.blocks.{i}."
            sd[b + "norm1.weight"] = 1 + r(hidden)
            sd[b + "norm1.bias"] = r(hidden)
            sd[b + "norm2.weight"] = 1 + r(hidden)
            sd[b + "norm2.bias"] = r(hidden)
            sd[b + "attn.qkv.weight"] = r(3 * hidden, hidden)
            sd[b + "attn.qkv.bias"] = r(3 * hidden)
            sd[b + "attn.proj.weight"] = r(hidden, hidden)
            sd[b + "attn.proj.bias"] = r(hidden)
            sd[b + "ls1.gamma"] = 1 + r(hidden)
            sd[b + "ls2.gamma"] = 1 + r(hidden)
            sd[b + "mlp.w12.weight"] = r(2 * mlp_hidden, hidden)
            sd[b + "mlp.w12.bias"] = r(2 * mlp_hidden)
            sd[b + "mlp.w3.weight"] = r(hidden, mlp_hidden)
            sd[b + "mlp.w3.bias"] = r(hidden)
        oc = dpt.out_channels
        for i in range(4):
            sd[f"depth_head.projects.{i}.weight"] = r(oc[i], hidden, 1, 1)
            sd[f"depth_head.projects.{i}.bias"] = r(oc[i])
            sd[f"depth_head.scratch.layer{i + 1}_rn.weight"] = r(
                dpt.features, oc[i], 3, 3)
        sd["depth_head.resize_layers.0.weight"] = r(oc[0], oc[0], 4, 4)
        sd["depth_head.resize_layers.0.bias"] = r(oc[0])
        sd["depth_head.resize_layers.1.weight"] = r(oc[1], oc[1], 2, 2)
        sd["depth_head.resize_layers.1.bias"] = r(oc[1])
        sd["depth_head.resize_layers.3.weight"] = r(oc[3], oc[3], 3, 3)
        sd["depth_head.resize_layers.3.bias"] = r(oc[3])
        for n in range(1, 5):
            f = f"depth_head.scratch.refinenet{n}."
            sd[f + "out_conv.weight"] = r(dpt.features, dpt.features, 1, 1)
            sd[f + "out_conv.bias"] = r(dpt.features)
            for rcu in ("resConfUnit1.", "resConfUnit2."):
                for cv in ("conv1.", "conv2."):
                    sd[f + rcu + cv + "weight"] = r(
                        dpt.features, dpt.features, 3, 3)
                    sd[f + rcu + cv + "bias"] = r(dpt.features)
        sd["depth_head.scratch.output_conv1.weight"] = r(
            dpt.features // 2, dpt.features, 3, 3)
        sd["depth_head.scratch.output_conv1.bias"] = r(dpt.features // 2)
        sd["depth_head.scratch.output_conv2.0.weight"] = r(
            dpt.head_hidden, dpt.features // 2, 3, 3)
        sd["depth_head.scratch.output_conv2.0.bias"] = r(dpt.head_hidden)
        sd["depth_head.scratch.output_conv2.2.weight"] = r(
            1, dpt.head_hidden, 1, 1)
        sd["depth_head.scratch.output_conv2.2.bias"] = 1 + r(1)

        params = convert_state_dict(sd, num_layers=layers)
        flat_c = dict(jax.tree_util.tree_leaves_with_path(
            jax.tree_util.tree_map(np.asarray, params)))
        flat_i = dict(jax.tree_util.tree_leaves_with_path(init))
        assert flat_c.keys() == flat_i.keys()
        for k in flat_i:
            assert flat_c[k].shape == flat_i[k].shape, k

        out = fm.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                       jnp.zeros((1, 56, 56, 3), jnp.float32))
        assert out.shape == (1, 56, 56)
        assert np.isfinite(np.asarray(out)).all()

    def test_real_vitg_registry_init_structure(self):
        """The real vitg registry model's init tree has the SwiGLU params the
        converter emits (guards registry/converter divergence without paying
        for a 1.1B-param init: structure from eval_shape only)."""
        model, vit, dpt = build_model("v2", "vitg")
        shapes = jax.eval_shape(
            lambda k: model.init(k, jnp.zeros((1, 56, 56, 3), jnp.float32)),
            jax.random.PRNGKey(0))["params"]
        b0 = shapes["encoder"]["block_0"]["mlp"]
        assert "w12" in b0 and "w3" in b0
        assert b0["w12"]["kernel"].shape == (1536, 2 * 4096)
        assert b0["w3"]["kernel"].shape == (4096, 1536)
        assert "block_39" in shapes["encoder"]
