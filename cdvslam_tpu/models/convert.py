"""Torch-checkpoint -> flax parameter conversion.

Maps the reference's state_dict names (reference: cdvslam/net_cdv.py /
net_dpv.py module trees, checkpoints like cdv_dinov2.pth) onto this
framework's flax parameter tree so published weights run unmodified.

Conventions:
  torch Linear weight (out, in)        -> flax Dense kernel (in, out): .T
  torch Conv2d weight (out, in, kh, kw)-> flax Conv kernel (kh, kw, in, out)
  torch LayerNorm weight/bias          -> flax scale/bias
  torch BatchNorm running stats        -> flax batch_stats mean/var
"""
from __future__ import annotations

import numpy as np


def _lin(sd, name):
    w = np.asarray(sd[f"{name}.weight"], np.float32).T
    out = {"kernel": w}
    if f"{name}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{name}.bias"], np.float32)
    return out


def _conv(sd, name):
    w = np.asarray(sd[f"{name}.weight"], np.float32).transpose(2, 3, 1, 0)
    out = {"kernel": w}
    if f"{name}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{name}.bias"], np.float32)
    return out


def _ln(sd, name):
    return {
        "scale": np.asarray(sd[f"{name}.weight"], np.float32),
        "bias": np.asarray(sd[f"{name}.bias"], np.float32),
    }


def _mlp2(sd, name):
    # torch Sequential(Linear, ReLU, Linear) -> MLP2 {Dense_0, Dense_1}
    return {"Dense_0": _lin(sd, f"{name}.0"), "Dense_1": _lin(sd, f"{name}.2")}


def convert_update_cdv(sd, prefix="update."):
    """Update (CDV 'pa' variant) weights (reference net_cdv.py:29-95)."""
    p = prefix
    common = {
        "corr_0": _lin(sd, f"{p}corr.0"),
        "corr_2": _lin(sd, f"{p}corr.2"),
        "corr_3": _ln(sd, f"{p}corr.3"),
        "corr_5": _lin(sd, f"{p}corr.5"),
        "norm": _ln(sd, f"{p}norm"),
        "c1": _mlp2(sd, f"{p}c1"),
        "c2": _mlp2(sd, f"{p}c2"),
        "agg_kk": {
            "Dense_0": _lin(sd, f"{p}agg_kk.f"),
            "Dense_1": _lin(sd, f"{p}agg_kk.g"),
            "Dense_2": _lin(sd, f"{p}agg_kk.h"),
        },
    }
    enc = f"{p}gatten.encoder."
    gatten = {
        "gate": _lin(sd, f"{p}gatten.gate.0"),
        "encoder": {
            "q_proj": _lin(sd, f"{enc}q_proj"),
            "k_proj": _lin(sd, f"{enc}k_proj"),
            "v_proj": _lin(sd, f"{enc}v_proj"),
            "merge": _lin(sd, f"{enc}merge"),
            "norm1": _ln(sd, f"{enc}norm1"),
            "norm2": _ln(sd, f"{enc}norm2"),
            "mlp_0": _lin(sd, f"{enc}mlp.0"),
            "mlp_2": _lin(sd, f"{enc}mlp.2"),
        },
    }
    heads = {"d": _lin(sd, f"{p}d.1"), "w": _lin(sd, f"{p}w.1")}
    return {
        "update_op": {
            "common": common,
            "norm2": _ln(sd, f"{p}norm2"),
            "gatten": gatten,
            "heads": heads,
        }
    }


def convert_update_dpv(sd, prefix="update."):
    """Update (DPVO variant) weights (reference net_dpv.py:27-92)."""
    p = prefix
    common = {
        "corr_0": _lin(sd, f"{p}corr.0"),
        "corr_2": _lin(sd, f"{p}corr.2"),
        "corr_3": _ln(sd, f"{p}corr.3"),
        "corr_5": _lin(sd, f"{p}corr.5"),
        "norm": _ln(sd, f"{p}norm"),
        "c1": _mlp2(sd, f"{p}c1"),
        "c2": _mlp2(sd, f"{p}c2"),
        "agg_kk": {
            "Dense_0": _lin(sd, f"{p}agg_kk.f"),
            "Dense_1": _lin(sd, f"{p}agg_kk.g"),
            "Dense_2": _lin(sd, f"{p}agg_kk.h"),
        },
    }

    def gated_res(name):
        return {
            "Dense_0": _lin(sd, f"{name}.gate.0"),
            "Dense_1": _lin(sd, f"{name}.res.0"),
            "Dense_2": _lin(sd, f"{name}.res.2"),
        }

    return {
        "update_op": {
            "common": common,
            "agg_ij": {
                "Dense_0": _lin(sd, f"{p}agg_ij.f"),
                "Dense_1": _lin(sd, f"{p}agg_ij.g"),
                "Dense_2": _lin(sd, f"{p}agg_ij.h"),
            },
            "LayerNorm_0": _ln(sd, f"{p}gru.0"),
            "GatedResidual_0": gated_res(f"{p}gru.1"),
            "LayerNorm_1": _ln(sd, f"{p}gru.2"),
            "GatedResidual_1": gated_res(f"{p}gru.3"),
            "heads": {"d": _lin(sd, f"{p}d.1"), "w": _lin(sd, f"{p}w.1")},
        }
    }


def _resblock(sd, name, norm_fn):
    out = {
        "Conv_0": _conv(sd, f"{name}.conv1"),
        "Conv_1": _conv(sd, f"{name}.conv2"),
    }
    if norm_fn == "instance":
        pass  # InstanceNorm2d default affine=False: no params
    # downsample
    if f"{name}.downsample.0.weight" in sd:
        out["Conv_2"] = _conv(sd, f"{name}.downsample.0")
    return out


def convert_encoder4(sd, prefix, norm_fn="instance"):
    """BasicEncoder4 (reference extractor.py:207-271)."""
    blocks = {}
    names = [(f"{prefix}layer1.0", "ResidualBlock_0"),
             (f"{prefix}layer1.1", "ResidualBlock_1"),
             (f"{prefix}layer2.0", "ResidualBlock_2"),
             (f"{prefix}layer2.1", "ResidualBlock_3")]
    for tname, fname in names:
        blocks[fname] = _resblock(sd, tname, norm_fn)
    return {
        "Conv_0": _conv(sd, f"{prefix}conv1"),
        **blocks,
        "Conv_1": _conv(sd, f"{prefix}conv2"),
    }


def convert_dino(sd, prefix="patchify.dino."):
    """DINOv2 ViT-S/14 (reference DINO_modules/dinov2.py)."""
    p = prefix
    out = {
        "patch_embed": _conv(sd, f"{p}patch_embed.proj"),
        "norm": _ln(sd, f"{p}norm"),
    }
    out["cls_token"] = np.asarray(sd[f"{p}cls_token"], np.float32)
    out["pos_embed"] = np.asarray(sd[f"{p}pos_embed"], np.float32)
    # blocks may be chunked (blocks.0.i.*) or flat (blocks.i.*)
    for i in range(12):
        base = f"{p}blocks.{i}."
        if f"{base}norm1.weight" not in sd:
            base = f"{p}blocks.0.{i}."
        out[f"block{i}"] = {
            "norm1": _ln(sd, f"{base}norm1"),
            "attn": {
                "qkv": _lin(sd, f"{base}attn.qkv"),
                "proj": _lin(sd, f"{base}attn.proj"),
            },
            "ls1": {"gamma": np.asarray(sd[f"{base}ls1.gamma"], np.float32)},
            "norm2": _ln(sd, f"{base}norm2"),
            "mlp": {
                "fc1": _lin(sd, f"{base}mlp.fc1"),
                "fc2": _lin(sd, f"{base}mlp.fc2"),
            },
            "ls2": {"gamma": np.asarray(sd[f"{base}ls2.gamma"], np.float32)},
        }
    return out


def convert_xfeat(sd, prefix="patchify.xfeat."):
    """XFeat blocks 1-2 + skip (reference net_cdv.py:158-205).

    BatchNorm2d(affine=False) keeps only running stats -> batch_stats.
    """
    p = prefix

    def basic(name):
        return {"Conv_0": _conv(sd, f"{name}.layer.0")}

    def basic_stats(name):
        return {"BatchNorm_0": {
            "mean": np.asarray(sd[f"{name}.layer.1.running_mean"], np.float32),
            "var": np.asarray(sd[f"{name}.layer.1.running_var"], np.float32),
        }}

    params = {
        "block1_0": basic(f"{p}block1.0"),
        "block1_1": basic(f"{p}block1.1"),
        "block1_2": basic(f"{p}block1.2"),
        "block1_3": basic(f"{p}block1.3"),
        "skip1": _conv(sd, f"{p}skip1.1"),
        "block2_0": basic(f"{p}block2.0"),
        "block2_1": basic(f"{p}block2.1"),
    }
    stats = {
        "block1_0": basic_stats(f"{p}block1.0"),
        "block1_1": basic_stats(f"{p}block1.1"),
        "block1_2": basic_stats(f"{p}block1.2"),
        "block1_3": basic_stats(f"{p}block1.3"),
        "block2_0": basic_stats(f"{p}block2.0"),
        "block2_1": basic_stats(f"{p}block2.1"),
    }
    return params, stats


def load_torch_checkpoint(path, version="cdv"):
    """Load a reference .pth checkpoint into this framework's param tree."""
    import torch

    sd = torch.load(path, map_location="cpu")
    sd = {k.replace("module.", ""): v.numpy() if hasattr(v, "numpy") else v
          for k, v in sd.items() if "update.lmbda" not in k}

    if version == "cdv":
        xf_params, xf_stats = convert_xfeat(sd)
        params = {
            "xfeat_f": {"xfeat": xf_params},
            "dino": convert_dino(sd),
            **convert_update_cdv(sd),
            "posenc_mod": {"Dense_0": _lin(sd, "posenc.Wr")},
        }
        if "patchify.dino_adapter.weight" in sd:
            params["dino_adapter"] = _lin(sd, "patchify.dino_adapter")
        if "patchify.score.0.weight" in sd:
            # optional score head (reference net_cdv.py:179-184)
            params["score_head"] = {
                "layers_0": _lin(sd, "patchify.score.0"),
                "layers_2": _lin(sd, "patchify.score.2"),
            }
        batch_stats = {"xfeat_f": {"xfeat": xf_stats}}
        return {"params": params, "batch_stats": batch_stats}

    params = {
        "fnet": convert_encoder4(sd, "patchify.fnet.", "instance"),
        "inet": convert_encoder4(sd, "patchify.inet.", "none"),
        **convert_update_dpv(sd),
    }
    return {"params": params}


def load_seg_head(path):
    """SegHeadFlatten checkpoint (BatchNorm1d + Linear) -> flax variables."""
    import torch

    sd = {k: v.numpy() for k, v in torch.load(path, map_location="cpu").items()}
    return {
        "params": {
            "bn": {"scale": sd["bn.weight"], "bias": sd["bn.bias"]},
            "linear": _lin(sd, "linear"),
        },
        "batch_stats": {
            "bn": {"mean": sd["bn.running_mean"], "var": sd["bn.running_var"]},
        },
    }


def load_depth_head(path):
    """DepthHeadFlatten checkpoint (Linear) -> flax variables."""
    import torch

    sd = {k: v.numpy() for k, v in torch.load(path, map_location="cpu").items()}
    return {"params": {"linear": _lin(sd, "linear")}}


def _convT(sd, name):
    """torch ConvTranspose2d (I, O, kh, kw) -> flax ConvTranspose kernel
    (kh, kw, I, O), spatially flipped (flax conv_transpose does not flip)."""
    w = np.asarray(sd[f"{name}.weight"], np.float32)
    out = {"kernel": w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy()}
    if f"{name}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{name}.bias"], np.float32)
    return out


def load_dpt_head(path):
    """DPT depth-head checkpoint (dinov2_vits14_nyu_dpt_head.pth) -> flax
    variables for models.dpt.DPTHead.

    Key mapping follows reference slam.py:170-177 (strip 'decode_head.')
    and DINO_modules/hub/dpt/depth_head_mm.py module names.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu")
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    sd = {k.replace("decode_head.", ""): v.numpy() for k, v in ckpt.items()}

    ra = "reassemble_blocks."
    reassemble = {}
    for i in range(4):
        reassemble[f"readout{i}"] = _lin(sd, f"{ra}readout_projects.{i}.0")
        reassemble[f"project{i}"] = _conv(sd, f"{ra}projects.{i}.conv")
    reassemble["up4"] = _convT(sd, f"{ra}resize_layers.0")
    reassemble["up2"] = _convT(sd, f"{ra}resize_layers.1")
    reassemble["down2"] = _conv(sd, f"{ra}resize_layers.3")

    def _pre_act_unit(prefix):
        return {"conv1": _conv(sd, f"{prefix}.conv1.conv"),
                "conv2": _conv(sd, f"{prefix}.conv2.conv")}

    params = {"reassemble": reassemble}
    for i in range(4):
        params[f"conv{i}"] = _conv(sd, f"convs.{i}.conv")
        fu = {"project": _conv(sd, f"fusion_blocks.{i}.project.conv"),
              "res2": _pre_act_unit(f"fusion_blocks.{i}.res_conv_unit2")}
        if i > 0:  # fusion_blocks[0].res_conv_unit1 = None (depth_head_mm.py:267)
            fu["res1"] = _pre_act_unit(f"fusion_blocks.{i}.res_conv_unit1")
        params[f"fusion{i}"] = fu
    params["project"] = _conv(sd, "project.conv")
    params["head0"] = _conv(sd, "conv_depth.head.0")
    params["head2"] = _conv(sd, "conv_depth.head.2")
    params["head4"] = _conv(sd, "conv_depth.head.4")
    return {"params": params}
