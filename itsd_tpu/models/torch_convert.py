"""Convert reference PyTorch UNet checkpoints into itsd_tpu UNet params.

Loads state dicts produced by the reference's training loops
(`/root/reference/Diffusion/Model.py` UNet and
`/root/reference/DiffusionFreeGuidence/ModelCondition.py` UNet) into this
framework's parameter pytree — including the `module.`-prefix stripping the
reference needs for DataParallel checkpoints (`Train.py:562-574`,
`abstract_metrics…py:152-160`).

Layout conversions: conv OIHW -> HWIO; ConvTranspose2d (in,out,kh,kw) ->
(kh,kw,in,out); Linear (out,in) -> (in,out); 1x1 attention convs -> Dense
kernels; GroupNorm weight/bias -> scale/bias. Parity is verified end-to-end
in tests/test_torch_parity.py against the actual reference model.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from .unet import UNetConfig


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def strip_module_prefix(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Remove DataParallel's 'module.' prefix (`Train.py:562-574`)."""
    if any(k.startswith("module.") for k in sd):
        return {k[len("module."):] if k.startswith("module.") else k: v
                for k, v in sd.items()}
    return sd


def _conv(sd, name):
    return {"kernel": jnp.asarray(_np(sd[f"{name}.weight"])
                                  .transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(_np(sd[f"{name}.bias"]))}


def _conv1x1_as_dense(sd, name):
    w = _np(sd[f"{name}.weight"])  # [out, in, 1, 1]
    return {"kernel": jnp.asarray(w[:, :, 0, 0].T),
            "bias": jnp.asarray(_np(sd[f"{name}.bias"]))}


def _dense(sd, name):
    return {"kernel": jnp.asarray(_np(sd[f"{name}.weight"]).T),
            "bias": jnp.asarray(_np(sd[f"{name}.bias"]))}


def _gn(sd, name):
    return {"scale": jnp.asarray(_np(sd[f"{name}.weight"])),
            "bias": jnp.asarray(_np(sd[f"{name}.bias"]))}


def _conv_transpose(sd, name):
    w = _np(sd[f"{name}.weight"])  # torch: [in, out, kh, kw]
    return {"kernel": jnp.asarray(w.transpose(2, 3, 0, 1)),
            "bias": jnp.asarray(_np(sd[f"{name}.bias"]))}


def _resblock(sd, prefix, conditional, has_shortcut, has_attn):
    p = {
        "norm1": _gn(sd, f"{prefix}.block1.0"),
        "conv1": _conv(sd, f"{prefix}.block1.2"),
        "temb_proj": _dense(sd, f"{prefix}.temb_proj.1"),
        "norm2": _gn(sd, f"{prefix}.block2.0"),
        "conv2": _conv(sd, f"{prefix}.block2.3"),
    }
    if conditional:
        p["cond_proj"] = _dense(sd, f"{prefix}.cond_proj.1")
    if has_shortcut:
        p["shortcut"] = _conv1x1_as_dense(sd, f"{prefix}.shortcut")
    if has_attn:
        p["attn"] = {
            "norm": _gn(sd, f"{prefix}.attn.group_norm"),
            "q": _conv1x1_as_dense(sd, f"{prefix}.attn.proj_q"),
            "k": _conv1x1_as_dense(sd, f"{prefix}.attn.proj_k"),
            "v": _conv1x1_as_dense(sd, f"{prefix}.attn.proj_v"),
            "proj": _conv1x1_as_dense(sd, f"{prefix}.attn.proj"),
        }
    return p


def convert_reference_unet(sd: Dict[str, Any], cfg: UNetConfig) -> Dict:
    """Reference UNet state_dict -> our {'params': ...} pytree.

    Walks the exact construction order of both reference constructors
    (`Model.py:212-257`, `ModelCondition.py:164-203`) to map the flat
    `downblocks.{i}` / `upblocks.{i}` indices onto our named modules.
    """
    sd = strip_module_prefix(sd)
    cond = cfg.conditional
    params: Dict[str, Any] = {}

    # time embedding
    if cfg.time_embed == "functional":
        params["time_embedding"] = {"mlp": {
            "fc1": _dense(sd, "time_embedding.timembedding.0"),
            "fc2": _dense(sd, "time_embedding.timembedding.2"),
        }}
    else:
        params["time_embedding"] = {
            "table": jnp.asarray(
                _np(sd["time_embedding.timembedding.0.weight"])),
            "mlp": {
                "fc1": _dense(sd, "time_embedding.timembedding.1"),
                "fc2": _dense(sd, "time_embedding.timembedding.3"),
            },
        }
    if cond:
        params["cond_embedding"] = {
            "table": jnp.asarray(
                _np(sd["cond_embedding.condEmbedding.0.weight"])),
            "mlp": {
                "fc1": _dense(sd, "cond_embedding.condEmbedding.1"),
                "fc2": _dense(sd, "cond_embedding.condEmbedding.3"),
            },
        }

    params["head"] = _conv(sd, "head")

    # down path — replicate the constructors' skip-channel bookkeeping
    # (`Model.py:220-233`) so shortcut presence is computed exactly
    chs = [cfg.ch]
    idx = 0
    now_ch = cfg.ch
    for i, mult in enumerate(cfg.ch_mult):
        out_ch = cfg.ch * mult
        for j in range(cfg.num_res_blocks):
            attn = cfg.down_attn_all or (i in cfg.attn)
            params[f"down_{i}_{j}"] = _resblock(
                sd, f"downblocks.{idx}", cond,
                has_shortcut=(now_ch != out_ch), has_attn=attn)
            now_ch = out_ch
            chs.append(now_ch)
            idx += 1
        if i != len(cfg.ch_mult) - 1:
            ds = {}
            if cfg.down_type == "conv":
                ds["c1"] = _conv(sd, f"downblocks.{idx}.main")
            else:
                ds["c1"] = _conv(sd, f"downblocks.{idx}.c1")
                ds["c2"] = _conv(sd, f"downblocks.{idx}.c2")
            params[f"down_{i}_ds"] = ds
            chs.append(now_ch)
            idx += 1

    # middle: mid_0 has attention, mid_1 does not; in/out channels equal
    params["mid_0"] = _resblock(sd, "middleblocks.0", cond, False, True)
    params["mid_1"] = _resblock(sd, "middleblocks.1", cond, False, False)

    # up path: in_ch = skip + now_ch per constructor (`Model.py:240-249`)
    idx = 0
    for i, mult in reversed(list(enumerate(cfg.ch_mult))):
        out_ch = cfg.ch * mult
        for j in range(cfg.num_res_blocks + 1):
            attn = cfg.up_attn and (i in cfg.attn)
            in_ch = chs.pop() + now_ch
            params[f"up_{i}_{j}"] = _resblock(
                sd, f"upblocks.{idx}", cond,
                has_shortcut=(in_ch != out_ch), has_attn=attn)
            now_ch = out_ch
            idx += 1
        if i != 0:
            us = {}
            if cfg.up_type == "nearest_conv":
                us["c"] = _conv(sd, f"upblocks.{idx}.main")
            else:
                us["t"] = _conv_transpose(sd, f"upblocks.{idx}.t")
                us["c"] = _conv(sd, f"upblocks.{idx}.c")
            params[f"up_{i}_us"] = us
            idx += 1

    params["tail_norm"] = _gn(sd, "tail.0")
    params["tail_conv"] = _conv(sd, "tail.2")
    return {"params": params}


def load_reference_checkpoint(path: str, cfg: UNetConfig) -> Dict:
    """Load a torch `.pt` checkpoint file saved by the reference loops
    (handles both bare state dicts and {'state_dict': ...} wrappers,
    `abstract_metrics…py:126-160`)."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return convert_reference_unet(sd, cfg)
