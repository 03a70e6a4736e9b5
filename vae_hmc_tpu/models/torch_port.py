"""Import reference torch checkpoints / state_dicts into the Flax models.

The reference trains torch modules and saves ``.pt`` checkpoints
(scripts/06:347 raw state_dict; 12:282-285 {"model": sd, "cfg", "feat_hw",
"lyr_dim"}; 19:248-264 {"state_dict": sd, <architecture metadata>}; script 22
trains its AE inline without saving).  A user switching to this framework can
load those checkpoints directly: every function here maps a torch state_dict
(as a name -> numpy array dict) onto the corresponding Flax parameter tree.

The mappings are exact, not approximate:
  - ``nn.Linear`` weight (out, in)            -> Dense kernel (in, out): transpose.
  - ``nn.Conv2d`` weight (out, in, kh, kw)    -> Conv kernel (kh, kw, in, out).
  - ``nn.ConvTranspose2d`` weight
    (in, out, kh, kw)                         -> ConvTranspose kernel
    (kh, kw, in, out) with BOTH spatial axes flipped: torch's transposed conv
    is the gradient of a correlation, while flax/lax ``conv_transpose``
    (transpose_kernel=False) is a fractionally-strided correlation — the two
    differ by a spatial flip.  Verified to 1e-7 against torch (and gated by
    tests/test_torch_oracle.py).
  - The conv<->FC seam in ConvMMVAE additionally permutes the flattened
    feature axis: torch flattens NCHW (channel-major, reference 12:105), the
    NHWC redesign flattens (H, W, C) — the FC kernel rows/cols are reordered
    by that permutation so the composite function is identical.

Because every mapping is a permutation/transpose, applying the SAME mapping
to torch parameter *gradients* yields the Flax parameter gradients — the
oracle test uses this to diff backward passes as well.

torch itself is only needed for ``load_torch_checkpoint`` (reading ``.pt``
files); the array mappings are pure numpy.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

Array = np.ndarray
StateDict = Dict[str, Array]


# --------------------------------------------------------------------------
# primitive layer mappings
# --------------------------------------------------------------------------

def linear(sd: StateDict, prefix: str) -> Dict[str, Array]:
    """torch nn.Linear '<prefix>.weight/.bias' -> Dense {kernel, bias}."""
    w = np.asarray(sd[f"{prefix}.weight"], np.float32)
    out = {"kernel": np.ascontiguousarray(w.T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"], np.float32)
    return out


def conv2d(sd: StateDict, prefix: str) -> Dict[str, Array]:
    """torch nn.Conv2d (out, in, kh, kw) -> flax Conv (kh, kw, in, out)."""
    w = np.asarray(sd[f"{prefix}.weight"], np.float32)
    return {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
            "bias": np.asarray(sd[f"{prefix}.bias"], np.float32)}


def conv_transpose2d(sd: StateDict, prefix: str) -> Dict[str, Array]:
    """torch nn.ConvTranspose2d (in, out, kh, kw) -> flax ConvTranspose
    (kh, kw, in, out), spatially flipped (see module docstring)."""
    w = np.asarray(sd[f"{prefix}.weight"], np.float32)
    k = w.transpose(2, 3, 0, 1)[::-1, ::-1]
    return {"kernel": np.ascontiguousarray(k),
            "bias": np.asarray(sd[f"{prefix}.bias"], np.float32)}


def linear_after_nchw_flatten(sd: StateDict, prefix: str,
                              chw: Tuple[int, int, int]) -> Dict[str, Array]:
    """Linear whose torch input is ``conv_out.flatten(1)`` of an NCHW tensor
    (reference 12:105): reorder kernel rows from (C,H,W) to (H,W,C) flatten
    order so it consumes the NHWC flatten instead."""
    c, h, w_ = chw
    w = np.asarray(sd[f"{prefix}.weight"], np.float32)      # (out, C*H*W)
    out_f = w.shape[0]
    k = w.reshape(out_f, c, h, w_).transpose(2, 3, 1, 0).reshape(h * w_ * c, out_f)
    return {"kernel": np.ascontiguousarray(k),
            "bias": np.asarray(sd[f"{prefix}.bias"], np.float32)}


def linear_before_nchw_reshape(sd: StateDict, prefix: str,
                               chw: Tuple[int, int, int]) -> Dict[str, Array]:
    """Linear whose torch OUTPUT is ``.view(B, C, H, W)`` (reference 12:142):
    reorder kernel columns and bias from (C,H,W) to (H,W,C) order so the NHWC
    reshape sees identical values."""
    c, h, w_ = chw
    w = np.asarray(sd[f"{prefix}.weight"], np.float32)      # (C*H*W, in)
    in_f = w.shape[1]
    k = w.reshape(c, h, w_, in_f).transpose(3, 1, 2, 0).reshape(in_f, h * w_ * c)
    b = np.asarray(sd[f"{prefix}.bias"], np.float32)
    b = b.reshape(c, h, w_).transpose(1, 2, 0).reshape(-1)
    return {"kernel": np.ascontiguousarray(k), "bias": np.ascontiguousarray(b)}


# --------------------------------------------------------------------------
# per-model state_dict -> Flax param tree
# --------------------------------------------------------------------------

def dense_vae_params(sd: StateDict) -> dict:
    """Easy-tier MLPVAE (reference 06:145-179) AND hard-tier MLPVAE/CVAE
    (19:64-121) -> DenseVAE params.  Handles both naming conventions:
    06 uses enc1/enc2/..., 19 wraps layers in nn.Sequential (enc.0/enc.2,
    dec.0/dec.2/dec.4)."""
    if "enc1.weight" in sd:       # script 06 convention
        names = {"enc1": "enc1", "enc2": "enc2", "mu": "mu",
                 "logvar": "logvar", "dec1": "dec1", "dec2": "dec2",
                 "out": "out"}
    else:                          # script 19 convention (also CVAE)
        names = {"enc1": "enc.0", "enc2": "enc.2", "mu": "mu",
                 "logvar": "logvar", "dec1": "dec.0", "dec2": "dec.2",
                 "out": "dec.4"}
    return {"params": {flax: linear(sd, torch) for flax, torch in names.items()}}


def ae_params(sd: StateDict) -> dict:
    """Hard-tier deterministic AE (reference 22:66-88) -> AE params."""
    names = {"e1": "enc.0", "e2": "enc.2", "e3": "enc.4",
             "d1": "dec.0", "d2": "dec.2", "d3": "dec.4"}
    return {"params": {flax: linear(sd, torch) for flax, torch in names.items()}}


def conv_mm_vae_params(sd: StateDict, enc_hw: Tuple[int, int],
                       channels: Tuple[int, ...] = (32, 64, 128)) -> dict:
    """Medium-tier ConvMultiModalVAE (reference 12:83-190) -> ConvMMVAE
    params.  ``enc_hw`` is the post-conv-tower (H, W) — ConvMMVAE.enc_hw, or
    the checkpoint's saved ``feat_hw`` run through conv_tower_shape."""
    eh, ew = enc_hw
    chw = (channels[-1], eh, ew)
    p = {
        "enc_conv1": conv2d(sd, "audio_enc.conv.0"),
        "enc_conv2": conv2d(sd, "audio_enc.conv.2"),
        "enc_conv3": conv2d(sd, "audio_enc.conv.4"),
        "enc_fc": linear_after_nchw_flatten(sd, "audio_enc.fc.0", chw),
        "mu_a": linear(sd, "audio_enc.mu"),
        "logvar_a": linear(sd, "audio_enc.logvar"),
        "lyr1": linear(sd, "lyr_proj.net.0"),
        "lyr2": linear(sd, "lyr_proj.net.2"),
        "fuse": linear(sd, "fuse.0"),
        "mu": linear(sd, "mu"),
        "logvar": linear(sd, "logvar"),
        "dec_fc1": linear(sd, "audio_dec.fc.0"),
        "dec_fc2": linear_before_nchw_reshape(sd, "audio_dec.fc.2", chw),
        "dec_conv1": conv_transpose2d(sd, "audio_dec.deconv.0"),
        "dec_conv2": conv_transpose2d(sd, "audio_dec.deconv.2"),
        "dec_conv3": conv_transpose2d(sd, "audio_dec.deconv.4"),
    }
    return {"params": p}


# --------------------------------------------------------------------------
# .pt loading (torch required only here)
# --------------------------------------------------------------------------

def _to_numpy_sd(obj) -> StateDict:
    return {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v, np.float32)
            for k, v in obj.items()}


def load_torch_checkpoint(path) -> StateDict:
    """Read a reference ``.pt`` file and return a flat numpy state_dict.

    Unwraps the three reference container formats: raw state_dict (06:347),
    {"model": sd, ...} (12:282-285), {"state_dict": sd, ...} (19:248-264).
    """
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict):
        for key in ("state_dict", "model"):
            if key in obj and isinstance(obj[key], dict):
                return _to_numpy_sd(obj[key])
    return _to_numpy_sd(obj)
