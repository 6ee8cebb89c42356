"""AST: Audio Spectrogram Transformer (frozen audio tower), TPU-native.

Re-derivation of model/ast_models.py (which wraps timm's DeiT
base384-distilled): a 1-channel 16x16 conv patch embedding with overlapping
strides (fstride=tstride=10, ast_models.py:83-87), cls + distillation
tokens, a [1, num_patches+2, 768] positional embedding, 12 pre-norm ViT
blocks, final LayerNorm, and an mlp classification head.  The feature MaDe
consumes is (cls + dist) / 2 (ast_models.py:194).

Input convention matches the reference forward (ast_models.py:163-196):
spectrograms [B, time=1024, mel=128] -> internally [B, 1, 128, 1024]
(channel, freq, time) for the conv.

The ImageNet positional-embedding "surgery" (reshape 24x24, center-cut /
bilinear-interp to f_dim x t_dim, ast_models.py:89-112) is reproduced in
`surgery_pos_embed` and applied at weight-conversion time, not at runtime.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, Mapping

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from mgsv_tpu.models.vit_common import ViTBlock, default_attention


def patch_grid(fstride: int, tstride: int, input_fdim: int = 128,
               input_tdim: int = 1024, kernel: int = 16):
    """Conv output grid — the reference probes this with a dummy conv
    (ast_models.py:155-161); it's just the strided-conv size formula."""
    f_dim = (input_fdim - kernel) // fstride + 1
    t_dim = (input_tdim - kernel) // tstride + 1
    return f_dim, t_dim


class ASTEncoder(nn.Module):
    embed_dim: int = 768
    depth: int = 12
    heads: int = 12
    label_dim: int = 527
    fstride: int = 10
    tstride: int = 10
    input_fdim: int = 128
    input_tdim: int = 1024
    attention_fn: Callable = default_attention
    dtype: jnp.dtype = jnp.float32   # compute dtype (bfloat16 for speed)

    @nn.compact
    def __call__(self, spec: jnp.ndarray):
        """spec: [B, T, F] (e.g. [B, 1024, 128]).

        Returns (logits [B, label_dim], cls_dist [B, D], tokens [B, L, D]).
        """
        f_dim, t_dim = patch_grid(self.fstride, self.tstride,
                                  self.input_fdim, self.input_tdim)
        num_patches = f_dim * t_dim
        b = spec.shape[0]

        # [B, T, F] -> [B, F, T, 1] (NHWC for flax Conv; freq=H, time=W).
        x = jnp.transpose(spec, (0, 2, 1))[..., None]
        x = nn.Conv(self.embed_dim, kernel_size=(16, 16),
                    strides=(self.fstride, self.tstride), dtype=self.dtype,
                    padding="VALID", name="patch_proj")(x)   # [B, f, t, D]
        x = x.reshape(b, num_patches, self.embed_dim)

        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.embed_dim))
        dist = self.param("dist_token", nn.initializers.zeros,
                          (1, 1, self.embed_dim))
        pos = self.param("pos_embed", nn.initializers.truncated_normal(0.02),
                         (1, num_patches + 2, self.embed_dim))
        x = jnp.concatenate([
            jnp.broadcast_to(cls, (b, 1, self.embed_dim)),
            jnp.broadcast_to(dist, (b, 1, self.embed_dim)),
            x,
        ], axis=1)
        x = x + pos

        for i in range(self.depth):
            x = ViTBlock(self.embed_dim, self.heads,
                         attention_fn=self.attention_fn, dtype=self.dtype,
                         name=f"block_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)

        cls_dist = (x[:, 0] + x[:, 1]) / 2.0
        h = nn.LayerNorm(epsilon=1e-5, name="head_norm")(cls_dist)
        logits = nn.Dense(self.label_dim, name="head")(h)
        return logits, cls_dist, x


# ---------------------------------------------------------------------------
# Weight conversion (torch AST checkpoint -> flax params)
# ---------------------------------------------------------------------------

def _strip_prefixes(state: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Drop DataParallel/DDP 'module.' prefixes (the reference wraps the AST
    in DDP before loading, model_Base.py:278-281, so checkpoint keys carry
    them)."""
    out = {}
    for k, v in state.items():
        while k.startswith("module."):
            k = k[len("module."):]
        out[k] = v
    return out


def surgery_pos_embed(imagenet_pos: np.ndarray, f_dim: int, t_dim: int,
                      original_hw: int = 24) -> np.ndarray:
    """The reference's ImageNet pos-embed adaptation (ast_models.py:89-106).

    imagenet_pos: [1, original_hw^2 + 2, D] -> [1, f_dim * t_dim + 2, D]:
    grid part reshaped to [D, hw, hw], center-cut (or bilinearly resized)
    along time then frequency, re-flattened; cls/dist rows kept.
    """
    d = imagenet_pos.shape[2]
    lead = imagenet_pos[:, :2]
    grid = imagenet_pos[:, 2:].reshape(1, original_hw * original_hw, d)
    grid = grid.transpose(0, 2, 1).reshape(1, d, original_hw, original_hw)

    def cut_or_resize(arr, target, axis):
        size = arr.shape[axis]
        if target <= size:
            start = size // 2 - target // 2
            sl = [slice(None)] * arr.ndim
            sl[axis] = slice(start, start + target)
            return arr[tuple(sl)]
        return _bilinear_resize(arr, target, axis)

    grid = cut_or_resize(grid, t_dim, axis=3)
    grid = cut_or_resize(grid, f_dim, axis=2)
    grid = grid.reshape(1, d, f_dim * t_dim).transpose(0, 2, 1)
    return np.concatenate([lead, grid], axis=1)


def _bilinear_resize(arr: np.ndarray, target: int, axis: int) -> np.ndarray:
    """align_corners=False bilinear resize along one axis (matches
    F.interpolate(mode='bilinear') as used at ast_models.py:97,102)."""
    size = arr.shape[axis]
    scale = size / target
    coords = (np.arange(target) + 0.5) * scale - 0.5
    lo = np.clip(np.floor(coords).astype(int), 0, size - 1)
    hi = np.clip(lo + 1, 0, size - 1)
    w = np.clip(coords - lo, 0.0, 1.0)
    a = np.take(arr, lo, axis=axis)
    b_ = np.take(arr, hi, axis=axis)
    shape = [1] * arr.ndim
    shape[axis] = target
    w = w.reshape(shape)
    return a * (1 - w) + b_ * w


def import_ast_state_dict(state: Mapping[str, np.ndarray], depth: int = 12,
                          sum_rgb_patch: bool = False) -> Dict:
    """timm-AST torch state dict -> ASTEncoder params.

    Handles both the audioset checkpoint layout (pos_embed already sized for
    the 12x101 audio grid) and a raw ImageNet DeiT (3-channel patch conv is
    summed to 1 channel, ast_models.py:85, with `sum_rgb_patch=True`).
    """
    state = _strip_prefixes(state)

    def lin(prefix):
        return {"kernel": np.ascontiguousarray(state[f"{prefix}.weight"].T),
                "bias": state[f"{prefix}.bias"]}

    def ln(prefix):
        return {"scale": state[f"{prefix}.weight"], "bias": state[f"{prefix}.bias"]}

    conv_w = state["v.patch_embed.proj.weight"]          # [768, C, 16, 16]
    if sum_rgb_patch and conv_w.shape[1] == 3:
        conv_w = conv_w.sum(axis=1, keepdims=True)
    # torch conv [O, I, kh, kw] -> flax [kh, kw, I, O]
    conv_kernel = np.ascontiguousarray(conv_w.transpose(2, 3, 1, 0))

    # The ImageNet-DeiT path (sum_rgb_patch=True) carries a square
    # [1, hw*hw + 2, D] pos table; the audio grid needs
    # [1, f_dim*t_dim + 2, D] — apply the reference's conversion-time
    # surgery (ast_models.py:89-106).  AST-shaped checkpoints (audioset,
    # or the reduced grids the parity tests build) arrive already sized
    # for their grid and pass through untouched.
    pos = np.asarray(state["v.pos_embed"])
    if sum_rgb_patch:
        f_dim, t_dim = patch_grid(10, 10)
        if pos.shape[1] != f_dim * t_dim + 2:
            hw = int(round(math.sqrt(pos.shape[1] - 2)))
            if hw * hw != pos.shape[1] - 2:
                raise ValueError(
                    f"pos_embed length {pos.shape[1]} is neither the audio "
                    f"grid ({f_dim * t_dim + 2}) nor a square ImageNet grid")
            pos = surgery_pos_embed(pos, f_dim, t_dim, original_hw=hw)

    params: Dict = {
        "patch_proj": {"kernel": conv_kernel,
                       "bias": state["v.patch_embed.proj.bias"]},
        "cls_token": state["v.cls_token"],
        "dist_token": state["v.dist_token"],
        "pos_embed": pos,
        "norm": ln("v.norm"),
        "head_norm": ln("mlp_head.0"),
        "head": lin("mlp_head.1"),
    }
    for i in range(depth):
        base = f"v.blocks.{i}"
        params[f"block_{i}"] = {
            "norm1": ln(f"{base}.norm1"),
            "attn": {"qkv": lin(f"{base}.attn.qkv"),
                     "proj": lin(f"{base}.attn.proj")},
            "norm2": ln(f"{base}.norm2"),
            "fc1": lin(f"{base}.mlp.fc1"),
            "fc2": lin(f"{base}.mlp.fc2"),
        }
    return {"params": params}
