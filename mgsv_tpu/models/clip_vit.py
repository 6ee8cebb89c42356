"""CLIP ViT-B/32 visual tower (frozen frame encoder), TPU-native.

Re-derivation of the OpenAI CLIP image encoder used by the reference via
`clip.load("ViT-B/32")` (model_Base.py:288) and `encode_image`
(model_Base.py:432): 32x32 conv patches (no bias) over 224x224 -> 7x7
tokens + class embedding + learned positional embedding -> ln_pre ->
12 pre-norm blocks with QuickGELU MLPs -> ln_post on the class token ->
projection to 512.

Weight conversion consumes the `visual.*` subtree of a CLIP state dict
(the jit-archived ViT-B-32.pt's state_dict() or a plain one).
"""

from __future__ import annotations

from typing import Callable, Dict, Mapping

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from mgsv_tpu.models.vit_common import ViTBlock, default_attention

# CLIP preprocessing constants (dataloader_MGSV_EC_rawdata.py:18-25)
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


class ClipVisionTower(nn.Module):
    width: int = 768
    depth: int = 12
    heads: int = 12
    patch: int = 32
    out_dim: int = 512
    image_size: int = 224
    attention_fn: Callable = default_attention
    dtype: jnp.dtype = jnp.float32   # compute dtype (bfloat16 for speed)

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images: [B, 3, H, W] (torch layout, CLIP-normalized) -> [B, out_dim]."""
        b = images.shape[0]
        x = jnp.transpose(images, (0, 2, 3, 1))               # NHWC
        x = nn.Conv(self.width, kernel_size=(self.patch, self.patch),
                    strides=(self.patch, self.patch), padding="VALID",
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        grid = (self.image_size // self.patch) ** 2
        x = x.reshape(b, grid, self.width)

        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (self.width,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls[None, None, :], (b, 1, self.width)), x], axis=1)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (grid + 1, self.width))
        x = x + pos[None]
        x = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(x)

        for i in range(self.depth):
            x = ViTBlock(self.width, self.heads, act="quick_gelu",
                         attention_fn=self.attention_fn, dtype=self.dtype,
                         name=f"block_{i}")(x)

        x = nn.LayerNorm(epsilon=1e-5, name="ln_post")(x[:, 0])
        proj = self.param("proj", nn.initializers.normal(0.02),
                          (self.width, self.out_dim))
        return x @ proj                                        # [B, out_dim]


def import_clip_visual_state_dict(state: Mapping[str, np.ndarray],
                                  depth: int = 12) -> Dict:
    """CLIP state dict (`visual.*` keys) -> ClipVisionTower params."""
    s = {k[len("visual."):]: v for k, v in state.items() if k.startswith("visual.")}
    if not s:
        s = dict(state)  # already visual-only

    def lin(prefix):
        return {"kernel": np.ascontiguousarray(s[f"{prefix}.weight"].T),
                "bias": s[f"{prefix}.bias"]}

    def ln(prefix):
        return {"scale": s[f"{prefix}.weight"], "bias": s[f"{prefix}.bias"]}

    params: Dict = {
        "conv1": {"kernel": np.ascontiguousarray(
            s["conv1.weight"].transpose(2, 3, 1, 0))},
        "class_embedding": s["class_embedding"],
        "positional_embedding": s["positional_embedding"],
        "ln_pre": ln("ln_pre"),
        "ln_post": ln("ln_post"),
        "proj": s["proj"],
    }
    for i in range(depth):
        base = f"transformer.resblocks.{i}"
        w = s[f"{base}.attn.in_proj_weight"]       # [3D, D] packed
        bqkv = s[f"{base}.attn.in_proj_bias"]
        params[f"block_{i}"] = {
            "norm1": ln(f"{base}.ln_1"),
            "attn": {
                "qkv": {"kernel": np.ascontiguousarray(w.T), "bias": bqkv},
                "proj": lin(f"{base}.attn.out_proj"),
            },
            "norm2": ln(f"{base}.ln_2"),
            "fc1": lin(f"{base}.mlp.c_fc"),
            "fc2": lin(f"{base}.mlp.c_proj"),
        }
    return {"params": params}
