"""Parity for the frozen towers: AST and CLIP ViT vs exact torch math.

The real checkpoints (audioset_0.4593.pth, ViT-B-32.pt) are not available
offline, so each test builds a random state dict in the reference's naming
scheme, converts it with our importers, and compares our flax forward
against a functional torch implementation of the timm-DeiT / CLIP math.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from mgsv_tpu.models.ast import (
    ASTEncoder, import_ast_state_dict, patch_grid, surgery_pos_embed)
from mgsv_tpu.models.clip_vit import ClipVisionTower, import_clip_visual_state_dict
import pytest

pytestmark = pytest.mark.torch_oracle


def _rand(rng, *shape):
    return (rng.randn(*shape) * 0.05).astype(np.float32)


def _vit_block_torch(x, s, base, act):
    """Pre-norm ViT block in functional torch; x: [B, L, D]."""
    d = x.shape[-1]
    h = F.layer_norm(x, (d,), torch.tensor(s[f"{base}.norm1.weight"]),
                     torch.tensor(s[f"{base}.norm1.bias"]))
    qkv = h @ torch.tensor(s[f"{base}.attn.qkv.weight"]).T + torch.tensor(
        s[f"{base}.attn.qkv.bias"])
    b, l, _ = qkv.shape
    heads = s["__heads__"]
    hd = d // heads
    qkv = qkv.reshape(b, l, 3, heads, hd).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(hd), dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(b, l, d)
    out = out @ torch.tensor(s[f"{base}.attn.proj.weight"]).T + torch.tensor(
        s[f"{base}.attn.proj.bias"])
    x = x + out
    h = F.layer_norm(x, (d,), torch.tensor(s[f"{base}.norm2.weight"]),
                     torch.tensor(s[f"{base}.norm2.bias"]))
    h = h @ torch.tensor(s[f"{base}.mlp.fc1.weight"]).T + torch.tensor(s[f"{base}.mlp.fc1.bias"])
    h = F.gelu(h) if act == "gelu" else h * torch.sigmoid(1.702 * h)
    h = h @ torch.tensor(s[f"{base}.mlp.fc2.weight"]).T + torch.tensor(s[f"{base}.mlp.fc2.bias"])
    return x + h


@pytest.mark.slow
def test_ast_parity():
    rng = np.random.RandomState(0)
    d, depth, heads, label = 64, 2, 4, 10
    fdim, tdim, fs, ts = 32, 48, 10, 10
    f_dim, t_dim = patch_grid(fs, ts, fdim, tdim)
    npatch = f_dim * t_dim

    s = {"__heads__": heads}
    s["v.patch_embed.proj.weight"] = _rand(rng, d, 1, 16, 16)
    s["v.patch_embed.proj.bias"] = _rand(rng, d)
    s["v.cls_token"] = _rand(rng, 1, 1, d)
    s["v.dist_token"] = _rand(rng, 1, 1, d)
    s["v.pos_embed"] = _rand(rng, 1, npatch + 2, d)
    for i in range(depth):
        base = f"v.blocks.{i}"
        s[f"{base}.norm1.weight"] = np.ones(d, np.float32)
        s[f"{base}.norm1.bias"] = _rand(rng, d)
        s[f"{base}.attn.qkv.weight"] = _rand(rng, 3 * d, d)
        s[f"{base}.attn.qkv.bias"] = _rand(rng, 3 * d)
        s[f"{base}.attn.proj.weight"] = _rand(rng, d, d)
        s[f"{base}.attn.proj.bias"] = _rand(rng, d)
        s[f"{base}.norm2.weight"] = np.ones(d, np.float32)
        s[f"{base}.norm2.bias"] = _rand(rng, d)
        s[f"{base}.mlp.fc1.weight"] = _rand(rng, 4 * d, d)
        s[f"{base}.mlp.fc1.bias"] = _rand(rng, 4 * d)
        s[f"{base}.mlp.fc2.weight"] = _rand(rng, d, 4 * d)
        s[f"{base}.mlp.fc2.bias"] = _rand(rng, d)
    s["v.norm.weight"] = np.ones(d, np.float32)
    s["v.norm.bias"] = _rand(rng, d)
    s["mlp_head.0.weight"] = np.ones(d, np.float32)
    s["mlp_head.0.bias"] = _rand(rng, d)
    s["mlp_head.1.weight"] = _rand(rng, label, d)
    s["mlp_head.1.bias"] = _rand(rng, label)

    spec = _rand(rng, 3, tdim, fdim) * 4  # [B, T, F]

    # torch functional reference (timm/AST math, ast_models.py:163-196)
    with torch.no_grad():
        x = torch.tensor(spec).unsqueeze(1).transpose(2, 3)  # [B, 1, F, T]
        x = F.conv2d(x, torch.tensor(s["v.patch_embed.proj.weight"]),
                     torch.tensor(s["v.patch_embed.proj.bias"]), stride=(fs, ts))
        b = x.shape[0]
        x = x.flatten(2).transpose(1, 2)                      # [B, N, D]
        cls = torch.tensor(s["v.cls_token"]).expand(b, -1, -1)
        dist = torch.tensor(s["v.dist_token"]).expand(b, -1, -1)
        x = torch.cat([cls, dist, x], dim=1) + torch.tensor(s["v.pos_embed"])
        for i in range(depth):
            x = _vit_block_torch(x, s, f"v.blocks.{i}", "gelu")
        x = F.layer_norm(x, (d,), torch.tensor(s["v.norm.weight"]),
                         torch.tensor(s["v.norm.bias"]))
        cls_dist_ref = (x[:, 0] + x[:, 1]) / 2
        h = F.layer_norm(cls_dist_ref, (d,), torch.tensor(s["mlp_head.0.weight"]),
                         torch.tensor(s["mlp_head.0.bias"]))
        logits_ref = h @ torch.tensor(s["mlp_head.1.weight"]).T + torch.tensor(
            s["mlp_head.1.bias"])

    model = ASTEncoder(embed_dim=d, depth=depth, heads=heads, label_dim=label,
                       fstride=fs, tstride=ts, input_fdim=fdim, input_tdim=tdim)
    params = import_ast_state_dict({k: v for k, v in s.items() if k != "__heads__"},
                                   depth=depth)
    logits, cls_dist, tokens = model.apply(params, jnp.asarray(spec))
    np.testing.assert_allclose(np.asarray(cls_dist), cls_dist_ref.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(logits), logits_ref.numpy(), atol=2e-5)
    assert tokens.shape == (3, npatch + 2, d)


def test_ast_ddp_prefix_stripped():
    rng = np.random.RandomState(1)
    s = {"module.v.cls_token": _rand(rng, 1, 1, 8)}
    from mgsv_tpu.models.ast import _strip_prefixes
    assert "v.cls_token" in _strip_prefixes(s)


def test_surgery_pos_embed_cut_and_interp():
    rng = np.random.RandomState(2)
    d, hw = 8, 24
    pos = _rand(rng, 1, hw * hw + 2, d)

    # center-cut case (t_dim, f_dim <= 24): compare vs reference slicing math
    f_dim, t_dim = 12, 20
    ours = surgery_pos_embed(pos, f_dim, t_dim, original_hw=hw)
    grid = torch.tensor(pos[:, 2:]).reshape(1, hw * hw, d).transpose(1, 2).reshape(1, d, hw, hw)
    cut = grid[:, :, :, hw // 2 - t_dim // 2: hw // 2 - t_dim // 2 + t_dim]
    cut = cut[:, :, hw // 2 - f_dim // 2: hw // 2 - f_dim // 2 + f_dim, :]
    ref = cut.reshape(1, d, f_dim * t_dim).transpose(1, 2)
    np.testing.assert_allclose(ours[:, 2:], ref.numpy(), atol=1e-6)
    np.testing.assert_allclose(ours[:, :2], pos[:, :2], atol=0)

    # interpolation case (t_dim > 24) vs F.interpolate bilinear
    f_dim, t_dim = 12, 101
    ours = surgery_pos_embed(pos, f_dim, t_dim, original_hw=hw)
    interp = F.interpolate(grid, size=(hw, t_dim), mode="bilinear")
    interp = interp[:, :, hw // 2 - f_dim // 2: hw // 2 - f_dim // 2 + f_dim, :]
    ref = interp.reshape(1, d, f_dim * t_dim).transpose(1, 2)
    np.testing.assert_allclose(ours[:, 2:], ref.numpy(), atol=1e-5)


def test_clip_vit_parity():
    rng = np.random.RandomState(3)
    width, depth, heads, patch, out_dim, img = 64, 2, 4, 16, 32, 64
    grid = (img // patch) ** 2

    s = {"__heads__": heads}
    s["visual.conv1.weight"] = _rand(rng, width, 3, patch, patch)
    s["visual.class_embedding"] = _rand(rng, width)
    s["visual.positional_embedding"] = _rand(rng, grid + 1, width)
    s["visual.ln_pre.weight"] = np.ones(width, np.float32)
    s["visual.ln_pre.bias"] = _rand(rng, width)
    for i in range(depth):
        base = f"visual.transformer.resblocks.{i}"
        s[f"{base}.ln_1.weight"] = np.ones(width, np.float32)
        s[f"{base}.ln_1.bias"] = _rand(rng, width)
        s[f"{base}.attn.in_proj_weight"] = _rand(rng, 3 * width, width)
        s[f"{base}.attn.in_proj_bias"] = _rand(rng, 3 * width)
        s[f"{base}.attn.out_proj.weight"] = _rand(rng, width, width)
        s[f"{base}.attn.out_proj.bias"] = _rand(rng, width)
        s[f"{base}.ln_2.weight"] = np.ones(width, np.float32)
        s[f"{base}.ln_2.bias"] = _rand(rng, width)
        s[f"{base}.mlp.c_fc.weight"] = _rand(rng, 4 * width, width)
        s[f"{base}.mlp.c_fc.bias"] = _rand(rng, 4 * width)
        s[f"{base}.mlp.c_proj.weight"] = _rand(rng, width, 4 * width)
        s[f"{base}.mlp.c_proj.bias"] = _rand(rng, width)
    s["visual.ln_post.weight"] = np.ones(width, np.float32)
    s["visual.ln_post.bias"] = _rand(rng, width)
    s["visual.proj"] = _rand(rng, width, out_dim)

    images = _rand(rng, 2, 3, img, img)

    with torch.no_grad():
        x = F.conv2d(torch.tensor(images), torch.tensor(s["visual.conv1.weight"]),
                     stride=patch)
        b = x.shape[0]
        x = x.reshape(b, width, -1).permute(0, 2, 1)
        cls = torch.tensor(s["visual.class_embedding"]).reshape(1, 1, -1).expand(b, -1, -1)
        x = torch.cat([cls, x], dim=1) + torch.tensor(s["visual.positional_embedding"])
        x = F.layer_norm(x, (width,), torch.tensor(s["visual.ln_pre.weight"]),
                         torch.tensor(s["visual.ln_pre.bias"]))
        blk = {k.replace("visual.transformer.resblocks", "blk")
                .replace("ln_1", "norm1").replace("ln_2", "norm2")
                .replace("attn.in_proj_weight", "attn.qkv.weight")
                .replace("attn.in_proj_bias", "attn.qkv.bias")
                .replace("attn.out_proj", "attn.proj")
                .replace("mlp.c_fc", "mlp.fc1").replace("mlp.c_proj", "mlp.fc2"): v
               for k, v in s.items()}
        blk["__heads__"] = heads
        for i in range(depth):
            x = _vit_block_torch(x, blk, f"blk.{i}", "quick_gelu")
        x = F.layer_norm(x[:, 0], (width,), torch.tensor(s["visual.ln_post.weight"]),
                         torch.tensor(s["visual.ln_post.bias"]))
        ref = x @ torch.tensor(s["visual.proj"])

    model = ClipVisionTower(width=width, depth=depth, heads=heads, patch=patch,
                            out_dim=out_dim, image_size=img)
    params = import_clip_visual_state_dict(
        {k: v for k, v in s.items() if k != "__heads__"}, depth=depth)
    out = model.apply(params, jnp.asarray(images))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=2e-5)
