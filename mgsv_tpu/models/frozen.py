"""Frozen-encoder batch runners: raw media -> reference-compatible features.

TPU-side of the raw paths (model_Base.py:406-516): CLIP ViT-B/32 encodes
1 fps frames to [F, 512]; AST encodes snippet spectrograms to [S, 768]
(the snippet axis is treated as the AST batch, model_Base.py:486-487).
Outputs are bit-compatible with the reference's cached
`vit_feature/{id}.pt` / `ast_feature/{id}.pt` tensors, so extracted
features interoperate both ways.

Encoders run under stop_gradient — they are frozen by construction
(train-MaDe.py:242-244 freezes by parameter-name matching; here the
gradient simply never exists).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from mgsv_tpu.models.ast import ASTEncoder
from mgsv_tpu.models.clip_vit import ClipVisionTower


class FrozenEncoders:
    def __init__(self, clip_params: Dict[str, Any], ast_params: Dict[str, Any],
                 clip_tower: ClipVisionTower = None, ast_encoder: ASTEncoder = None):
        self.clip_tower = clip_tower or ClipVisionTower()
        self.ast_encoder = ast_encoder or ASTEncoder()
        self.clip_params = clip_params
        self.ast_params = ast_params

        @jax.jit
        def _encode_frames(params, frames):
            b, f = frames.shape[:2]
            flat = frames.reshape((b * f,) + frames.shape[2:])
            emb = self.clip_tower.apply(params, flat)
            return jax.lax.stop_gradient(emb.reshape(b, f, -1))

        @jax.jit
        def _encode_snippets(params, specs):
            b, s = specs.shape[:2]
            flat = specs.reshape((b * s,) + specs.shape[2:])
            _, cls_dist, _ = self.ast_encoder.apply(params, flat)
            return jax.lax.stop_gradient(cls_dist.reshape(b, s, -1))

        self._encode_frames = _encode_frames
        self._encode_snippets = _encode_snippets

    def encode_frames(self, frames: jnp.ndarray) -> jnp.ndarray:
        """[B, F, 3, H, W] CLIP-normalized -> [B, F, 512]."""
        return self._encode_frames(self.clip_params, frames)

    def encode_snippets(self, specs: jnp.ndarray) -> jnp.ndarray:
        """[B, S, T, mel] normalized spectrograms -> [B, S, 768]."""
        return self._encode_snippets(self.ast_params, specs)
