"""Direct parity for shared layer primitives vs importable reference modules."""

import sys

import jax.numpy as jnp
import numpy as np
import torch

sys.path.insert(0, "/root/reference")
from music_detr.position_encoding import PositionEmbeddingSine  # noqa: E402

from mgsv_tpu.models import layers as L  # noqa: E402
import pytest

pytestmark = pytest.mark.torch_oracle


def test_position_embedding_sine_parity():
    # built with N_steps=hidden_dim=256, normalize=True (position_encoding.py:101-104)
    ref = PositionEmbeddingSine(256, normalize=True)
    mask = np.zeros((3, 20), np.float32)
    mask[0, :20] = 1
    mask[1, :7] = 1
    mask[2, :1] = 1
    x = torch.zeros(3, 20, 256)
    with torch.no_grad():
        want = ref(x, torch.tensor(mask)).numpy()
    got = np.asarray(L.position_embedding_sine(jnp.asarray(mask), 256))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sinusoidal_table_matches_reference_formula():
    # model_Base.py:48-60 — verify against a direct torch transcription
    seq_len, dim = 50, 64
    import math
    pe = torch.zeros(seq_len, dim)
    position = torch.arange(0, seq_len, dtype=torch.float).unsqueeze(1)
    div_term = torch.exp(torch.arange(0, dim, 2).float() * -(math.log(10000.0) / dim))
    pe[:, 0::2] = torch.sin(position * div_term)
    pe[:, 1::2] = torch.cos(position * div_term)
    np.testing.assert_allclose(L.sinusoidal_table(seq_len, dim), pe.numpy(), atol=1e-6)


def test_masked_mean_and_quick_gelu():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 4).astype(np.float32))
    mask = jnp.asarray([[1, 1, 1, 0, 0], [1, 0, 0, 0, 0]], jnp.float32)
    got = L.masked_mean(x, mask)
    want0 = np.asarray(x[0, :3]).mean(0)
    np.testing.assert_allclose(got[0], want0, atol=1e-6)
    np.testing.assert_allclose(got[1], np.asarray(x[1, 0]), atol=1e-6)

    t = torch.tensor(np.asarray(x))
    ref = (t * torch.sigmoid(1.702 * t)).numpy()
    np.testing.assert_allclose(np.asarray(L.quick_gelu(x)), ref, atol=1e-6)


def test_trainable_positional_encoding_parity():
    """vs music_detr/position_encoding.py:10-32 (upstream dead code; weights
    imported, dropout off)."""
    import jax
    from music_detr.position_encoding import TrainablePositionalEncoding as Ref

    torch.manual_seed(0)
    ref = Ref(max_position_embeddings=16, hidden_size=32, dropout=0.1)
    ref.eval()

    mod = L.TrainablePositionalEncoding(max_positions=16, dim=32, dropout=0.1)
    params = {"params": {
        "position_embeddings": ref.position_embeddings.weight.detach().numpy().copy(),
        "ln": {"scale": ref.LayerNorm.weight.detach().numpy().copy(),
               "bias": ref.LayerNorm.bias.detach().numpy().copy()},
    }}
    x = np.random.RandomState(0).randn(2, 10, 32).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(mod.apply(params, jnp.asarray(x), deterministic=True))
    np.testing.assert_allclose(got, want, atol=1e-5)
