"""MGSV-TPU: a TPU-native framework for Music Grounding by Short Video.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of xxayt/MGSV
(ICCV 2025) and its MaDe model: joint video-to-music retrieval + music
moment detection, built TPU-first (SPMD over device meshes, jit-compiled
train/eval steps, Pallas kernels for the hot ops).
"""

from mgsv_tpu.config import Config, DataConfig, LossConfig, ModelConfig, TrainConfig

__version__ = "0.1.0"

__all__ = [
    "Config",
    "DataConfig",
    "LossConfig",
    "ModelConfig",
    "TrainConfig",
    "MaDe",
    "Trainer",
    "evaluate",
]


def __getattr__(name):
    # Lazy re-exports keep `import mgsv_tpu` light (no jax/flax import cost
    # until a model or trainer is actually requested).
    if name == "MaDe":
        from mgsv_tpu.models.made import MaDe
        return MaDe
    if name == "Trainer":
        from mgsv_tpu.train.loop import Trainer
        return Trainer
    if name == "evaluate":
        from mgsv_tpu.eval.evaluator import evaluate
        return evaluate
    raise AttributeError(name)
