"""Media decoding: WAV audio (stdlib) and video frames (OpenCV).

The environment has no torchaudio/ffmpeg/soundfile; WAV decoding uses the
stdlib `wave` module, and direct-video frame sampling (an extension beyond
the reference's pre-extracted JPEG directories) uses OpenCV when present.
Compressed audio (mp3/aac) raises with a clear message pointing at the
packed-feature path.
"""

from __future__ import annotations

import wave
from typing import Optional, Tuple

import numpy as np


def load_wav(path: str) -> Tuple[np.ndarray, int]:
    """Mono float32 waveform in [-1, 1] + sample rate."""
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 2:
        data = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, "<i4").astype(np.float32) / 2147483648.0
    elif width == 1:
        data = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width: {width}")
    if ch > 1:
        data = data.reshape(-1, ch).mean(axis=1)
    return data, sr


def load_audio(path: str) -> Tuple[np.ndarray, int]:
    if path.lower().endswith(".wav"):
        return load_wav(path)
    raise RuntimeError(
        f"no decoder for {path!r} in this environment (no ffmpeg/torchaudio); "
        "decode offline to WAV or use the packed feature store path")


def sample_video_frames(path: str, seconds: np.ndarray,
                        resolution: int = 224) -> np.ndarray:
    """Grab one frame per requested second from a video file via OpenCV and
    CLIP-preprocess each -> [len(seconds), 3, res, res]."""
    import cv2
    from PIL import Image

    from mgsv_tpu.data.frames import preprocess_image

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise RuntimeError(f"cannot open video: {path}")
    out = []
    try:
        for sec in seconds:
            cap.set(cv2.CAP_PROP_POS_MSEC, float(sec) * 1000.0)
            ok, frame = cap.read()
            if not ok:
                raise RuntimeError(f"cannot read frame at {sec}s from {path}")
            rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            out.append(preprocess_image(Image.fromarray(rgb), resolution))
    finally:
        cap.release()
    return np.stack(out)
