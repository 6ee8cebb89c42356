"""Raw-input frontend tests: kaldi fbank, snippet windower, frame preprocessing,
frozen-encoder batch runners."""

import os

import numpy as np
import pytest

from mgsv_tpu.data import audio
from mgsv_tpu.data.frames import black_frame, load_clip_frames, preprocess_image

pytestmark = pytest.mark.torch_oracle


def test_fbank_shapes_and_floor():
    sr = 16000
    # 10s window -> 1 + (160000 - 400) // 160 = 998 frames (the reference's
    # "1024 = 10.26s" comment, dataloader_MGSV_EC_rawdata.py:146)
    wav = np.zeros(sr * 10, np.float32)
    fb = audio.fbank(wav)
    assert fb.shape == (998, 128)
    # silence -> log(FLT_EPSILON) everywhere
    np.testing.assert_allclose(fb, np.log(audio.EPSILON), atol=1e-5)


def test_fbank_sine_peaks_at_expected_mel_bin():
    sr = 16000
    t = np.arange(sr, dtype=np.float32) / sr
    for freq in (440.0, 2000.0):
        wav = np.sin(2 * np.pi * freq * t).astype(np.float32)
        fb = audio.fbank(wav)
        mean_spec = fb.mean(axis=0)
        peak_bin = int(np.argmax(mean_spec))
        # locate the mel filter whose center is nearest to freq
        mel_lo, mel_hi = audio.mel_scale(20.0), audio.mel_scale(sr / 2)
        delta = (mel_hi - mel_lo) / (128 + 1)
        centers_mel = mel_lo + (np.arange(128) + 1) * delta
        expected = int(np.argmin(np.abs(centers_mel - audio.mel_scale(freq))))
        assert abs(peak_bin - expected) <= 1, (freq, peak_bin, expected)


def test_fbank_jax_matches_numpy_core():
    rng = np.random.RandomState(0)
    wav = rng.randn(16000).astype(np.float32) * 0.1
    fb_np = audio.fbank(wav)
    # frame on host, run core on device
    win, shift = 400, 160
    n_frames = 1 + (len(wav) - win) // shift
    idx = np.arange(win)[None, :] + shift * np.arange(n_frames)[:, None]
    frames = wav[idx][None]                       # [1, T, win]
    mel_w = audio.mel_banks(128, 512, 16000)
    window = audio._hanning(win)
    fb_j = np.asarray(audio.fbank_jax(frames, mel_w, window))[0]
    np.testing.assert_allclose(fb_j, fb_np, atol=2e-3)


def test_snippet_windows_and_mask():
    wins = audio.snippet_windows(240.0, 2.5, 10.0)
    assert wins.shape == (96, 2)
    np.testing.assert_allclose(wins[0], [0.0, 5.0])       # clipped at track start
    np.testing.assert_allclose(wins[4], [5.0, 15.0])      # full 10s window
    np.testing.assert_allclose(wins[-1], [232.5, 240.0])  # clipped at track end

    sr = 16000
    wav = np.random.RandomState(1).randn(sr * 30).astype(np.float32) * 0.05
    snips, mask = audio.extract_snippets(wav, sr)
    assert snips.shape == (96, 1024, 128)
    # mask rule: center <= duration (rawdata.py:138-139) — centers 0..30 -> 13
    assert mask.sum() == 13
    # normalization applied
    assert np.isfinite(snips).all()


def test_black_frame_matches_preprocessed_black_image():
    from PIL import Image

    img = Image.new("RGB", (448, 320), (0, 0, 0))
    np.testing.assert_allclose(
        preprocess_image(img, 224), black_frame(224), atol=1e-6)


def test_load_clip_frames(tmp_path):
    from PIL import Image

    d = tmp_path / "vid"
    d.mkdir()
    for sec in range(4):
        Image.new("RGB", (64, 48), (sec * 40, 10, 200)).save(d / f"{sec}.jpg")
    frames, mask = load_clip_frames(str(d), 0.0, 3.9, max_v_frames=6,
                                    resolution=32)
    assert frames.shape == (6, 3, 32, 32)
    np.testing.assert_array_equal(mask, [1, 1, 1, 1, 0, 0])
    # padded slots are black frames
    np.testing.assert_allclose(frames[4], black_frame(32), atol=1e-6)


@pytest.mark.slow
def test_frozen_encoders_batch_shapes():
    import jax

    from mgsv_tpu.models.ast import ASTEncoder
    from mgsv_tpu.models.clip_vit import ClipVisionTower
    from mgsv_tpu.models.frozen import FrozenEncoders

    clip = ClipVisionTower(width=32, depth=1, heads=2, patch=16, out_dim=24,
                           image_size=32)
    ast = ASTEncoder(embed_dim=32, depth=1, heads=2, label_dim=5,
                     input_fdim=32, input_tdim=48)
    rng = np.random.RandomState(0)
    images = rng.randn(2, 3, 3, 32, 32).astype(np.float32)
    specs = rng.randn(2, 4, 48, 32).astype(np.float32)
    clip_params = clip.init(jax.random.PRNGKey(0), images[0])
    ast_params = ast.init(jax.random.PRNGKey(0), specs[0])

    enc = FrozenEncoders(clip_params, ast_params, clip, ast)
    fe = enc.encode_frames(images)
    se = enc.encode_snippets(specs)
    assert fe.shape == (2, 3, 24)
    assert se.shape == (2, 4, 32)


def test_wav_roundtrip(tmp_path):
    import wave

    from mgsv_tpu.data.media import load_wav

    sr = 8000
    t = np.arange(sr) / sr
    wav = (np.sin(2 * np.pi * 440 * t) * 0.5 * 32767).astype(np.int16)
    path = str(tmp_path / "t.wav")
    with wave.open(path, "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(sr)
        w.writeframes(wav.tobytes())
    data, got_sr = load_wav(path)
    assert got_sr == sr
    np.testing.assert_allclose(data, wav.astype(np.float32) / 32768.0, atol=1e-6)


def test_audio_decoder_hook(tmp_path):
    """Compressed-format decoding is a pluggable hook (the reference's
    torchaudio/ffmpeg dependency, dataloader_MGSV_EC_rawdata.py:119, is a
    deployment choice): register_audio_decoder routes load_audio by
    extension, stereo output is downmixed, and an unregistered format
    still fails loudly with a message naming the hook."""
    import pytest

    from mgsv_tpu.data.media import (_AUDIO_DECODERS, load_audio,
                                     register_audio_decoder)

    calls = []

    def fake_mp3(path):
        calls.append(path)
        return np.stack([np.ones(100, np.float32),
                         np.zeros(100, np.float32)]), 22050  # [ch, n] stereo

    register_audio_decoder("mp3", fn=fake_mp3)   # no-dot form normalizes
    try:
        p = str(tmp_path / "track.MP3")          # case-insensitive ext
        open(p, "wb").close()
        wav, sr = load_audio(p)
        assert calls == [p] and sr == 22050
        np.testing.assert_allclose(wav, np.full(100, 0.5, np.float32))

        with pytest.raises(RuntimeError, match="register_audio_decoder"):
            load_audio(str(tmp_path / "x.aac"))
    finally:
        _AUDIO_DECODERS.pop(".mp3", None)


def _parity_waveform(orig_sr):
    rng = np.random.RandomState(0)
    t = np.arange(int(orig_sr * 1.3)) / orig_sr
    return (0.5 * np.sin(2 * np.pi * 440 * t)
            + 0.2 * np.sin(2 * np.pi * 3213 * t)
            + 0.05 * rng.randn(len(t))).astype(np.float32)


@pytest.mark.parametrize("orig_sr,new_sr", [(44100, 16000), (48000, 16000),
                                            (22050, 16000), (8000, 16000)])
def test_resample_sinc_matches_torchaudio(orig_sr, new_sr):
    """Parity with torchaudio's windowed-sinc resampler — the reference's
    resampling op (dataloader_MGSV_EC_rawdata.py:119-121).  Compares
    against torchaudio directly when installed; otherwise against committed
    golden fixtures from an independent float64 direct-summation oracle of
    the same windowed-sinc definition (tests/fixtures/
    make_resample_fixtures.py — different derivation and loop structure
    from the production polyphase code, so the check is not circular)."""
    wav = _parity_waveform(orig_sr)
    ours = audio.resample_sinc(wav, orig_sr, new_sr)

    try:
        import torch
        import torchaudio

        theirs = torchaudio.functional.resample(
            torch.from_numpy(wav), orig_sr, new_sr).numpy()
    except ImportError:
        fixture = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "fixtures", f"resample_{orig_sr}_{new_sr}.npy")
        theirs = np.load(fixture)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=0)


def test_resample_sinc_identity_and_upsample():
    wav = np.sin(np.arange(1600) / 10).astype(np.float32)
    np.testing.assert_array_equal(audio.resample_sinc(wav, 16000, 16000), wav)
    up = audio.resample_sinc(wav, 8000, 16000)
    assert up.shape == (3200,)
    # a band-limited signal survives up-then-down resampling
    back = audio.resample_sinc(up, 16000, 8000)
    np.testing.assert_allclose(back[50:-50], wav[50:-50], atol=5e-3)


@pytest.mark.parametrize("orig_sr", [44100, 48000, 22050])
def test_resample_sinc_analytic_sine(orig_sr):
    """torchaudio isn't installed in this environment, so in addition to the
    importorskip'd parity test above, check the resampler against the
    analytically-known answer: a mid-band sine resampled to 16 kHz must be
    that same sine sampled on the new grid (windowed-sinc reconstruction is
    near-exact well below the cutoff)."""
    freq = 1000.0
    dur = 1.0
    t_in = np.arange(int(orig_sr * dur)) / orig_sr
    wav = np.sin(2 * np.pi * freq * t_in).astype(np.float32)
    out = audio.resample_sinc(wav, orig_sr, 16000)
    t_out = np.arange(len(out)) / 16000.0
    expected = np.sin(2 * np.pi * freq * t_out).astype(np.float32)
    # ignore filter-width edge transients
    np.testing.assert_allclose(out[100:-100], expected[100:-100], atol=2e-3)
