"""Audio preprocessing for the omni/audio VLM calibration families.

Role of the reference's audio processors (``compressors/mllm/processor.py``
qwen2_5_omni / mimo_audio / qwen3_tts entries, which wrap the HF feature
extractors): raw waveforms become log-mel spectrograms in the
Whisper/Qwen-Audio convention — 16 kHz, 25 ms Hann windows, 10 ms hop,
128 mel bins, log10 clamped to max-8dB and scaled to ~[-1, 1].

Pure numpy (host-side preprocessing, like image resizing); the model
consumes the (frames, n_mels) tensor.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

__all__ = ["log_mel_spectrogram", "mel_filterbank"]

SAMPLE_RATE = 16_000
N_FFT = 400          # 25 ms at 16 kHz
HOP_LENGTH = 160     # 10 ms
N_MELS = 128


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)


def mel_filterbank(n_mels: int = N_MELS, n_fft: int = N_FFT,
                   sample_rate: int = SAMPLE_RATE) -> np.ndarray:
    """(n_mels, n_fft//2 + 1) triangular filterbank, Slaney-normalized
    (area 2/bandwidth — the librosa/Whisper convention)."""
    n_freqs = n_fft // 2 + 1
    freqs = np.linspace(0, sample_rate / 2, n_freqs)
    mel_pts = _mel_to_hz(np.linspace(_hz_to_mel(0.0),
                                     _hz_to_mel(sample_rate / 2),
                                     n_mels + 2))
    fb = np.zeros((n_mels, n_freqs), np.float64)
    for i in range(n_mels):
        lo, ctr, hi = mel_pts[i], mel_pts[i + 1], mel_pts[i + 2]
        up = (freqs - lo) / max(ctr - lo, 1e-10)
        down = (hi - freqs) / max(hi - ctr, 1e-10)
        fb[i] = np.maximum(0.0, np.minimum(up, down))
        fb[i] *= 2.0 / (hi - lo)                      # Slaney area norm
    return fb.astype(np.float32)


def log_mel_spectrogram(waveform: np.ndarray,
                        sample_rate: int = SAMPLE_RATE,
                        n_mels: int = N_MELS,
                        n_fft: int = N_FFT,
                        hop: int = HOP_LENGTH,
                        fb: Optional[np.ndarray] = None) -> np.ndarray:
    """(T,) float waveform → (frames, n_mels) float32 log-mel features
    (Whisper convention: reflect-padded centered frames, |STFT|²,
    log10 clamped to max-8, (x + 4) / 4)."""
    if sample_rate != SAMPLE_RATE:
        # naive linear resample to 16 kHz (host-side, calibration only)
        n_out = int(round(len(waveform) * SAMPLE_RATE / sample_rate))
        waveform = np.interp(
            np.linspace(0, len(waveform) - 1, n_out),
            np.arange(len(waveform)), waveform)
    x = np.asarray(waveform, np.float64)
    pad = n_fft // 2
    x = np.pad(x, (pad, pad), mode="reflect")
    n_frames = 1 + (len(x) - n_fft) // hop
    idx = (np.arange(n_fft)[None, :]
           + hop * np.arange(n_frames)[:, None])
    frames = x[idx] * np.hanning(n_fft + 1)[:-1][None, :]
    spec = np.abs(np.fft.rfft(frames, axis=-1)) ** 2   # (frames, F)
    fb = mel_filterbank(n_mels, n_fft, SAMPLE_RATE) if fb is None else fb
    mel = spec @ fb.T                                  # (frames, n_mels)
    logmel = np.log10(np.maximum(mel, 1e-10))
    logmel = np.maximum(logmel, logmel.max() - 8.0)
    return ((logmel + 4.0) / 4.0).astype(np.float32)
