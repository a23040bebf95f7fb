"""Batched log-mel spectrogram frontend (GEMM-native, MXU-friendly).

TPU rebuild of the reference's per-file librosa path
(reference mp3_to_pkl.py:30-42 and src/datasets/transformations.py:251-266:
librosa.feature.melspectrogram(sr=44100, n_fft=1024, hop_length=256,
n_mels=80) followed by power_to_db(ref=np.max)). librosa is pinned to 0.7.2
in the reference (requirements.txt), whose STFT defaults are: periodic hann
window, center=True, pad_mode='reflect', power=2.0; mel filterbank is
slaney-scale with area normalization (norm=1), fmin=0, fmax=sr/2.

Design (MelT-style GEMM-native DFT — the rFFT becomes two matmuls with
cos/sin matrices so the whole frontend is framing + 3 GEMMs + elementwise,
which XLA maps straight onto the MXU; no FFT butterflies):

    frames (B*M, F, n_fft) @ dft_cos (n_fft, n_bins)  -> real
    frames (B*M, F, n_fft) @ dft_sin (n_fft, n_bins)  -> imag
    power = real^2 + imag^2
    mel   = power @ mel_fb.T (n_bins, n_mels)

All shapes static; the batch dimension carries (clips x microphones).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SR = 44100
N_FFT = 1024
HOP = 256
N_MELS = 80


def hann_window(n: int) -> np.ndarray:
    """Periodic Hann (scipy.signal.get_window('hann', n, fftbins=True))."""
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz,
                    min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
                    mels)


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = f_sp * m
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    min_log_hz * np.exp(logstep * (m - min_log_mel)),
                    freqs)


def mel_filterbank(sr: int = SR, n_fft: int = N_FFT, n_mels: int = N_MELS,
                   fmin: float = 0.0, fmax: Optional[float] = None
                   ) -> np.ndarray:
    """Slaney-scale mel filterbank with area norm, (n_mels, 1+n_fft//2),
    matching librosa.filters.mel(htk=False, norm=1)."""
    if fmax is None:
        fmax = sr / 2.0
    n_bins = 1 + n_fft // 2
    fft_freqs = np.linspace(0, sr / 2.0, n_bins)
    mel_pts = np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax),
                          n_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    weights = np.zeros((n_mels, n_bins))
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    # slaney area normalization
    enorm = 2.0 / (hz_pts[2:n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _dft_matrices(n_fft: int) -> Tuple[np.ndarray, np.ndarray]:
    """Windowed real-DFT matrices (n_fft, n_bins): frames @ cos, frames @ sin."""
    n_bins = 1 + n_fft // 2
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    w = hann_window(n_fft)[:, None]
    return ((np.cos(ang) * w).astype(np.float32),
            (-np.sin(ang) * w).astype(np.float32))


def frame_signal(y: jnp.ndarray, n_fft: int = N_FFT, hop: int = HOP,
                 center: bool = True) -> jnp.ndarray:
    """(B, T) PCM -> (B, num_frames, n_fft) frames. center=True reflect-pads
    n_fft//2 on both sides (librosa 0.7.2 stft semantics)."""
    if center:
        y = jnp.pad(y, ((0, 0), (n_fft // 2, n_fft // 2)), mode='reflect')
    t = y.shape[-1]
    num_frames = 1 + (t - n_fft) // hop
    idx = (np.arange(num_frames)[:, None] * hop +
           np.arange(n_fft)[None, :])
    return y[:, idx]


@functools.partial(jax.jit, static_argnames=('n_fft', 'hop', 'center'))
def power_spectrogram(y: jnp.ndarray, n_fft: int = N_FFT, hop: int = HOP,
                      center: bool = True) -> jnp.ndarray:
    """(B, T) -> (B, n_bins, num_frames) power spectrogram |STFT|^2."""
    frames = frame_signal(y.astype(jnp.float32), n_fft, hop, center)
    cos_m, sin_m = _dft_matrices(n_fft)
    re = jnp.dot(frames, jnp.asarray(cos_m),
                 preferred_element_type=jnp.float32)
    im = jnp.dot(frames, jnp.asarray(sin_m),
                 preferred_element_type=jnp.float32)
    power = re * re + im * im                 # (B, F, n_bins)
    return jnp.swapaxes(power, 1, 2)


@functools.partial(jax.jit, static_argnames=('sr', 'n_fft', 'hop', 'n_mels'))
def melspectrogram(y: jnp.ndarray, sr: int = SR, n_fft: int = N_FFT,
                   hop: int = HOP, n_mels: int = N_MELS) -> jnp.ndarray:
    """(B, T) PCM -> (B, n_mels, num_frames) mel power spectrogram,
    matching librosa.feature.melspectrogram layout."""
    power = power_spectrogram(y, n_fft, hop)          # (B, bins, frames)
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels))
    return jnp.einsum('mb,kbf->kmf', fb, power,
                      preferred_element_type=jnp.float32)


def power_to_db(S: jnp.ndarray, top_db: float = 80.0,
                amin: float = 1e-10) -> jnp.ndarray:
    """librosa.power_to_db(S, ref=np.max) per clip: 10*log10(max(S, amin))
    - 10*log10(max(ref, amin)), then clipped at (max - top_db). The ref max
    is taken over each clip (leading axis)."""
    S = S.astype(jnp.float32)
    ref = jnp.max(S, axis=tuple(range(1, S.ndim)), keepdims=True)
    log_spec = 10.0 * jnp.log10(jnp.maximum(S, amin))
    log_spec = log_spec - 10.0 * jnp.log10(jnp.maximum(ref, amin))
    peak = jnp.max(log_spec, axis=tuple(range(1, S.ndim)), keepdims=True)
    return jnp.maximum(log_spec, peak - top_db)


@functools.partial(jax.jit, static_argnames=('sr', 'n_fft', 'hop', 'n_mels'))
def log_mel_batch(pcm: jnp.ndarray, sr: int = SR, n_fft: int = N_FFT,
                  hop: int = HOP, n_mels: int = N_MELS) -> jnp.ndarray:
    """(B, M, T) multi-mic PCM -> (B, n_mels, frames, M) log-mel stack,
    the runtime shape chain of MultimodalDetection (stack 8 mel specs then
    transpose to (80, T, 8), reference src/datasets/MultimodalDetection.py:
    219-224). power_to_db normalizes per (clip, mic) like the reference's
    per-file pickles."""
    b, m, t = pcm.shape
    mel = melspectrogram(pcm.reshape(b * m, t), sr, n_fft, hop, n_mels)
    db = power_to_db(mel)
    db = db.reshape(b, m, n_mels, -1)
    return jnp.transpose(db, (0, 2, 3, 1))
