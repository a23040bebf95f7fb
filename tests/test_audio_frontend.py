"""Audio frontend parity vs numpy/scipy oracles and cv2 bicubic resize."""
import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from mm_distillnet_tpu.ops.audio import (frame_signal, hann_window,
                                         log_mel_batch, mel_filterbank,
                                         melspectrogram, power_spectrogram,
                                         power_to_db)
from mm_distillnet_tpu.ops.resize import resize_bicubic, resize_matrix


def _np_stft_power(y, n_fft=1024, hop=256):
    """Oracle: numpy rFFT STFT with reflect pad + periodic hann (librosa
    0.7.2 defaults)."""
    ypad = np.pad(y, n_fft // 2, mode='reflect')
    win = hann_window(n_fft)
    frames = []
    for start in range(0, len(ypad) - n_fft + 1, hop):
        frames.append(ypad[start:start + n_fft] * win)
    spec = np.fft.rfft(np.stack(frames), axis=-1)
    return (np.abs(spec) ** 2).T  # (bins, frames)


def test_power_spectrogram_matches_fft_oracle():
    rng = np.random.default_rng(0)
    y = rng.normal(size=8192).astype(np.float32)
    ours = np.asarray(power_spectrogram(jnp.asarray(y[None])))[0]
    oracle = _np_stft_power(y)
    assert ours.shape == oracle.shape
    np.testing.assert_allclose(ours, oracle, rtol=2e-3, atol=2e-3)


def test_mel_filterbank_matches_librosa_semantics():
    fb = mel_filterbank(44100, 1024, 80)
    assert fb.shape == (80, 513)
    # triangle filters: non-negative, each filter has support
    assert (fb >= 0).all()
    assert (fb.sum(axis=1) > 0).all()
    # slaney area norm: peak amplitudes decrease with center frequency in
    # the log region
    peaks = fb.max(axis=1)
    assert peaks[10] > peaks[70]


def test_melspectrogram_pipeline_shapes():
    rng = np.random.default_rng(1)
    y = rng.normal(size=(2, 44100)).astype(np.float32)  # 1 second
    mel = np.asarray(melspectrogram(jnp.asarray(y)))
    # librosa: 1 + T // hop frames with center padding
    assert mel.shape == (2, 80, 1 + 44100 // 256)
    assert np.isfinite(mel).all()


def test_power_to_db_ref_max_semantics():
    rng = np.random.default_rng(2)
    S = rng.uniform(1e-6, 10.0, size=(1, 80, 100)).astype(np.float32)
    db = np.asarray(power_to_db(jnp.asarray(S)))
    assert db.max() <= 1e-5          # ref=max -> peak at 0 dB
    assert db.min() >= db.max() - 80.0 - 1e-4  # top_db clip


def test_log_mel_batch_multimic_layout():
    rng = np.random.default_rng(3)
    pcm = rng.normal(size=(2, 8, 22016)).astype(np.float32)
    out = np.asarray(log_mel_batch(jnp.asarray(pcm)))
    assert out.shape == (2, 80, 1 + 22016 // 256, 8)
    # per-(clip, mic) ref=max normalization: every mic channel peaks at 0 dB
    assert np.allclose(out.max(axis=(1, 2)), 0.0, atol=1e-4)


@pytest.mark.parametrize('shape,out', [((80, 172), (768, 768)),
                                       ((100, 50), (37, 75))])
def test_bicubic_resize_matches_cv2(shape, out):
    rng = np.random.default_rng(4)
    img = rng.normal(size=shape + (3,)).astype(np.float32)
    ours = np.asarray(resize_bicubic(jnp.asarray(img), out[0], out[1]))
    want = cv2.resize(img, dsize=(out[1], out[0]),
                      interpolation=cv2.INTER_CUBIC)
    np.testing.assert_allclose(ours, want, rtol=1e-3, atol=1e-3)


def test_resize_matrix_rows_sum_to_one():
    m = resize_matrix(768, 80)
    np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-5)
