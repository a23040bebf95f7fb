#!/usr/bin/env python
"""Offline audio preprocessing: mp3/wav -> log-mel spectrogram pickles.

Public CLI matching the reference (reference mp3_to_pkl.py:18-42):

    python mp3_to_pkl.py --dir <drive-or-dataset-path>

The reference decodes each mp3 with librosa and computes the mel spectrogram
file-at-a-time on CPU. Here decode stays on host (ffmpeg subprocess when
available, stdlib wave for .wav) but the STFT+mel+dB math runs BATCHED
through the jit'd GEMM-native frontend (mm_distillnet_tpu.ops.audio) — many
clips per device dispatch. Output pickles are drop-in compatible:
(80, T) float32 dB arrays, one per mic file.
"""
from __future__ import annotations

import argparse
import glob
import os
import pickle
import shutil
import subprocess
import wave

import os as _os
if _os.environ.get('MMDT_PLATFORM'):
    import jax as _jax
    _jax.config.update('jax_platforms', _os.environ['MMDT_PLATFORM'])
import numpy as np

SR = 44100


def decode_audio(path: str, sr: int = SR) -> np.ndarray:
    """Decode mp3/wav to mono float32 PCM at `sr` (librosa.load semantics:
    mono mix-down, [-1, 1] floats)."""
    if path.endswith('.wav'):
        with wave.open(path, 'rb') as w:
            n = w.getnframes()
            raw = w.readframes(n)
            width = w.getsampwidth()
            channels = w.getnchannels()
            rate = w.getframerate()
        dtype = {1: np.uint8, 2: np.int16, 4: np.int32}[width]
        pcm = np.frombuffer(raw, dtype=dtype).astype(np.float32)
        if width == 1:
            pcm = (pcm - 128.0) / 128.0
        else:
            pcm = pcm / float(np.iinfo(dtype).max)
        if channels > 1:
            pcm = pcm.reshape(-1, channels).mean(axis=1)
        if rate != sr:
            x = np.arange(len(pcm)) / rate
            xi = np.arange(int(len(pcm) * sr / rate)) / sr
            pcm = np.interp(xi, x, pcm).astype(np.float32)
        return pcm
    if shutil.which('ffmpeg') is None:
        raise RuntimeError(
            f'cannot decode {path}: ffmpeg not available (wav is supported '
            'natively)')
    out = subprocess.run(
        ['ffmpeg', '-v', 'quiet', '-i', path, '-f', 'f32le', '-ac', '1',
         '-ar', str(sr), 'pipe:1'],
        check=True, stdout=subprocess.PIPE)
    return np.frombuffer(out.stdout, dtype=np.float32)


def process_files(files, batch_size: int = 16):
    import jax.numpy as jnp
    from mm_distillnet_tpu.ops.audio import melspectrogram, power_to_db

    for start in range(0, len(files), batch_size):
        chunk = files[start:start + batch_size]
        pcms = [decode_audio(f) for f in chunk]
        max_len = max(len(p) for p in pcms)
        batch = np.zeros((len(pcms), max_len), np.float32)
        for i, p in enumerate(pcms):
            batch[i, :len(p)] = p
        mel = melspectrogram(jnp.asarray(batch))
        db = power_to_db(mel)
        db = np.asarray(db)
        for i, f in enumerate(chunk):
            n_frames = 1 + len(pcms[i]) // 256
            out_path = os.path.splitext(f)[0] + '.pkl'
            with open(out_path, 'wb') as handle:
                pickle.dump(db[i, :, :n_frames].astype(np.float32), handle,
                            protocol=pickle.HIGHEST_PROTOCOL)
            print(out_path)


def main(argv=None):
    parser = argparse.ArgumentParser(description='Get the audio inputs')
    parser.add_argument('--dir', required=True,
                        help='The drive directory or the dataset path')
    parser.add_argument('--batch_size', type=int, default=16)
    args = parser.parse_args(argv)

    pattern = 'audio/*' if 'drive' in args.dir else '*/audio/*'
    files = sorted(
        glob.glob(os.path.join(args.dir, pattern + 'mp3')) +
        glob.glob(os.path.join(args.dir, pattern + 'wav')))
    if not files:
        print(f'no audio files under {args.dir}')
        return
    process_files(files, args.batch_size)


if __name__ == '__main__':
    main()
