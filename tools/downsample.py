"""Resample a directory of wavs to a target rate (reference
tools/sox_downsample.py shelled out to the sox binary; this uses a polyphase
resampler in-process — no external binary)."""

import glob
import os
from argparse import ArgumentParser
from concurrent.futures import ThreadPoolExecutor
from fractions import Fraction

import numpy as np
from scipy.signal import resample_poly

from nsynth_wavenet_tpu.data.dataset import read_wav, write_wav


def downsample_file(src: str, dst: str, target_sr: int):
    wav, sr = read_wav(src)
    if sr != target_sr:
        frac = Fraction(target_sr, sr)
        wav = resample_poly(wav, frac.numerator, frac.denominator).astype(np.float32)
    write_wav(dst, np.clip(wav, -1.0, 1.0), target_sr)


def downsample_dir(wave_dir: str, out_dir: str, target_sr: int = 16000, workers: int = 8):
    os.makedirs(out_dir, exist_ok=True)
    files = sorted(glob.glob(os.path.join(wave_dir, "*.wav")))
    with ThreadPoolExecutor(max_workers=workers) as ex:
        list(
            ex.map(
                lambda f: downsample_file(
                    f, os.path.join(out_dir, os.path.basename(f)), target_sr
                ),
                files,
            )
        )
    print(f"resampled {len(files)} files to {target_sr} Hz in {out_dir}")


if __name__ == "__main__":
    parser = ArgumentParser()
    parser.add_argument("--wave_dir", required=True)
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--sample_rate", default=16000, type=int)
    parser.add_argument("--num_workers", default=8, type=int)
    args = parser.parse_args()
    downsample_dir(args.wave_dir, args.out_dir, args.sample_rate, args.num_workers)
