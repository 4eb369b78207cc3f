"""Host-side input-pipeline benchmark: native C++ crop-gather vs numpy.

The reference's input pipeline runs inside TF's C++ runtime (TFRecordReader +
shuffle-queue kernels, auxilaries/reader.py:83-106); here the equivalent
native component is data/native/sampler.cpp.  This measures the end-to-end
``Dataset.random_crop_batch`` host cost (selection + gather) both ways.

The loader is never the training bottleneck (a B=8 batch costs ~0.1 ms vs a
~106 ms train step), so this is a correctness-of-design record, not a
headline number: it shows the native path matters exactly where batches get
big (the 4096-crop init/stats batches and large serving sweeps).

Run: python benchmarks/bench_loader.py   (CPU only, ~30 s)
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nsynth_wavenet_tpu.data import dataset as ds_lib


def main():
    tmp = tempfile.mkdtemp()
    rng = np.random.default_rng(0)
    waves = [rng.standard_normal(160000).astype(np.float32) for _ in range(256)]
    ds_lib.build_dataset_from_arrays(waves, [f"u{i}" for i in range(256)], tmp)

    print(f"{'batch':>6} {'numpy ms':>10} {'native ms':>10} {'speedup':>8}")
    for batch in (8, 64, 512, 4096):
        times = []
        for use_native in (False, True):
            ds = ds_lib.Dataset(tmp, use_native=use_native)
            assert ds._native == use_native or not use_native
            ds.random_crop_batch(np.random.default_rng(0), batch, 7680)  # warm
            reps = 50 if batch <= 512 else 10
            t0 = time.perf_counter()
            for s in range(reps):
                ds.random_crop_batch(np.random.default_rng(s), batch, 7680)
            times.append((time.perf_counter() - t0) / reps * 1e3)
        print(f"{batch:>6} {times[0]:>10.3f} {times[1]:>10.3f} {times[0] / times[1]:>7.2f}x")


if __name__ == "__main__":
    main()
