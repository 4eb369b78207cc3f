"""Dataset build + loading.

Replaces the reference's TFRecord + queue-runner pipeline
(build_dataset.py, auxilaries/reader.py) with a TPU-friendly design:

  * **Format**: one flat ``data.bin`` of concatenated float32 PCM plus an
    ``index.json`` with per-record (id, offset, length).  Memory-mapped,
    so random crops are O(crop) reads with zero deserialization — the
    reference decodes protobuf bytes per example (reader.py:76-81).
  * **Loading**: seeded numpy random crops on the host with a
    double-buffered background prefetch thread; *no* mel here — mel/STFT
    runs on device inside the jitted train step (the reference crosses
    into librosa through tf.py_func for every example, reader.py:90).
  * **Multi-host**: ``process_index``/``process_count`` shard the record
    space deterministically; seeds fold in the process index, replacing
    nondeterministic shuffle queues (SURVEY.md §5 hard part 6).

Wav I/O uses scipy (PCM/float WAV); no librosa/sox dependency.
"""

import glob
import json
import os
import queue
import threading

import numpy as np

from nsynth_wavenet_tpu.data.native import native as _native_mod

INDEX_NAME = "index.json"
DATA_NAME = "data.bin"


def read_wav(path: str, expect_sr: int = None):
    """Read a wav file -> (float32 mono waveform in [-1, 1], sample_rate)."""
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        wav = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        wav = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        wav = (data.astype(np.float32) - 128.0) / 128.0
    else:
        wav = data.astype(np.float32)
    if wav.ndim == 2:
        wav = wav.mean(axis=1)
    if expect_sr is not None and sr != expect_sr:
        raise ValueError(f"{path}: sample rate {sr} != expected {expect_sr}")
    return wav, sr


def write_wav(path: str, wav: np.ndarray, sr: int = 16000):
    from scipy.io import wavfile

    wav = np.clip(np.asarray(wav, np.float32), -1.0, 1.0)
    wavfile.write(path, sr, (wav * 32767.0).astype(np.int16))


def build_dataset(
    wave_dir: str,
    save_dir: str,
    sample_rate: int = 16000,
    min_len: int = 16000,
    num_workers: int = 10,
):
    """wav dir -> {data.bin, index.json}.  Pads records shorter than
    ``min_len`` (reference build_dataset.py:20-40) and reports duration."""
    from concurrent.futures import ThreadPoolExecutor

    wave_files = sorted(glob.glob(os.path.join(wave_dir, "*.wav")))
    if not wave_files:
        raise ValueError(f"no .wav files in {wave_dir}")
    os.makedirs(save_dir, exist_ok=True)

    def _load(wf):
        wav, sr = read_wav(wf)
        if sr != sample_rate:
            raise ValueError(
                f"{wf}: sample rate {sr} != {sample_rate}; resample first "
                "(tools/downsample.py)"
            )
        orig_len = len(wav)
        if orig_len < min_len:
            wav = np.pad(wav, (0, min_len - orig_len))
        return os.path.splitext(os.path.basename(wf))[0], wav.astype(np.float32), orig_len

    with ThreadPoolExecutor(max_workers=num_workers) as ex:
        results = list(ex.map(_load, wave_files))

    records = []
    offset = 0
    total_samples = 0
    padded = 0
    with open(os.path.join(save_dir, DATA_NAME), "wb") as f:
        for audio_id, wav, orig_len in results:
            f.write(wav.tobytes())
            records.append({"id": audio_id, "offset": offset, "length": len(wav)})
            offset += len(wav)
            total_samples += orig_len
            padded += int(orig_len < min_len)
    index = {"sample_rate": sample_rate, "records": records}
    with open(os.path.join(save_dir, INDEX_NAME), "wt") as f:
        json.dump(index, f)
    print(f"total duration: {total_samples / sample_rate / 3600.0:.5f} hours")
    print(f"padded samples: {padded}/{len(records)} pieces")
    return index


def build_dataset_from_arrays(waves, ids, save_dir, sample_rate: int = 16000):
    """Build a dataset directly from in-memory arrays (tests/benchmarks)."""
    os.makedirs(save_dir, exist_ok=True)
    records = []
    offset = 0
    with open(os.path.join(save_dir, DATA_NAME), "wb") as f:
        for audio_id, wav in zip(ids, waves):
            wav = np.asarray(wav, np.float32)
            f.write(wav.tobytes())
            records.append({"id": audio_id, "offset": offset, "length": len(wav)})
            offset += len(wav)
    index = {"sample_rate": sample_rate, "records": records}
    with open(os.path.join(save_dir, INDEX_NAME), "wt") as f:
        json.dump(index, f)
    return index


class Dataset:
    """Memory-mapped random-crop loader.

    Equivalent role to reference auxilaries/reader.py Dataset, minus the mel
    (done on device) and the queue runners (seeded numpy instead).
    """

    def __init__(
        self,
        path: str,
        process_index: int = 0,
        process_count: int = 1,
        use_native: bool = True,
    ):
        """path: dataset directory (or its index.json).  use_native: gather
        crops with the C++ sampler when it builds/loads (numpy otherwise)."""
        if path.endswith(".json"):
            path = os.path.dirname(path)
        self.dir = path
        with open(os.path.join(path, INDEX_NAME), "rt") as f:
            index = json.load(f)
        self.sample_rate = index["sample_rate"]
        records = index["records"]
        # deterministic per-process shard of the record space
        self.records = records[process_index::process_count]
        if not self.records:
            raise ValueError("dataset shard is empty")
        self.data = np.memmap(os.path.join(path, DATA_NAME), dtype=np.float32, mode="r")
        self._offsets = np.array([r["offset"] for r in self.records], np.int64)
        self._lengths = np.array([r["length"] for r in self.records], np.int64)
        self._native = use_native and _native_mod.load() is not None

    def __len__(self):
        return len(self.records)

    def get_record(self, i: int) -> np.ndarray:
        o, l = int(self._offsets[i]), int(self._lengths[i])
        return np.asarray(self.data[o : o + l])

    def random_crop_batch(self, rng: np.random.Generator, batch_size: int, length: int):
        """Uniformly sample records and crop ``length`` samples from each.

        Records shorter than ``length`` are zero-padded at the end.
        Returns float32 [batch_size, length].

        Record/start selection is seeded numpy; the gather itself runs in the
        native C++ sampler when available (data/native/sampler.cpp — the
        role the reference delegates to TF's C++ TFRecord/queue kernels,
        reader.py:83-106) and otherwise in numpy.  Both paths produce
        bit-identical batches (tests/test_native_sampler.py).
        """
        idx = rng.integers(0, len(self.records), size=batch_size)
        # vectorized per-row start draw: span 1 (start 0) for records not
        # longer than the crop, else uniform over the valid range
        spans = np.maximum(self._lengths[idx] - length + 1, 1)
        starts = rng.integers(0, spans, size=batch_size).astype(np.int64)
        out = np.empty((batch_size, length), np.float32)
        # thread-spawn costs ~0.1 ms/thread: worth it only for big gathers
        # (measured: 1-thread native ~2x numpy at B>=64; 8 threads 5-8x at
        # B>=512 x 7680; below ~8 MB threads are a net loss)
        n_threads = 8 if batch_size * length >= 2_000_000 else 0
        if self._native and _native_mod.crop_gather(
            self.data, self._offsets, self._lengths,
            idx.astype(np.int64), starts, length, out,
            n_threads=n_threads,
        ):
            return out
        for j, i in enumerate(idx):
            o, l = int(self._offsets[i]), int(self._lengths[i])
            if l <= length:
                out[j, :l] = self.data[o : o + l]
                out[j, l:] = 0.0
            else:
                start = int(starts[j])
                out[j] = self.data[o + start : o + start + length]
        return out

    def batch_iterator(self, batch_size: int, length: int, seed: int = 0, prefetch: int = 2):
        """Infinite iterator with a background prefetch thread."""
        rng = np.random.default_rng(seed)
        q: "queue.Queue[np.ndarray]" = queue.Queue(maxsize=prefetch)
        stop = threading.Event()

        def _worker():
            while not stop.is_set():
                batch = self.random_crop_batch(rng, batch_size, length)
                while not stop.is_set():
                    try:
                        q.put(batch, timeout=0.5)
                        break
                    except queue.Full:
                        continue

        t = threading.Thread(target=_worker, daemon=True)
        t.start()

        class _Iter:
            def __iter__(self):
                return self

            def __next__(self):
                return q.get()

            def close(self):
                stop.set()

        return _Iter()

    def sequential_batches(self, batch_size: int, length: int):
        """Single-epoch, in-order batches with front-of-record crops — the
        reference reader's is_training=False path (reader.py:98-105).
        Yields float32 [<=batch_size, length]."""
        n = len(self.records)
        for start in range(0, n, batch_size):
            idx = np.arange(start, min(start + batch_size, n), dtype=np.int64)
            out = np.empty((len(idx), length), np.float32)
            if self._native and _native_mod.crop_gather(
                self.data, self._offsets, self._lengths,
                idx, np.zeros(len(idx), np.int64), length, out, n_threads=0,
            ):
                yield out
                continue
            out[:] = 0.0
            for j, i in enumerate(idx):
                o, l = int(self._offsets[i]), int(self._lengths[i])
                take = min(l, length)
                out[j, :take] = self.data[o : o + take]
            yield out

    def get_init_batch(self, batch_size: int, seq_len: int, first_n: int = 1000, seed: int = 0):
        """Random crops from the first ``first_n`` records, for data-dependent
        init (reference auxilaries/reader.py:117-137)."""
        rng = np.random.default_rng(seed)
        n = min(first_n, len(self.records))
        chosen = rng.permutation(n)[:batch_size]
        # with replacement if the dataset is tiny
        if len(chosen) < batch_size:
            chosen = rng.integers(0, n, size=batch_size)
        chosen = chosen.astype(np.int64)
        spans = np.maximum(self._lengths[chosen] - seq_len + 1, 1)
        starts = rng.integers(0, spans, size=batch_size).astype(np.int64)
        out = np.empty((batch_size, seq_len), np.float32)
        if self._native and _native_mod.crop_gather(
            self.data, self._offsets, self._lengths, chosen, starts, seq_len,
            out, n_threads=8 if batch_size * seq_len >= 2_000_000 else 0,
        ):
            return out
        for j, i in enumerate(chosen):
            o, l = int(self._offsets[i]), int(self._lengths[i])
            if l <= seq_len:
                out[j, :l] = self.data[o : o + l]
                out[j, l:] = 0.0
            else:
                out[j] = self.data[o + starts[j] : o + starts[j] + seq_len]
        return out


def spec_feat_mean_std(
    train_path: str,
    feat_fn,
    batch_size: int = 4096,
    seq_len: int = 7680,
    first_n: int = 10000,
    chunk: int = 256,
    seed: int = 0,
):
    """Per-frequency mean/std of an STFT feature over a large sample batch
    (reference auxilaries/reader.py:140-156; used to normalize the power
    loss).  Computed on device in chunks with a running-moment accumulator
    instead of one 4096x7680 host session.run."""
    import jax.numpy as jnp

    from nsynth_wavenet_tpu.ops import stft as stft_ops

    ds = Dataset(train_path)
    waves = ds.get_init_batch(batch_size, seq_len, first_n=first_n, seed=seed)

    count = 0
    mean = None
    m2 = None
    for i in range(0, batch_size, chunk):
        w = waves[i : i + chunk]
        feat = np.asarray(feat_fn(stft_ops.stft_pad_end(jnp.asarray(w))))
        f2 = feat.reshape(-1, feat.shape[-1]).astype(np.float64)
        n = f2.shape[0]
        cm = f2.mean(axis=0)
        cv = f2.var(axis=0)
        if mean is None:
            mean, m2, count = cm, cv * n, n
        else:
            delta = cm - mean
            tot = count + n
            mean = mean + delta * n / tot
            m2 = m2 + cv * n + delta**2 * count * n / tot
            count = tot
    std = np.sqrt(m2 / count)
    return mean.astype(np.float32), std.astype(np.float32)


def make_synthetic_dataset(save_dir, n_records=32, length=32000, sr=16000, seed=0):
    """Synthetic speech-like dataset (harmonic + noise bursts) for tests and
    benchmarks — stands in for LJSpeech where no corpus is mounted."""
    rng = np.random.default_rng(seed)
    waves, ids = [], []
    t = np.arange(length) / sr
    for i in range(n_records):
        f0 = rng.uniform(80, 250)
        env = 0.4 * (0.6 + 0.4 * np.sin(2 * np.pi * rng.uniform(1, 4) * t))
        w = env * (
            np.sin(2 * np.pi * f0 * t)
            + 0.4 * np.sin(2 * np.pi * 2 * f0 * t + rng.uniform(0, 6))
            + 0.15 * np.sin(2 * np.pi * 3 * f0 * t + rng.uniform(0, 6))
        )
        w = w + 0.02 * rng.standard_normal(length)
        waves.append(np.clip(w, -0.999, 0.999).astype(np.float32))
        ids.append(f"synthetic_{i:04d}")
    return build_dataset_from_arrays(waves, ids, save_dir, sample_rate=sr)
