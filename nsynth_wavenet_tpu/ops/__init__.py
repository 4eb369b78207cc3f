from nsynth_wavenet_tpu.ops import conv, distributions, signal, stft  # noqa: F401
