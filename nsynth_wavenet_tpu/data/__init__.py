from nsynth_wavenet_tpu.data import dataset  # noqa: F401
