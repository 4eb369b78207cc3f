from nsynth_wavenet_tpu.parallel import mesh  # noqa: F401
