from nsynth_wavenet_tpu.training import checkpoint, optimizer, train_lib  # noqa: F401
