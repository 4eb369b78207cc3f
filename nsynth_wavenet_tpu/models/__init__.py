from nsynth_wavenet_tpu.models import wavenet  # noqa: F401
