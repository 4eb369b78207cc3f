from nsynth_wavenet_tpu.models import (  # noqa: F401
    fastgen,
    parallel_wavenet,
    parallelgen,
    wavenet,
)
