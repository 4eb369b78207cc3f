"""nsynth_wavenet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) neural-vocoder framework.

Re-implements the capabilities of bfs18/nsynth_wavenet (TF 1.x, GPU) as a
TPU-first design:

  * Teacher WaveNet (mel-conditioned, CE / MoL / single-Gaussian heads)
  * Device-resident autoregressive fast generation (one XLA program per
    utterance via ``lax.scan`` ring buffers — replaces per-sample
    ``session.run`` round trips of the reference, fastgen.py:156-168)
  * Parallel WaveNet IAF student with probability-density distillation
    (MC logistic KL / closed-form Gaussian KL + STFT power loss +
    contrastive loss)
  * One-shot parallel synthesis
  * On-device mel/STFT frontend (replaces the reference's librosa
    ``tf.py_func`` host round trip, auxilaries/reader.py:90)
  * SPMD data-parallel (+ channel tensor-parallel) training over a
    ``jax.sharding.Mesh``

Layer map mirrors SURVEY.md §1: ops -> models -> generation -> training.
"""

__version__ = "0.1.0"
