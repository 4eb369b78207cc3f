"""Write audible free-run generations from every committed golden
checkpoint into tests/golden/ (the analog of the reference's committed
per-config generations, tests/pred_data-*, Readme.md:93-107).

The quantitative gates live in test_golden_regression.py /
tpu_kernel_parity.py; these wavs exist so a human can LISTEN to what each
head's sampler produces from its committed trained weights.

Usage (TPU, ~2 min): python tools/make_golden_wavs.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from nsynth_wavenet_tpu.data.dataset import write_wav
    from nsynth_wavenet_tpu.models.fastgen import Fastgen
    from nsynth_wavenet_tpu.utils.compile_cache import enable_persistent_cache
    from tools.make_golden_ckpt import (_GOLDEN_ROOT, available_heads,
                                        eval_mels, load_golden)

    enable_persistent_cache()
    mels, _ = eval_mels(n=4)
    for head in available_heads():
        model, params, meta = load_golden(head)
        fg = Fastgen(model)
        audio = np.asarray(
            jax.jit(lambda p, m, fg=fg: fg.generate(p, m, jax.random.PRNGKey(7)))(
                params, mels
            )
        )
        assert np.isfinite(audio).all()
        for i in range(len(mels)):
            path = os.path.join(_GOLDEN_ROOT, f"gen_golden_{head}_{i}.wav")
            write_wav(path, audio[i])
            print("wrote", path)


if __name__ == "__main__":
    main()
