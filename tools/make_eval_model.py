"""Export an EMA-weights-only checkpoint from a training run, for shipping
eval models (reference tools/make_eval_model.py:8-34, which rewrote a TF
checkpoint keeping only the EMA shadow variables)."""

import os
from argparse import ArgumentParser


def save_eval_model(run_dir: str, out_dir: str = None):
    from nsynth_wavenet_tpu.evaluation import load_eval_model
    from nsynth_wavenet_tpu.training import checkpoint as ckpt_lib

    _, ema_params = load_eval_model(run_dir)
    out_dir = out_dir or os.path.join(run_dir, "ema")
    ckpt_lib.export_ema({"ema": ema_params}, out_dir)
    print(f"EMA eval model written to {out_dir}")
    return out_dir


if __name__ == "__main__":
    parser = ArgumentParser()
    parser.add_argument("--run_dir", required=True,
                        help="training run directory (json + ckpt)")
    parser.add_argument("--out_dir", default=None,
                        help="output dir (default <run_dir>/ema)")
    args = parser.parse_args()
    save_eval_model(args.run_dir, args.out_dir)
