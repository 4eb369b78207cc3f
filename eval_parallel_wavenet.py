"""Parallel WaveNet one-shot synthesis CLI
(reference eval_parallel_wavenet.py)."""

from argparse import ArgumentParser

from nsynth_wavenet_tpu import evaluation

if __name__ == "__main__":
    parser = ArgumentParser()
    parser.add_argument("--source_path", required=True,
                        help="wav/npy file or directory")
    parser.add_argument("--ckpt_dir", required=True,
                        help="student run directory (json + ckpt)")
    parser.add_argument("--save_path", required=True,
                        help="output wav directory")
    parser.add_argument("--batch_size", default=4, type=int)
    parser.add_argument("--seed", default=0, type=int)
    args = parser.parse_args()
    evaluation.generate_parallel_wavenet(
        args.source_path, args.ckpt_dir, args.save_path, args.batch_size, args.seed
    )
