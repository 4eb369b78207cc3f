"""Parallel WaveNet student distillation CLI
(reference train_parallel_wavenet.py)."""

from argparse import ArgumentParser

from nsynth_wavenet_tpu.training import runner

if __name__ == "__main__":
    from nsynth_wavenet_tpu.utils.compile_cache import enable_persistent_cache

    from nsynth_wavenet_tpu.utils.platform import apply_env_platform

    apply_env_platform()
    enable_persistent_cache()
    parser = ArgumentParser()
    parser.add_argument("--config", default="", help="Student config json")
    parser.add_argument("--train_path", required=True, help="Dataset directory")
    parser.add_argument("--teacher_dir", required=True,
                        help="Run dir of the trained teacher (json + ckpt)")
    parser.add_argument("--logdir", default="/tmp/nsynth_pwn_tpu",
                        help="Existing run directory to resume")
    parser.add_argument("--log_root", default="",
                        help="Root for a new run directory")
    parser.add_argument("--total_batch_size", default=4, type=int)
    parser.add_argument("--num_steps", default=None, type=int)
    parser.add_argument("--ckpt_every_steps", default=2000, type=int)
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--multihost", action="store_true",
                        help="initialize jax.distributed (TPU pod)")
    parser.add_argument("--profile_steps", default=0, type=int,
                        help="capture a jax.profiler trace over N steps")
    parser.add_argument("--n_model", default=1, type=int,
                        help="channel tensor-parallel mesh extent")
    parser.add_argument("--n_seq", default=1, type=int,
                        help="sequence-parallel mesh extent")
    args = parser.parse_args()
    runner.train_parallel_wavenet(
        train_path=args.train_path,
        teacher_dir=args.teacher_dir,
        config_path=args.config,
        log_root=args.log_root,
        logdir=args.logdir,
        total_batch_size=args.total_batch_size,
        num_steps=args.num_steps,
        ckpt_every_steps=args.ckpt_every_steps,
        seed=args.seed,
        multihost=args.multihost,
        profile_steps=args.profile_steps,
        n_model=args.n_model,
        n_seq=args.n_seq,
    )
