"""Training CLI: ``python -m loongx_tpu.cli.train [--config path]``.

Equivalent of ``accelerate launch -m src.train.train`` with XFL_CONFIG
(reference train/script/train_seed_loongx.sh:1-13) — one process drives the
whole mesh, so no launcher is needed.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description="LoongX-TPU training")
    parser.add_argument("--config", type=str, default=None,
                        help="YAML config (default: $XFL_CONFIG)")
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--no_resume", action="store_true")
    parser.add_argument("--no_wandb", action="store_true")
    args = parser.parse_args(argv)

    from loongx_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from loongx_tpu.config import load_config
    from loongx_tpu.train.loop import train

    config = load_config(args.config)
    summary = train(
        config,
        max_steps=args.max_steps,
        resume=not args.no_resume,
        use_wandb=False if args.no_wandb else None,
    )
    print(f"[train] done: {summary}")


if __name__ == "__main__":
    main()
