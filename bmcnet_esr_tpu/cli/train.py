"""Training CLI.

Usage (mirrors the reference ``python train.py -c config/train_nfs.yml``,
``scripts/train_ours.sh:3-11``):

    python -m bmcnet_esr_tpu.cli.train -c configs/train_nfs.yml \
        [-id RUNID] [-seed N] [-r CKPT_PATH] [--reset] \
        [-lr 1e-4] [-bs 2] [-o key;path value ...]

CLI overrides address config paths with ``;`` separators
(reference ``config/parser.py:93-112`` / ``train.py:699-703``).
"""

from __future__ import annotations

import argparse
import ast
import random
from typing import List, Tuple

import numpy as np


def parse_overrides(args) -> List[Tuple[str, object]]:
    overrides: List[Tuple[str, object]] = []
    if args.learning_rate is not None:
        overrides.append(("optimizer;args;lr", args.learning_rate))
    if args.batch_size is not None:
        overrides.append(("train_dataloader;batch_size", args.batch_size))
        overrides.append(("valid_dataloader;batch_size", args.batch_size))
    for target, raw in args.override or []:
        try:
            value = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            value = raw
        overrides.append((target, value))
    return overrides


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="bmcnet_esr_tpu trainer")
    p.add_argument("-c", "--config", required=True)
    p.add_argument("-id", "--runid", default=None)
    p.add_argument("-seed", "--seed", default=3407, type=int)
    p.add_argument("-r", "--resume", default=None)
    p.add_argument("--reset", action="store_true",
                   help="load weights from --resume but reset trainer state")
    p.add_argument("-lr", "--learning_rate", type=float, default=None)
    p.add_argument("-bs", "--batch_size", type=int, default=None)
    p.add_argument("-o", "--override", nargs=2, action="append",
                   metavar=("PATH", "VALUE"), help="config override: 'a;b;c' value")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host SPMD: jax.distributed.initialize() per host "
                        "(coordinator via JAX_COORDINATOR_ADDRESS et al.)")
    args = p.parse_args(argv)

    if args.distributed:
        import jax

        jax.distributed.initialize()

    # seed host-side RNGs (device RNG keys derive from the seed explicitly)
    random.seed(args.seed)
    np.random.seed(args.seed)

    from bmcnet_esr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bmcnet_esr_tpu.training.config import RunConfig
    from bmcnet_esr_tpu.training.trainer import Trainer
    from bmcnet_esr_tpu.utils.logging import get_logger

    run = RunConfig.from_file(args.config, runid=args.runid, overrides=parse_overrides(args))
    logger = get_logger("train")
    logger.info(f"run dir: {run.save_dir}")

    trainer = Trainer(run, seed=args.seed, logger=logger)
    start = 0
    if args.resume:
        start = trainer.resume(args.resume, reset=args.reset)
    trainer.train(start_iteration=start)


if __name__ == "__main__":
    main()
