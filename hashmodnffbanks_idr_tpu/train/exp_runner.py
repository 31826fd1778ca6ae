"""Training CLI — parity with code/training/exp_runner.py:7-45.

Usage:
    python -m hashmodnffbanks_idr_tpu.train.exp_runner \
        --conf hashmodnffbanks_idr_tpu/config/confs/embedder_conf_var/FFB_StyleMod/dtu_fixed_cameras.conf \
        --scan_id 65 --nepoch 2000 [--train_cameras] [--is_continue]

GPU auto-pick (GPUtil in the reference) has no TPU counterpart — chips are
assigned by the runtime; `--platform cpu` forces the CPU backend for smoke
runs.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--nepoch", type=int, default=2000)
    p.add_argument("--conf", type=str, required=True)
    p.add_argument("--expname", type=str, default="")
    p.add_argument("--exps_folder_name", type=str, default="exps")
    p.add_argument("--is_continue", action="store_true")
    p.add_argument("--timestamp", type=str, default="latest")
    p.add_argument("--checkpoint", type=str, default="latest")
    p.add_argument("--train_cameras", action="store_true")
    p.add_argument("--scan_id", type=int, default=-1)
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--platform", type=str, default=None,
                   help="force jax platform (e.g. cpu)")
    p.add_argument("--no_tensorboard", action="store_true")
    # multi-host bring-up (every process runs this same CLI; see
    # parallel/multihost.py — the single distributed entry point)
    p.add_argument("--coordinator", type=str, default=None,
                   help="host:port of process 0 for multi-host runs")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from ..parallel import multihost

    multihost.initialize(args.coordinator, args.num_processes, args.process_id)

    from .trainer import IDRTrainRunner

    runner = IDRTrainRunner(
        conf=args.conf,
        batch_size=args.batch_size,
        nepochs=args.nepoch,
        expname=args.expname,
        exps_folder_name=args.exps_folder_name,
        train_cameras=args.train_cameras,
        scan_id=args.scan_id,
        is_continue=args.is_continue,
        timestamp=args.timestamp,
        checkpoint=args.checkpoint,
        data_root=args.data_root,
        seed=args.seed,
        log_tensorboard=not args.no_tensorboard,
    )
    runner.run()


if __name__ == "__main__":
    main(sys.argv[1:])
