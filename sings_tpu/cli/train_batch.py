"""Batch training over multiple cases (reference
scripts/run_batch/train_batch.sh:33-38 — a sequential shell loop).

Two modes:
- default: each case's full training runs in-process, one after the
  other, reusing the compilation cache across cases (same shapes ->
  later cases skip all compiles). Multi-host deployments shard cases
  across hosts by `--shard i/n`.
- --simultaneous: all cases train in LOCKSTEP over a (case, gs) device
  mesh — one jitted dispatch per iteration updates every case at once
  (train/trainer_cases.py). Needs len(cases) * gs devices.

Usage:
    python -m sings_tpu.cli.train_batch -c configs/human_complex.yaml \
        --cases f_2 m_1 m_3 [--shard 0/2 | --simultaneous [--gs 4]] \
        [overrides...]
"""
from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--cfg_file", type=str, default=None)
    parser.add_argument("--cases", nargs="+", required=True)
    parser.add_argument("--shard", type=str, default="0/1",
                        help="i/n: this host trains cases i, i+n, ...")
    parser.add_argument("--simultaneous", action="store_true",
                        help="train all cases at once on a (case, gs) "
                        "device mesh instead of sequentially")
    parser.add_argument("--gs", type=int, default=1,
                        help="gaussian/strip shards per case "
                        "(simultaneous mode)")
    parser.add_argument("opts", nargs="*")
    args = parser.parse_args(argv)

    if args.simultaneous:
        return _train_simultaneous(args)

    i, n = (int(x) for x in args.shard.split("/"))
    cases = args.cases[i::n]
    print(f"[batch] shard {i}/{n}: {cases}")

    from .train import main as train_main

    results = {}
    for case in cases:
        print(f"[batch] === training {case} ===", flush=True)
        results[case] = train_main(
            (["-c", args.cfg_file] if args.cfg_file else [])
            + [f"dataset.name={case}"] + list(args.opts))
    for case, res in results.items():
        print(f"[batch] {case}: {res}")
    return results


def _train_simultaneous(args):
    import jax

    from ._platform import apply_platform_env

    apply_platform_env()
    cache_dir = os.environ.get("SINGS_JAX_CACHE", "/root/jax_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from ..config.core import load_config, save_config
    from ..config.defaults import DEFAULTS
    from ..train.trainer_cases import CasePool

    cfgs = [
        load_config(DEFAULTS, args.cfg_file,
                    [f"dataset.name={case}"] + list(args.opts))
        for case in args.cases
    ]
    pool = CasePool(cfgs, gs=args.gs)
    for cfg, t in zip(cfgs, pool.trainers):
        save_config(cfg, os.path.join(t.logdir, "config_train.yaml"))
    results = pool.train()
    for t in pool.trainers:
        t.visualize("final")
        t.save_splat_file()
    for case, res in results.items():
        print(f"[batch] {case}: {res}")
    return results


if __name__ == "__main__":
    main()
