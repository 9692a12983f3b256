"""Batch training over multiple cases (reference
scripts/run_batch/train_batch.sh:33-38 — a sequential shell loop).

Runs each case's full training in-process, reusing the compilation
cache across cases (same shapes -> later cases skip all compiles).
Multi-host deployments shard cases across hosts by `--shard i/n`.

Usage:
    python -m sings_tpu.cli.train_batch -c configs/human_complex.yaml \
        --cases f_2 m_1 m_3 [--shard 0/2] [overrides...]
"""
from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--cfg_file", type=str, default=None)
    parser.add_argument("--cases", nargs="+", required=True)
    parser.add_argument("--shard", type=str, default="0/1",
                        help="i/n: this host trains cases i, i+n, ...")
    parser.add_argument("opts", nargs="*")
    args = parser.parse_args(argv)

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


if __name__ == "__main__":
    main()
