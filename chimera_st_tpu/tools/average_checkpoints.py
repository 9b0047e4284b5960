"""Checkpoint parameter averaging CLI (the reference recipe averages 7 epochs
around the best checkpoint; its scripts/average_checkpoints.py is missing from
the fork — chimera/tools/eval-average-checkpoint.py depends on it)."""

from __future__ import annotations

import argparse
import pickle
import sys


def main(argv=None):
    p = argparse.ArgumentParser("chimera-average-checkpoints")
    p.add_argument("--inputs", nargs="+", required=True)
    p.add_argument("--output", required=True)
    args = p.parse_args(argv)

    import numpy as np

    payloads = []
    for path in args.inputs:
        with open(path, "rb") as f:
            payloads.append(pickle.load(f))

    def avg(key_path, trees):
        import jax

        acc = jax.tree_util.tree_map(
            lambda x: np.asarray(x, np.float64), trees[0]
        )
        for t in trees[1:]:
            acc = jax.tree_util.tree_map(lambda a, x: a + np.asarray(x), acc, t)
        return jax.tree_util.tree_map(
            lambda a: (a / len(trees)).astype(np.float32), acc
        )

    out = dict(payloads[-1])
    out["params"] = avg("params", [pl["params"] for pl in payloads])
    with open(args.output, "wb") as f:
        pickle.dump(out, f, protocol=pickle.HIGHEST_PROTOCOL)
    print(f"averaged {len(payloads)} checkpoints -> {args.output}")


def cli_main():
    main()


if __name__ == "__main__":
    cli_main()
