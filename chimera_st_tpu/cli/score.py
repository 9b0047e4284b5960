"""chimera-score: score a system output file against a reference file
(reference: fairseq_cli/score.py)."""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> None:
    p = argparse.ArgumentParser("chimera-score")
    p.add_argument("--sys", "-s", required=True)
    p.add_argument("--ref", "-r", required=True)
    p.add_argument("--scoring", default="sacrebleu", choices=["sacrebleu", "bleu", "chrf", "wer"])
    p.add_argument("--ignore-case", action="store_true")
    args = p.parse_args(argv)

    import chimera_st_tpu.scoring  # noqa: F401
    from ..scoring import build_scorer

    scorer = build_scorer({"_name": args.scoring, "sacrebleu_lowercase": args.ignore_case})
    sys_fh = sys.stdin if args.sys == "-" else open(args.sys, encoding="utf-8")
    with open(args.ref, encoding="utf-8") as ref_fh:
        for hyp, ref in zip(sys_fh, ref_fh):
            if args.ignore_case:
                hyp, ref = hyp.lower(), ref.lower()
            scorer.add_string(ref.rstrip("\n"), hyp.rstrip("\n"))
    print(scorer.result_string())


def cli_main():
    main()


if __name__ == "__main__":
    cli_main()
