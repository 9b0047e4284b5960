"""chimera-preprocess: text binarization
(reference: fairseq_cli/preprocess.py — builds dictionaries and writes
fairseq-compatible mmap-indexed binary datasets, so output is interchangeable
with fairseq-preprocess and vice versa)."""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

logger = logging.getLogger("chimera_st_tpu.preprocess")


def main(argv=None) -> None:
    p = argparse.ArgumentParser("chimera-preprocess")
    p.add_argument("--source-lang", "-s", required=True)
    p.add_argument("--target-lang", "-t", required=True)
    p.add_argument("--trainpref", default=None)
    p.add_argument("--validpref", default=None)
    p.add_argument("--testpref", default=None)
    p.add_argument("--destdir", required=True)
    p.add_argument("--srcdict", default=None)
    p.add_argument("--tgtdict", default=None)
    p.add_argument("--joined-dictionary", action="store_true")
    p.add_argument("--nwordssrc", type=int, default=-1)
    p.add_argument("--nwordstgt", type=int, default=-1)
    p.add_argument("--thresholdsrc", type=int, default=0)
    p.add_argument("--thresholdtgt", type=int, default=0)
    p.add_argument("--workers", type=int, default=1)
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                        format="%(asctime)s | %(message)s")

    import numpy as np

    from ..data.dictionary import Dictionary
    from ..data.indexed_dataset import MMapIndexedDatasetBuilder

    dest = Path(args.destdir)
    dest.mkdir(parents=True, exist_ok=True)
    src, tgt = args.source_lang, args.target_lang

    def build_dict(pref_files, threshold, nwords):
        d = Dictionary()
        for path in pref_files:
            with open(path, encoding="utf-8") as f:
                for line in f:
                    for w in line.split():
                        d.add_symbol(w)
        d.finalize(threshold=threshold, nwords=nwords)
        return d

    if args.srcdict:
        src_dict = Dictionary.load(args.srcdict)
    elif args.joined_dictionary:
        src_dict = build_dict(
            [f"{args.trainpref}.{l}" for l in (src, tgt)],
            args.thresholdsrc, args.nwordssrc,
        )
    else:
        src_dict = build_dict([f"{args.trainpref}.{src}"], args.thresholdsrc, args.nwordssrc)
    if args.tgtdict:
        tgt_dict = Dictionary.load(args.tgtdict)
    elif args.joined_dictionary or args.srcdict and not args.tgtdict:
        tgt_dict = src_dict
    else:
        tgt_dict = build_dict([f"{args.trainpref}.{tgt}"], args.thresholdtgt, args.nwordstgt)

    src_dict.save(str(dest / f"dict.{src}.txt"))
    tgt_dict.save(str(dest / f"dict.{tgt}.txt"))

    def binarize(pref: str, split: str, lang: str, d: Dictionary):
        builder = MMapIndexedDatasetBuilder(
            str(dest / f"{split}.{src}-{tgt}.{lang}")
        )
        n_tok, n_unk = 0, 0
        with open(f"{pref}.{lang}", encoding="utf-8") as f:
            for line in f:
                ids = d.encode_line(line, append_eos=True)
                n_tok += len(ids)
                n_unk += int((ids == d.unk()) .sum())
                builder.add_item(ids)
        builder.finalize()
        logger.info(
            f"[{lang}] {split}: {n_tok} tokens, "
            f"{100.0 * n_unk / max(n_tok, 1):.3f}% replaced by <unk>"
        )

    for pref, split in [
        (args.trainpref, "train"),
        (args.validpref, "valid"),
        (args.testpref, "test"),
    ]:
        if pref:
            binarize(pref, split, src, src_dict)
            binarize(pref, split, tgt, tgt_dict)
    logger.info(f"Wrote binarized data to {dest}")


def cli_main():
    main()


if __name__ == "__main__":
    cli_main()
