"""chimera-validate: run validation over a split with a checkpoint
(reference: fairseq_cli/validate.py)."""

from __future__ import annotations

import logging
import math
import sys

logger = logging.getLogger("chimera_st_tpu.validate")


def main(argv=None) -> None:
    from . import options

    p = options.base_parser("chimera-validate")
    options.add_train_args(p)
    p.add_argument("--path", required=True)
    p.add_argument("--dump-feature-to-file", default=None, metavar="FILE",
                   help="dump audio/text interlingua memory banks per batch "
                        "to a pickle (reference: tasks/triplet.py:196-232 "
                        "valid_step feature dumping)")
    args, model_overrides = options.parse_with_model_overrides(p, argv)
    options.require_single_host("chimera-validate")
    logging.basicConfig(level=logging.INFO, stream=sys.stdout,
                        format="%(asctime)s | %(message)s")

    import jax.numpy as jnp
    import numpy as np

    import chimera_st_tpu.criterions  # noqa: F401
    import chimera_st_tpu.models  # noqa: F401
    from ..tasks import setup_task
    from .generate import load_model_and_params

    task_cfg = {"_name": args.task, "data": args.data,
                "config_yaml": args.config_yaml,
                "source_lang": args.source_lang, "target_lang": args.target_lang}
    task = setup_task(task_cfg)
    task.load_dataset(args.valid_subset)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model_overrides.setdefault("arch", args.arch)
    model, params = load_model_and_params(args.path, task, dtype, model_overrides)
    criterion = task.build_criterion({
        "_name": args.criterion,
        "label_smoothing": args.label_smoothing,
        "loss_ratio": tuple(args.loss_ratio),
    })

    import jax

    valid_fn = jax.jit(
        lambda prm, b: criterion(model, prm, b, rngs=None, train=False)[2]
    )
    itr = task.make_batch_iterator(
        task.dataset(args.valid_subset),
        max_tokens=int(args.max_tokens) if args.max_tokens else None,
        max_sentences=args.batch_size,
        num_length_buckets=args.num_length_buckets,
    ).next_epoch_itr(shuffle=False)
    totals = {}
    dumped = []
    for batch in itr:
        ids = batch.get("id")
        batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "id"}
        logging_out = valid_fn(params, batch)
        for k, v in logging_out.items():
            totals[k] = totals.get(k, 0.0) + float(np.asarray(v))
        if args.dump_feature_to_file and hasattr(task, "dump_memories"):
            mem = task.dump_memories(model, params, batch)
            mem["id"] = np.asarray(ids) if ids is not None else None
            dumped.append(mem)
    if args.dump_feature_to_file and dumped:
        import pickle

        with open(args.dump_feature_to_file, "wb") as f:
            pickle.dump(dumped, f)
        logger.info(
            f"dumped {len(dumped)} batches of memory features to "
            f"{args.dump_feature_to_file}"
        )
    ss = max(totals.get("sample_size", 1.0), 1.0)
    stats = {k: v / ss / math.log(2) for k, v in totals.items() if k.endswith("loss")}
    print(" | ".join(f"{k} {v:.4f}" for k, v in sorted(stats.items())))


def cli_main():
    main()


if __name__ == "__main__":
    cli_main()
