"""chimera-eval-lm: language-model perplexity evaluation
(reference: fairseq_cli/eval_lm.py)."""

from __future__ import annotations

import logging
import math
import sys

logger = logging.getLogger("chimera_st_tpu.eval_lm")


def main(argv=None) -> None:
    from . import options

    p = options.base_parser("chimera-eval-lm")
    p.add_argument("--path", required=True)
    p.add_argument("--gen-subset", default="test")
    p.add_argument("--tokens-per-sample", type=int, default=512)
    p.add_argument("--sample-break-mode", default="none")
    args, model_overrides = options.parse_with_model_overrides(p, argv)
    logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                        format="%(asctime)s | %(message)s")

    import jax
    import jax.numpy as jnp
    import numpy as np

    import chimera_st_tpu.models  # noqa: F401
    from ..criterions.label_smoothed_ce import ce_loss_from_logits
    from ..tasks import setup_task

    task_cfg = {"_name": "language_modeling", "data": args.data,
                "tokens_per_sample": args.tokens_per_sample,
                "sample_break_mode": args.sample_break_mode}
    task = setup_task(task_cfg)
    task.load_dataset(args.gen_subset)

    from .generate import load_model_and_params

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model_overrides.setdefault("arch", "transformer_lm")
    model, params = load_model_and_params(args.path, task, dtype, model_overrides)

    pad = task.target_dictionary.pad()

    @jax.jit
    def nll_fn(params, net_tokens, target):
        logits = model.apply(params, net_tokens, deterministic=True)
        loss, nll = ce_loss_from_logits(logits, target, 0.0, pad)
        return nll

    itr = task.make_batch_iterator(
        task.dataset(args.gen_subset),
        max_tokens=int(args.max_tokens) if args.max_tokens else None,
        max_sentences=args.batch_size or 8,
        num_length_buckets=args.num_length_buckets,
    ).next_epoch_itr(shuffle=False)

    total_nll, total_tokens = 0.0, 0
    for batch in itr:
        nll = nll_fn(params, jnp.asarray(batch["net_tokens"]),
                     jnp.asarray(batch["target"]))
        total_nll += float(np.asarray(nll))
        total_tokens += int(batch["ntokens"])
    nll_per_tok = total_nll / max(total_tokens, 1) / math.log(2)
    print(
        f"Evaluated {total_tokens} tokens: loss {nll_per_tok:.4f} bits/token, "
        f"perplexity {2 ** nll_per_tok:.2f}"
    )


def cli_main():
    main()


if __name__ == "__main__":
    cli_main()
