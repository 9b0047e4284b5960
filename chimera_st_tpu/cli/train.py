"""chimera-train: training entry point
(reference: fairseq_cli/train.py:51-411 — same loop skeleton: epoch iterator
-> update_freq-grouped microbatches -> train step -> periodic validate+save,
with max_update/max_epoch/patience/stop_time stopping)."""

from __future__ import annotations

import logging
import math
import sys
import time
from typing import Dict, List, Optional

logger = logging.getLogger("chimera_st_tpu.train")


def main(argv=None) -> None:
    from . import options
    from .options import parse_lr, parse_update_freq

    p = options.base_parser("chimera-train")
    options.add_train_args(p)
    args, model_overrides = options.parse_with_model_overrides(p, argv)

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s | %(levelname)s | %(name)s | %(message)s",
        stream=sys.stdout,
    )

    import jax
    import jax.numpy as jnp
    import numpy as np

    import chimera_st_tpu.criterions  # noqa: F401 — registration
    import chimera_st_tpu.models  # noqa: F401
    import chimera_st_tpu.scoring  # noqa: F401
    from ..checkpoint.store import CheckpointManager, load_state
    from ..data.iterators import GroupedIterator
    from ..logging import metrics as metrics_mod
    from ..logging.progress_bar import progress_bar
    from ..models.interlingua import ChimeraInterlinguaModel
    from ..optim import build_lr_schedule, build_optimizer
    from ..parallel import make_mesh, shard_params
    from ..tasks import setup_task
    from ..train.trainer import Trainer

    np.random.seed(args.seed)

    # multi-host init already ran in parse_with_model_overrides (shared by
    # every entry point); from here jax.devices() spans the whole job. Every
    # process runs this same program: the data pipeline is seeded identically
    # and each host reads the full dataset, so all hosts construct
    # bit-identical global batches — the invariant shard_batch relies on when
    # it device_puts the host-local batch onto the global mesh. Only the lead
    # process writes checkpoints/logs (shared save_dir).
    lead_process = jax.process_index() == 0
    if not lead_process:
        logging.getLogger("chimera_st_tpu").setLevel(logging.WARNING)

    # ----------------------------------------------------------- components
    task_cfg = {"_name": args.task, "data": args.data, "config_yaml": args.config_yaml,
                "source_lang": args.source_lang, "target_lang": args.target_lang,
                **model_overrides}  # unknown flags reach both task and model cfgs
    if args.task_configs:
        # joint training: per-sub-task config files (reference §3.4)
        task_cfg["task_configs"] = list(args.task_configs)
        if args.main_task:
            task_cfg["main_task"] = args.main_task
    task = setup_task(task_cfg)
    task.load_dataset(args.valid_subset) if not args.disable_validation else None
    task.load_dataset(args.train_subset)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" or args.fp16 else jnp.float32
    model_cfg = {"arch": args.arch, **model_overrides}
    if args.feature_grad_mult != 1.0:
        model_cfg["feature_grad_mult"] = args.feature_grad_mult
    pipeline_stages = getattr(args, "pipeline_stages", 0)
    if pipeline_stages > 1:
        # the model needs the (data x pipe) mesh at build time; built here
        # instead of the default (data x model) mesh below
        from ..parallel.mesh import make_pipeline_mesh

        devs = jax.devices()
        if args.distributed_world_size > 0:
            devs = devs[: args.distributed_world_size]
        pipe_mesh = make_pipeline_mesh(pipeline_stages, devices=devs)
        model_cfg.update(
            pipeline_stages=pipeline_stages,
            pipeline_chunks=args.pipeline_chunks,
            pipeline_remat=args.pipeline_checkpoint,
            pipeline_mesh=pipe_mesh,
        )
    if pipeline_stages > 1 and args.model_parallel_size > 1:
        raise SystemExit(
            "--pipeline-stages and --model-parallel-size are mutually "
            "exclusive (the pipe mesh has no model axis); pick one"
        )
    model = task.build_model(model_cfg, dtype=dtype)
    # pipeline_* keys are execution config for THIS run, not model identity:
    # persisting them would make generate/validate rebuilds demand a pipe
    # mesh (and the mesh object itself is not serializable)
    model_cfg = {
        k: v for k, v in model_cfg.items() if not k.startswith("pipeline_")
    }
    logger.info(f"model arch {args.arch} ({type(model).__name__})")

    lr = parse_lr(args.lr)
    sched_cfg = {
        "_name": args.lr_scheduler,
        "lr": lr,
        "warmup_updates": args.warmup_updates,
        "warmup_init_lr": args.warmup_init_lr,
        "max_update": args.max_update,
        # family hyperparams + plateau polarity (review fixes: these never
        # reached the schedulers; plateau was inverted for maximize metrics)
        "total_num_update": args.total_num_update or args.max_update,
        "end_learning_rate": args.end_learning_rate,
        "power": args.power,
        "lr_shrink": args.lr_shrink,
        "t_mult": getattr(args, "t_mult", 1.0),
        "init_lr_scale": args.init_lr_scale,
        "final_lr_scale": args.final_lr_scale,
        "maximize_best_checkpoint_metric": args.maximize_best_checkpoint_metric,
    }
    if args.min_lr is not None:
        sched_cfg["min_lr"] = args.min_lr
    if args.max_lr is not None:
        sched_cfg["max_lr"] = args.max_lr
    if args.lr_period_updates is not None:
        sched_cfg["lr_period_updates"] = args.lr_period_updates
    if args.phase_ratio:
        import ast as _ast

        sched_cfg["phase_ratio"] = tuple(_ast.literal_eval(args.phase_ratio))
    lr_schedule = build_lr_schedule(sched_cfg)
    opt_cfg = {
        "_name": args.optimizer, "adam_betas": args.adam_betas,
        "adam_eps": args.adam_eps, "weight_decay": args.weight_decay,
        "adagrad_eps": args.adagrad_eps, "adadelta_rho": args.adadelta_rho,
        "adadelta_eps": args.adadelta_eps, "adamax_eps": args.adamax_eps,
        "lamb_eps": args.lamb_eps,
    }
    if args.momentum:
        opt_cfg["momentum"] = args.momentum
    if args.adamax_betas is not None:
        opt_cfg["adamax_betas"] = args.adamax_betas
    if args.lamb_betas is not None:
        opt_cfg["lamb_betas"] = args.lamb_betas
    tx = build_optimizer(opt_cfg, lr_schedule, clip_norm=args.clip_norm)

    crit_cfg = {
        "_name": args.criterion,
        "label_smoothing": args.label_smoothing,
        "loss_ratio": tuple(args.loss_ratio),
        "contrastive_temp": args.contrastive_temp,
        "contrastive_increase_until": args.contrastive_increase_until,
        "sentence_avg": args.sentence_avg,
    }
    criterion = task.build_criterion(crit_cfg)

    # ----------------------------------------------------------- init params
    params = init_params_for_task(model, task, args)
    if hasattr(task, "post_init_params"):
        # task-owned warm-start surgery (e.g. translation_from_pretrained_xlm)
        params = task.post_init_params(params, model, args)
    fixes = [f for f in
             ("fix_wav2vec", "fix_interlingua", "fix_decoder",
              "fix_decoder_transformers", "fix_encoder_transformers")
             if getattr(args, f, False)]
    if "fix_wav2vec" not in fixes:
        # torch-parity: text-only tasks never grad the audio trunk, and the
        # reference's Adam skips grad-None params — mask the trunk out of
        # the optimizer instead of streaming its moments (optim/freeze.py
        # auto_text_only_fixes)
        from ..optim.freeze import auto_text_only_fixes

        fixes.extend(auto_text_only_fixes(task, params))
    if fixes:
        from ..optim.freeze import frozen_fraction, wrap_freeze

        tx = wrap_freeze(tx, params, fixes)
        logger.info(
            f"freezing {', '.join(fixes)} "
            f"({frozen_fraction(params, fixes):.1%} of parameters)"
        )
    devices = jax.devices()
    if args.distributed_world_size > 0:
        devices = devices[: args.distributed_world_size]
    if pipeline_stages > 1:
        mesh = pipe_mesh  # (data x pipe); TP composes with dp only
    else:
        mesh = make_mesh(model_parallel=args.model_parallel_size, devices=devices)
    if mesh.devices.size > 1:
        params = shard_params(params, mesh)
    logger.info(
        f"mesh: {dict(mesh.shape)}; params: "
        f"{sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params)) / 1e6:.1f}M"
    )

    trainer = Trainer(
        model, criterion, tx, params,
        lr_schedule=lr_schedule,
        mesh=mesh,
        zero_sharding=None if args.zero_sharding == "none" else args.zero_sharding,
        async_depth=max(args.async_dispatch, 0),
    )
    # persisted so generate/validate can rebuild the model from the checkpoint
    run_cfg = {"model_cfg": model_cfg, "task_cfg": task_cfg, "criterion_cfg": crit_cfg}

    ckpt_mgr = CheckpointManager(
        args.save_dir,
        best_metric=args.best_checkpoint_metric,
        maximize_best=args.maximize_best_checkpoint_metric,
        keep_last_epochs=args.keep_last_epochs,
        keep_interval_updates=args.keep_interval_updates,
        keep_best_checkpoints=args.keep_best_checkpoints,
        no_last=args.no_last_checkpoints,
        no_epoch=args.no_epoch_checkpoints,
        no_save=args.no_save,
        save_optimizer_state=not args.no_save_optimizer_state,
        # multi-host: best/patience tracking runs on every process (identical
        # val metrics keep the early-stop decision in lockstep) but only the
        # lead touches the shared save_dir
        write=lead_process,
    )

    # ----------------------------------------------------------- batch iters
    update_freq = parse_update_freq(args.update_freq)
    if hasattr(task, "make_joint_iterator"):
        # joint multi-task training: ratio-interleaved task-tagged batches;
        # the Trainer compiles one step per (task, shape) signature
        # (reference call stack §3.4: JointDataset + any_step dispatch)
        from ..data.iterators import StreamingEpochBatchIterator

        class _JointEpochSource:
            epoch = 1

            def set_epoch(self, e):
                self.epoch = e

            def __iter__(self):
                return task.make_joint_iterator(
                    args.train_subset,
                    max_tokens=int(args.max_tokens) if args.max_tokens else None,
                    max_sentences=args.batch_size,
                    seed=args.seed,
                    num_length_buckets=args.num_length_buckets,
                    epoch=self.epoch,
                )

        train_itr = StreamingEpochBatchIterator(
            _JointEpochSource(), buffer_size=args.data_buffer_size
        )
    else:
        train_itr = task.make_batch_iterator(
            task.dataset(args.train_subset),
            max_tokens=int(args.max_tokens) if args.max_tokens else None,
            max_sentences=args.batch_size,
            required_batch_size_multiple=args.required_batch_size_multiple,
            seed=args.seed,
            num_shards=args.num_shards,
            shard_id=args.shard_id,
            num_length_buckets=args.num_length_buckets,
            buffer_size=args.data_buffer_size,
            num_workers=args.num_workers,
        )
        if not getattr(args, "no_host_wire", False):
            # host-wire economy mode on the TRAIN split: PCM16 waveforms stay
            # int16 over the host->device wire and the [B,T] bool padding
            # mask is rebuilt on device from audio_lengths — the jitted
            # step's prepare_batch undoes both (train/train_step.py). The
            # decode/validate iterators never enable it.
            from ..data.manifests import set_wire_format

            set_wire_format(task.dataset(args.train_subset))

    # host->device transfer dispatched from the prefetch/stager thread so it
    # double-buffers behind device compute (reference analog: DataLoader
    # pin_memory + non_blocking copies); Trainer.to_device is idempotent for
    # batches that arrive already placed
    train_itr.device_put_fn = trainer.to_device

    # ----------------------------------------------------------- restore
    epoch = 1
    resume_file = ckpt_mgr.save_dir / "checkpoint_last.ckpt"
    if args.finetune_from_model and args.restore_file != "checkpoint_last.ckpt":
        raise SystemExit(
            "--finetune-from-model and --restore-file are mutually exclusive "
            "(reference checkpoint_utils.py behavior)")
    if args.finetune_from_model and resume_file.is_file():
        # a preempted finetune run resumes from its own checkpoint_last —
        # the warm start only applies on first launch (reference:
        # checkpoint_utils.load_checkpoint finetune_from_model semantics)
        logger.info(
            f"{resume_file} exists; resuming it instead of re-applying "
            f"--finetune-from-model {args.finetune_from_model}")
        args.finetune_from_model = None
    if args.finetune_from_model:
        # warm-start params only; optimizer/lr/meters/dataloader start fresh
        # (reference: checkpoint_utils.load_checkpoint finetune_from_model —
        # mutually exclusive with --restore-file/--reset-* flags)
        if (args.reset_optimizer or args.reset_dataloader or args.reset_meters
                or args.reset_lr_scheduler):
            raise SystemExit(
                "--finetune-from-model already resets optimizer/dataloader/"
                "meters; do not combine it with --reset-* flags "
                "(reference checkpoint_utils.py behavior)")
        from ..checkpoint.store import load_params_only

        warm = load_params_only(args.finetune_from_model, trainer.state.params)
        trainer.state = trainer.state._replace(params=warm)
        logger.info(f"loaded pretrained params from {args.finetune_from_model} "
                    f"(optimizer/meters/dataloader reset)")
    restore = ckpt_mgr.save_dir / args.restore_file
    if restore.is_file() and not args.finetune_from_model:  # normal resume
        fresh_params = trainer.state.params
        state, extra = load_state(str(restore), trainer.state)
        if args.reset_encoder:
            from ..optim.freeze import reset_encoder_subtrees

            logger.info("--reset-encoder: re-initializing the shared encoder "
                        "transformer stack")
            state = state._replace(
                params=reset_encoder_subtrees(state.params, fresh_params)
            )
        if not args.reset_optimizer:
            trainer.state = state
        else:
            trainer.state = trainer.state._replace(params=state.params)
        trainer.load_extra_state(
            extra,
            None if args.reset_dataloader else train_itr,
            load_meters=not args.reset_meters,
            load_lr_scheduler=not args.reset_lr_scheduler,
        )
        # reference guards the best-metric restore on BOTH reset flags
        # (checkpoint_utils.load_checkpoint: restores save_checkpoint.best
        # only when `not reset_optimizer and not reset_meters`) — the ST
        # warm start from an MT checkpoint passes --reset-optimizer and must
        # NOT import the MT stage's best CE into ST best-tracking/patience
        if not args.reset_optimizer and not args.reset_meters:
            ckpt_mgr.best = extra.get("best")
        epoch = extra.get("train_iterator", {}).get("epoch", 1)
        logger.info(
            f"restored {restore} (epoch {epoch}, {trainer.num_updates} updates)"
        )

    # ----------------------------------------------------------- train loop
    if args.profile:
        # reference: --profile wraps training in cuda profiler + nvtx ranges
        # (fairseq_cli/train.py:399-402); here a jax.profiler trace
        jax.profiler.start_trace(args.profile)
    start = time.time()
    patience_left = args.patience
    last_interval_validated = -1  # review fix: a non-finite skip keeps
    # num_updates unchanged; without this guard the save/validate interval
    # block re-fires every skipped step at a boundary
    stop = False
    while not stop:
        if args.max_epoch and epoch > args.max_epoch:
            break
        train_itr.epoch = epoch
        # --curriculum N: length-ordered (unshuffled) batches for the first
        # N epochs (reference dataset_cfg.curriculum)
        itr = train_itr.next_epoch_itr(shuffle=epoch > args.curriculum)
        grouped = GroupedIterator(itr, update_freq)
        pbar = progress_bar(
            grouped,
            log_format=args.log_format,
            log_interval=args.log_interval,
            epoch=epoch,
            # lead-only writes: the TB sink writes event files directly (not
            # via logging), so non-lead hosts of a multi-host job must not
            # open one on a shared logdir
            tensorboard_logdir=args.tensorboard_logdir if lead_process else None,
        )
        with metrics_mod.aggregate("train_inner") as agg:
            for i, microbatches in enumerate(pbar):
                trainer.train_step(microbatches, seed=args.seed + trainer.num_updates)
                # num_updates is the optimistic host mirror under async
                # dispatch — every block below that ACTS on it drains first
                # (one batched transfer) and re-reads the exact counter
                num_updates = trainer.num_updates
                if num_updates % args.log_interval == 0:
                    trainer.drain_metrics()
                    num_updates = trainer.num_updates
                    pbar.log(agg.get_smoothed_values(), step=num_updates)
                    metrics_mod.reset_meters("train_inner")
                if (
                    args.save_interval_updates > 0
                    and num_updates % args.save_interval_updates == 0
                    and num_updates != last_interval_validated
                ):
                    trainer.drain_metrics()
                    num_updates = trainer.num_updates
                    last_interval_validated = num_updates
                    val = None
                    if num_updates >= args.validate_after_updates:
                        val = validate_and_metric(args, task, trainer, criterion)
                    if hasattr(lr_schedule, "step_val") and lr_schedule.step_val(val):
                        trainer.refresh_apply()
                    ckpt_mgr.save(
                        trainer.state,
                        {**trainer.extra_state(train_itr, val, ckpt_mgr.best), **run_cfg},
                        epoch,
                        num_updates,
                        val_metric=val,
                        end_of_epoch=False,
                        save_interval_updates=args.save_interval_updates,
                    )
                if args.max_update and num_updates >= args.max_update:
                    trainer.drain_metrics()
                    if trainer.num_updates >= args.max_update:
                        stop = True
                        break
                if args.stop_time_hours and (time.time() - start) / 3600 > args.stop_time_hours:
                    stop = True
                    break
            # flush deferred metrics INSIDE the aggregation context so the
            # epoch tail lands in train_inner/train/TB like every update
            trainer.drain_metrics()
        train_itr.next_epoch()

        val = None
        if (not args.disable_validation
                and trainer.num_updates >= args.validate_after_updates
                and (epoch % args.validate_interval == 0 or stop)):
            val = validate_and_metric(args, task, trainer, criterion)
            if hasattr(lr_schedule, "step_val") and lr_schedule.step_val(val):
                trainer.refresh_apply()
            if val is not None and args.patience > 0:
                if ckpt_mgr.is_better(val):
                    patience_left = args.patience
                else:
                    patience_left -= 1
                    if patience_left <= 0:
                        logger.info(f"early stop: patience {args.patience} exhausted")
                        stop = True
        if epoch % args.save_interval == 0 or stop:
            ckpt_mgr.save(
                trainer.state,
                {**trainer.extra_state(train_itr, val, ckpt_mgr.best), **run_cfg},
                epoch,
                trainer.num_updates,
                val_metric=val,
                end_of_epoch=True,
            )
        with metrics_mod.aggregate("train") as agg:
            pass
        epoch += 1

    if args.profile:
        jax.profiler.stop_trace()
        logger.info(f"profiler trace written to {args.profile}")
    logger.info(f"done training in {time.time() - start:.1f}s "
                f"({trainer.num_updates} updates)")


def init_params_for_task(model, task, args):
    """Fresh init (optionally loading a pretrained wav2vec2 .pt)."""
    import jax
    import jax.numpy as jnp

    from ..models.interlingua import ChimeraInterlinguaModel
    from ..models.wav2vec2_pretraining import Wav2Vec2PretrainModel

    seed = getattr(args, "seed", 0)
    B, T = 2, 4000
    audio = jnp.zeros((B, T), jnp.float32)
    mask = jnp.zeros((B, T), bool)
    if isinstance(model, Wav2Vec2PretrainModel):
        from ..models.wav2vec2 import extractor_output_length

        frames = extractor_output_length(T, model.cfg.conv_spec)
        span = jnp.zeros((B, frames), bool).at[:, :4].set(True)
        negs = jnp.zeros((B, frames, model.cfg.num_negatives), jnp.int32)
        return model.init(
            {"params": jax.random.PRNGKey(seed), "gumbel": jax.random.PRNGKey(1)},
            audio, mask, span, negs,
        )
    src = jnp.full((B, 4), 2, jnp.int32)
    prev = jnp.full((B, 4), 2, jnp.int32)
    from ..models.wav2vec2_asr import Wav2VecCtcModel, Wav2VecSeq2SeqModel

    if isinstance(model, Wav2VecCtcModel):
        return model.init(jax.random.PRNGKey(seed), audio, mask)
    if isinstance(model, Wav2VecSeq2SeqModel):
        return model.init(jax.random.PRNGKey(seed), audio, mask, prev)
    from ..models.bart import BARTModel
    from ..models.fconv import FConvLM
    from ..models.hf_gpt2 import GPT2LM
    from ..models.lm_extra import LightConvLM, LSTMLM, RNNClassifier
    from ..models.masked_lm import MaskedLMModel
    from ..models.multilingual_transformer import MultilingualTransformer
    from ..models.nat_insertion import InsertionTransformer
    from ..models.nat_levenshtein import LevenshteinTransformer
    from ..models.transformer_mt import TransformerLM, TransformerModel

    # decoder-only / encoder-only models take a single token stream
    if isinstance(model, (MaskedLMModel, GPT2LM, LSTMLM, LightConvLM,
                          FConvLM, RNNClassifier)):
        return model.init(jax.random.PRNGKey(seed), prev)
    if isinstance(model, BARTModel):
        return model.init(
            jax.random.PRNGKey(seed), src, prev,
            method=BARTModel.init_everything,
        )
    if isinstance(model, MultilingualTransformer):
        return model.init(
            jax.random.PRNGKey(seed), src, prev,
            method=MultilingualTransformer.init_everything,
        )
    if isinstance(model, InsertionTransformer):
        return model.init(jax.random.PRNGKey(seed), src, prev)
    if isinstance(model, LevenshteinTransformer):
        return model.init(jax.random.PRNGKey(seed), src, prev, prev, prev)
    from ..models.nat_vanilla import NATransformer
    from ..models.pipeline_lm import PipelinedTransformerLM

    if isinstance(model, (TransformerLM, PipelinedTransformerLM)):
        return model.init(jax.random.PRNGKey(seed), prev)
    if isinstance(model, NATransformer):
        return model.init(jax.random.PRNGKey(seed), src, prev,
                          method=NATransformer.init_everything)
    from ..models.nat_cmlm import CMLMTransformer

    if isinstance(model, CMLMTransformer):
        # __call__(src, prev) materializes both the token decoder and the
        # length head (review fix: CMLM fell through to the interlingua
        # audio init and crashed — the --noise random_mask training path
        # was unreachable)
        return model.init(jax.random.PRNGKey(seed), src, prev)
    if isinstance(model, TransformerModel):
        return model.init(jax.random.PRNGKey(seed), src, prev)
    params = model.init(
        jax.random.PRNGKey(seed), audio, mask, src, prev,
        method=ChimeraInterlinguaModel.init_everything,
    )
    w2v_path = getattr(args, "w2v2_model_path", None)
    if w2v_path:
        from ..checkpoint.torch_import import (
            import_wav2vec2_state_dict,
            load_torch_checkpoint,
        )

        ckpt = load_torch_checkpoint(w2v_path)
        sub = import_wav2vec2_state_dict(ckpt["model"])
        params = dict(params)
        params["params"] = dict(params["params"])
        params["params"]["wav2vec_model"] = sub
        logger.info(f"loaded pretrained wav2vec2 from {w2v_path}")
    return params


def validate_and_metric(args, task, trainer, criterion) -> Optional[float]:
    if args.disable_validation:
        return None
    import numpy as np

    from ..logging import metrics as metrics_mod

    main_task_name = None
    if hasattr(task, "sub_tasks"):
        # joint training validates over the MAIN sub-task (reference:
        # joint_task any_step dispatch; per-task valid namespaces)
        main_task_name = task.main_task_name
        task = task.main_task
    # valid-specific budgets + seed (reference dataset_cfg.max_tokens_valid/
    # batch_size_valid/fixed_validation_seed; fall back to the train values)
    max_tokens_valid = getattr(args, "max_tokens_valid", None) or args.max_tokens
    batch_size_valid = getattr(args, "batch_size_valid", None) or args.batch_size
    valid_seed = getattr(args, "fixed_validation_seed", None)
    itr = task.make_batch_iterator(
        task.dataset(args.valid_subset),
        max_tokens=int(max_tokens_valid) if max_tokens_valid else None,
        max_sentences=batch_size_valid,
        seed=args.seed if valid_seed is None else valid_seed,
        num_length_buckets=args.num_length_buckets,
    ).next_epoch_itr(shuffle=False)
    totals: Dict[str, float] = {}
    for batch in itr:
        if main_task_name is not None:
            batch = {**batch, "task_name": main_task_name}
        logging = trainer.valid_step(batch)
        for k, v in logging.items():
            totals[k] = totals.get(k, 0.0) + float(v)
    ss = max(totals.get("sample_size", 1.0), 1.0)
    stats = {k: v / ss / math.log(2) for k, v in totals.items()
             if k.endswith("loss")}
    if args.best_checkpoint_metric == "bleu":
        # BLEU-during-validation drives checkpoint selection (reference:
        # tasks/translation.py:218-239 / speech_to_text_bleu.py:207-297)
        stats["bleu"] = validate_bleu(args, task, trainer)
    if args.best_checkpoint_metric == "wer":
        # greedy-CTC WER during validation (reference: criterions/ctc_chi.py
        # valid-time wer/uer logging; the KenLM beam path is replaced by
        # greedy decode — criterions/ctc.py docstring)
        stats["wer"] = validate_wer(args, task, trainer)
    logger.info(
        "validation | " + " | ".join(f"{k} {v:.3f}" for k, v in sorted(stats.items()))
    )
    metric = args.best_checkpoint_metric
    if metric in stats:
        return stats[metric]
    return stats.get("loss")


def _audio_and_mask(batch):
    """Host-side undo of the train-split wire format for eval helpers that
    read batch['audio'] / ['audio_padding_mask'] directly (only reachable
    when --valid-subset aliases the train split)."""
    import numpy as np

    audio = np.asarray(batch["audio"])
    if audio.dtype == np.int16:
        audio = audio.astype(np.float32) / 32768.0
    mask = batch.get("audio_padding_mask")
    if mask is None:
        pos = np.arange(audio.shape[1])[None, :]
        mask = pos >= np.asarray(batch["audio_lengths"])[:, None]
    return audio, mask


def validate_bleu(args, task, trainer, beam: int = 4, max_decode_len: int = 64) -> float:
    import jax.numpy as jnp
    import numpy as np
    import sacrebleu

    class GenCfg:
        pass

    GenCfg.beam = beam
    GenCfg.max_decode_len = max_decode_len
    GenCfg.lenpen = 1.0
    generator = task.build_generator(trainer.model, GenCfg)
    tgt_dict = task.target_dictionary
    strip = task.lang_tag_indices() if hasattr(task, "lang_tag_indices") else set()
    itr = task.make_batch_iterator(
        task.dataset(args.valid_subset),
        max_tokens=int(args.max_tokens) if args.max_tokens else None,
        max_sentences=args.batch_size,
        num_length_buckets=args.num_length_buckets,
    ).next_epoch_itr(shuffle=False)
    hyps, refs = [], []
    for batch in itr:
        if "audio" in batch:
            audio, mask = _audio_and_mask(batch)
            tokens, _, lens = generator.generate_audio(
                trainer.state.params, jnp.asarray(audio), jnp.asarray(mask)
            )
        else:
            tokens, _, lens = generator.generate_text(
                trainer.state.params, jnp.asarray(batch["src_tokens"])
            )
        tokens, lens = np.asarray(tokens), np.asarray(lens)
        for b in range(tokens.shape[0]):
            hyps.append(tgt_dict.string(
                tokens[b, 0, : lens[b, 0]], bpe_symbol="sentencepiece",
                extra_symbols_to_ignore=strip))
            refs.append(tgt_dict.string(
                batch["target"][b], bpe_symbol="sentencepiece",
                extra_symbols_to_ignore=strip))
    return sacrebleu.corpus_bleu(hyps, [refs], tokenize="13a").score


def validate_wer(args, task, trainer) -> float:
    """Corpus WER over the valid split via greedy CTC decode (reference:
    criterions/ctc_chi.py valid-time w_errs/w_len logging; its KenLM beam
    is replaced by host-side greedy collapse — see criterions/ctc.py).

    Letter-label convention: symbols are joined and ``|`` marks word
    boundaries (reference post_process="letter", fairseq data_utils
    post_process:340)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..criterions.ctc import ctc_greedy_decode
    from ..scoring.wer import levenshtein

    model = trainer.model
    if not hasattr(type(model), "ctc_logits"):
        logger.warning("--best-checkpoint-metric wer needs a CTC-head model")
        return float("inf")
    d = task.target_dictionary
    special = {d.pad(), d.eos(), d.bos()}

    @jax.jit
    def logits_fn(params, audio, mask):
        return model.apply(params, audio, mask, method=type(model).ctc_logits)

    def words(token_ids):
        syms = [d[int(t)] for t in token_ids if int(t) not in special]
        return "".join(syms).replace("|", " ").split()

    itr = task.make_batch_iterator(
        task.dataset(args.valid_subset),
        max_tokens=int(args.max_tokens) if args.max_tokens else None,
        max_sentences=args.batch_size,
        num_length_buckets=args.num_length_buckets,
    ).next_epoch_itr(shuffle=False)
    errs, total = 0, 0
    for batch in itr:
        audio, mask = _audio_and_mask(batch)
        logits, frame_pad = logits_fn(
            trainer.state.params, jnp.asarray(audio), jnp.asarray(mask)
        )
        logits = np.asarray(logits)
        frame_pad = None if frame_pad is None else np.asarray(frame_pad)
        for b in range(logits.shape[0]):
            valid = (
                logits[b] if frame_pad is None else logits[b][~frame_pad[b]]
            )
            hyp = words(ctc_greedy_decode(valid, blank_idx=0))
            ref = words(np.asarray(batch["target"][b]))
            errs += levenshtein(hyp, ref)
            total += max(len(ref), 1)
    return 100.0 * errs / max(total, 1)


def cli_main():
    main()


if __name__ == "__main__":
    cli_main()
