"""Training CLI.

Mirrors the reference trainer surface (ref /root/reference/valle/bin/trainer.py):
two-stage AR/NAR recipes, ScaledAdam/Eve/AdamW/Adam + Eden/Noam/Cosine,
bucketed loading by --max-duration, grad accumulation, periodic + best
checkpoints with keep-last-k, mid-epoch resume including sampler state,
validation every --valid-interval, optional model averaging, inf/nan guard,
and a pre-flight OOM scan of the biggest buckets (ref :1096-1140; here it is
a compile-and-run pass per bucket shape, which also pre-warms the jit cache).

Run: python -m valle_tpu.bin.train --manifest-dir data/ --exp-dir exp/ ...
"""

from __future__ import annotations

import argparse
import logging
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from valle_tpu.data import Manifest, Prefetcher, TtsDataLoader, get_text_token_collater
from valle_tpu.models import add_model_arguments, config_from_args, get_model, str2bool
from valle_tpu.optim import eden_lr, eve, get_lr_fn, scaled_adam
from valle_tpu.parallel import mesh as mesh_lib
from valle_tpu.train.checkpoint import CheckpointManager
from valle_tpu.train.metrics import MetricsTracker
from valle_tpu.train.step import init_train_state, make_eval_step, make_train_step


def get_parser():
    parser = argparse.ArgumentParser(description="Train VALL-E (TPU)")
    add_model_arguments(parser)
    # trainer flags (ref trainer.py:83-277)
    parser.add_argument("--manifest-dir", type=Path, required=True)
    parser.add_argument("--text-tokens", type=str, default="unique_text_tokens.k2symbols")
    parser.add_argument("--exp-dir", type=Path, required=True)
    parser.add_argument("--num-epochs", type=int, default=20)
    parser.add_argument("--start-epoch", type=int, default=1)
    parser.add_argument("--train-stage", type=int, default=0)
    parser.add_argument("--optimizer-name", type=str, default="ScaledAdam")
    parser.add_argument("--scheduler-name", type=str, default="Eden")
    parser.add_argument("--base-lr", type=float, default=0.05)
    parser.add_argument("--warmup-steps", type=int, default=200)
    parser.add_argument("--accumulate-grad-steps", type=int, default=1)
    parser.add_argument("--max-duration", type=float, default=40.0)
    parser.add_argument("--num-buckets", type=int, default=10)
    parser.add_argument("--filter-min-duration", type=float, default=0.0)
    parser.add_argument("--filter-max-duration", type=float, default=20.0)
    parser.add_argument("--batch-quant", type=int, default=8,
                        help="round batch example counts up to a multiple of "
                        "this (masked dummy rows) to bound XLA recompiles")
    parser.add_argument("--dataset", type=str, default="",
                        help="libritts/ljspeech: enables prefix-mode-4 prompts")
    parser.add_argument("--log-interval", type=int, default=100)
    parser.add_argument("--valid-interval", type=int, default=10000)
    parser.add_argument("--save-every-n", type=int, default=10000)
    parser.add_argument("--keep-last-k", type=int, default=20)
    parser.add_argument("--average-period", type=int, default=0)
    parser.add_argument(
        "--init-checkpoint", type=str, default="",
        help="warm-start the model weights (optimizer/scheduler fresh) from "
        "a checkpoint before training: a reference PyTorch .pt (converted "
        "via utils/convert_reference — the torch->TPU migration path), an "
        ".npz params dump, or an orbax dir from our trainer.  Ignored when "
        "the exp dir already holds a checkpoint to resume from.")
    parser.add_argument("--seed", type=int, default=42)
    # multi-host launch (the TPU-native equivalent of the reference's
    # --world-size/--master-port DDP spawn, ref trainer.py:95-100,1152):
    # one process per host; on a TPU pod slice all three can be omitted
    # and jax.distributed auto-detects from the TPU environment.
    parser.add_argument("--num-processes", type=int, default=1,
                        help="total train processes (hosts); >1 calls "
                        "jax.distributed.initialize")
    parser.add_argument("--process-id", type=int, default=None)
    parser.add_argument("--coordinator-address", type=str, default="",
                        help="host:port of process 0")
    parser.add_argument("--inf-check", type=str2bool, default=False)
    parser.add_argument("--oom-check", type=str2bool, default=True)
    parser.add_argument("--tensorboard", type=str2bool, default=True)
    parser.add_argument("--visualize", type=str2bool, default=False,
                        help="dump eval PNGs at validation (ref trainer.py:575-583)")
    parser.add_argument("--enable-spec-aug", type=str2bool, default=False,
                        help="SpecAugment on fbank features (Transformer "
                        "baseline; ref datamodule.py:251-274)")
    parser.add_argument("--spec-aug-time-warp-factor", type=int, default=80)
    parser.add_argument("--profile-steps", type=str, default="",
                        help="'START,END': capture a jax.profiler trace of "
                        "those train steps into <exp-dir>/profile")
    parser.add_argument("--rng-impl", type=str, default="rbg",
                        choices=["rbg", "threefry2x32", "unsafe_rbg"],
                        help="PRNG for dropout masks; rbg (TPU hardware "
                        "RNG) cuts the measured step time ~35%% vs "
                        "threefry (docs/perf_notes.md)")
    return parser


def make_optimizer(args):
    name = args.optimizer_name
    if name == "ScaledAdam":
        from valle_tpu.optim import valle_batched_axis

        # batched_axis_fn: nn.scan-stacked layer leaves and the stacked NAR
        # embedding tables get per-slice rms/size stats, matching the
        # reference's per-tensor optimizer state (ref optim.py:504-596)
        return scaled_adam(
            learning_rate=args.base_lr, clipping_scale=2.0,
            betas=(0.9, 0.95), batched_axis_fn=valle_batched_axis,
        ), None
    if name == "Eve":
        from valle_tpu.optim import valle_batched_axis

        return eve(learning_rate=args.base_lr, betas=(0.9, 0.98),
                   target_rms=0.1,
                   batched_axis_fn=valle_batched_axis), None
    # plain Adam/AdamW via optax with grad-norm clip 1.0 (ref :687-692,961-975)
    if name == "AdamW":
        tx = optax.adamw(args.base_lr, b1=0.9, b2=0.95, weight_decay=1e-2)
    elif name == "Adam":
        tx = optax.adam(args.base_lr, b1=0.9, b2=0.95)
    else:
        raise NotImplementedError(name)
    wrapped = optax.GradientTransformationExtraArgs(
        tx.init, lambda g, s, p=None, lr=None, **kw: tx.update(g, s, p)
    )
    return wrapped, 1.0


def run(args):
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(message)s",
        handlers=[
            logging.StreamHandler(),
            logging.FileHandler(args.exp_dir / "log.txt"),
        ],
        force=True,  # jax configures the root logger first; override it
    )
    if getattr(args, "num_processes", 1) and args.num_processes > 1:
        from valle_tpu.parallel import dist

        dist.initialize(
            coordinator_address=args.coordinator_address or None,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
        logging.info(
            f"distributed: process {jax.process_index()}/"
            f"{jax.process_count()}"
        )
    cfg = config_from_args(args)
    model = get_model(cfg)
    logging.info(f"model config: {cfg}")
    if cfg.model_name.lower() == "transformer" and args.train_stage != 0:
        raise ValueError(
            "the Transformer baseline has no AR/NAR stages; use "
            "--train-stage 0"
        )

    collater = get_text_token_collater(str(args.manifest_dir / args.text_tokens))
    manifest = Manifest.load(args.manifest_dir / "manifest_train.jsonl.gz")
    dev_path = args.manifest_dir / "manifest_dev.jsonl.gz"
    dev_loader = None
    if dev_path.exists():
        # built once (not per validation — re-bucketing the dev set every
        # --valid-interval wasted host time)
        dev_loader = TtsDataLoader(
            Manifest.load(dev_path),
            collater,
            max_duration=args.max_duration,
            num_buckets=2,
            shuffle=False,
            dataset_name=args.dataset or None,
        )
        dev_loader.set_epoch(0)

    tx, clip = make_optimizer(args)
    lr_fn_base = get_lr_fn(
        args.scheduler_name,
        args.base_lr,
        decoder_dim=args.decoder_dim,
        warmup_steps=args.warmup_steps,
    )

    train_mesh = mesh_lib.make_mesh()
    world = jax.process_count()
    feature_transforms = []
    if args.enable_spec_aug:
        from valle_tpu.data.transforms import SpecAugment

        feature_transforms.append(
            SpecAugment(
                time_warp_factor=args.spec_aug_time_warp_factor,
                seed=args.seed,
            )
        )
    loader = TtsDataLoader(
        manifest,
        collater,
        max_duration=args.max_duration,
        num_buckets=args.num_buckets,
        accum_steps=args.accumulate_grad_steps,
        seed=args.seed,
        rank=jax.process_index(),
        world_size=world,
        dataset_name=args.dataset or None,
        min_duration=args.filter_min_duration,
        max_utt_duration=args.filter_max_duration,
        batch_quant=args.batch_quant,
        feature_transforms=feature_transforms,
    )

    # find an example batch for init
    loader.set_epoch(args.start_epoch)
    try:
        example = next(iter(loader))
    except StopIteration:
        raise SystemExit(
            "the training loader yields zero accumulation groups — the "
            "corpus is too small for num_processes x accumulate-grad-steps "
            "at this --max-duration (every host needs at least one full "
            "group of same-bucket batches)"
        )
    example_batch = {
        k: jnp.asarray(v[0])
        for k, v in example.items()
        if k not in ("utt_id", "text")
    }
    state = init_train_state(
        model,
        tx,
        jax.random.PRNGKey(args.seed),
        example_batch,
        train_stage=args.train_stage,
        with_model_avg=args.average_period > 0,
    )
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(state.params))
    logging.info(f"parameters: {n_params / 1e6:.1f}M")
    # model description dump (ref trainer.py:894-896 model.txt)
    with open(args.exp_dir / "model.txt", "w") as f:
        f.write(f"{cfg}\n\nparameters: {n_params}\n\n")
        for path, p in jax.tree_util.tree_flatten_with_path(state.params)[0]:
            name = "/".join(str(k.key) for k in path)
            f.write(f"{name}\t{tuple(p.shape)}\t{p.dtype}\n")

    ckpt = CheckpointManager(args.exp_dir / "checkpoints", args.keep_last_k)
    meta: dict = {}
    latest = ckpt.latest()
    if args.init_checkpoint and latest is None:
        # weights-only warm start (e.g. migrating a reference-trained .pt);
        # optimizer/scheduler state stays fresh, like a stage switch
        from valle_tpu.bin.infer import load_model_params

        variant = (
            "vallf" if cfg.model_name.lower() in ("vall-f", "vallf")
            else "valle"
        )
        loaded = load_model_params(args.init_checkpoint, cfg, variant)
        # tree_map validates the structures match; keep the initialized
        # dtypes (the train step's param dtype policy, not the file's)
        params = jax.tree.map(
            lambda cur, new: jnp.asarray(new, cur.dtype),
            state.params,
            jax.tree.map(jnp.asarray, loaded),
        )
        # re-init the optimizer from the LOADED weights: ScaledAdam's state
        # carries param_rms of the params it was initialized with
        from valle_tpu.train.state import partition_params

        train_params, _ = partition_params(params, args.train_stage)
        state = state.replace(
            params=params,
            opt_state=tx.init(train_params),
            model_avg=(
                jax.tree.map(jnp.array, params)
                if state.model_avg is not None
                else None
            ),
        )
        logging.info(f"warm-started weights from {args.init_checkpoint}")
    if latest is not None:
        prev_stage = None
        meta_path = ckpt.dir / f"{latest}.meta.json"
        if meta_path.exists():
            import json

            prev_stage = json.loads(meta_path.read_text()).get("train_stage")
        state, meta = ckpt.restore(
            latest,
            state,
            tx=tx,
            from_stage=prev_stage,
            to_stage=args.train_stage,
        )
        logging.info(f"resumed from {latest} (meta={list(meta)})")
        if "sampler_state" in meta:
            loader.load_state_dict(meta["sampler_state"])

    step_fn = make_train_step(
        model,
        tx,
        lambda s, e: lr_fn_base(s, e),
        train_stage=args.train_stage,
        clip_grad_norm=clip,
        average_period=args.average_period,
    )
    eval_fn = make_eval_step(model, train_stage=args.train_stage)

    writer = None
    if args.tensorboard:
        try:
            from tensorboardX import SummaryWriter

            writer = SummaryWriter(
                str(args.exp_dir / f"tensorboard_stage{args.train_stage}")
            )
        except ImportError:
            pass

    rng = jax.random.key(args.seed + 1, impl=args.rng_impl)
    tracker = MetricsTracker(reset_interval=200)
    start_epoch = int(meta.get("epoch", args.start_epoch))

    profile_range = None
    trace_active = False
    if args.profile_steps:
        lo, hi = (int(x) for x in args.profile_steps.split(","))
        profile_range = (lo, hi)
    from valle_tpu.utils.flops import chip_peak_flops, train_step_flops

    peak = chip_peak_flops()

    if args.oom_check:
        scan_batch_shapes_for_oom(
            args, cfg, loader, step_fn, state, train_mesh
        )

    with train_mesh:
        for epoch in range(start_epoch, args.num_epochs + 1):
            loader.set_epoch(epoch)
            epoch_arr = jnp.asarray(epoch, jnp.int32)
            t_last = time.time()
            flops_since_log = 0.0
            # background host batch assembly (native C++ gather + collation)
            # overlapping device compute (ref dataloader workers
            # datamodule.py:336-343)
            for batch in Prefetcher(iter(loader)):
                arrays = {
                    k: v
                    for k, v in batch.items()
                    if k not in ("utt_id", "text", "prompt_codes_lens")
                }
                if profile_range and int(state.step) + 1 == profile_range[0]:
                    jax.profiler.start_trace(str(args.exp_dir / "profile"))
                    trace_active = True
                    logging.info(
                        f"profiler trace started (steps {profile_range})"
                    )
                a_, b_, s_ = arrays["text_tokens"].shape
                t_ = arrays["audio_features"].shape[2]
                flops_since_log += train_step_flops(
                    cfg, a_, b_, s_, t_, args.train_stage
                )
                sharded = mesh_lib.shard_batch(arrays, train_mesh, axis=1)
                try:
                    state, metrics = step_fn(state, sharded, rng, epoch_arr)
                    step = int(state.step)
                    tracker.update(jax.tree.map(float, metrics))
                except Exception:
                    # crash-time batch dump (ref display_and_save_batch
                    # trainer.py:1076-1093)
                    dump = args.exp_dir / f"batch-crash-step{int(state.step)}.npz"
                    np.savez(
                        dump,
                        **{k: np.asarray(v) for k, v in arrays.items()},
                        utt_id=np.array(
                            [u for row in batch["utt_id"] for u in row]
                        ),
                    )
                    logging.error(f"step failed; batch dumped to {dump}")
                    raise

                if args.inf_check and not np.isfinite(float(metrics["loss"])):
                    # localize the first non-finite module / poisoned params
                    # (per-module parity with ref trainer.py:992-993 hooks,
                    # run post-hoc so the hot step stays fused)
                    from valle_tpu.train.debug import nonfinite_report

                    micro = {
                        k: jnp.asarray(v[0])
                        for k, v in arrays.items()
                        if k != "prompt_codes_lens"
                    }
                    report = nonfinite_report(
                        model, state.params, micro,
                        train_stage=args.train_stage,
                    )
                    raise FloatingPointError(
                        f"non-finite loss at step {step}: {metrics}; {report}"
                    )

                if profile_range and step >= profile_range[1]:
                    jax.profiler.stop_trace()
                    trace_active = False
                    logging.info(
                        f"profiler trace written to {args.exp_dir / 'profile'}"
                    )
                    profile_range = None

                if step % args.log_interval == 0:
                    dt = time.time() - t_last
                    t_last = time.time()
                    # analytic MFU per chip over the interval (matmul FLOPs
                    # from THIS HOST's batch shapes vs this host's chips —
                    # the loader is rank-sharded, so local flops over local
                    # devices is the per-chip utilization on any world size)
                    n_dev = max(jax.local_device_count(), 1)
                    mfu = flops_since_log / max(dt, 1e-9) / (peak * n_dev)
                    flops_since_log = 0.0
                    mem = ""
                    stats = getattr(
                        jax.local_devices()[0], "memory_stats", lambda: None
                    )()
                    if stats and "bytes_in_use" in stats:
                        mem = f" mem={stats['bytes_in_use'] / 2**30:.1f}GiB"
                    msg = tracker.summary()
                    logging.info(
                        f"epoch {epoch} step {step} {msg} "
                        f"({args.log_interval / max(dt, 1e-9):.2f} it/s, "
                        f"mfu={mfu:.3f}{mem})"
                    )
                    if writer:
                        for k, v in tracker.normalized().items():
                            writer.add_scalar(f"train/{k}", v, step)
                        writer.add_scalar("train/lr", float(metrics["lr"]), step)
                        writer.add_scalar("train/mfu", mfu, step)

                if args.save_every_n and step % args.save_every_n == 0:
                    ckpt.save_step(
                        step,
                        state,
                        {
                            "train_stage": args.train_stage,
                            "epoch": epoch,
                            "train_loss": tracker.normalized().get("loss"),
                            "sampler_state": loader.state_dict(),
                        },
                    )

                if dev_loader is not None and step % args.valid_interval == 0:
                    valid_loss = run_validation(
                        eval_fn, state, dev_loader, args, train_mesh,
                        model=model, tag=f"step-{step}",
                    )
                    logging.info(f"validation at step {step}: loss={valid_loss:.4f}")
                    if writer:
                        writer.add_scalar("valid/loss", valid_loss, step)

            if trace_active:
                # training ended before the requested end step: close the
                # trace so it is not lost
                jax.profiler.stop_trace()
                trace_active = False
                profile_range = None
                logging.info(
                    f"profiler trace (early stop) written to "
                    f"{args.exp_dir / 'profile'}"
                )
            ckpt.save_epoch(
                epoch,
                state,
                {
                    "train_stage": args.train_stage,
                    "train_loss": tracker.normalized().get("loss"),
                    "valid_loss": run_validation(
                        eval_fn, state, dev_loader, args, train_mesh,
                        model=model, tag=f"epoch-{epoch}",
                    )
                    if dev_loader is not None
                    else None,
                },
            )
            logging.info(f"epoch {epoch} done")


def scan_batch_shapes_for_oom(args, cfg, loader, step_fn, state, train_mesh):
    """Pre-flight: AOT-compile one train step per distinct batch shape the
    sampler will produce this epoch (ref scan_pessimistic_batches_for_oom,
    trainer.py:1096-1140).  Surfaces OOM before hours of training AND warms
    the (persistent) XLA compile cache so epoch 1 has no mid-epoch compile
    stalls.

    Compile-only on purpose: on TPU the OOM failure mode is the compiler's
    HBM assignment (every OOM observed in docs/perf_notes.md was a compile
    error), and ``.lower().compile()`` traces the REAL state without copying
    or donating it — the earlier executed scan deep-copied params+optimizer
    state, ~2x optimizer-state HBM, which could itself OOM configs the real
    loop would survive.  Per-shape peak memory is logged from the compiled
    program's memory analysis."""
    sampler = loader.sampler
    shapes = sorted(
        {
            (
                sampler.bucket_specs[b].max_text_len,
                sampler.bucket_specs[b].max_audio_len,
                len(items),
            )
            for b, items in sampler._batches()
        }
    )
    logging.info(f"OOM pre-scan / jit pre-warm over {len(shapes)} batch shapes")
    rng = np.random.RandomState(0)
    a = args.accumulate_grad_steps
    float_features = loader.dataset.float_features
    with train_mesh:
        for s, t, bsz in shapes:
            if float_features:  # mel features (Transformer baseline)
                audio = rng.randn(a, bsz, t, cfg.num_mel_bins).astype(
                    np.float32
                )
            else:
                audio = rng.randint(
                    0, cfg.num_audio_tokens, (a, bsz, t, cfg.num_quantizers)
                ).astype(np.int32)
            arrays = {
                "text_tokens": rng.randint(
                    1, cfg.num_text_tokens, (a, bsz, s)
                ).astype(np.int32),
                "text_tokens_lens": np.full((a, bsz), s, np.int32),
                "audio_features": audio,
                "audio_features_lens": np.full((a, bsz), t, np.int32),
                "example_mask": np.ones((a, bsz), bool),
            }
            if args.dataset:
                p = 3 * 75
                arrays["prompt_codes"] = rng.randint(
                    0, cfg.num_audio_tokens, (a, bsz, p, cfg.num_quantizers)
                ).astype(np.int32)
            sharded = mesh_lib.shard_batch(arrays, train_mesh, axis=1)
            try:
                compiled = step_fn.lower(
                    state, sharded, jax.random.PRNGKey(0),
                    jnp.zeros((), jnp.int32),
                ).compile()
                try:
                    mem = compiled.memory_analysis()
                    peak_gb = (
                        mem.temp_size_in_bytes + mem.argument_size_in_bytes
                    ) / 2**30
                    logging.info(
                        f"  shape B={bsz} S={s} T={t}: "
                        f"temp+args {peak_gb:.2f} GiB"
                    )
                except Exception:  # memory analysis is backend-optional
                    pass
            except Exception:
                logging.error(
                    f"OOM-scan failure at shape B={bsz} S={s} T={t} "
                    f"(accum {a}); reduce --max-duration"
                )
                raise


def run_validation(
    eval_fn, state, loader, args, mesh, model=None, tag="latest"
) -> float:
    """Validation over the (pre-built) dev loader, with each batch sharded
    over the mesh's data axis so eval uses all chips (ref trainer.py:550-585;
    the metric sums are global under GSPMD like MetricsTracker.reduce)."""
    tot, frames = 0.0, 0.0
    rng = jax.random.PRNGKey(0)
    first = None
    with mesh:
        for batch in loader:
            # numpy straight into shard_batch (device_put with the mesh
            # sharding) — jnp.asarray first would add a redundant transfer
            micro = {
                k: v[0]
                for k, v in batch.items()
                if k not in ("utt_id", "text", "prompt_codes_lens")
            }
            micro = mesh_lib.shard_batch(micro, mesh, axis=0)
            out = eval_fn(state.params, micro, rng)
            tot += float(out["loss"])
            frames += float(out["frames"])
            if first is None:
                first = batch
    if (args.visualize and model is not None and first is not None
            and args.model_name.lower() != "transformer"):
        from valle_tpu.models.visualizer import visualize

        # shard the forward over the mesh's data axis like eval batches —
        # a plain apply would replicate onto device 0 and could OOM a pod
        # with a large eval bucket
        vis_in = mesh_lib.shard_batch(
            {
                k: first[k][0]
                for k in ("text_tokens", "text_tokens_lens",
                          "audio_features", "audio_features_lens")
            },
            mesh,
            axis=0,
        )
        with mesh:
            enc, dec = jax.jit(model.apply, static_argnames=("method",))(
                {"params": state.params},
                vis_in["text_tokens"],
                vis_in["text_tokens_lens"],
                vis_in["audio_features"],
                vis_in["audio_features_lens"],
                method="visualize_forward",
            )
        visualize(
            (np.asarray(enc, np.float32), np.asarray(dec, np.float32)),
            {
                "text_tokens": first["text_tokens"][0],
                "text_tokens_lens": first["text_tokens_lens"][0],
                "audio_features": first["audio_features"][0],
                "audio_features_lens": first["audio_features_lens"][0],
                "utt_id": first["utt_id"][0],
                "text": first["text"][0],
            },
            str(args.exp_dir / "eval" / str(tag)),
        )
    return tot / max(frames, 1.0)


def main():
    args = get_parser().parse_args()
    args.exp_dir.mkdir(parents=True, exist_ok=True)
    run(args)


if __name__ == "__main__":
    main()
