"""Contrastive trainer (reference scripts/train_cl.py:145-369 +
epoch/train_epoch.py:9-81), TPU-native.

One jitted train step under the device mesh: device-side augmentation
(flips/rotation — the host pipeline does decode + resize + random-resized
crop), tri-encoder forward in bf16 (the reference's autocast), global-batch
multi-positive InfoNCE (XLA inserts the ICI all-gathers for the sharded
batch), AdamW with per-step LR schedule and a trainability mask
(LoRA/freeze semantics), donated params+opt_state.

Epoch loop: eval every `evaluation_period` via the retrieval grid, best/last
checkpoints selected by overall_acc, early stopping — rank logic and NCCL
broadcasts disappear (single-controller JAX).
"""

from __future__ import annotations

import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config.schema import ExperimentConfig, GlobalConfig
from ..data.pipeline import BatchSpec, BioscanLoader
from ..models.clibd import clibd_apply, dequantize_image, init_clibd_params, trainable_mask
from ..ops.augment import train_augment
from ..ops.loss import clip_loss
from ..parallel.mesh import (
    create_mesh,
    host_id,
    is_main_process,
    num_hosts,
    pad_to_multiple,
    replicate,
    shard_batch,
)
from .checkpoint import BestLastCheckpointer
from .evaluate import compute_overall_acc, inference_and_eval
from .extract import extract_split
from .schedules import build_schedule


def build_optimizer(cfg: ExperimentConfig, params, schedule) -> optax.GradientTransformation:
    mask = trainable_mask(params, cfg)
    labels = jax.tree.map(lambda m: "train" if m else "frozen", mask)
    adamw = optax.adamw(
        learning_rate=schedule,
        b1=cfg.optim.beta1,
        b2=cfg.optim.beta2,
        eps=cfg.optim.eps,
        weight_decay=cfg.optim.weight_decay,
    )
    if cfg.optim.grad_clip_norm > 0:
        # clip inside the trainable branch: frozen params carry zero updates
        # but nonzero value_and_grad outputs here (torch frozen params have
        # requires_grad=False, so a torch clip would see only trainable
        # grads); clipping the full tree would let the frozen backbone's
        # grads dominate the global norm and systematically over-clip
        adamw = optax.chain(optax.clip_by_global_norm(cfg.optim.grad_clip_norm), adamw)
    return optax.multi_transform({"train": adamw, "frozen": optax.set_to_zero()}, labels)


def remat_arg(cfg: ExperimentConfig):
    """cfg.remat/cfg.remat_policy → the `remat` argument for clibd_apply:
    False (off), True (blanket recompute), or a policy spec string
    (models/layers.remat_policy)."""
    if not cfg.remat:
        return False
    return cfg.remat_policy if cfg.remat_policy not in ("", "none") else True


def make_train_step(
    cfg: ExperimentConfig,
    optimizer: optax.GradientTransformation,
    mesh=None,
    donate: bool = True,
) -> Callable:
    """→ step(params, opt_state, batch, rng) → (params, opt_state, loss).

    Sharding is carried by the inputs: callers place the batch with a
    P('data') leading-axis sharding and params replicated (parallel/mesh.py);
    jit propagates those layouts and XLA inserts the loss all-gathers over
    ICI (mesh is accepted for signature symmetry/documentation)."""
    compute_dtype = jnp.bfloat16 if cfg.amp else jnp.float32

    def loss_fn(params, batch, rng):
        image_in = batch.get("image")
        if image_in is not None and cfg.image.input_type == "image":
            # augment in compute dtype: flips/rotation only move values, so
            # augment(cast(x)) == cast(augment(x)) bit-exactly, and the tower
            # casts to compute_dtype anyway — under bf16 this halves the
            # augmentation's HBM traffic for free
            image_in = train_augment(
                rng, dequantize_image(image_in).astype(compute_dtype))
        out = clibd_apply(
            params,
            cfg,
            image_input=image_in,
            dna_input=batch.get("dna"),
            language_input=batch.get("language"),
            compute_dtype=compute_dtype,
            remat=remat_arg(cfg),
        )
        # fix_temperature → literal 1/0.07 (reference train_epoch.py:55-56)
        logit_scale = (1.0 / 0.07) if cfg.loss.fix_temperature else out["logit_scale"]
        features = {m: out[m] for m in ("image", "dna", "language")}
        return clip_loss(features, batch["label"], logit_scale, cfg.loss)

    def step(params, opt_state, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def make_train_step_accum(
    cfg: ExperimentConfig,
    optimizer: optax.GradientTransformation,
    accum_steps: int,
    donate: bool = True,
) -> Callable:
    """Gradient-cache accumulation step: the EXACT full-batch CLIP loss and
    gradients of `make_train_step` at ~1/accum_steps the activation memory.

    A contrastive loss couples every sample in the batch, so naive microbatch
    accumulation would change the objective (k independent batch-B/k CLIP
    losses ≠ one batch-B CLIP loss).  This is the gradient-cache construction
    instead (the structure of Gao et al. 2021's GradCache, re-derived for
    jax transforms):

      1. `lax.scan` of NO-GRAD encoder forwards over the k microbatches —
         only the [B, D] feature matrices persist, never a microbatch's
         activations beyond its scan iteration;
      2. full-batch loss + cotangents d(loss)/d(features) on those [B, D]
         matrices (+ d/d(logit_scale) straight to its param leaf) — cheap;
      3. `lax.scan` of per-microbatch encoder VJPs against the cached
         feature cotangents, accumulating the parameter gradients.

    Passes 1 and 3 compute the same function (same params, same per-
    microbatch fold_in rng), so the total gradient equals the monolithic
    step's exactly (up to scan-order fp addition; pinned by
    tests/test_train.py).  FLOP cost = one extra no-grad forward — the
    memory-for-compute trade this makes is an ALTERNATIVE to remat
    (cfg.remat still applies inside each microbatch if set); measured
    against remat on the flagship recipe in docs/PERF.md (round 5).

    Single-mesh/global-jit variant (sharding carried by input placement,
    like make_train_step); B must divide by accum_steps.
    """
    if accum_steps < 2:
        return make_train_step(cfg, optimizer, donate=donate)
    compute_dtype = jnp.bfloat16 if cfg.amp else jnp.float32

    def encode_mb(params, mbatch, mb_rng):
        image_in = mbatch.get("image")
        if image_in is not None and cfg.image.input_type == "image":
            image_in = train_augment(
                mb_rng, dequantize_image(image_in).astype(compute_dtype))
        out = clibd_apply(
            params,
            cfg,
            image_input=image_in,
            dna_input=mbatch.get("dna"),
            language_input=mbatch.get("language"),
            compute_dtype=compute_dtype,
            remat=remat_arg(cfg),
        )
        return {m: out[m] for m in ("image", "dna", "language")
                if out[m] is not None}

    def split_mb(batch):
        """[B, ...] leaves → [k, B//k, ...] (labels stay full-batch)."""
        def r(x):
            assert x.shape[0] % accum_steps == 0, (
                f"batch {x.shape[0]} not divisible by accum_steps={accum_steps}")
            return x.reshape(accum_steps, x.shape[0] // accum_steps, *x.shape[1:])

        return jax.tree.map(r, {k: v for k, v in batch.items() if k != "label"})

    def step(params, opt_state, batch, rng):
        mbs = split_mb(batch)
        mb_rngs = jax.vmap(lambda i: jax.random.fold_in(rng, i))(
            jnp.arange(accum_steps))

        # pass 1: no-grad features, one microbatch resident at a time
        def fwd(_, xs):
            mb, r = xs
            return None, encode_mb(params, mb, r)

        _, feats_stacked = jax.lax.scan(fwd, None, (mbs, mb_rngs))
        feats = jax.tree.map(
            lambda x: x.reshape(x.shape[0] * x.shape[1], *x.shape[2:]),
            feats_stacked)

        # pass 2: loss + feature/logit_scale cotangents on [B, D] only
        def head(ls_param, f):
            logit_scale = ((1.0 / 0.07) if cfg.loss.fix_temperature
                           else jnp.exp(ls_param))
            return clip_loss(f, batch["label"], logit_scale, cfg.loss)

        loss, (d_ls, d_feats) = jax.value_and_grad(head, argnums=(0, 1))(
            params["logit_scale"], feats)
        d_feats_stacked = jax.tree.map(
            lambda x: x.reshape(accum_steps, x.shape[0] // accum_steps,
                                *x.shape[1:]),
            d_feats)

        # pass 3: per-microbatch VJPs, grads accumulated in the scan carry
        def bwd(acc, xs):
            mb, r, ct = xs
            _, vjp = jax.vjp(lambda p: encode_mb(p, mb, r), params)
            (g,) = vjp(ct)
            return jax.tree.map(jnp.add, acc, g), None

        zero = jax.tree.map(jnp.zeros_like, params)
        grads, _ = jax.lax.scan(bwd, zero, (mbs, mb_rngs, d_feats_stacked))
        grads["logit_scale"] = grads["logit_scale"] + d_ls

        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def make_train_step_shard_map(
    cfg: ExperimentConfig,
    optimizer: optax.GradientTransformation,
    mesh,
    donate: bool = True,
) -> Callable:
    """Explicit-collective train step: the whole step runs under `shard_map`
    (per-device local batch shapes), with `sharded_clip_loss`'s
    `lax.all_gather` building the global contrastive batch and a `psum` of
    gradients standing in for DDP's allreduce.

    Numerically identical to `make_train_step`'s global-math jit (tested on
    the CPU mesh), but (a) the collective pattern is pinned rather than left
    to the partitioner and (b) local shapes let the flash Pallas attention
    kernel run per device on multi-chip meshes."""
    from jax.sharding import PartitionSpec as P

    from ..models.layers import flash_context
    from ..ops.loss import sharded_clip_loss

    compute_dtype = jnp.bfloat16 if cfg.amp else jnp.float32

    def local_loss_fn(params, batch, rng):
        image_in = batch.get("image")
        if image_in is not None and cfg.image.input_type == "image":
            # decorrelate augmentation streams across shards (the replicated
            # key would otherwise draw identical crops on every device)
            rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
            # compute-dtype augment: bit-equal to fp32 augment + cast (see
            # make_train_step)
            image_in = train_augment(
                rng, dequantize_image(image_in).astype(compute_dtype))
        with flash_context(True):
            out = clibd_apply(
                params, cfg,
                image_input=image_in,
                dna_input=batch.get("dna"),
                language_input=batch.get("language"),
                compute_dtype=compute_dtype,
                remat=remat_arg(cfg),
            )
        logit_scale = (1.0 / 0.07) if cfg.loss.fix_temperature else out["logit_scale"]
        features = {m: out[m] for m in ("image", "dna", "language")}
        return sharded_clip_loss(features, batch["label"], logit_scale, cfg.loss)

    def local_step(params, opt_state, batch, rng):
        loss, grads = jax.value_and_grad(local_loss_fn)(params, batch, rng)
        # per-device grads cover only the local shard's encoder paths; the
        # global gradient is their sum (DDP allreduce ≡ psum)
        grads = jax.lax.psum(grads, "data")
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P("data"), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,  # pallas out_shapes carry no vma info
    )
    return jax.jit(sharded, donate_argnums=(0, 1) if donate else ())


class Trainer:
    """Full training driver: loaders + model + optimizer + eval + checkpoints."""

    def __init__(
        self,
        global_cfg: GlobalConfig,
        hdf5_path: str,
        output_dir: str,
        train_split: str = "no_split_and_seen_train",
        eval_splits: Optional[dict] = None,  # {"keys": ..., "seen": ..., "unseen": ...}
        params: Optional[dict] = None,
        mesh=None,
        log_fn: Optional[Callable[[dict], None]] = None,
        num_workers: Optional[int] = None,
        train_labels: Optional[np.ndarray] = None,
        train_loader=None,
        eval_loader_factory: Optional[Callable[[str, bool], object]] = None,
    ):
        """train_loader / eval_loader_factory allow alternate datasets (e.g.
        INSECT contrastive fine-tune, reference train_cl.py:166-169):
        eval_loader_factory(split_name, train) must return a loader with
        batches()/label_dicts()/ids()/close()."""
        self.gcfg = global_cfg
        self.cfg = global_cfg.model_config
        self.hdf5_path = hdf5_path
        self.mesh = mesh if mesh is not None else create_mesh()
        self.log_fn = log_fn or (lambda d: None)
        # async checkpoint writes: the disk leg of last/best saves overlaps
        # the next epoch; fit() and close() join before returning
        self.checkpointer = BestLastCheckpointer(output_dir, async_writes=True)
        self.eval_splits = eval_splits or {
            "keys": "all_keys",
            "seen": "val_seen",
            "unseen": "val_unseen",
        }

        cfg = self.cfg
        # reference semantics: batch_size is PER-DEVICE (train_cl.py runs one
        # process per GPU with batch_size each); the host loader therefore
        # produces global batches of batch_size × mesh-size, which also keeps
        # train batches exactly divisible across the mesh (no padding)
        self.world_size = self.mesh.size
        # multi-host: the loader yields this process's shard of the global
        # batch (shard_batch assembles the global array across processes);
        # single host: the full global batch
        local_share = self.world_size // num_hosts()
        spec = BatchSpec(
            batch_size=cfg.batch_size * local_share,
            train=True,
            transport_uint8=cfg.amp,
            with_image=cfg.image.enable,
            with_dna=cfg.dna.enable,
            with_language=cfg.language.enable,
            dna_kmer=cfg.dna.kmer,
            dna_tokenizer=cfg.dna.tokenizer,
            dna_stride=cfg.dna.stride,
            dna_max_bp=cfg.dna.max_bp,
            image_source="image" if cfg.image.input_type == "image" else "image_features",
            dna_source="sequence" if cfg.dna.input_type == "sequence" else "dna_features",
            clip_tokenizer=BatchSpec.maybe_clip_tokenizer(cfg),
        )
        self.eval_loader_factory = eval_loader_factory
        nw = global_cfg.pipeline.num_workers if num_workers is None else num_workers
        if train_loader is not None:
            self.train_loader = train_loader
        else:
            self.train_loader = BioscanLoader(
                hdf5_path, train_split, spec,
                labels=train_labels,
                num_workers=nw,
                prefetch=global_cfg.pipeline.prefetch_batches,
                seed=cfg.default_seed,
                use_native=global_cfg.pipeline.use_native_decoder,
                # DistributedSampler semantics (reference dataset.py:44-51):
                # disjoint per-host index shards, drop_last, equal batch counts
                host_id=host_id(),
                num_hosts=num_hosts(),
            )

        if params is None:
            params = init_clibd_params(jax.random.PRNGKey(cfg.default_seed), cfg)
        self.params = replicate(self.mesh, params)

        steps_per_epoch = len(self.train_loader)
        total_steps = max(steps_per_epoch * cfg.epochs, 1)
        # LR × (batch × world)/500 (reference util/util.py:753-756)
        self.schedule = build_schedule(
            cfg.optim, total_steps, cfg.batch_size, world_size=self.world_size
        )
        self.optimizer = build_optimizer(cfg, params, self.schedule)
        self.opt_state = replicate(self.mesh, self.optimizer.init(params))
        if cfg.step_impl == "shard_map":
            if cfg.accum_steps > 1:
                raise ValueError("accum_steps>1 requires step_impl=jit "
                                 "(gradient-cache step is global-math)")
            self.step_fn = make_train_step_shard_map(cfg, self.optimizer, self.mesh)
        elif cfg.accum_steps > 1:
            self.step_fn = make_train_step_accum(cfg, self.optimizer,
                                                 cfg.accum_steps)
        else:
            self.step_fn = make_train_step(cfg, self.optimizer, mesh=self.mesh)
        self.global_step = 0
        self.stop_flag = False

    # -- epoch loops --------------------------------------------------------

    def train_epoch(self, epoch: int, progress: bool = False, start_batch: int = 0) -> float:
        cfg = self.cfg
        from ..utils.profiling import StepTimer

        timer = StepTimer(warmup_steps=1)
        # per-batch keys derive from (epoch base, batch index) — O(1)
        # mid-epoch resume realignment instead of one split per skipped batch
        base_rng = jax.random.PRNGKey((cfg.default_seed << 16) + epoch)
        epoch_loss, n_steps = 0.0, 0
        t0 = time.time()
        batch_idx = start_batch
        pending = None  # one-step-delayed loss fetch: the host materializes
        # step i's loss while the device runs step i+1 (extract_split pattern)

        def emit(item):
            nonlocal epoch_loss
            loss_dev, step_no, lr = item
            loss_val = float(loss_dev)
            epoch_loss += loss_val
            self.log_fn({"loss": loss_val, "step": step_no, "learning_rate": lr})
            if progress:
                dt = time.time() - t0
                print(
                    f"\rEpoch {epoch}||Step {step_no}||Loss {loss_val:.4f}||LR {lr:.3e}||{n_steps/max(dt,1e-9):.2f} it/s",
                    end="",
                )

        for batch in self.train_loader.batches(epoch=epoch, start_batch=start_batch):
            sub = jax.random.fold_in(base_rng, batch_idx)
            batch_idx += 1
            model_batch = {
                k: batch[k] for k in ("image", "dna", "language", "label") if k in batch
            }
            # pad the LOCAL batch to this process's device share (a global-
            # count multiple would inject duplicated rows into the loss on
            # multi-host runs); drop_last makes this a no-op in practice
            padded, _ = pad_to_multiple(model_batch, self.mesh.size // num_hosts())
            padded = shard_batch(self.mesh, padded)
            self.params, self.opt_state, loss = self.step_fn(
                self.params, self.opt_state, padded, sub
            )
            self.global_step += 1
            n_steps += 1
            # step-cadence last/ (mid-epoch failure recovery; async, so the
            # disk leg overlaps the next step — snapshot happens here, before
            # the buffers are donated to it)
            if (cfg.checkpoint_every_steps
                    and self.global_step % cfg.checkpoint_every_steps == 0
                    and self.gcfg.save_ckpt and is_main_process()):
                # meta.epoch records the last COMPLETED epoch (resume
                # realigns to step − (epoch+1)·steps_per_epoch inside the
                # next one, _apply_resume_state)
                self.checkpointer.save_last(
                    self.params, self.opt_state, self.global_step, epoch - 1)
            lr = float(self.schedule(self.global_step - 1))
            if pending is not None:
                emit(pending)
            pending = (loss, self.global_step, lr)
            timer.tick()
        if pending is not None:
            emit(pending)
        if progress:
            print()
        if timer.times:
            self.log_fn(
                {
                    "epoch": epoch,
                    **{
                        f"throughput/{k}": v
                        for k, v in timer.summary(
                            cfg.batch_size * self.world_size, n_chips=self.world_size
                        ).items()
                    },
                }
            )
        return epoch_loss / max(n_steps, 1)

    def evaluate(self) -> dict:
        cfg = self.cfg
        # best-checkpoint selection must see the same preprocessing as the
        # final standalone eval — one shared constructor guarantees it
        spec = BatchSpec.eval_spec(cfg)

        # multi-host: the split is host-sharded — each process decodes+encodes
        # 1/H of the data on its local devices and the encoded matrices are
        # allgathered so every host holds the identical full-split dict
        # (extract_split_multihost; the kNN grid below stays per-host, keeping
        # the early-stop decision deterministic everywhere without the
        # reference's stop_flag broadcast, train_cl.py:280-331)
        from ..parallel.mesh import local_mesh, mesh_is_multiprocess

        multiproc = mesh_is_multiprocess(self.mesh)
        eval_mesh = local_mesh() if multiproc else self.mesh
        eval_params = jax.device_get(self.params) if multiproc else self.params

        def run(split, for_key=False):
            if self.eval_loader_factory is not None:
                loader = self.eval_loader_factory(split, False)
                out = extract_split(eval_params, cfg, loader, for_key_set=for_key,
                                    mesh=eval_mesh)
                loader.close()
                return out
            if multiproc:
                from .extract import extract_split_multihost

                return extract_split_multihost(
                    eval_params, cfg, self.hdf5_path, split, spec,
                    for_key_set=for_key,
                    num_workers=self.gcfg.pipeline.num_workers,
                    use_native=self.gcfg.pipeline.use_native_decoder,
                )
            # same decode parallelism as training — at 1M scale all_keys
            # is 21k records × 3 splits per eval (VERDICT r1 weak #7)
            loader = BioscanLoader(
                self.hdf5_path, split, spec,
                num_workers=self.gcfg.pipeline.num_workers,
                use_native=self.gcfg.pipeline.use_native_decoder,
            )
            out = extract_split(eval_params, cfg, loader, for_key_set=for_key, mesh=eval_mesh)
            loader.close()
            return out

        keys_dict = run(self.eval_splits["keys"], for_key=True)
        seen_dict = run(self.eval_splits["seen"])
        unseen_dict = run(self.eval_splits["unseen"])
        acc_dict, _, _ = inference_and_eval(keys_dict, seen_dict, unseen_dict, with_preds=False)
        return acc_dict

    def resume(self, directory: str) -> int:
        """Restore params + optimizer state + step from a checkpoint dir
        (true resume — the reference only reloads params, SURVEY.md §5.4).
        Returns the epoch to continue from."""
        from .checkpoint import load_train_state

        donor = self.optimizer.init(jax.device_get(self.params))
        params, opt_state, meta = load_train_state(directory, opt_state_like=donor)
        return self._apply_resume_state(
            params, opt_state if opt_state is not None else donor,
            int(meta.get("step", 0)), int(meta.get("epoch", -1)),
            self._read_best_meta(directory),
        )

    def resume_multihost(self, directory: str):
        """Resume on a multi-host pod where checkpoint writes are
        process-0-gated: process 0 loads and BROADCASTS params + optimizer
        state + the scalar bookkeeping, so all hosts continue in lockstep
        with identical weights and best-metric tracking.  Local files on
        other hosts — even when present — are deliberately ignored: a stale
        per-host copy at the same path (older run, pre-gating version) read
        locally would silently diverge the pod, since matching shapes keep
        the first train-step collectives from failing.  A per-host
        `os.path.exists` gate would be equally wrong in the other direction
        (non-0 hosts fresh-starting against a resumed process 0).  Returns
        the epoch to continue from, or None when process 0 has no
        checkpoint (fresh start everywhere — agreed via allgather, not
        local disk).  Single process delegates to the local resume()."""
        from ..parallel.mesh import broadcast_from_main, host_id, num_hosts

        local_has = os.path.exists(os.path.join(directory, "params.npz"))
        if num_hosts() == 1:
            return self.resume(directory) if local_has else None
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(np.asarray([local_has]))
        if not bool(np.ravel(flags)[0]):
            return None  # process 0 has nothing → fresh start everywhere
        from .checkpoint import load_train_state

        donor = self.optimizer.init(jax.device_get(self.params))
        if host_id() == 0:
            params, opt_state, meta = load_train_state(directory, opt_state_like=donor)
            if opt_state is None:
                opt_state = donor
            best = self._read_best_meta(directory)
            # int32/float32 split: broadcast canonicalizes to 32-bit (x64
            # off) — packing step/epoch as floats would corrupt large steps
            ints = np.asarray([int(meta.get("step", 0)), int(meta.get("epoch", -1)),
                               best[1] if best else -1, 1 if best else 0], np.int32)
            metric = np.asarray([best[0] if best else 0.0], np.float32)
        else:
            # same-structure placeholders; values come from process 0
            params, opt_state = jax.device_get(self.params), donor
            ints, metric = np.zeros(4, np.int32), np.zeros(1, np.float32)
        # one combined broadcast: a single collective rendezvous
        params, opt_state, ints, metric = broadcast_from_main(
            (params, opt_state, ints, metric))
        ints = np.asarray(ints)
        best = (float(np.asarray(metric)[0]), int(ints[2])) if int(ints[3]) else None
        return self._apply_resume_state(params, opt_state,
                                        int(ints[0]), int(ints[1]), best)

    def _read_best_meta(self, directory: str):
        """(best_metric, best_epoch) from the sibling best/meta.json, else
        None."""
        import json as _json

        best_meta = os.path.join(os.path.dirname(directory), "best", "meta.json")
        if os.path.exists(best_meta):
            with open(best_meta) as bf:
                binfo = _json.load(bf)
            if "overall_acc" in binfo:
                return float(binfo["overall_acc"]), int(binfo.get("epoch", -1))
        return None

    def _apply_resume_state(self, params, opt_state, step: int,
                            ckpt_epoch: int, best) -> int:
        self.params = replicate(self.mesh, params)
        self.opt_state = replicate(self.mesh, opt_state)
        self.global_step = int(step)
        # restore best-checkpoint tracking — otherwise the first post-resume
        # eval always "improves" and can overwrite best/ with a worse model
        # (and suppresses the early-stop signal)
        if best is not None:
            self.checkpointer.best_metric = best[0]
            self.checkpointer.best_epoch = best[1]
        # mid-epoch resume (beyond the reference, which restarts from params
        # only): the deterministic epoch streams make the step count resolve
        # to an exact (epoch, batch) position
        spe = max(len(self.train_loader), 1)
        if self.global_step > (ckpt_epoch + 1) * spe:
            # checkpoint taken mid-epoch (e.g. external save): continue inside it
            self._resume_start_batch = self.global_step - (ckpt_epoch + 1) * spe
            return ckpt_epoch + 1
        self._resume_start_batch = 0
        return ckpt_epoch + 1

    def fit(self, progress: bool = False, start_epoch: int = 0) -> dict:
        cfg = self.cfg
        history = {"loss": [], "overall_acc": [], "best_epoch": None}
        try:
            return self._fit_loop(history, progress, start_epoch)
        finally:
            # join in-flight async checkpoint writes on EVERY exit path
            # (KeyboardInterrupt mid-epoch must not tear the last/best set)
            self.checkpointer.wait()

    def _fit_loop(self, history, progress: bool, start_epoch: int) -> dict:
        cfg = self.cfg
        for epoch in range(start_epoch, cfg.epochs):
            if self.stop_flag:
                break
            start_batch = getattr(self, "_resume_start_batch", 0) if epoch == start_epoch else 0
            mean_loss = self.train_epoch(epoch, progress=progress, start_batch=start_batch)
            history["loss"].append(mean_loss)

            # last/ is written EVERY epoch (not only on eval epochs): with
            # eval_skip_epoch or evaluation_period > 1 a crash would
            # otherwise leave nothing to --resume from
            if self.gcfg.save_ckpt and is_main_process():
                self.checkpointer.save_last(
                    self.params, self.opt_state, self.global_step, epoch
                )

            do_eval = (
                epoch % cfg.evaluation_period == 0 or epoch == cfg.epochs - 1
            ) and epoch > cfg.eval_skip_epoch
            if do_eval:
                # multi-host: every process runs the (deterministic) eval so
                # the early-stop decision agrees everywhere without an
                # explicit broadcast (replaces the reference's stop_flag
                # dist.broadcast, train_cl.py:280-331); only process 0 writes
                # checkpoints.
                acc_dict = self.evaluate()
                overall = compute_overall_acc(acc_dict)
                history["overall_acc"].append((epoch, overall))
                # flattened eval grid to the run logger (reference
                # convert_acc_dict_to_wandb_dict, train_cl.py:110-121)
                from .evaluate import convert_acc_dict_to_wandb_dict

                self.log_fn(convert_acc_dict_to_wandb_dict(acc_dict))
                improved = self.checkpointer.maybe_save_best(
                    overall, self.params, self.opt_state, self.global_step, epoch,
                    save=self.gcfg.save_ckpt and is_main_process(),
                )
                if improved:
                    history["best_epoch"] = epoch
                elif self.gcfg.enable_early_stopping:
                    self.stop_flag = True
                self.log_fn({"overall_acc": overall, "epoch": epoch})
        return history

    def close(self):
        self.checkpointer.wait()
        self.train_loader.close()
