"""Config-driven training loop (reference train_stereo.py:138-212), TPU-native.

Differences from the reference, by design:

* one jitted, donated train step over a (data, spatial) mesh instead of
  per-step DataParallel replica scatter/gather;
* bf16 compute / f32 params instead of CUDA AMP + GradScaler (bf16 needs no
  loss scaling);
* Orbax checkpoints carry the FULL train state (params, batch stats, opt
  state, step) -- consciously fixing the reference's broken resume, where
  restore was weights-only and then clobbered by a post-restore re-init
  (reference train_stereo.py:149-158);
* sync-BN across the data axis for free via jit-with-shardings.
"""

from __future__ import annotations

import logging
import os
import time
from functools import partial
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from realtime_stereo_matcher_tpu.config import ExperimentConfig
from realtime_stereo_matcher_tpu.models import build_model
from realtime_stereo_matcher_tpu.parallel.distributed import shard_host_batch
from realtime_stereo_matcher_tpu.parallel.mesh import (
    make_mesh,
    replicated,
)
from realtime_stereo_matcher_tpu.train.init import reference_initialize
from realtime_stereo_matcher_tpu.train.loss import (
    build_loss_function,
    flow_map_metrics,
)
from realtime_stereo_matcher_tpu.train.optim import make_optimizer
from realtime_stereo_matcher_tpu.utils.fetch import FetchTimeout, timed_fetch
from realtime_stereo_matcher_tpu.utils.logger import MetricLogger


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def count_parameters(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def create_train_state(exp_config: ExperimentConfig, rng_key=None,
                       *, sample_hw=None, dtype=None):
    """Build model + optimizer and initialize a TrainState."""
    from realtime_stereo_matcher_tpu.config import DataConfig, TrainConfig

    model = build_model(exp_config.model.as_dict(), dtype=dtype)
    tcfg = exp_config.train or TrainConfig()
    tx, schedule = make_optimizer(
        tcfg.learn_rate, tcfg.num_of_steps, tcfg.weight_decay)
    hw = tuple(sample_hw or (exp_config.data or DataConfig()).image_size)
    rng_key = rng_key if rng_key is not None else jax.random.PRNGKey(1234)
    dummy = jnp.zeros((1, hw[0], hw[1], 3), jnp.float32)
    # jit the init: eager init dispatches every conv separately, which costs
    # minutes through the relayed TPU runtime (one compile instead)
    variables = jax.jit(partial(model.init, train=True))(
        rng_key, dummy, dummy)
    # reference train-start init semantics (train/init.py), applied to fresh
    # state only -- a later checkpoint restore wins (the reference clobbers
    # restored weights by initializing afterwards, train_stereo.py:149-158;
    # consciously fixed)
    variables = reference_initialize(
        dict(variables), jax.random.fold_in(rng_key, 7),
        model_type=exp_config.model.type)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )
    return model, tx, schedule, state


def make_train_step(model, tx, loss_params: dict,
                    loss_type: str = "SequenceLoss",
                    freeze_bn: bool = False):
    """Jittable (state, batch) -> (state, metrics) step.

    ``freeze_bn``: BatchNorms normalize with running stats and never update
    (reference train_stereo.py:121-124 analog, train/freeze.py)."""
    loss = build_loss_function({"type": loss_type, "parameters": loss_params})
    if freeze_bn:
        from realtime_stereo_matcher_tpu.train.freeze import frozen_bn_apply

        apply_fn = frozen_bn_apply(model)
    else:
        apply_fn = model.apply

    def train_step(state: TrainState, img1, img2, flow, valid):
        def loss_fn(params):
            preds, updates = apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                img1, img2, train=True, mutable=["batch_stats"])
            return loss(preds, flow, valid), (preds, updates["batch_stats"])

        (loss_val, (preds, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = flow_map_metrics(flow, preds[-1], valid)
        metrics["live_loss"] = loss_val
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt_state,
        )
        return new_state, metrics

    return train_step


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


# Per-attempt deadline for the device->host pulls in checkpoint saves and
# metric flushes.  Generous vs the measured fetch times (full v1-v4 train
# states pull in < 10 s through the relay) so it only fires on a genuine
# wedge, not a slow fetch.
FETCH_TIMEOUT_S = 120.0
# consecutive wedged metric flushes before the trainer stops fetching
# metrics for the rest of the run (see flush_metrics in train())
METRIC_FETCH_MAX_WEDGES = 2


def save_checkpoint(path, state: TrainState, *,
                    fetch_timeout: float | None = None):
    """Save the full train state; the device->host pull is deadline-guarded.

    Raises :class:`~realtime_stereo_matcher_tpu.utils.fetch.FetchTimeout`
    if the relay client wedges (round-4 incident); callers at periodic
    save points should skip the save and keep training.
    """
    ckptr = _checkpointer()
    if fetch_timeout is None:
        fetch_timeout = FETCH_TIMEOUT_S  # resolved at call time (testable)
    # one guarded fetch of the whole tree (jax.device_get batches leaves)
    # instead of a blocking np.asarray per leaf
    host_state = timed_fetch(
        lambda: jax.device_get(state), timeout=fetch_timeout,
        what=f"checkpoint fetch for {path}", retries=1)
    host_state = jax.tree_util.tree_map(np.asarray, host_state)
    ckptr.save(os.path.abspath(path), host_state, force=True)


def restore_checkpoint(path, state: TrainState) -> TrainState:
    ckptr = _checkpointer()
    # template from metadata only -- np.asarray on live device arrays would
    # issue one blocking device->host fetch per leaf (minutes through the
    # relayed TPU runtime)
    item = jax.tree_util.tree_map(
        lambda x: np.zeros(x.shape, x.dtype), state)
    restored = ckptr.restore(os.path.abspath(path), item=item)
    return jax.tree_util.tree_map(jnp.asarray, restored)


def train(exp_config: ExperimentConfig, *, max_steps: int | None = None,
          mesh=None, data_loader=None, log_dir=None,
          use_bf16: bool | None = None) -> str:
    """Run training per config; returns the final checkpoint path."""
    from realtime_stereo_matcher_tpu.data.loader import fetch_dataloader

    if use_bf16 is None:
        use_bf16 = exp_config.model.mixed_precision
    dtype = jnp.bfloat16 if use_bf16 else None

    mesh = mesh or make_mesh()
    n_data = mesh.shape["data"]
    num_steps = max_steps or exp_config.train.num_of_steps

    model, tx, schedule, state = create_train_state(exp_config, dtype=dtype)
    logging.info("Model parameter count: %d.", count_parameters(state.params))

    restore = exp_config.train.restore_checkpoint
    if restore:
        logging.info("Restoring full train state from %s...", restore)
        state = restore_checkpoint(restore, state)
        logging.info("Done loading checkpoint.")

    device_augment = exp_config.train.device_augment
    if data_loader is None:
        shard_id = jax.process_index()
        num_shards = jax.process_count()
        data_loader = fetch_dataloader(exp_config, shard_id=shard_id,
                                       num_shards=num_shards,
                                       raw=device_augment)

    loss_params = exp_config.train.loss.parameters
    loss_type = exp_config.train.loss.type
    # fail fast on unknown loss types (reference loss/__init__.py:4-10)
    build_loss_function({"type": loss_type, "parameters": loss_params})
    fast_mode = getattr(exp_config.train, "fast_kernels", "auto")
    if exp_config.train.freeze_bn:
        # the kernel train path implements live-BN semantics only; frozen-BN
        # training runs the XLA step with the freeze.py interceptor
        if fast_mode == "on":
            logging.warning(
                "train.fast_kernels='on' is overridden to 'off' by "
                "train.freeze_bn: the kernel train path has live-BN "
                "semantics only; running the XLA step instead.")
        fast_mode = "off"
    use_fast = False
    if fast_mode in ("auto", "on"):
        from realtime_stereo_matcher_tpu.models.fast_train import (
            fast_step_supported,
            make_fast_train_step,
        )

        use_fast = fast_step_supported(model, exp_config, mesh)
        if fast_mode == "on" and not use_fast:
            raise ValueError(
                "train.fast_kernels='on' but the kernel train path does not "
                "support this model/mesh/crop (see fast_step_supported)")
    if use_fast:
        logging.info("Training on the fused Pallas kernel path "
                     "(models/fast_train.py)%s.",
                     f", data-parallel over {mesh.shape['data']} devices"
                     if mesh.size > 1 else "")
        base_step = make_fast_train_step(model, tx, loss_params,
                                         mesh=mesh if mesh.size > 1 else None,
                                         loss_type=loss_type)
    else:
        base_step = make_train_step(model, tx, loss_params,
                                    loss_type=loss_type,
                                    freeze_bn=exp_config.train.freeze_bn)
    # Device-resident dataset: through this environment's TPU relay,
    # host->device batch streaming serializes against compute (~450 ms per
    # 11.5 MB batch while the chip is busy), so when the training set fits
    # in HBM it is uploaded once and each step ships a (B,) index vector
    # instead (data/device_cache.py).  Round 5: any uniform-shape dataset
    # packs (pack_dataset), and multi-process runs shard the scenes over the
    # mesh's data axis (one copy total, communication-free shard_map fetch).
    resident = None
    if device_augment:
        from realtime_stereo_matcher_tpu.data.datasets import ConcatDataset
        from realtime_stereo_matcher_tpu.data.device_cache import (
            DeviceResidentScenes,
            ShardedResidentScenes,
            pack_dataset,
            pack_synthetic,
        )
        from realtime_stereo_matcher_tpu.data.synthetic import SyntheticStereo

        ds = getattr(data_loader, "dataset", None)
        leaves = ds.datasets if isinstance(ds, ConcatDataset) else [ds]
        try:
            if (jax.process_count() == 1 and len(leaves) == 1
                    and isinstance(leaves[0], SyntheticStereo)):
                packed = pack_synthetic(leaves[0])  # disk-cached generator
                if sum(a.nbytes for a in packed.values()) > 8e9:
                    raise ValueError("synthetic pack exceeds 8 GB")
                resident = DeviceResidentScenes(packed,
                                                sharding=replicated(mesh))
            elif ds is not None and jax.process_count() == 1:
                packed = pack_dataset(ds)
                resident = DeviceResidentScenes(packed,
                                                sharding=replicated(mesh))
            elif ds is not None:
                n_dev = mesh.shape["data"] * mesh.shape["spatial"]
                total = (len(ds) // n_dev) * n_dev
                lo, hi = ShardedResidentScenes.local_scene_range(total, mesh)
                packed = pack_dataset(ds, indices=range(lo, hi))
                resident = ShardedResidentScenes(packed, mesh,
                                                 global_length=total)
        except ValueError as exc:
            logging.info("Device-resident dataset disabled (%s); falling "
                         "back to host streaming.", exc)
        if resident is not None:
            logging.info(
                "Device-resident dataset: %d scenes, %.2f GB in HBM%s; "
                "steps ship int32 indices only.", resident.length,
                resident.nbytes() / 1e9,
                " (scene-sharded over the data axis)"
                if isinstance(resident, ShardedResidentScenes) else "")

    if device_augment:
        # augmentation runs inside the jitted step; the spec needs the raw
        # sample shape, so the streaming variant compiles lazily on the
        # first batch
        step_fn = None

        def build_augmented_step(src_hw, fetch=None):
            from realtime_stereo_matcher_tpu.data.device_augment import (
                AugmentSpec,
                make_device_augment,
            )

            spec = AugmentSpec.from_aug_params(exp_config.aug_params(), src_hw)
            aug_fn = make_device_augment(spec)
            base_key = jax.random.PRNGKey(1234)

            def augmented(state, img1_raw, img2_raw, flow_raw):
                # keyed by the global step: deterministic, resume-stable
                key = jax.random.fold_in(base_key, state.step)
                img1, img2, flow, valid = aug_fn(key, img1_raw, img2_raw,
                                                 flow_raw)
                return base_step(state, img1, img2, flow, valid)

            if fetch is None:
                step = augmented
            else:
                # resident arrays arrive as ARGUMENTS (closure capture would
                # embed GBs as HLO constants -- see device_cache.py)
                def step(state, data, idx):
                    return augmented(state, *fetch(data, idx))

            logging.info("On-device augmentation: raw %s -> crop %s.",
                         src_hw, spec.crop_size)
            return jax.jit(step, donate_argnums=(0,))

        if resident is not None:
            from realtime_stereo_matcher_tpu.data.device_cache import (
                fetch_scene_batch,
            )

            if isinstance(resident, ShardedResidentScenes):
                fetch = resident.make_fetch()  # shard_map'd local take
            else:
                fetch = partial(fetch_scene_batch, fp=resident.fp)
            step_fn = build_augmented_step(resident.image_hw, fetch)
    else:
        step_fn = jax.jit(base_step, donate_argnums=(0,))

    # replicate state over the mesh; batches are sharded over 'data'
    state = jax.device_put(state, replicated(mesh))

    logger = MetricLogger(
        log_dir=log_dir or os.path.join(exp_config.path, "runs"),
        lr_fn=lambda s: float(schedule(s)))

    exp_name, exp_path = exp_config.name, exp_config.path
    ckpt_dir = Path(exp_path) / "checkpoints"
    total_steps = int(state.step)
    should_keep_training = True
    t_start = time.time()
    # metric fetches are batched: materializing every step forces a full
    # device round-trip per step through the relayed runtime and destroys
    # dispatch pipelining (measured 3.5 s/step vs ~0.1 s compute)
    pending: list = []
    metric_keys: list = []
    # circuit breaker: a permanently wedged relay client makes EVERY flush
    # pay the full 2 x FETCH_TIMEOUT_S deadline (observed in the round-5
    # DispNetC 100k run: 100 steps / 4 min instead of / 3.9 s -- a 60x
    # throughput loss with training itself perfectly healthy).  After
    # METRIC_FETCH_MAX_WEDGES consecutive wedged flushes, stop fetching
    # metrics for the rest of the run: scalars are observability, the train
    # state is not affected, and checkpoint saves keep their own
    # deadline+retry path.
    fetch_health = {"wedges": 0, "disabled": False}

    def flush_metrics():
        if not pending:
            return
        if fetch_health["disabled"]:
            pending.clear()
            return
        steps_, vecs = zip(*pending)
        stacked = jnp.stack(vecs)
        try:
            vals = np.asarray(timed_fetch(
                lambda: jax.device_get(stacked), timeout=FETCH_TIMEOUT_S,
                what=f"metrics fetch @step {steps_[-1]}", retries=1))
        except FetchTimeout:
            # drop this metrics batch rather than wedge the run (the scalars
            # are observability, not train state); training continues and
            # the next flush retries with a fresh fetch
            logging.error(
                "Dropping %d pending metric rows (steps %d..%d): relay "
                "fetch wedged.", len(pending), steps_[0], steps_[-1])
            pending.clear()
            fetch_health["wedges"] += 1
            if fetch_health["wedges"] >= METRIC_FETCH_MAX_WEDGES:
                fetch_health["disabled"] = True
                logging.error(
                    "Metric fetches DISABLED for the rest of the run after "
                    "%d consecutive wedged flushes (training continues; "
                    "checkpoint saves keep their own deadline+retry).",
                    fetch_health["wedges"])
            return
        fetch_health["wedges"] = 0
        for s, row in zip(steps_, vals):
            scalars = dict(zip(metric_keys, (float(x) for x in row)))
            logger.write_scalars(s, {
                "live_loss": scalars["live_loss"],
                "learning_rate": float(schedule(s))})
            logger.push(scalars, step=s)
        pending.clear()

    def batch_iter():
        if resident is not None:
            b = exp_config.train.batch_size
            steps_per_epoch = max(1, resident.length // b)
            for idx in resident.index_batches(
                    b, seed=1234, epoch0=total_steps // steps_per_epoch):
                yield (idx,)
            return
        while True:
            for _, img1, img2, flow, valid in iter(data_loader):
                if device_augment:
                    # the raw geometric valid is recomputed post-augment on
                    # device (|flow| < 512, the dense-GT convention) -- skip
                    # its host->device transfer
                    yield (img1, img2, flow)
                else:
                    yield (img1, img2, flow, valid)

    while should_keep_training:
        for arrays in batch_iter():
            global_b = arrays[0].shape[0] * jax.process_count()
            assert global_b % n_data == 0, (
                f"global batch {global_b} not divisible by data axis {n_data}")
            if step_fn is None:
                step_fn = build_augmented_step(arrays[0].shape[1:3])
            batch = shard_host_batch(mesh, arrays)
            if resident is not None:
                state, metrics = step_fn(state, resident.arrays, *batch)
            else:
                state, metrics = step_fn(state, *batch)
            if not metric_keys:
                metric_keys = sorted(metrics)
            pending.append((total_steps,
                            jnp.stack([metrics[k] for k in metric_keys])))
            total_steps += 1
            if len(pending) >= logger.sum_freq:
                flush_metrics()
            if total_steps > num_steps:
                should_keep_training = False
                break
            if total_steps % exp_config.train.save_checkpoint_frequency == 0:
                flush_metrics()
                ckpt = ckpt_dir / f"{exp_name}-epoch-{total_steps}.ckpt"
                ckpt.parent.mkdir(parents=True, exist_ok=True)
                logging.info("Saving file %s...", ckpt)
                try:
                    save_checkpoint(ckpt, state)
                except FetchTimeout:
                    # round-4 incident class: a wedged relay fetch must cost
                    # one checkpoint, not the run — later saves retry with
                    # fresh fetches, and the final save below still raises
                    # if the wedge persists to the end
                    logging.error(
                        "SKIPPING checkpoint %s: device->host fetch wedged; "
                        "training continues.", ckpt)
    flush_metrics()
    logging.info("FINISHED TRAINING! (%.1fs)", time.time() - t_start)
    logger.close()
    final = ckpt_dir / f"{exp_name}-epoch-{total_steps}.ckpt"
    final.parent.mkdir(parents=True, exist_ok=True)
    save_checkpoint(final, state)
    return str(final)
