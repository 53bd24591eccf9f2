"""Jit-compiled train/eval engine.

Behavior parity with the reference's modelTraining
(/root/reference/localfunctions.py:159-334):
- LR schedule  lr = max(base * decay^(epoch//step), 1e-5)        (:168,:187)
- BN momentum  m  = max(0.1 * 0.5^(epoch//step), 0.01)           (:169-194)
- torch-Adam semantics (weight decay added to the gradient before the
  moment update, betas (0.9, 0.999), eps 1e-8) or SGD(momentum=0.9)
  (/root/reference/sem_seg_training.py:576-584)
- per-epoch eval with per-class IoU / mIoU, checkpoint every 5 epochs and
  on best mIoU, accuracy/loss/IoU charts returned per epoch.

TPU-native differences: one fully-fused jit step (augmentation, forward,
loss, backward, optimizer) with the LR and BN momentum as *traced* scalars
so schedules never recompile; z-rotation augmentation runs on device keyed
by PRNG (the reference does it per-batch in NumPy, localfunctions.py:206);
batch sharded over the mesh's data axis with XLA inserting gradient/BN
psums over ICI.
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np
import optax

from tumseg.data import augment
from tumseg.data.device_sampler import RoomBatch
from tumseg.utils.progress import progress
from tumseg.parallel import mesh as pmesh
from tumseg.train import checkpoint as ckpt
from tumseg.train import metrics as M

LEARNING_RATE_CLIP = 1e-5
MOMENTUM_ORIGINAL = 0.1
MOMENTUM_DECCAY = 0.5
MOMENTUM_FLOOR = 0.01


def lr_schedule(epoch: int, base_lr: float, lr_decay: float,
                step_size: int) -> float:
    return max(base_lr * (lr_decay ** (epoch // step_size)), LEARNING_RATE_CLIP)


def bn_momentum_schedule(epoch: int, step_size: int) -> float:
    m = MOMENTUM_ORIGINAL * (MOMENTUM_DECCAY ** (epoch // step_size))
    return max(m, MOMENTUM_FLOOR)


def make_optimizer(name: str = "Adam", weight_decay: float = 1e-4):
    """Gradient transform matching the reference's optimizers; the learning
    rate is applied inside the step as a traced scalar."""
    if name == "Adam":
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale(-1.0),
        )
    return optax.chain(optax.trace(decay=0.9), optax.scale(-1.0))


_INIT_JIT_CACHE: Dict = {}


def _jitted_init(model):
    key = id(model)
    if key not in _INIT_JIT_CACHE:
        _INIT_JIT_CACHE[key] = (model, jax.jit(model.init,
                                               static_argnums=(1, 2)))
    return _INIT_JIT_CACHE[key][1]


class TrainEngine:
    """Holds the jitted train/eval steps and the mutable training state."""

    def __init__(self, model, num_classes: int, train_weights: np.ndarray,
                 optimizer: str = "Adam", weight_decay: float = 1e-4,
                 mesh=None, augment_rotate: bool = True,
                 compute_dtype=None, seed: int = 0,
                 exact_gathers: bool = False, sampler=None):
        self.model = model
        self.num_classes = num_classes
        self.mesh = mesh
        self.augment_rotate = augment_rotate
        self.tx = make_optimizer(optimizer, weight_decay)
        # traced argument (not a baked constant): different label weights
        # reuse the same compiled step
        self.weights = jnp.asarray(train_weights, dtype=jnp.float32)
        self.base_key = jax.random.PRNGKey(seed)
        self._batch_sharding = (pmesh.batch_sharding(mesh)
                                if mesh is not None else None)
        self._step_count = 0
        self._eval_count = 0
        # with a DeviceBlockSampler, train/eval steps take int32 room ids +
        # a key instead of featurized batches: block selection/featurization
        # runs inside the step jit from the sampler's once-uploaded tables
        # (data/device_sampler.py)
        self.sampler = sampler
        axis = pmesh.DATA_AXIS if mesh is not None else None

        def fold_axis(key):
            if axis is not None:
                # per-device RNG streams for sampling/augmentation/dropout
                key = jax.random.fold_in(key, jax.lax.axis_index(axis))
            return key

        def train_step(params, batch_stats, opt_state, points, target,
                       weights, lr, momentum, key):
            key = fold_axis(key)
            krot, kdrop, kfps = jax.random.split(key, 3)
            if self.augment_rotate:
                rotated = augment.jrotate_z(krot, points[..., :3])
                points = jnp.concatenate([rotated, points[..., 3:]], axis=-1)

            def loss_fn(p):
                logp, aux, new_stats = model.apply(
                    {"params": p, "batch_stats": batch_stats}, points,
                    training=True, bn_momentum=momentum,
                    rngs={"dropout": kdrop, "fps": kfps},
                    compute_dtype=compute_dtype, axis_name=axis,
                    fast_gather=not exact_gathers)
                loss = model.loss(logp, target, aux, weights,
                                  axis_name=axis)
                return loss, (new_stats, logp)

            (loss, (new_stats, logp)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            # Under shard_map with replication checking, the loss is made
            # device-invariant by the psums inside loss_fn, and jax's
            # autodiff inserts the cross-device gradient reduction for the
            # replicated params itself — an explicit psum here would
            # double-count by the mesh size.
            updates, new_opt_state = self.tx.update(grads, opt_state, params)
            updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
            new_params = optax.apply_updates(params, updates)
            pred = jnp.argmax(logp, axis=-1)
            correct = jnp.sum((pred == target).astype(jnp.int32))
            if axis is not None:
                correct = jax.lax.psum(correct, axis)
            return new_params, new_stats, new_opt_state, loss, correct

        def eval_step(params, batch_stats, points, target, weights):
            logp, aux, _ = model.apply(
                {"params": params, "batch_stats": batch_stats}, points,
                training=False, compute_dtype=compute_dtype)
            loss = model.loss(logp, target, aux, weights, axis_name=axis)
            pred = jnp.argmax(logp, axis=-1)
            tallies = M.confusion_tallies(pred, target, num_classes)
            if axis is not None:
                tallies = jax.tree_util.tree_map(
                    lambda t: jax.lax.psum(t, axis), tallies)
            return loss, tallies

        def train_step_rooms(params, batch_stats, opt_state, room_ids,
                             weights, lr, momentum, key):
            # sample the blocks on device from the once-uploaded room tables
            # (per-device sub-key first so mesh shards draw distinct blocks);
            # train_step folds the axis again on kstep — an already-varying
            # key stays varying and distinct, so this is just a second
            # deterministic derivation
            ks, kstep = jax.random.split(fold_axis(key))
            points, target = sampler.sample_batch(ks, room_ids)
            return train_step(params, batch_stats, opt_state, points, target,
                              weights, lr, momentum, kstep)

        def eval_step_rooms(params, batch_stats, room_ids, weights, key):
            points, target = sampler.sample_batch(fold_axis(key), room_ids)
            return eval_step(params, batch_stats, points, target, weights)

        def eval_superstep_rooms(params, batch_stats, room_ids_k, weights,
                                 base_key, count0):
            # k eval steps per dispatch; keys fold (1 << 31) + eval_count
            # exactly like eval_batch_rooms, so the sampled eval blocks are
            # unchanged. Losses stay per-step [k]; tallies sum inside.
            k = room_ids_k.shape[0]
            # uint32 arithmetic: (1 << 31) overflows int32; fold_in folds
            # the same uint32 value eval_batch_rooms derives from its
            # python-int counter
            counts = (jnp.uint32(1 << 31) + count0.astype(jnp.uint32)
                      + 1 + jnp.arange(k, dtype=jnp.uint32))
            keys = jax.vmap(lambda i: jax.random.fold_in(base_key, i))(counts)

            def body(carry, inp):
                ids, kk = inp
                loss, tallies = eval_step_rooms(params, batch_stats, ids,
                                                weights, kk)
                return carry, (loss, tallies)

            _, (losses, tallies) = lax.scan(body, 0, (room_ids_k, keys))
            return losses, jax.tree_util.tree_map(
                lambda t: jnp.sum(t, axis=0), tallies)

        def train_superstep_rooms(params, batch_stats, opt_state, room_ids_k,
                                  weights, lr, momentum, base_key, step0):
            # k train steps in ONE dispatch (lax.scan): the device-pipeline
            # step's host cost is pure dispatch (~100 bytes shipped/step),
            # so at k steps per dispatch the sustained rate approaches the
            # enqueued device rate. Per-step keys are fold_in(base_key,
            # step0 + i) — the SAME stream as train_batch_rooms, so the
            # sampled blocks (and therefore the whole run) are unchanged.
            k = room_ids_k.shape[0]
            keys = jax.vmap(lambda i: jax.random.fold_in(base_key, i))(
                step0 + jnp.arange(k, dtype=jnp.int32))

            def body(carry, inp):
                p, s, o = carry
                ids, kk = inp
                p, s, o, loss, correct = train_step_rooms(
                    p, s, o, ids, weights, lr, momentum, kk)
                return (p, s, o), (loss, correct)

            (params, batch_stats, opt_state), (losses, corrects) = lax.scan(
                body, (params, batch_stats, opt_state), (room_ids_k, keys))
            return params, batch_stats, opt_state, losses, corrects

        if mesh is not None:
            # shard_map: batch sharded over the data axis, state replicated;
            # collectives (BN pmean, loss/grad psum) are explicit above. This
            # is also the correct SPMD wrapper for the Pallas kernels, which
            # otherwise have no GSPMD partitioning rules.
            from jax.sharding import PartitionSpec as P

            P_b = P(pmesh.DATA_AXIS)
            train_sharded = jax.shard_map(
                train_step, mesh=mesh,
                in_specs=(P(), P(), P(), P_b, P_b, P(), P(), P(), P()),
                out_specs=(P(), P(), P(), P(), P()),
                check_vma=True)
            eval_sharded = jax.shard_map(
                eval_step, mesh=mesh,
                in_specs=(P(), P(), P_b, P_b, P()),
                out_specs=(P(), P()),
                check_vma=True)
            self._train_step = jax.jit(train_sharded, donate_argnums=(0, 1, 2))
            self._eval_step = jax.jit(eval_sharded)
            if sampler is not None:
                self._train_step_rooms = jax.jit(jax.shard_map(
                    train_step_rooms, mesh=mesh,
                    in_specs=(P(), P(), P(), P_b, P(), P(), P(), P()),
                    out_specs=(P(), P(), P(), P(), P()),
                    check_vma=True), donate_argnums=(0, 1, 2))
                self._eval_step_rooms = jax.jit(jax.shard_map(
                    eval_step_rooms, mesh=mesh,
                    in_specs=(P(), P(), P_b, P(), P()),
                    out_specs=(P(), P()),
                    check_vma=True))
                # room_ids_k [k, B]: batch axis sharded, scan axis whole
                self._train_superstep_rooms = jax.jit(jax.shard_map(
                    train_superstep_rooms, mesh=mesh,
                    in_specs=(P(), P(), P(), P(None, pmesh.DATA_AXIS), P(),
                              P(), P(), P(), P()),
                    out_specs=(P(), P(), P(), P(), P()),
                    check_vma=True), donate_argnums=(0, 1, 2))
                self._eval_superstep_rooms = jax.jit(jax.shard_map(
                    eval_superstep_rooms, mesh=mesh,
                    in_specs=(P(), P(), P(None, pmesh.DATA_AXIS), P(), P(),
                              P()),
                    out_specs=(P(), P()),
                    check_vma=True))
        else:
            self._train_step = jax.jit(train_step, donate_argnums=(0, 1, 2))
            self._eval_step = jax.jit(eval_step)
            if sampler is not None:
                self._train_step_rooms = jax.jit(train_step_rooms,
                                                 donate_argnums=(0, 1, 2))
                self._eval_step_rooms = jax.jit(eval_step_rooms)
                self._train_superstep_rooms = jax.jit(
                    train_superstep_rooms, donate_argnums=(0, 1, 2))
                self._eval_superstep_rooms = jax.jit(eval_superstep_rooms)

    # -- state management ---------------------------------------------------

    def init_state(self, key, num_extra_features: int):
        # one jitted (persistently cacheable) init program: eager model.init
        # dispatches a tiny compile per random op, each ~0.4-2 s through
        # this image's remote compile helper; the wrapper is cached per
        # model so repeated init_state calls reuse the traced executable
        variables = _jitted_init(self.model)(key, self.num_classes,
                                             num_extra_features)
        opt_state = self.tx.init(variables["params"])
        self.params = variables["params"]
        self.batch_stats = variables["batch_stats"]
        self.opt_state = opt_state
        if self.mesh is not None:
            rep = pmesh.replicated_sharding(self.mesh)
            put = lambda t: jax.tree_util.tree_map(
                lambda x: jax.device_put(x, rep), t)
            self.params = put(self.params)
            self.batch_stats = put(self.batch_stats)
            self.opt_state = put(self.opt_state)

    def load_state(self, state: Dict):
        variables, opt_state, epoch = ckpt.restore_variables(state)
        self.params = variables["params"]
        self.batch_stats = variables["batch_stats"]
        if isinstance(opt_state, ckpt.OptLeaves):
            # v2 checkpoints store optimizer leaves only; rebuild the optax
            # structure from this engine's own optimizer (nothing but raw
            # arrays ever comes off disk)
            opt_state = ckpt.unflatten_opt_state(self.tx.init(self.params),
                                                 opt_state)
        self.opt_state = (opt_state if opt_state is not None
                          else self.tx.init(self.params))
        if self.mesh is not None:
            # re-replicate restored state onto the mesh exactly like
            # init_state, so the donated buffers of the sharded train step
            # see the expected shardings (resume-on-mesh)
            rep = pmesh.replicated_sharding(self.mesh)
            put = lambda t: jax.tree_util.tree_map(
                lambda x: jax.device_put(jnp.asarray(x), rep), t)
            self.params = put(self.params)
            self.batch_stats = put(self.batch_stats)
            self.opt_state = put(self.opt_state)
        return epoch

    def variables(self) -> Dict:
        return {"params": self.params, "batch_stats": self.batch_stats}

    # -- steps --------------------------------------------------------------

    def _put_batch(self, points, target):
        points = jnp.asarray(points, dtype=jnp.float32)
        target = jnp.asarray(target, dtype=jnp.int32)
        if self._batch_sharding is not None:
            points = jax.device_put(points, self._batch_sharding)
            target = jax.device_put(target, self._batch_sharding)
        return points, target

    def train_batch(self, points, target, lr: float, momentum: float):
        points, target = self._put_batch(points, target)
        key = jax.random.fold_in(self.base_key, self._step_count)
        self._step_count += 1
        (self.params, self.batch_stats, self.opt_state, loss,
         correct) = self._train_step(
            self.params, self.batch_stats, self.opt_state, points, target,
            self.weights, jnp.float32(lr), jnp.float32(momentum), key)
        return loss, correct

    def eval_batch(self, points, target):
        points, target = self._put_batch(points, target)
        return self._eval_step(self.params, self.batch_stats, points, target,
                               self.weights)

    # -- device-sampled steps (room ids in, nothing featurized on host) -----

    def _check_mesh_divisible(self, b: int):
        """Sharded room-id batches must tile the data axis: a ragged
        drop_last=False tail (e.g. 26 samples at B=4 on 8 devices) would
        otherwise die at dispatch with an opaque sharding error. The CLI
        always drops the tail; direct fit() callers get a clear message."""
        if self._batch_sharding is None:
            return
        ndev = self.mesh.shape[pmesh.DATA_AXIS]
        if b % ndev != 0:
            raise ValueError(
                "room-id batch of %d rows cannot shard over the %d-device "
                "'%s' mesh axis; use a drop_last=True loader (the CLI "
                "default) or pad the tail to a multiple of %d"
                % (b, ndev, pmesh.DATA_AXIS, ndev))

    def _put_rooms(self, room_ids):
        room_ids = jnp.asarray(room_ids, dtype=jnp.int32)
        if self._batch_sharding is not None:
            self._check_mesh_divisible(room_ids.shape[0])
            room_ids = jax.device_put(room_ids, self._batch_sharding)
        return room_ids

    def train_batch_rooms(self, room_ids, lr: float, momentum: float):
        """One train step whose per-step upload is ~100 bytes: [B] int32
        room ids + a PRNG key; block sampling/featurization runs on device
        inside the step jit (requires the engine's ``sampler``)."""
        key = jax.random.fold_in(self.base_key, self._step_count)
        self._step_count += 1
        (self.params, self.batch_stats, self.opt_state, loss,
         correct) = self._train_step_rooms(
            self.params, self.batch_stats, self.opt_state,
            self._put_rooms(room_ids), self.weights, jnp.float32(lr),
            jnp.float32(momentum), key)
        return loss, correct

    def train_batch_rooms_multi(self, room_ids_k, lr: float, momentum: float):
        """k train steps in one dispatch (lax.scan over the room-id step).
        room_ids_k is [k, B] int32. Returns ([k] losses, [k] corrects) on
        device. RNG/sampling identical to k train_batch_rooms calls (the
        scan derives the same fold_in(base_key, step) keys), so the two
        paths produce the same run — pinned by tests/test_train.py."""
        room_ids_k = jnp.asarray(room_ids_k, dtype=jnp.int32)
        if self._batch_sharding is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._check_mesh_divisible(room_ids_k.shape[1])
            room_ids_k = jax.device_put(room_ids_k, NamedSharding(
                self.mesh, P(None, pmesh.DATA_AXIS)))
        step0 = jnp.int32(self._step_count)
        self._step_count += int(room_ids_k.shape[0])
        (self.params, self.batch_stats, self.opt_state, losses,
         corrects) = self._train_superstep_rooms(
            self.params, self.batch_stats, self.opt_state, room_ids_k,
            self.weights, jnp.float32(lr), jnp.float32(momentum),
            self.base_key, step0)
        return losses, corrects

    def eval_batch_rooms(self, room_ids):
        # eval keys fold counters offset by 2^31: disjoint from the train
        # stream's fold_in(base, step_count < 2^31) without re-deriving
        # base_key (which would silently change existing host-path runs)
        self._eval_count += 1
        key = jax.random.fold_in(self.base_key, (1 << 31) + self._eval_count)
        return self._eval_step_rooms(self.params, self.batch_stats,
                                     self._put_rooms(room_ids), self.weights,
                                     key)

    def eval_batch_rooms_multi(self, room_ids_k):
        """k eval steps in one dispatch: ([k] losses, summed tallies).
        Key stream identical to k eval_batch_rooms calls."""
        room_ids_k = jnp.asarray(room_ids_k, dtype=jnp.int32)
        if self._batch_sharding is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._check_mesh_divisible(room_ids_k.shape[1])
            room_ids_k = jax.device_put(room_ids_k, NamedSharding(
                self.mesh, P(None, pmesh.DATA_AXIS)))
        count0 = jnp.int32(self._eval_count)
        self._eval_count += int(room_ids_k.shape[0])
        return self._eval_superstep_rooms(self.params, self.batch_stats,
                                          room_ids_k, self.weights,
                                          self.base_key, count0)


class _SuperstepBuffer:
    """Groups same-shape room-id batches into k-step scanned dispatches.

    Ragged batches (a ``drop_last=False`` loader tail) would break
    ``np.stack``; when one arrives the pending group is drained through the
    per-step executable first, so ``fit(superstep>1)`` accepts any loader.
    ``add``/``drain`` return raw ``(loss, aux)`` device results — the multi
    path's ``[k]``-shaped losses and the per-step path's scalars are both
    consumed by the callers' ``jnp.sum``/``M.accumulate`` reductions."""

    def __init__(self, k, multi_fn, step_fn):
        self.k, self.multi_fn, self.step_fn = k, multi_fn, step_fn
        self.buf = []

    def add(self, room_ids, *args):
        ids = np.asarray(room_ids)
        out = self.drain(*args) if (self.buf and
                                    ids.shape != self.buf[0].shape) else []
        self.buf.append(ids)
        if len(self.buf) == self.k:
            loss, aux = self.multi_fn(np.stack(self.buf), *args)
            self.buf = []
            out.append((loss, aux))
        return out

    def drain(self, *args):
        out = [self.step_fn(ids, *args) for ids in self.buf]
        self.buf = []
        return out


def fit(engine: TrainEngine, train_loader, eval_loader, *, start_epoch: int,
        end_epoch: int, learning_rate: float, lr_decay: float, step_size: int,
        batch_size: int, num_point: int, checkpoints_dir, model_name: str,
        seg_label_to_cat: Dict, log_string=print, superstep: int = 1):
    """Epoch loop mirroring modelTraining (localfunctions.py:159-334).
    Returns (accuracyChart, MLChart, IoUChart).

    ``superstep`` > 1 groups that many device-pipeline batches into one
    k-step scanned dispatch (train_batch_rooms_multi) — same run, fewer
    host dispatches; the epoch tail falls back to per-step calls."""
    num_classes = engine.num_classes
    accuracy_chart, ml_chart, iou_chart = [], [], []
    best_iou = 0.0
    global_epoch = 0

    for epoch in range(start_epoch, end_epoch):
        log_string("**** Epoch %d (%d/%s) ****"
                   % (global_epoch + 1, epoch + 1, end_epoch))
        lr = lr_schedule(epoch, learning_rate, lr_decay, step_size)
        log_string("Learning rate:%f" % lr)
        momentum = bn_momentum_schedule(epoch, step_size)
        print("BN momentum updated to: %f" % momentum)

        num_batches = len(train_loader)
        total_seen = 0
        losses, corrects = [], []
        room_buf = _SuperstepBuffer(superstep, engine.train_batch_rooms_multi,
                                    engine.train_batch_rooms)
        t0 = time.time()
        # progress mirrors the reference's tqdm wrap (localfunctions.py:202);
        # iteration-rate only — no device readbacks
        for batch in progress(train_loader, total=num_batches, desc="train"):
            if isinstance(batch, RoomBatch):
                # device pipeline: the batch exists only as room ids; blocks
                # are sampled/featurized inside the step jit
                if superstep > 1:
                    total_seen += batch_size * num_point
                    for l, c in room_buf.add(batch.room_ids, lr, momentum):
                        losses.append(jnp.sum(l))
                        corrects.append(jnp.sum(c))
                    continue
                loss, correct = engine.train_batch_rooms(batch.room_ids, lr,
                                                         momentum)
            else:
                loss, correct = engine.train_batch(*batch, lr, momentum)
            # keep per-step results on device: a float() here would force a
            # host readback every step (~26 ms through this image's TPU
            # tunnel — 1.5x the step itself); one fence per epoch instead
            losses.append(loss)
            corrects.append(correct)
            total_seen += batch_size * num_point
        for l, c in room_buf.drain(lr, momentum):  # epoch tail < superstep
            losses.append(jnp.sum(l))
            corrects.append(jnp.sum(c))
        loss_sum = float(jnp.sum(jnp.stack(losses))) if losses else 0.0
        total_correct = (int(jnp.sum(jnp.stack(corrects))) if corrects else 0)
        train_time = time.time() - t0
        if num_batches:
            log_string("Training mean loss: %f" % (loss_sum / num_batches))
            log_string("Training accuracy: %f" % (total_correct / float(total_seen)))
            log_string("Training points/sec: %.0f"
                       % (total_seen / max(train_time, 1e-9)))

        if epoch % 5 == 0:
            savepath = str(checkpoints_dir) + "/model.pth"
            log_string("Saving at %s" % savepath)
            ckpt.save_checkpoint(savepath, epoch=epoch,
                                 variables=engine.variables(),
                                 opt_state=engine.opt_state)

        # ---- eval ----
        log_string("---- EPOCH %03d EVALUATION ----" % (global_epoch + 1))
        eval_batches = len(eval_loader)
        tallies = M.zero_tallies(num_classes)
        eval_losses = []
        eval_seen = 0
        eval_buf = _SuperstepBuffer(superstep, engine.eval_batch_rooms_multi,
                                    engine.eval_batch_rooms)
        for batch in progress(eval_loader, total=eval_batches, desc="eval"):
            if isinstance(batch, RoomBatch):
                if superstep > 1:
                    eval_seen += batch_size * num_point
                    for l, t in eval_buf.add(batch.room_ids):
                        eval_losses.append(jnp.sum(l))
                        tallies = M.accumulate(tallies, t)
                    continue
                loss, t = engine.eval_batch_rooms(batch.room_ids)
            else:
                loss, t = engine.eval_batch(*batch)
            eval_losses.append(loss)  # device-side; fenced once below
            tallies = M.accumulate(tallies, t)
            eval_seen += batch_size * num_point
        for l, t in eval_buf.drain():  # tail: per-step executable
            eval_losses.append(jnp.sum(l))
            tallies = M.accumulate(tallies, t)
        eval_loss_sum = (float(jnp.sum(jnp.stack(eval_losses)))
                         if eval_losses else 0.0)

        if eval_batches:
            iou = M.iou_from_tallies(tallies)
            miou = float(np.mean(iou))
            eval_acc = M.accuracy_from_tallies(tallies, eval_seen)
            log_string("eval mean loss: %f" % (eval_loss_sum / eval_batches))
            log_string("eval point avg class IoU: %f" % miou)
            log_string("eval point accuracy: %f" % eval_acc)
            log_string("eval point avg class acc: %f"
                       % M.class_avg_accuracy(tallies))

            labelweights = tallies["seen"] / max(tallies["seen"].sum(), 1)
            iou_str = "------- IoU --------\n"
            for l in range(num_classes):
                iou_str += "class %s weight: %.3f, IoU: %.3f \n" % (
                    seg_label_to_cat[l] + " " * (14 - len(seg_label_to_cat[l])),
                    labelweights[l], iou[l])
            log_string(iou_str)

            if miou >= best_iou:
                best_iou = miou
                savepath = str(checkpoints_dir) + model_name
                log_string("Saving at %s" % savepath)
                ckpt.save_checkpoint(savepath, epoch=epoch,
                                     variables=engine.variables(),
                                     opt_state=engine.opt_state,
                                     class_avg_iou=miou)
            log_string("Best mIoU: %f" % best_iou)

            accuracy_chart.append(eval_acc)
            ml_chart.append(eval_loss_sum / eval_batches)
            iou_chart.append(best_iou)
        global_epoch += 1

    return accuracy_chart, ml_chart, iou_chart
