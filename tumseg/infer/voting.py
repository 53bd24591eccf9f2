"""Whole-scene voting inference, TPU-native.

Behavior parity with modelTesting + add_vote
(/root/reference/localfunctions.py:339-479): for each scene, ``num_votes``
stochastic re-blockings are run through the model and each point's class
votes are pooled; the final label is the argmax of the pool; per-class IoU
is tallied against the whole-scene ground truth and .txt/.obj artifacts are
written.

TPU-native differences:
- all blocks of a vote are forwarded as one padded [B, N, C] batch per
  device step (optionally sharded over the mesh's data axis), instead of a
  Python loop re-using stale batch buffers;
- vote accumulation is a device scatter-add into the [N_scene, C] pool
  (one fused XLA op), replacing the reference's pure-Python double loop over
  B x N points (localfunctions.py:339-346, the host-side hot spot);
- only real (non-padding) blocks vote, reproducing the *effect* of the
  reference's ``0:real_batch_size`` slice (SURVEY §5.1.6);
- the reference gates votes on ``weight != 0 and not isinf(weight)`` where
  weight = labelweights[ground-truth label] (sem_seg_testing.py:224) — a
  no-op in practice but a GT leak in principle. We replicate it behind
  ``gt_weight_gate=True`` (default, for bit-parity) and allow disabling.
"""

from __future__ import annotations

import os
import threading
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from tumseg import ops as tumseg_ops
from tumseg.parallel import mesh as pmesh
from tumseg.train import metrics as M
from tumseg.utils.progress import progress
from tumseg.viz.writers import write_labels_txt, write_obj_pointcloud


@partial(jax.jit, donate_argnums=(0,))
def _scatter_votes(pool: jnp.ndarray, point_idx: jnp.ndarray,
                   pred: jnp.ndarray, keep: jnp.ndarray) -> jnp.ndarray:
    """pool [N_scene, C] += one_hot(pred) at point_idx where keep."""
    flat_idx = point_idx.reshape(-1)
    flat_pred = pred.reshape(-1)
    flat_keep = keep.reshape(-1).astype(pool.dtype)
    return pool.at[flat_idx, flat_pred].add(flat_keep)


def _sorted_histogram(keys: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Count occurrences of each key (all in [0, out_len) — the vote keys
    idx*C + pred are bounded by the dump row) WITHOUT a duplicate-index
    scatter (DESIGN.md 2b): one ascending sort, per-run counts at run ends,
    then a scatter into a [out_len + m] scratch whose indices are ALL
    unique and in range — run ends target their key (one per run), every
    non-end position targets its own scratch slot out_len + i with a zero
    update. unique_indices=True is therefore honest (a single
    out-of-range sentinel shared by all non-ends would be undefined
    behavior under that promise); the scatter-add has no duplicate
    serialization and the scratch tail is sliced off."""
    m = keys.shape[0]
    sk = jnp.sort(keys)
    iota = jnp.arange(m, dtype=jnp.int32)
    boundary = sk[1:] != sk[:-1]
    new_run = jnp.concatenate([jnp.ones((1,), bool), boundary])
    # index of each element's run start: cummax of (iota where run starts)
    start = jax.lax.associative_scan(jnp.maximum,
                                     jnp.where(new_run, iota, 0))
    is_end = jnp.concatenate([boundary, jnp.ones((1,), bool)])
    counts = (iota - start + 1).astype(jnp.float32)
    tgt = jnp.where(is_end, sk, out_len + iota)
    hist = jnp.zeros((out_len + m,), jnp.float32).at[tgt].add(
        jnp.where(is_end, counts, 0.0), mode="promise_in_bounds",
        unique_indices=True)
    return hist[:out_len]


def _build_reblock_arrays(cells, block_points: int):
    """Host-side one-time flats for DEVICE re-blocking: concatenate every
    cell's candidates padded to a block_points multiple (zeros in the
    shortfall slots, replaced on device by random in-cell picks). Region
    layout is static per scene, so after the in-cell shuffle the flat
    sequence reshapes straight into [NB, block_points] blocks.

    Cells are laid out GROUPED BY BLOCK COUNT (stable within a group) so
    the in-cell shuffle can run as per-group [n_cells, k*block_points]
    minor-axis sorts instead of one global composite-key sort — 6.7 vs
    25.3 ms at the 1M-pt facade's real shape (273 cells x 4 blocks;
    /tmp/sort_probe2, 2026-08-17). Block order is irrelevant to voting
    (the vote pool is a per-point scatter-add over all real blocks).
    Returns (..., segments, order): ``segments`` is a tuple of
    (blocks_per_cell, n_cells) runs describing the grouped layout;
    ``order`` maps layout position -> index into ``cells``."""
    # grid_structure's contract: only non-empty cells are emitted — the
    # fill path divides by count, so an empty cell must fail loudly here
    # rather than silently vote foreign points (ValueError, not assert:
    # the check must survive `python -O`)
    if any(int(c[0].size) == 0 for c in cells):
        raise ValueError("empty grid cell passed to device re-blocking")
    nb_per_cell = [int(np.ceil(int(c[0].size) / block_points))
                   for c in cells]
    order = sorted(range(len(cells)), key=lambda i: nb_per_cell[i])
    segments = []
    for i in order:
        k = nb_per_cell[i]
        if segments and segments[-1][0] == k:
            segments[-1][1] += 1
        else:
            segments.append([k, 1])
    segments = tuple((k, n) for k, n in segments)

    sizes, counts, base_parts, offsets = [], [], [], []
    for i in order:
        point_idxs, s_x, s_y = cells[i]
        n = int(point_idxs.size)
        ps = nb_per_cell[i] * block_points
        buf = np.zeros(ps, np.int32)
        buf[:n] = point_idxs
        base_parts.append(buf)
        sizes.append(ps)
        counts.append(n)
        offsets.append(np.repeat([[s_x, s_y]], nb_per_cell[i], axis=0))
    flat_base = np.concatenate(base_parts).astype(np.int32)
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int32)
    return (flat_base, starts, np.asarray(counts, np.int32),
            np.asarray(sizes, np.int32),
            np.concatenate(offsets, axis=0).astype(np.float32),
            segments, np.asarray(order, np.int64))


@partial(jax.jit, static_argnums=(5, 6))
def _reblock_on_device(key, flat_base, starts_pos, counts_pos, cell_rank,
                       block_points: int, segments=None):
    """One vote's re-blocking entirely on device: fill shortfall slots with
    random in-cell candidates, then shuffle within each cell. Returns
    [NB, block_points] int32. Replicates grid_indices' sampling semantics
    with jax.random instead of the host Generator (fills draw with
    replacement; the host path draws without replacement when shortfall <=
    count — a distribution nuance on the duplicated padding points only).

    The shuffle: with ``segments`` (the grouped layout from
    _build_reblock_arrays), each (blocks_per_cell k, n_cells) run reshapes
    to [n_cells, k*block_points] and sorts random keys along the MINOR
    axis — one row per cell, so the row sort IS the uniform in-cell
    shuffle. 6.7 vs 25.3 ms against the global composite-key sort at the
    1M-pt facade shape (rows stay VMEM-resident; the global variadic sort
    streams all three L-element operands through every bitonic stage).
    ``cell_rank`` may then be None (only the fallback uses it). Without
    segments, the global (cell_rank, rand, seq) 2-key sort is used — same
    distribution, slower; a packed single-uint32-key variant of it was
    MEASURED A WASH (55.6 vs 56.9 ms, benchmarks/serve_probe4.py).

    Compile-sharing note: ``segments`` is a static argnum, so two scenes
    with equal flat length L but different cell-size structure retrace
    this function — a deliberate trade: the jit already keys on L (the
    flat arrays are not bucketed), this program is tiny next to the vote
    scan, and the segmented sort saves ~11 ms on every vote."""
    L = flat_base.shape[0]
    kf, ks = jax.random.split(key)
    u = jax.random.uniform(kf, (L,), jnp.float32)
    r = jnp.minimum((u * counts_pos).astype(jnp.int32), counts_pos - 1)
    pos_in_cell = jnp.arange(L, dtype=jnp.int32) - starts_pos
    # ~77% of lanes are member slots whose fill value is discarded by the
    # where() below — pin their gather address to the cell start so the
    # random-access HBM gather only pays for real fill slots (measured
    # 43.9 -> 36.2 ms on the fill pass alone, /tmp/fill_probe 2026-08-17)
    r = jnp.where(pos_in_cell >= counts_pos, r, 0)
    fill_val = jnp.take(flat_base, starts_pos + r, axis=0)
    seq = jnp.where(pos_in_cell >= counts_pos, fill_val, flat_base)
    rand_bits = jax.random.bits(ks, (L,), jnp.uint32)
    if segments is not None:
        parts = []
        off = 0
        for k_blocks, n_cells in segments:
            m = k_blocks * block_points
            rows = seq[off:off + n_cells * m].reshape(n_cells, m)
            keys = rand_bits[off:off + n_cells * m].reshape(n_cells, m)
            _, srt = jax.lax.sort((keys, rows), dimension=1, num_keys=1)
            parts.append(srt.reshape(-1))
            off += n_cells * m
        shuffled = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
    else:
        _, _, shuffled = jax.lax.sort((cell_rank, rand_bits, seq),
                                      dimension=0, num_keys=2)
    return shuffled.reshape(-1, block_points)


class InferenceRunner:
    """Batched, optionally mesh-sharded forward + device vote pooling.

    ``device_features`` ("auto"/True/False): build the 6+extra block
    channels ON DEVICE from a once-uploaded scene, so each vote ships only
    int32 block indices over the host->device link instead of full float
    feature blocks (~9x less; the link through this image's TPU tunnel runs
    at ~30 MB/s and dominated the serving path). "auto" enables it on TPU
    backends. Channel math replicates TestGridDataset.__getitem__ exactly,
    in f32 instead of the host's f64 (last-ulp differences only).
    """

    def __init__(self, model, variables: Dict, num_classes: int,
                 batch_size: int = 32, mesh=None, compute_dtype=None,
                 device_features="auto", device_reblock="auto",
                 window_ops="auto", seed: int = 0):
        self.model = model
        self.variables = variables
        self.num_classes = num_classes
        self.batch_size = batch_size
        self.mesh = mesh
        self._sharding = pmesh.batch_sharding(mesh) if mesh is not None else None
        if device_features == "auto":
            device_features = jax.default_backend() in ("tpu", "axon")
        self.device_features = bool(device_features)
        if device_reblock == "auto":
            device_reblock = self.device_features
        self.device_reblock = bool(device_reblock)
        # z-window extraction kernels: the ball-query window is dispatched
        # unconditionally by the ops layer (tiered, guarded-exact); this
        # flag additionally enables the 3-NN window inside the scan trace.
        # Measured OFF wins end to end: the 3-NN window loses even on
        # facade columns (2.38 vs 1.99 ms at fp1, window_probe.py --facade)
        # and the real vote scan confirms it (1.92M vs 1.86M scene-pts/s,
        # predictions bit-equal — benchmarks/serve_probe5.py, two runs).
        if window_ops == "auto":
            window_ops = False
        self.window_ops = bool(window_ops)
        # vote accumulation inside the scan (DESIGN.md 2b A/B):
        #   "scan" = per-chunk flat scatter-add carried through the scan
        #            (the r2/r3 measured configuration);
        #   "sort" = scan outputs predictions, then one post-scan sort +
        #            unique-index run-count scatter (_sorted_histogram);
        #   "bulk" = scan outputs predictions, then one big scatter-add.
        # "auto" resolves to "scan" until a device A/B says otherwise
        # (benchmarks/serve_probe6.py). All three are pool-identical —
        # pinned by tests/test_voting.py.
        vote_scatter = os.environ.get("TUMSEG_VOTE_SCATTER", "auto")
        if vote_scatter == "auto":
            vote_scatter = "scan"
        if vote_scatter not in ("scan", "sort", "bulk"):
            raise ValueError(f"unknown vote_scatter mode {vote_scatter!r}")
        self.vote_scatter = vote_scatter
        self._base_key = jax.random.PRNGKey(int(seed))
        self._scene_cache = {}
        self._grid_cache = {}
        self._vote_fn_cache = {}
        self._cache_lock = threading.Lock()

        def forward(variables, points):
            logp, _, _ = model.apply(variables, points, training=False,
                                     compute_dtype=compute_dtype)
            return jnp.argmax(logp, axis=-1).astype(jnp.int32)

        if mesh is not None:
            # shard_map, not bare GSPMD: the Pallas kernels have no SPMD
            # partitioning rules, so each device must run them on its local
            # block shard (same reasoning as TrainEngine's sharded step).
            # Eval-mode BN uses fixed stats — no collectives needed.
            from jax.sharding import PartitionSpec as P

            if batch_size % mesh.size != 0:
                raise ValueError(
                    f"batch_size {batch_size} must be a multiple of the "
                    f"mesh size {mesh.size} for sharded inference")
            forward_sharded = jax.shard_map(
                forward, mesh=mesh,
                in_specs=(P(), P(pmesh.DATA_AXIS)),
                out_specs=P(pmesh.DATA_AXIS))
            self._forward = jax.jit(forward_sharded)
        else:
            self._forward = jax.jit(forward)

        def forward_featurized(variables, scene_xyz, scene_extra, coord_max,
                               color_mask, idx, offsets, block_size):
            # gather + channel build on device (mirrors
            # data/dataset.py:TestGridDataset.__getitem__)
            pts = jnp.take(scene_xyz, idx, axis=0)          # [B, P, 3]
            normalized = pts / coord_max
            centered = pts.at[..., 0].add(-(offsets[:, None, 0]
                                            + block_size / 2.0))
            centered = centered.at[..., 1].add(-(offsets[:, None, 1]
                                                 + block_size / 2.0))
            feats = [centered, normalized]
            if scene_extra.shape[1]:
                extra = jnp.take(scene_extra, idx, axis=0)  # [B, P, E]
                extra = jnp.where(color_mask, extra / 255.0, extra)
                feats.append(extra)
            points = jnp.concatenate(feats, axis=-1)
            return forward(variables, points)

        self._forward_featurized_fn = forward_featurized  # raw, for scan use

        if mesh is not None:
            from jax.sharding import PartitionSpec as P

            P_b = P(pmesh.DATA_AXIS)

            def featurized_sharded(variables, scene_xyz, scene_extra,
                                   coord_max, color_mask, idx, offsets,
                                   block_size):
                return jax.shard_map(
                    lambda v, sx, se, cm, cmask, i, o: forward_featurized(
                        v, sx, se, cm, cmask, i, o, block_size),
                    mesh=mesh,
                    in_specs=(P(), P(), P(), P(), P(), P_b, P_b),
                    out_specs=P_b,
                )(variables, scene_xyz, scene_extra, coord_max, color_mask,
                  idx, offsets)

            self._forward_featurized = jax.jit(
                featurized_sharded, static_argnames=("block_size",))
        else:
            self._forward_featurized = jax.jit(
                forward_featurized, static_argnames=("block_size",))

    def predict_blocks(self, scene_data: np.ndarray) -> np.ndarray:
        """scene_data [num_blocks, N, C] -> predicted labels [num_blocks, N].
        Pads the block axis up to a batch multiple; padded rows are dropped."""
        preds = [np.asarray(p[:real])
                 for p, real in self._predict_chunks(scene_data)]
        return np.concatenate(preds, axis=0)

    def _predict_chunks(self, scene_data: np.ndarray):
        """Yield (device predictions [bs, N], real_rows) per batch chunk —
        no host readback; callers decide when to materialize."""
        bs = self.batch_size
        for s in range(0, scene_data.shape[0], bs):
            chunk = scene_data[s:s + bs]
            real = chunk.shape[0]
            if real < bs:
                chunk, _ = pmesh.pad_to_multiple(chunk, bs)
            x = jnp.asarray(chunk, dtype=jnp.float32)
            if self._sharding is not None:
                x = jax.device_put(x, self._sharding)
            yield self._forward(self.variables, x), real

    def _cached(self, cache, dataset, scene_idx: int, build):
        """Per-scene device cache with content-identity validation (the
        source array object is stored alongside the tensors and compared
        with `is`, like TestGridDataset.grid_structure — id() alone can be
        reused after garbage collection). Holds at most TWO scenes —
        the one being voted and the one ``prefetch_scene`` uploads while
        the device scans (run_testing overlaps scene N+1's host gridding
        AND device uploads with scene N's votes); older entries evict so
        a long dataset never pins every scene's tensors in HBM.

        Thread-safe against the prefetch thread: entries are
        ``[src, value, done_event]`` claimed under a lock, so two threads
        missing the same scene build it ONCE (the loser waits on the event
        instead of re-paying the gridding + tunnel upload), and eviction
        only removes COMPLETED entries in insertion (oldest-first) order —
        an in-progress prefetch can't be dropped or double-popped."""
        key = (id(dataset), scene_idx)
        src = dataset.scene_points_list[scene_idx]
        with self._cache_lock:
            entry = cache.get(key)
            owner = entry is None or entry[0] is not src
            if owner:
                entry = [src, None, threading.Event()]
                cache.pop(key, None)
                cache[key] = entry
                done = [k for k in cache
                        if k != key and cache[k][2].is_set()]
                while len(cache) > 2 and done:
                    cache.pop(done.pop(0), None)
        if owner:
            try:
                entry[1] = build()
            finally:
                entry[2].set()
            return entry[1]
        entry[2].wait()
        if entry[1] is None:
            # the owning thread's build raised; rebuild uncached so the
            # failure surfaces in THIS thread too rather than a None deref
            with self._cache_lock:
                if cache.get(key) is entry:
                    cache.pop(key, None)
            return build()
        return entry[1]

    @staticmethod
    def _scene_bucket(n: int) -> int:
        """Round the scene point count up to a shared bucket so scenes of
        different sizes reuse ONE compiled vote scan: the scan jit keys on
        the scene tensors' shapes, and a fresh compile per facade costs
        1-2 min through this image's remote-compile tunnel (~10-20 s on a
        normal TPU host) — measured dominating a cold whole-scene test.
        128K granularity = at most ~8 shapes per million points."""
        bucket = 131072
        return max(bucket, (n + bucket - 1) // bucket * bucket)

    def _scene_tensors(self, dataset, scene_idx: int):
        """Upload a scene's raw columns once (bucket-padded); every vote
        then ships only block indices. Padded rows never appear in any
        grid cell, so only the dump row (index n_pad) can touch them."""
        from tumseg.data.dataset import _COLOR_FEATURES

        def build():
            pts = np.asarray(dataset.scene_points_list[scene_idx][:, :3],
                             dtype=np.float32)
            n = pts.shape[0]
            n_pad = self._scene_bucket(n)
            coord_max = pts.max(axis=0)
            if n_pad > n:
                pts = np.concatenate(
                    [pts, np.broadcast_to(coord_max, (n_pad - n, 3))])
            E = dataset.num_extra_features
            if E:
                extra = np.stack(
                    [np.asarray(c, dtype=np.float32)
                     for c in dataset.extra_features_data[scene_idx]], axis=1)
                if n_pad > n:
                    extra = np.concatenate(
                        [extra, np.zeros((n_pad - n, E), np.float32)])
                color_mask = np.array(
                    [n_ in _COLOR_FEATURES
                     for n_ in dataset.feature_name], dtype=bool)
            else:
                extra = np.zeros((n_pad, 0), dtype=np.float32)
                color_mask = np.zeros((0,), dtype=bool)
            return (jnp.asarray(pts), jnp.asarray(extra),
                    jnp.asarray(coord_max), jnp.asarray(color_mask))

        return self._cached(self._scene_cache, dataset, scene_idx, build)

    def _grid_tensors(self, dataset, scene_idx: int):
        """Upload the scene's deterministic grid structure once; every vote
        then needs only a PRNG fold-in (the per-vote index upload — ~17 MB
        at 1M points through the ~30 MB/s tunnel — was the serving-path
        bottleneck after device featurization)."""
        def build():
            cells = dataset.grid_structure(scene_idx)
            (flat_base, starts, counts, sizes, offsets, segments,
             _order) = _build_reblock_arrays(cells, dataset.block_points)
            L = flat_base.shape[0]
            nc = starts.shape[0]
            jsizes = jnp.asarray(sizes)
            starts_pos = jnp.repeat(jnp.asarray(starts), jsizes,
                                    total_repeat_length=L)
            counts_pos = jnp.repeat(jnp.asarray(counts), jsizes,
                                    total_repeat_length=L)
            # HOST array: only the segments=None fallback of
            # _reblock_on_device consumes cell_rank (probes A/B the global
            # sort); the production path must not pin an extra [L] int32
            # in HBM nor ship a dead operand every vote
            cell_rank = np.repeat(np.arange(nc, dtype=np.int32),
                                  np.asarray(sizes))
            nb = L // dataset.block_points
            bs = self.batch_size
            # bucket the padded block count to 4*bs chunks: the vote scan's
            # length is static, so distinct block counts would otherwise
            # recompile per scene (same motivation as _scene_bucket);
            # padded blocks run a dummy forward into the dump row, worst
            # case (4*bs - 1) extra blocks ~ a few % of a real facade
            granule = 4 * bs
            nb_pad = int(np.ceil(max(nb, 1) / granule) * granule)
            offsets_pad = np.zeros((nb_pad, 2), np.float32)
            offsets_pad[:nb] = offsets
            return (jnp.asarray(flat_base), starts_pos, counts_pos,
                    cell_rank, jnp.asarray(offsets_pad), nb, nb_pad, nc,
                    segments)

        return self._cached(self._grid_cache, dataset, scene_idx, build)

    def prefetch_scene(self, dataset, scene_idx: int) -> None:
        """Stage a scene's device tensors (raw columns + grid flats) ahead
        of time — run_testing calls this from its prefetch thread so scene
        N+1's host gridding AND its uploads through the host->device link
        overlap scene N's vote scans (the caches hold two scenes)."""
        if not hasattr(dataset, "grid_structure"):
            return
        dataset.grid_structure(scene_idx)   # host gridding (memoized)
        if self.device_features:
            self._scene_tensors(dataset, scene_idx)
            if self.device_reblock:
                self._grid_tensors(dataset, scene_idx)

    def _vote_scan_fn(self, block_size: float, n_feat_extra: int):
        """One jit per (block shape): runs ALL of a vote's blocks through
        featurize+forward+vote-scatter as a lax.scan — a single device
        dispatch per vote. No per-chunk masking: padded blocks carry
        idx == n_pad (the bucket-padded scene size) and vote into a dump
        row (pool has n_pad+1 rows);
        the gt-weight gate is a per-scene-point CONSTANT (labelweights of
        the ground-truth label), so it is applied once to the finished pool
        instead of per-chunk gathers (measured 67 ms/vote at 1M points).

        With a mesh, the same scan runs under shard_map: the block axis
        shards over the data axis, each device scans its bs/D-block chunks
        into a full-size local pool replica, and one psum merges the pools
        (vote counts are small integers in f32, so the add order across
        devices cannot change the result)."""
        cache_key = (float(block_size), n_feat_extra, self.batch_size,
                     self.vote_scatter)
        if cache_key in self._vote_fn_cache:
            return self._vote_fn_cache[cache_key]

        forward_featurized = self._forward_featurized_fn
        bs = self.batch_size
        C = self.num_classes
        mode = self.vote_scatter

        def scan_votes(variables, scene_xyz, scene_extra, coord_max,
                       color_mask, idx_all, offs_all, pool_flat, bs_n):
            # pool is FLAT [(N+1)*C]: the 1-D scatter-add lowers ~1.7x
            # faster than the 2-D (idx, pred) form (benchmarks/
            # serve_probe2.py: 458 vs 510 ms/vote at 1M points)
            nchunks = idx_all.shape[0] // bs_n
            chunks = (idx_all.reshape(nchunks, bs_n, -1),
                      offs_all.reshape(nchunks, bs_n, 2))

            def predict(idx, offs):
                return forward_featurized(
                    variables, scene_xyz, scene_extra, coord_max,
                    color_mask,
                    jnp.minimum(idx, scene_xyz.shape[0] - 1),
                    offs, block_size)

            # chunks that exist only for the compile-sharing block granule
            # (all idx == n_pad) skip the forward entirely via lax.cond
            def all_dummy(idx):
                return jnp.min(idx) >= scene_xyz.shape[0]

            if mode == "scan":
                def body(pool_flat, chunk):
                    idx, offs = chunk

                    def run(p):
                        pred = predict(idx, offs)
                        flat = idx.reshape(-1) * C + pred.reshape(-1)
                        return p.at[flat].add(1.0)

                    return jax.lax.cond(all_dummy(idx), lambda p: p, run,
                                        pool_flat), None

                pool_flat, _ = jax.lax.scan(body, pool_flat, chunks)
                return pool_flat

            # "sort"/"bulk" (DESIGN.md 2b): the scan only COLLECTS each
            # chunk's flat vote keys; accumulation happens once post-scan —
            # dummy chunks emit key n_pad*C + 0, which lands in the same
            # dump row their scatter would have
            def body(_, chunk):
                idx, offs = chunk
                # dummy branch derives from idx (not jnp.zeros) so both
                # cond branches carry the same shard_map varying-axes type
                pred = jax.lax.cond(
                    all_dummy(idx),
                    lambda: idx * 0,
                    lambda: predict(idx, offs))
                return None, (idx.reshape(-1) * C + pred.reshape(-1))

            _, keys = jax.lax.scan(body, None, chunks)
            keys = keys.reshape(-1)
            if mode == "bulk":
                return pool_flat.at[keys].add(1.0)
            return pool_flat + _sorted_histogram(keys, pool_flat.shape[0])

        if self.mesh is None:
            @partial(jax.jit, donate_argnums=(7,))
            def vote(variables, scene_xyz, scene_extra, coord_max,
                     color_mask, idx_all, offs_all, pool_flat):
                return scan_votes(variables, scene_xyz, scene_extra,
                                  coord_max, color_mask, idx_all, offs_all,
                                  pool_flat, bs)
        else:
            from jax.sharding import PartitionSpec as P

            bs_local = bs // self.mesh.size

            def vote_local(variables, scene_xyz, scene_extra, coord_max,
                           color_mask, idx_all, offs_all, pool_flat):
                # scan into a ZERO local pool and psum only this vote's
                # increment — psum-ing the carried (replicated) pool would
                # multiply it by the device count every vote
                zero = jax.lax.pcast(jnp.zeros_like(pool_flat),
                                     pmesh.DATA_AXIS, to="varying")
                inc = scan_votes(variables, scene_xyz, scene_extra,
                                 coord_max, color_mask, idx_all, offs_all,
                                 zero, bs_local)
                return pool_flat + jax.lax.psum(inc, pmesh.DATA_AXIS)

            P_b = P(pmesh.DATA_AXIS)
            vote = jax.jit(jax.shard_map(
                vote_local, mesh=self.mesh,
                in_specs=(P(), P(), P(), P(), P(), P_b, P_b, P()),
                out_specs=P()), donate_argnums=(7,))

        self._vote_fn_cache[cache_key] = vote
        return vote

    def _infer_scene_device_reblock(self, dataset, scene_idx, num_votes,
                                    gt_weight_gate):
        labels_np = dataset.semantic_labels_list[scene_idx].astype(np.int32)
        n_scene = labels_np.shape[0]
        scene_xyz, scene_extra, coord_max, color_mask = self._scene_tensors(
            dataset, scene_idx)
        n_pad = int(scene_xyz.shape[0])       # bucket-padded scene rows
        (flat_base, starts_pos, counts_pos, cell_rank, offsets_pad,
         nb, nb_pad, nc, segments) = self._grid_tensors(dataset, scene_idx)
        # dump row n_pad absorbs padded blocks' votes
        C = self.num_classes
        pool_flat = jnp.zeros(((n_pad + 1) * C,), jnp.float32)
        vote_fn = self._vote_scan_fn(float(dataset.block_size),
                                     int(scene_extra.shape[1]))
        bp = int(dataset.block_points)
        # fold the scene identity in too: base_key folded by vote alone would
        # reuse one key sequence for every scene, correlating re-blocking
        # randomness across scenes (the host path consumes one continuing
        # Generator stream and has no such correlation)
        scene_key = jax.random.fold_in(self._base_key, scene_idx)
        # progress mirrors the reference's vote tqdm (localfunctions.py:375)
        for vote in progress(range(num_votes), desc="votes"):
            k = jax.random.fold_in(scene_key, vote)
            idx_blocks = _reblock_on_device(k, flat_base, starts_pos,
                                            counts_pos, None, bp, segments)
            if nb_pad > nb:
                idx_blocks = jnp.pad(idx_blocks, ((0, nb_pad - nb), (0, 0)),
                                     constant_values=n_pad)
            # real-scan geometry: blocks are 1m x 1m xy columns with metres
            # of z-spread, exactly where the z-window pruned extraction
            # kernels win (~10% of the vote scan, benchmarks/serve_probe.py)
            with tumseg_ops.window_enabled(self.window_ops):
                pool_flat = vote_fn(self.variables, scene_xyz, scene_extra,
                                    coord_max, color_mask, idx_blocks,
                                    offsets_pad, pool_flat)
        pool = pool_flat.reshape(n_pad + 1, C)[:n_scene]
        if gt_weight_gate:
            # reference semantics (localfunctions.py:344): votes only count
            # where labelweights[gt] is finite nonzero. That is a constant
            # per scene point, so masking the finished pool is equivalent to
            # gating each vote (a zeroed row argmaxes to 0, same as a row
            # that never received votes).
            lw = np.asarray(dataset.labelweights, np.float32)
            smpw = lw[labels_np]
            keep = jnp.asarray((smpw != 0) & ~np.isinf(smpw))
            pool = jnp.where(keep[:, None], pool, 0.0)
        return np.asarray(jnp.argmax(pool, axis=1))

    def _infer_scene_device_features(self, dataset, scene_idx, num_votes,
                                     gt_weight_gate):
        from concurrent.futures import ThreadPoolExecutor

        labels = dataset.semantic_labels_list[scene_idx].astype(int)
        lw = np.asarray(dataset.labelweights)
        scene_xyz, scene_extra, coord_max, color_mask = self._scene_tensors(
            dataset, scene_idx)
        pool = jnp.zeros((labels.shape[0], self.num_classes),
                         dtype=jnp.float32)
        executor = ThreadPoolExecutor(max_workers=1)
        # try/finally: shut the prefetch worker down even when a vote raises
        try:
            fut = executor.submit(dataset.grid_indices, scene_idx)
            bs = self.batch_size
            for vote in progress(range(num_votes), desc="votes"):
                idx_blocks, offsets = fut.result()
                if vote + 1 < num_votes:
                    fut = executor.submit(dataset.grid_indices, scene_idx)
                if gt_weight_gate:
                    smpw = lw[labels[idx_blocks]]
                    keep = (smpw != 0) & ~np.isinf(smpw)
                else:
                    keep = np.ones(idx_blocks.shape, dtype=bool)
                for s in range(0, idx_blocks.shape[0], bs):
                    idx_c = idx_blocks[s:s + bs].astype(np.int32)
                    offs_c = offsets[s:s + bs].astype(np.float32)
                    keep_c = keep[s:s + bs]
                    real = idx_c.shape[0]
                    if real < bs:
                        idx_c = np.pad(idx_c, [(0, bs - real), (0, 0)])
                        offs_c = np.pad(offs_c, [(0, bs - real), (0, 0)])
                        keep_c = np.pad(keep_c, [(0, bs - real), (0, 0)])
                    jidx = jnp.asarray(idx_c)
                    if self._sharding is not None:
                        jidx = jax.device_put(jidx, self._sharding)
                    pred = self._forward_featurized(
                        self.variables, scene_xyz, scene_extra, coord_max,
                        color_mask, jidx, jnp.asarray(offs_c),
                        float(dataset.block_size))
                    pool = _scatter_votes(pool, jidx, pred,
                                          jnp.asarray(keep_c))
        finally:
            executor.shutdown(wait=False)
        return np.asarray(jnp.argmax(pool, axis=1))

    def infer_scene(self, dataset, scene_idx: int, num_votes: int = 5,
                    gt_weight_gate: bool = True,
                    log=print) -> np.ndarray:
        """Run ``num_votes`` re-blocked passes and return per-point labels
        for the whole scene [N_scene]."""
        from concurrent.futures import ThreadPoolExecutor

        if (self.device_reblock and self.device_features
                and hasattr(dataset, "grid_structure")):
            return self._infer_scene_device_reblock(
                dataset, scene_idx, num_votes, gt_weight_gate)
        if self.device_features and hasattr(dataset, "grid_indices"):
            return self._infer_scene_device_features(
                dataset, scene_idx, num_votes, gt_weight_gate)

        n_scene = dataset.semantic_labels_list[scene_idx].shape[0]
        pool = jnp.zeros((n_scene, self.num_classes), dtype=jnp.float32)
        # host re-blocking of the next vote overlaps device compute of the
        # current one (the reference re-blocks synchronously every vote,
        # sem_seg_testing.py:182-254 — the host-side hot path)
        executor = ThreadPoolExecutor(max_workers=1)
        # try/finally: shut the prefetch worker down even when a vote raises
        try:
            fut = executor.submit(dataset.__getitem__, scene_idx)
            bs = self.batch_size
            for vote in progress(range(num_votes), desc="votes"):
                scene_data, scene_label, scene_smpw, scene_index = fut.result()
                if vote + 1 < num_votes:
                    fut = executor.submit(dataset.__getitem__, scene_idx)
                if gt_weight_gate:
                    keep = (scene_smpw != 0) & ~np.isinf(scene_smpw)
                else:
                    keep = np.ones_like(scene_smpw, dtype=bool)
                # scatter each chunk's device predictions straight into the
                # device pool: predictions never visit the host (each readback
                # costs ~26 ms through this image's TPU tunnel), padded rows
                # vote with keep=False
                for ci, (pred, real) in enumerate(
                        self._predict_chunks(scene_data)):
                    s = ci * bs
                    idx_c = scene_index[s:s + bs].astype(np.int32)
                    keep_c = keep[s:s + bs]
                    if real < pred.shape[0]:
                        pad = pred.shape[0] - real
                        idx_c = np.pad(idx_c, [(0, pad), (0, 0)])
                        keep_c = np.pad(keep_c, [(0, pad), (0, 0)])
                    pool = _scatter_votes(pool, jnp.asarray(idx_c),
                                          pred, jnp.asarray(keep_c))
        finally:
            executor.shutdown(wait=False)
        return np.asarray(jnp.argmax(pool, axis=1))


def run_testing(dataset, runner: InferenceRunner, *, num_votes: int,
                visual_dir=None, visual: bool = False,
                seg_label_to_cat: Dict = None, label2color: Dict = None,
                result_color: bool = True, log_string=print):
    """Loop over scenes: voting inference, per-scene + aggregate IoU report,
    .txt label dumps and optional colored .obj files — the modelTesting
    surface (localfunctions.py:349-479)."""
    from concurrent.futures import ThreadPoolExecutor

    num_classes = runner.num_classes
    scene_ids = [os.path.basename(str(f))[:-4] for f in dataset.file_list]
    totals = M.zero_tallies(num_classes)
    per_scene_miou = []

    # overlap the NEXT scene's host gridding (~0.7 s/scene at 1M points)
    # AND its device-tensor uploads with the device compute of the current
    # scene's votes; both memoize per scene (runner caches hold two scenes)
    # so the main thread's later calls are cache hits
    prefetch = (ThreadPoolExecutor(max_workers=1)
                if hasattr(dataset, "grid_structure") else None)

    log_string("---- EVALUATION WHOLE SCENE----")
    # try/finally: the prefetch pool must be shut down even when a scene
    # raises — otherwise its worker thread (and the gridding it holds)
    # outlives the run
    try:
        for batch_idx in range(len(dataset)):
            print("Inference [%d/%d] %s ..." % (batch_idx + 1, len(dataset),
                                                scene_ids[batch_idx]))
            if prefetch is not None and batch_idx + 1 < len(dataset):
                prefetch.submit(runner.prefetch_scene, dataset, batch_idx + 1)
            whole_scene_label = dataset.semantic_labels_list[batch_idx].astype(int)
            whole_scene_data = dataset.scene_points_list[batch_idx]

            pred_label = runner.infer_scene(dataset, batch_idx, num_votes)

            t = M.confusion_tallies(jnp.asarray(pred_label),
                                    jnp.asarray(whole_scene_label), num_classes)
            scene_iou = M.iou_from_tallies(t)
            totals = M.accumulate_host(totals, t)
            seen = np.asarray(t["seen"])
            tmp_iou = float(np.mean(scene_iou[seen != 0])) if (seen != 0).any() else 0.0
            print(scene_iou)
            per_scene_miou.append(tmp_iou)
            log_string("Mean IoU of %s: %.4f" % (scene_ids[batch_idx], tmp_iou))
            print("----------------------------")

            if visual_dir is not None:
                write_labels_txt(os.path.join(str(visual_dir),
                                              scene_ids[batch_idx] + ".txt"),
                                 pred_label)
                if visual:
                    kw = (dict(labels=pred_label, label2color=label2color)
                          if result_color else {})
                    kw_gt = (dict(labels=whole_scene_label, label2color=label2color)
                             if result_color else {})
                    write_obj_pointcloud(
                        os.path.join(str(visual_dir),
                                     scene_ids[batch_idx] + "_pred.obj"),
                        whole_scene_data, **kw)
                    write_obj_pointcloud(
                        os.path.join(str(visual_dir),
                                     scene_ids[batch_idx] + "_gt.obj"),
                        whole_scene_data, **kw_gt)
    finally:
        if prefetch is not None:
            prefetch.shutdown(wait=False)
    iou = M.iou_from_tallies(totals)
    iou_str = "------- IoU --------\n"
    for l in range(num_classes):
        if (totals["seen"][l] + totals["predicted"][l]) == 0:
            continue
        name = seg_label_to_cat[l] if seg_label_to_cat else str(l)
        iou_str += "class %s, IoU: %.3f \n" % (name + " " * (14 - len(name)),
                                               iou[l])
    log_string(iou_str)
    log_string("eval point avg class IoU: %f" % float(np.mean(iou)))
    log_string("eval whole scene point avg class acc: %f"
               % M.class_avg_accuracy(totals))
    total_seen = int(np.asarray(totals["seen"]).sum())
    log_string("eval whole scene point accuracy: %f"
               % (np.asarray(totals["correct"]).sum() / float(total_seen + 1e-6)))
    return {"iou": iou, "miou": float(np.mean(iou)),
            "per_scene_miou": per_scene_miou, "tallies": totals}
