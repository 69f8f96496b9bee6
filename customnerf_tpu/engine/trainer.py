"""Trainer: reconstruction + (LGIE editing) loops, eval strips, test videos.

Functional equivalent of the reference ``Trainer_Nerf``
(``nerf/utils_init_nerf.py:26-900``) restructured TPU-first: the whole train
step — render, losses, grads, Adam update — is ONE jitted function; data is
device-resident; there is no GradScaler (bf16 needs none; the ``fp16`` flag
selects a bfloat16 compute policy instead, documented deviation).

Reference semantics preserved:
  * Adam(betas=(0.9, 0.99), eps=1e-15) with the grid encoder at lr×10
    (main.py:182, network_grid.py:196-206).
  * LR decay ``0.1^min(step/iters, 1)`` applied **per step** (main.py:189-191).
  * reconstruction loss = train_rgb·MSE(rgb) + train_conf·MSE(render_mask)
    (utils_init_nerf.py:224-238); optional ``--batch_rays`` subsampling.
  * eval strip [gt | rgb | depth | gt_mask | pred_mask | fg | bg] →
    ``workspace/validation/{name}.png`` (utils_init_nerf.py:416-429, 745-752),
    ≤4 images unless ``--val_all_images``.
  * test renders per-frame PNGs + 30 fps mp4 (utils_init_nerf.py:520-569).
  * checkpoint cadence: at train start and twice per eval interval
    (utils_init_nerf.py:492-506); policy flags scratch/latest/latest_model/path
    + ``--editing_from`` (utils_init_nerf.py:136-150).
  * editing mode (``--pretrained``): frozen deep-copy of the field, render
    cache keyed by image path, SDS + keep_bg losses
    (utils_init_nerf.py:152-172, 243-265, 353-394).
"""

from __future__ import annotations

import math
import os
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from customnerf_tpu.engine import checkpoint as ckpt_io
from customnerf_tpu.models.field import FieldConfig, NeRFField
from customnerf_tpu.models.renderer import RenderSettings, render_rays
from customnerf_tpu.ops.grid import GridSpec
from customnerf_tpu.parallel.mesh import make_mesh, replicate, shard_batch


def fetch_tree(tree):
    """Pull a whole device pytree to host in ONE transfer per dtype.

    Each blocking ``np.asarray(leaf)`` costs a full tunnel round-trip;
    eval/test pull 4-7 arrays per rendered frame, which adds up to tens of
    seconds per bear run.  Ravel-concat the leaves on device (cheap, fuses)
    and split on host.  Leaves are grouped by dtype and each group concats
    at its own dtype — no silent float32 cast of integer/bool outputs."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if len(leaves) <= 1:
        return jax.tree_util.tree_map(np.asarray, tree)
    by_dtype = {}
    for idx, l in enumerate(leaves):
        by_dtype.setdefault(jnp.result_type(l), []).append(idx)
    outs = [None] * len(leaves)
    for dt, idxs in by_dtype.items():
        group = [leaves[i] for i in idxs]
        shapes = [l.shape for l in group]
        sizes = [int(np.prod(s)) for s in shapes]
        if len(group) == 1:
            outs[idxs[0]] = np.asarray(group[0])
            continue
        host = np.asarray(jnp.concatenate([jnp.ravel(l) for l in group]))
        off = 0
        for idx, sh, n in zip(idxs, shapes, sizes):
            outs[idx] = host[off:off + n].reshape(sh)
            off += n
    return jax.tree_util.tree_unflatten(treedef, outs)


def build_encoder_spec(opt):
    """Position-encoder spec from flags: hash/tiled grid (reference parity)
    or tri-plane (--grid_type triplane, the TPU-tuned low-row-count field)."""
    if opt.grid_type == "triplane":
        from customnerf_tpu.ops.triplane import TriplaneSpec
        chans = [int(c) for c in (opt.triplane_channels
                                  if isinstance(opt.triplane_channels,
                                                (list, tuple))
                                  else [opt.triplane_channels])]
        if len(chans) == 1:
            chans = chans * len(opt.triplane_res)
        return TriplaneSpec(
            resolutions=tuple(int(r) for r in opt.triplane_res),
            channels=tuple(chans),
            bwd=opt.triplane_bwd,
            # measured neutral at the flagship (table already under the
            # gather cliff, docs/PERF.md) — opt-in for R≥1024 plane configs
            fwd_bf16=bool(getattr(opt, "triplane_fwd_bf16", False)),
        )
    return GridSpec(
        input_dim=3,
        num_levels=opt.grid_levels,
        level_dim=opt.grid_level_dim,
        base_resolution=opt.grid_base_resolution,
        log2_hashmap_size=opt.log2_hashmap_size,
        desired_resolution=opt.desired_resolution,
        gridtype=opt.grid_type,
    )


def build_field(opt) -> NeRFField:
    cfg = FieldConfig(
        bound=opt.bound,
        grid=build_encoder_spec(opt),
        train_conf=bool(opt.train_conf),
        conf_channels=2 if opt.keyword2 is not None else 1,
        detach_mask_from_field=opt.detach_mask_from_field,
        mask_no_dir=opt.mask_no_dir,
        mask_no_dir_nodetach=opt.mask_no_dir_nodetach,
        use_bias=opt.mlp_bias,
        compute_dtype="bfloat16" if opt.fp16 else "float32",
    )
    return NeRFField(cfg)


def render_settings(opt) -> RenderSettings:
    return RenderSettings(
        bound=opt.bound,
        min_near=opt.min_near,
        num_steps=opt.num_steps,
        upsample_steps=opt.upsample_steps,
        train_conf=bool(opt.train_conf),
        soft_mask=opt.soft_mask,
        conf_thr=opt.conf_thr,
        detach_bg=opt.detach_bg,
        detach_mask_from_field=opt.detach_mask_from_field,
    )


class Trainer:
    def __init__(self, name, opt, field: Optional[NeRFField] = None,
                 guidance=None, workspace: Optional[str] = None,
                 use_checkpoint: Optional[str] = None):
        self.name = name
        self.opt = opt
        self.workspace = workspace or opt.workspace
        self.guidance = guidance
        self.field = field or build_field(opt)
        self.settings = render_settings(opt)
        self.mesh = make_mesh(opt.mesh_shape)

        # --- rng ---------------------------------------------------------
        # key-split order per step (documented RNG discipline, SURVEY.md §7):
        #   root → (epoch_key per step) → [perturb/pdf key, bg-color key,
        #   LGIE gate key, timestep key, noise key]
        self.root_key = jax.random.PRNGKey(opt.seed)
        self._np_rng = np.random.RandomState(opt.seed)

        # --- params ------------------------------------------------------
        self.params = self.field.init_params(jax.random.PRNGKey(opt.seed))

        # --- optimizer: per-group lr, per-step decay -----------------------
        base_lr, iters = opt.lr, opt.iters

        def sched(scale):
            return lambda step: scale * base_lr * (0.1 ** jnp.minimum(step / iters, 1.0))

        def label_tree(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: "grid"
                if any(getattr(p, "key", None) == "grid_table" for p in path)
                else "mlp",
                params,
            )

        def adam(lr_fn):
            tx = optax.chain(
                optax.zero_nans(),  # a NaN batch must not poison Adam state
                optax.scale_by_adam(b1=0.9, b2=0.99, eps=1e-15),
                optax.scale_by_learning_rate(lr_fn),
            )
            if opt.weight_decay:
                tx = optax.chain(optax.add_decayed_weights(opt.weight_decay), tx)
            return tx

        self.tx = optax.multi_transform(
            {"grid": adam(sched(10.0)), "mlp": adam(sched(1.0))}, label_tree
        )
        self.opt_state = self.tx.init(self.params)
        self.lr_fn = sched(1.0)

        # --- occupancy grid (the -O / cuda_ray fast path) --------------------
        self.occ_state = None
        if opt.cuda_ray:
            from customnerf_tpu.ops.occupancy import init_state
            self.occ_state = init_state(opt.cascade,
                                        grid_size=opt.occ_grid_size)

        # --- bookkeeping ---------------------------------------------------
        self.epoch = 0
        self.global_step = 0
        self.stats = {"loss": [], "valid_loss": [], "results": [],
                      "checkpoints": [], "best_result": None}
        self.pt_dict = {}  # editing: cached frozen-model renders per img_path

        os.makedirs(self.workspace, exist_ok=True)
        self.ckpt_path = os.path.join(self.workspace, "checkpoints")
        os.makedirs(self.ckpt_path, exist_ok=True)
        self.log_path = os.path.join(self.workspace, f"log_{name}.txt")
        self._log_ptr = open(self.log_path, "a+")
        self._writer = None

        self.log(f"[INFO] Trainer: {name} | {time.strftime('%Y-%m-%d_%H-%M-%S')} | "
                 f"{jax.devices()[0].platform} | "
                 f"{'bf16' if opt.fp16 else 'fp32'} | {self.workspace}")
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(self.params))
        self.log(f"[INFO] #parameters: {n_params}")

        # --- checkpoint policy (utils_init_nerf.py:136-150) -----------------
        use_checkpoint = use_checkpoint if use_checkpoint is not None else opt.use_ckpt
        if opt.editing_from:
            self.log(f"[INFO] Loading {opt.editing_from} ...")
            self._load(opt.editing_from, model_only=True)
        if use_checkpoint == "scratch":
            self.log("[INFO] Training from scratch ...")
        elif use_checkpoint == "latest":
            path = ckpt_io.latest_checkpoint(self.ckpt_path)
            if path:
                self.log(f"[INFO] Latest checkpoint is {path}")
                self._load(path)
            else:
                self.log("[WARN] No checkpoint found, model randomly initialized.")
        elif use_checkpoint == "latest_model":
            path = ckpt_io.latest_checkpoint(self.ckpt_path)
            if path:
                self._load(path, model_only=True)
        else:
            self.log(f"[INFO] Loading {use_checkpoint} ...")
            self._load(use_checkpoint)

        # --- editing mode: frozen pretrained copy + guidance ----------------
        self.params_pretrained = self.params
        if opt.pretrained:
            source = opt.editing_from or opt.use_ckpt
            if source and os.path.exists(str(source)):
                pre, _ = ckpt_io.load_checkpoint(source)
                self.params_pretrained = jax.tree_util.tree_map(jnp.asarray, pre)
            else:
                self.params_pretrained = jax.tree_util.tree_map(
                    lambda x: x, self.params)
            self.params_pretrained = jax.lax.stop_gradient(self.params_pretrained)
            self.log("[INFO] loaded pretrained (frozen) model.")

        if self.mesh is not None:
            self.params = replicate(self.mesh, self.params)
            self.opt_state = replicate(self.mesh, self.opt_state)

        self._compiled = {}

    # ------------------------------------------------------------------ log
    def log(self, *args):
        msg = " ".join(str(a) for a in args)
        print(msg)
        if self._log_ptr:
            print(msg, file=self._log_ptr)
            self._log_ptr.flush()

    @property
    def writer(self):
        if self._writer is None:
            try:
                import tensorboardX
                self._writer = tensorboardX.SummaryWriter(
                    os.path.join(self.workspace, "run", self.name))
            except Exception:
                self._writer = False
        return self._writer or None

    # --------------------------------------------------- occupancy refresh
    def update_extra_state(self):
        """Refresh the occupancy grid (reference update_extra_state,
        renderer.py:1659-1717; cadence utils_init_nerf.py:602-607)."""
        from customnerf_tpu.ops.occupancy import update_grid
        field, params, opt = self.field, self.params, self.opt
        if "occ_update" not in self._compiled:
            @jax.jit
            def occ_update(state, params, key):
                density_fn = lambda pts: field.apply(params, pts,
                                                     method=field.density)
                return update_grid(state, density_fn, opt.bound,
                                   opt.density_thresh, key)
            self._compiled["occ_update"] = occ_update
        self.root_key, key = jax.random.split(self.root_key)
        self.occ_state = self._compiled["occ_update"](self.occ_state, params, key)
        # occ_state changed without a step advance (the epoch loop refreshes
        # BEFORE stepping) — a save right after must not persist the
        # pre-refresh grid from the step-keyed cache
        self._host_state_cache = None

    def _render_fn(self):
        """Bound renderer closure: dense two-pass or occupancy fast path;
        optional Pallas fused-MLP backend (--backend pallas)."""
        opt, s, field = self.opt, self.settings, self.field
        use_pallas = opt.backend == "pallas"

        def apply_fns(p):
            if not use_pallas:
                return None
            from customnerf_tpu.models.field import make_pallas_apply
            return make_pallas_apply(field, p)

        if opt.cuda_ray:
            from customnerf_tpu.models.renderer import render_rays_fast

            n_total = max(opt.num_steps + opt.upsample_steps, 2)

            def render(p, occ, o, d, key, train, perturb, bg_color=None):
                # training jitters candidates, so 2× oversampling suffices;
                # eval renders are deterministic and must not step over thin
                # surface shells into unsupervised interior points — march at
                # the reference's inference budget (max_steps candidates ≈
                # dt 2√3/max_steps, raymarching.cu:345-346 / march_rays),
                # or --eval_march_candidates when set (quality-gated
                # coarser eval march)
                n_eval = (int(opt.eval_march_candidates)
                          or max(opt.max_steps, n_total * 2))
                n_coarse = n_total * 2 if train else max(n_eval, n_total * 2)
                return render_rays_fast(
                    field, p, o, d, occ, key, s,
                    n_coarse=n_coarse,
                    n_keep=n_total,
                    train=train, perturb=perturb, bg_color=bg_color,
                    apply_fns=apply_fns(p),
                    # -1 = auto: off until _autotune_compaction measures the
                    # slab fill on the warmed-up grid and rewrites the flag
                    compact_frac=max(opt.compact_frac, 0.0),
                    compact_block=opt.compact_block,
                    # editing graphs (render+VAE+UNet, full-image rays)
                    # cannot afford the saved one-hot residuals — remat the
                    # compacted eval there; recon keeps the saved-residual
                    # fast path (see renderer.render_rays_fast docstring)
                    compact_remat=opt.pretrained,
                    compact_layout=opt.compact_layout)
        else:
            def render(p, occ, o, d, key, train, perturb, bg_color=None):
                return render_rays(field, p, o, d, key, s, train=train,
                                   perturb=perturb, bg_color=bg_color,
                                   apply_fns=apply_fns(p))
        return render

    # ----------------------------------------------------------- train step
    def _pretrain_step_fn(self):
        """Build the jitted reconstruction step (render+loss+grad+update)."""
        opt, tx = self.opt, self.tx
        batch_rays = int(opt.batch_rays)
        render = self._render_fn()

        @jax.jit
        def step(params, opt_state, occ, rgbs, mask, rays_o, rays_d, key):
            key_sel, key_render = jax.random.split(key)
            if batch_rays:
                n = rays_o.shape[0]
                sel = jax.random.permutation(key_sel, n)[:batch_rays]
                rgbs, mask = rgbs[sel], mask[sel]
                rays_o, rays_d = rays_o[sel], rays_d[sel]

            def loss_fn(p):
                out = render(p, occ, rays_o, rays_d, key_render,
                             train=True, perturb=True)
                loss_c = opt.train_rgb * jnp.mean((out["image"] - rgbs) ** 2)
                loss = loss_c
                aux = {"loss_c": loss_c}
                if opt.train_conf:
                    loss_m = opt.train_conf * jnp.mean(
                        (out["render_mask"][..., 0] - mask) ** 2)
                    loss = loss + loss_m
                    aux["loss_m"] = loss_m
                return loss, aux

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, aux

        return step

    def _multi_step_fn(self):
        """K train steps per dispatch via lax.scan over pre-stacked batches —
        amortizes host→device dispatch latency (a TPU-tunnel reality the
        reference never faced; ``--steps_per_dispatch``)."""
        opt, tx = self.opt, self.tx
        batch_rays = int(opt.batch_rays)
        render = self._render_fn()

        @jax.jit
        def many(params, opt_state, occ, rgbs_k, mask_k, rays_o_k, rays_d_k,
                 keys):
            def body(carry, inp):
                params, opt_state = carry
                rgbs, mask, rays_o, rays_d, key = inp
                # same split order as the single-step path (RNG parity)
                key_sel, key_render = jax.random.split(key)
                if batch_rays:
                    # same --batch_rays subsample as _pretrain_step_fn —
                    # multi-step dispatch must not silently change batch
                    # semantics (ADVICE r2)
                    n = rays_o.shape[0]
                    sel = jax.random.permutation(key_sel, n)[:batch_rays]
                    rgbs, mask = rgbs[sel], mask[sel]
                    rays_o, rays_d = rays_o[sel], rays_d[sel]

                def loss_fn(p):
                    out = render(p, occ, rays_o, rays_d, key_render,
                                 train=True, perturb=True)
                    loss_c = opt.train_rgb * jnp.mean((out["image"] - rgbs) ** 2)
                    loss = loss_c
                    aux = {"loss_c": loss_c}
                    if opt.train_conf:
                        loss_m = opt.train_conf * jnp.mean(
                            (out["render_mask"][..., 0] - mask) ** 2)
                        loss = loss + loss_m
                        aux["loss_m"] = loss_m
                    return loss, aux

                (loss, aux), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), (loss, aux)

            (params, opt_state), (losses, auxes) = jax.lax.scan(
                body, (params, opt_state),
                (rgbs_k, mask_k, rays_o_k, rays_d_k, keys))
            return params, opt_state, losses, auxes

        return many

    def train_many(self, batches, keys):
        """Run len(batches) reconstruction steps in ONE device dispatch."""
        if "multi" not in self._compiled:
            self._compiled["multi"] = self._multi_step_fn()
        many = self._compiled["multi"]
        rgbs = jnp.stack([b.rgbs.reshape(-1, 3) for b in batches])
        mask = jnp.stack([b.mask.reshape(-1) for b in batches])
        rays_o = jnp.stack([b.rays_o for b in batches])
        rays_d = jnp.stack([b.rays_d for b in batches])
        if (self.mesh is not None and "data" in self.mesh.axis_names
                and not self.opt.batch_rays):
            # steps stacked on axis 0, rays sharded across the mesh on axis 1
            # (--batch_rays gathers a random subset inside the step, which
            # would defeat the static sharding — same opt-out as train_step)
            from jax.sharding import NamedSharding, PartitionSpec as P
            sh = NamedSharding(self.mesh, P(None, "data"))
            rgbs, mask, rays_o, rays_d = (
                jax.device_put(x, sh) for x in (rgbs, mask, rays_o, rays_d))
        self.params, self.opt_state, losses, auxes = many(
            self.params, self.opt_state, self.occ_state, rgbs, mask,
            rays_o, rays_d, jnp.stack(keys))
        return losses, auxes

    def train_step(self, batch, key):
        if self.opt.pretrained:
            return self.train_step_editing(batch, key)
        if "pretrain" not in self._compiled:
            self._compiled["pretrain"] = self._pretrain_step_fn()
        step = self._compiled["pretrain"]
        rays_o, rays_d = batch.rays_o, batch.rays_d
        rgbs = batch.rgbs.reshape(-1, 3)
        mask = batch.mask.reshape(-1)
        if self.mesh is not None and not self.opt.batch_rays:
            rgbs, mask, rays_o, rays_d = shard_batch(
                self.mesh, (rgbs, mask, rays_o, rays_d))
        self.params, self.opt_state, loss, aux = step(
            self.params, self.opt_state, self.occ_state, rgbs, mask,
            rays_o, rays_d, key)
        # device scalars returned as-is: the epoch loop converts lazily so a
        # step costs ONE dispatch (no per-step host sync on the TPU tunnel)
        return loss, aux

    def train_step_editing(self, batch, key):
        from customnerf_tpu.engine.editing import editing_step
        return editing_step(self, batch, key)

    # ----------------------------------------------------------- train loop
    def train(self, train_loader, valid_loader, max_epochs: int):
        start_t = time.time()
        self.save_checkpoint(full=True)
        profile_epoch = self.epoch + 1 if self.opt.profile else None
        if self.opt.profile:
            # xplane trace of the first epoch (SURVEY.md §5.1: the reference
            # has no profiler; JAX gives us one for free)
            jax.profiler.start_trace(os.path.join(self.workspace, "profile"))
        for epoch in range(self.epoch + 1, max_epochs + 1):
            self.epoch = epoch
            self.train_one_epoch(train_loader)
            if self.opt.profile and epoch == profile_epoch:
                try:
                    jax.profiler.stop_trace()
                except Exception:
                    pass
                object.__setattr__(self.opt, "profile", False)
            if epoch % self.opt.eval_interval == 0:
                self.save_checkpoint(full=True)
                self.evaluate_one_epoch(valid_loader)
                self.save_checkpoint(full=True)
        if hasattr(self, "_orbax_saver"):
            self._orbax_saver.wait()  # don't exit with a half-flushed ckpt
        self.log(f"[INFO] training takes {(time.time() - start_t) / 60:.4f} minutes.")

    # -------------------------------------------- compaction auto-tune
    def measure_slab_fill(self, batch):
        """Mean fraction of live slots in the fast path's [N, n_keep] slab
        for one batch — the quantity compaction exploits (docs/PERF.md
        measured 31.8% on the trained bear grid)."""
        from customnerf_tpu.ops.occupancy import march_rays_occupancy
        from customnerf_tpu.ops.ray import near_far_from_aabb
        opt = self.opt
        n_total = max(opt.num_steps + opt.upsample_steps, 2)

        if "fill_probe" not in self._compiled:
            @jax.jit
            def probe(occ, o, d, key):
                aabb = jnp.asarray([-opt.bound] * 3 + [opt.bound] * 3,
                                   jnp.float32)
                nears, fars = near_far_from_aabb(o, d, aabb, opt.min_near)
                miss = nears >= fars
                _, valid, _ = march_rays_occupancy(
                    occ, o, d, jnp.where(miss, 0.0, nears),
                    jnp.where(miss, 1.0, fars), key, opt.bound,
                    n_coarse=n_total * 2, n_keep=n_total, perturb=True)
                return (valid & ~miss[:, None]).mean()
            self._compiled["fill_probe"] = probe

        self.root_key, key = jax.random.split(self.root_key)
        return float(self._compiled["fill_probe"](
            self.occ_state, jnp.asarray(batch.rays_o),
            jnp.asarray(batch.rays_d), key))

    def _autotune_compaction(self, loader):
        """``--compact_frac -1``: size the compaction budget from the
        MEASURED slab fill once the occupancy grid is warmed up — the
        static-shape analog of the reference's mean_count-adaptive march
        buffer (raymarching/raymarching.py:196-233).  One-shot: re-jits the
        train/render programs once, then leaves frac fixed."""
        from customnerf_tpu.ops.occupancy import WARMUP_UPDATES
        if self.occ_state is None:
            self.opt.compact_frac = 0.0
            return
        if int(jax.device_get(self.occ_state.iter_density)) <= WARMUP_UPDATES:
            return  # grid still everywhere-occupied; keep compaction off
        batch = loader.item(0) if hasattr(loader, "item") else next(iter(loader))
        fill = self.measure_slab_fill(batch)
        # 1.3× headroom over the mean: blocks above the mean fall back to
        # the exactness-preserving even-stride subsample (quality-gated at
        # the flagship's 0.4/0.32 ≈ 1.25 margin).  Dense slabs (>60%) gain
        # nothing from pack/unpack matmuls — disable instead.
        frac = 0.0 if fill > 0.6 else float(min(1.0, max(0.05, fill * 1.3)))
        if frac > 0.0:
            # Snap the implied per-block budget to the NEAREST 128-lane
            # multiple: block_budget() ceils, which at e.g. G=32·K=40
            # silently inflates 1.3× headroom to ~1.6× (fill 0.32 → frac
            # 0.41 → budget 640 vs the quality-gated 512).  Never snap
            # below 1.1× fill — that margin is what the overflow fallback's
            # quality gating assumed.
            n_total = max(self.opt.num_steps + self.opt.upsample_steps, 2)
            gk = self.opt.compact_block * n_total
            snapped = max(128, int(round(frac * gk / 128.0)) * 128)
            if snapped < fill * 1.1 * gk:
                snapped = max(128, -(-int(np.ceil(frac * gk)) // 128) * 128)
            frac = float(min(1.0, snapped / gk))
        self.log(f"[INFO] compaction auto-tune: measured slab fill "
                 f"{fill:.3f} → --compact_frac {frac:.3f}")
        self.opt.compact_frac = frac
        for k in ("pretrain", "multi", "render_frame", "editing",
                  "editing_many", "fill_probe"):
            self._compiled.pop(k, None)

    def train_one_epoch(self, loader):
        if self.opt.cuda_ray and self.opt.compact_frac == -1:
            self._autotune_compaction(loader)
        lr_now = float(self.lr_fn(self.global_step))
        self.log(f"==> Start Training {self.workspace} Epoch {self.epoch}, "
                 f"lr={lr_now:.6f} ...")
        # (first_global_step, n_steps, aux pytree) per DISPATCH — values are
        # [n_steps]-stacked device arrays (scan paths) or 0-d scalars
        pending = []
        spd = int(self.opt.steps_per_dispatch)
        if spd <= 0:  # auto: amortize dispatch latency on accelerators
            spd = 1 if jax.devices()[0].platform == "cpu" else 8
        if spd > 1 and not self.opt.pretrained:
            batches = list(loader)
            for i in range(0, len(batches), spd):
                group = batches[i:i + spd]
                if (self.opt.cuda_ray and self.global_step
                        % self.opt.update_extra_interval < len(group)):
                    self.update_extra_state()
                keys = []
                for _ in group:
                    self.root_key, k = jax.random.split(self.root_key)
                    keys.append(k)
                losses, auxes = self.train_many(group, keys)
                pending.append((self.global_step + 1, len(group), auxes))
                self.global_step += len(group)
        elif spd > 1 and self.opt.pretrained:
            # fused scanned editing: K steps per dispatch (editing analog of
            # the recon path above; see editing.editing_steps_many)
            from customnerf_tpu.engine.editing import editing_steps_many
            batches = list(loader)
            for i in range(0, len(batches), spd):
                group = batches[i:i + spd]
                if (self.opt.cuda_ray and self.global_step
                        % self.opt.update_extra_interval < len(group)):
                    self.update_extra_state()
                keys = []
                for _ in group:
                    self.root_key, k = jax.random.split(self.root_key)
                    keys.append(k)
                losses, auxes = editing_steps_many(self, group, keys)
                pending.append((self.global_step - len(group) + 1,
                                len(group), auxes))
        else:
            for batch in loader:
                if (self.opt.cuda_ray
                        and self.global_step % self.opt.update_extra_interval == 0):
                    self.update_extra_state()
                self.global_step += 1
                self.root_key, key = jax.random.split(self.root_key)
                _, loss_dict = self.train_step(batch, key)
                pending.append((self.global_step, 1, loss_dict))

        # ONE host transfer per dispatch: a float() per scalar costs a full
        # tunnel RTT each (~100-300 RTTs/epoch used to dominate real wall
        # time — measured ~37 s/epoch overhead vs ~2 s of train steps on
        # the bear runs).  device_get pulls each dispatch's stacked aux
        # tree in one go; the per-step bookkeeping below is pure numpy.
        total_loss, n_steps = 0.0, 0
        base_lr, iters = self.opt.lr, self.opt.iters
        for gstart, k, aux in pending:
            aux_h = jax.device_get(aux)
            for j in range(k):
                gstep = gstart + j
                loss_val = float(sum(
                    np.asarray(v).reshape(-1)[j] if np.asarray(v).size > 1
                    else float(np.asarray(v)) for v in aux_h.values()))
                total_loss += loss_val
                n_steps += 1
                if self.writer:
                    lr = base_lr * 0.1 ** min(gstep / iters, 1.0)  # host math
                    self.writer.add_scalar("train/loss", loss_val, gstep)
                    self.writer.add_scalar("train/lr", lr, gstep)
        avg = total_loss / max(n_steps, 1)
        self.stats["loss"].append(avg)
        self.log(f"==> Finished Epoch {self.epoch}. average_loss {avg}")

    # --------------------------------------------------------------- render
    def render_image(self, rays_o, rays_d, perturb=False, bg_color=None,
                     params=None):
        """Full-frame render, chunked over rays to bound memory (the staged
        path; reference --max_ray_batch, renderer.py:1749-1765).

        The chunk loop runs ON DEVICE (``lax.map`` over chunk rows): one
        dispatch per FRAME instead of one per chunk — through the 100-250 ms
        tunnel a 30-chunk eval frame used to pay 30 RTTs of latency, which
        dominated the bear run's eval/test wall time."""
        params = self.params if params is None else params
        chunk = int(self.opt.max_ray_batch)
        N = rays_o.shape[0]
        if "render_frame" not in self._compiled:
            render = self._render_fn()

            @partial(jax.jit, static_argnames=("perturb", "use_bg"))
            def render_frame(p, occ, o_rows, d_rows, keys, bg, perturb=False,
                             use_bg=False):
                def body(args):
                    o, d, key = args
                    out = render(p, occ, o, d, key, train=False,
                                 perturb=perturb,
                                 bg_color=bg if use_bg else None)
                    keep = {k: out[k] for k in
                            ("image", "depth", "weights_sum") if k in out}
                    if "render_mask" in out:
                        keep["render_mask"] = out["render_mask"]
                    for side in ("fg", "bg"):
                        if side in out:
                            keep[side] = {"image": out[side]["image"],
                                          "depth": out[side]["depth"],
                                          "weights_sum": out[side]["weights_sum"]}
                    return keep

                return jax.lax.map(body, (o_rows, d_rows, keys))

            self._compiled["render_frame"] = render_frame
        render_frame = self._compiled["render_frame"]

        pad = (-N) % chunk
        if pad:
            rays_o = jnp.concatenate([rays_o, jnp.broadcast_to(rays_o[-1:], (pad, 3))])
            rays_d = jnp.concatenate([rays_d, jnp.broadcast_to(rays_d[-1:], (pad, 3))])
        use_bg = bg_color is not None
        bg = jnp.asarray(bg_color, jnp.float32) if use_bg else jnp.zeros((3,))
        n_chunks = (N + pad) // chunk
        o_rows = rays_o.reshape(n_chunks, chunk, 3)
        d_rows = rays_d.reshape(n_chunks, chunk, 3)
        self.root_key, key = jax.random.split(self.root_key)
        keys = jax.random.split(key, n_chunks)
        if self.mesh is not None:
            # eval/test rendering is data-parallel too: each chunk row's rays
            # split across the mesh (the reference's DDP eval all_gather
            # analog, utils_init_nerf.py:709-726 — here XLA gathers)
            from jax.sharding import NamedSharding, PartitionSpec as P
            sh = NamedSharding(self.mesh, P(None, "data"))
            o_rows = jax.device_put(o_rows, sh)
            d_rows = jax.device_put(d_rows, sh)
        merged = render_frame(params, self.occ_state, o_rows, d_rows, keys,
                              bg, perturb=perturb, use_bg=use_bg)
        merged = jax.tree_util.tree_map(
            lambda x: x.reshape(-1, *x.shape[2:])[:N], merged)
        return merged

    # ----------------------------------------------------------------- eval
    def evaluate_one_epoch(self, loader, name=None):
        self.log(f"++> Evaluate {self.workspace} at epoch {self.epoch} ...")
        name = name or f"{self.name}_ep{self.epoch:04d}"
        import cv2

        strips = []
        psnrs = []

        # pipeline: keep a few frame renders in flight so the next frame's
        # dispatch isn't serialized behind this frame's D2H fetch (one
        # tunnel RTT per frame otherwise)
        def _rendered_frames():
            window, inflight = 4, []
            for i, batch in enumerate(loader):
                if not self.opt.val_all_images and i >= 4:
                    break
                inflight.append(
                    (i, batch,
                     self.render_image(batch.rays_o, batch.rays_d)))
                if len(inflight) > window:
                    yield inflight.pop(0)
            yield from inflight

        for i, batch, out_dev in _rendered_frames():
            H, W = batch.H, batch.W
            out = fetch_tree(out_dev)
            gt = np.asarray(batch.rgbs).reshape(H, W, 3)
            rgb = np.asarray(out["image"]).reshape(H, W, 3)
            mse = float(np.mean((rgb - gt) ** 2))
            psnrs.append(-10.0 * np.log10(max(mse, 1e-10)))
            depth = np.asarray(out["depth"]).reshape(H, W, 1).repeat(3, -1)
            ims = [gt, rgb, depth]
            if self.opt.train_conf and "render_mask" in out:
                gt_mask = np.asarray(batch.mask).reshape(H, W, 1).repeat(3, -1)
                pm = np.asarray(out["render_mask"]).reshape(H, W, -1)
                pred_mask = pm.mean(-1, keepdims=True).repeat(3, -1)
                fg = np.asarray(out["fg"]["image"]).reshape(H, W, 3)
                bg = np.asarray(out["bg"]["image"]).reshape(H, W, 3)
                ims += [gt_mask, pred_mask, fg, bg]
            strip = np.concatenate(ims, axis=1)
            if self.opt.val_all_images:
                path = os.path.join(self.workspace, "validation_all", f"{i + 1}.png")
                os.makedirs(os.path.dirname(path), exist_ok=True)
                cv2.imwrite(path, cv2.cvtColor(
                    (np.clip(strip, 0, 1) * 255).astype(np.uint8), cv2.COLOR_RGB2BGR))
            else:
                strips.append(strip)

        if strips:
            path = os.path.join(self.workspace, "validation", f"{name}.png")
            os.makedirs(os.path.dirname(path), exist_ok=True)
            full = np.concatenate(strips, axis=0)
            cv2.imwrite(path, cv2.cvtColor(
                (np.clip(full, 0, 1) * 255).astype(np.uint8), cv2.COLOR_RGB2BGR))
            self.log(f"++> saved validation strip to {path}")
        mean_psnr = float(np.mean(psnrs)) if psnrs else 0.0
        self.log(f"++> eval PSNR: {mean_psnr:.2f} dB "
                 f"({[round(p, 2) for p in psnrs]})")
        if self.writer:
            self.writer.add_scalar("eval/psnr", mean_psnr, self.global_step)
        self.stats["valid_loss"].append(-mean_psnr)
        self.stats["results"].append(-mean_psnr)

        # best checkpoint → {name}.pth ('min' mode over results, i.e. max
        # PSNR here; reference utils_init_nerf.py:817-833)
        best = self.stats.get("best_result")
        if best is None or self.stats["results"][-1] < best:
            self.log(f"[INFO] New best result: {best} --> "
                     f"{self.stats['results'][-1]}")
            self.stats["best_result"] = self.stats["results"][-1]
            host_params, _, host_occ = self._host_state()
            # the best checkpoint is the one --test points at — it must
            # carry the occupancy grid too (ADVICE r3 medium)
            ckpt_io.save_checkpoint(
                os.path.join(self.ckpt_path, f"{self.name}.pth"),
                host_params, self.epoch, self.global_step,
                self.stats, extra=self._occ_extra(host_occ))

    def evaluate(self, loader, name=None):
        self.evaluate_one_epoch(loader, name)

    # ----------------------------------------------------------------- test
    def test(self, loader, save_path=None, name=None, write_video=True,
             split=None):
        import cv2

        save_path = save_path or os.path.join(self.workspace, "results")
        name = name or f"{self.name}_ep{self.epoch:04d}"
        if split:
            name = f"{name}_{split}"
        os.makedirs(os.path.join(save_path, name), exist_ok=True)
        self.log(f"==> Start Test, save results to {save_path}")

        all_preds = []
        clip_after, clip_before = [], []
        side_by_side = (self.opt.pretrained
                        and self.params_pretrained is not self.params)

        # pipeline frame dispatches ahead of the per-frame D2H fetch (same
        # sliding window as evaluate_one_epoch)
        def _rendered_frames():
            window, inflight = 4, []
            for i, batch in enumerate(loader):
                out_dev = self.render_image(batch.rays_o, batch.rays_d)
                # side-by-side with the frozen pretrained render
                # (utils_init_nerf.py:468-472)
                pt_dev = (self.render_image(batch.rays_o, batch.rays_d,
                                            params=self.params_pretrained)
                          if side_by_side else None)
                inflight.append((i, batch, out_dev, pt_dev))
                if len(inflight) > window:
                    yield inflight.pop(0)
            yield from inflight

        for i, batch, out_dev, pt_dev in _rendered_frames():
            H, W = batch.H, batch.W
            out = fetch_tree(out_dev)
            pred = np.asarray(out["image"]).reshape(H, W, 3)
            if self.opt.clip_metrics:
                clip_after.append(pred)
            if pt_dev is not None:
                pt = np.asarray(fetch_tree(pt_dev)["image"]).reshape(H, W, 3)
                if self.opt.clip_metrics:
                    clip_before.append(pt)
                pred = np.concatenate([pred, pt], axis=1)
            if (self.opt.train_conf and self.opt.render_all
                    and "render_mask" in out):
                # [rgb | pred_mask | fg | bg] strip (utils_init_nerf.py:474-481)
                pm = np.asarray(out["render_mask"]).reshape(H, W, -1)
                pm3 = pm.mean(-1, keepdims=True).repeat(3, -1)
                fg = np.asarray(out["fg"]["image"]).reshape(H, W, 3)
                bg = np.asarray(out["bg"]["image"]).reshape(H, W, 3)
                pred = np.concatenate([pred, pm3, fg, bg], axis=1)
            pred8 = (np.clip(pred, 0, 1) * 255).astype(np.uint8)
            cv2.imwrite(os.path.join(save_path, name, f"{i:03d}.png"),
                        cv2.cvtColor(pred8, cv2.COLOR_RGB2BGR))
            all_preds.append(pred8)

        if write_video and all_preds:
            video_path = os.path.join(save_path, f"{name}_rgb.mp4")
            try:
                h, w = all_preds[0].shape[:2]
                vw = cv2.VideoWriter(video_path,
                                     cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h))
                for frame in all_preds:
                    vw.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
                vw.release()
            except Exception as e:
                self.log(f"[WARN] mp4 write failed ({e}); PNGs saved.")
        if self.opt.clip_metrics and clip_after:
            self.report_clip_metrics(np.stack(clip_after),
                                     np.stack(clip_before) if clip_before
                                     else None, save_path, name)
        self.log("==> Finished Test.")

    def report_clip_metrics(self, after, before, save_path, name):
        """CLIP score / directional score over test renders (--clip_metrics).

        The CustomNeRF paper reports CLIP-family editing metrics (Table 1);
        the reference repo computes none — this is the rebuild's native
        evaluation hook (docs/ROADMAP.md framework #2).  ``after`` is the
        edited render stack [B,H,W,3]; ``before`` the frozen pretrained
        renders (present under --pretrained) for the directional score
        against --clip_ref_text → --text."""
        from customnerf_tpu.guidance.clip_view import (
            CLIPViewMatcher, clip_directional_score, clip_score)

        matcher = getattr(self, "clip_matcher", None)
        if matcher is None:
            if not self.opt.clip_weights and not self.opt.allow_random_guidance:
                self.log(
                    "[WARN] --clip_metrics without --clip_weights: scores "
                    "from a RANDOM CLIP are meaningless. Provide "
                    "--clip_weights (or force with --allow_random_guidance). "
                    "Skipping.")
                return None
            matcher = CLIPViewMatcher(weights_dir=self.opt.clip_weights)
            self.clip_matcher = matcher

        metrics = {"clip_score": clip_score(matcher, after, self.opt.text),
                   "text": self.opt.text, "n_views": int(len(after))}
        if before is not None and self.opt.clip_ref_text:
            metrics["clip_directional"] = clip_directional_score(
                matcher, before, after, self.opt.clip_ref_text, self.opt.text)
            metrics["ref_text"] = self.opt.clip_ref_text
        elif before is not None:
            self.log("[WARN] --clip_metrics: no --clip_ref_text given; "
                     "skipping the directional score.")

        line = " ".join(f"{k}={v:.4f}" for k, v in metrics.items()
                        if isinstance(v, float))
        self.log(f"==> CLIP metrics [{name}]: {line}")
        if self.writer:
            for k, v in metrics.items():
                if isinstance(v, float):
                    self.writer.add_scalar(f"test/{k}", v, self.global_step)
        import json
        path = os.path.join(save_path, f"{name}_clip_metrics.json")
        with open(path, "w") as f:
            json.dump(metrics, f, indent=1)
        self.log(f"==> wrote {path}")
        return metrics

    # ----------------------------------------------------------- checkpoint
    def _host_state(self):
        """Host copies of (params, opt_state), fetched ONCE per global_step.

        The train loop saves a full checkpoint up to three times per eval
        interval on IDENTICAL device state (ring save before eval, best save,
        ring save after eval — the reference's cadence,
        utils_init_nerf.py:492,501-506,817-833); through the tunnel each
        fetch costs seconds, so duplicate fetches dominated steady-state
        epoch wall time (docs/PERF.md "Full-run wall time")."""
        step = int(self.global_step)
        cached = getattr(self, "_host_state_cache", None)
        if cached is None or cached[0] != step:
            host_params, host_opt, host_occ = jax.device_get(
                (self.params, self.opt_state, self.occ_state))
            cached = (step, host_params, host_opt, host_occ)
            self._host_state_cache = cached
        return cached[1], cached[2], cached[3]

    @staticmethod
    def _occ_extra(host_occ):
        """Checkpoint extras for the occupancy state (reference cuda_ray
        parity, §5.4) — the reference persists density_grid/density_bitfield
        as model BUFFERS (nerf/renderer.py:235-236), so checkpoint-driven
        inference (--test, eval scripts, --editing_from's frozen render)
        marches the TRAINED occupancy, not a fresh grid (measured: a fresh
        grid costs ~3.6 dB on bear eval frames)."""
        if host_occ is None:
            return None
        return {"mean_density": float(host_occ.mean_density),
                "mean_count": 0,
                "density_grid": np.asarray(host_occ.density_grid),
                "density_bitfield": np.asarray(host_occ.bitfield),
                "iter_density": int(host_occ.iter_density)}

    def save_checkpoint(self, name=None, full=True):
        name = name or f"{self.name}_ep{self.epoch:04d}"
        use_orbax = self.opt.ckpt_format == "orbax"
        file_name = f"{name}.orbax" if use_orbax else f"{name}.pth"
        self.stats["checkpoints"].append(file_name)
        if use_orbax and hasattr(self, "_orbax_saver"):
            # a pruned ring entry may still be flushing asynchronously —
            # never rmtree a directory mid-commit
            self._orbax_saver.wait()
        ckpt_io.prune_ring(self.stats, self.ckpt_path, self.opt.max_keep_ckpt)
        if use_orbax:
            # the async saver is handed the DEVICE-side params/opt_state —
            # only the occ extras need a host fetch here (a full _host_state
            # pull would be a wasted blocking D2H of the whole state)
            host_occ = (jax.device_get(self.occ_state)
                        if self.occ_state is not None else None)
            extra = self._occ_extra(host_occ)
            if not hasattr(self, "_orbax_saver"):
                self._orbax_saver = ckpt_io.OrbaxSaver()
            self._orbax_saver.save(
                os.path.join(self.ckpt_path, file_name), self.params,
                self.epoch, self.global_step, self.stats,
                opt_state=self.opt_state if full else None, extra=extra)
            return
        host_params, host_opt, host_occ = self._host_state()
        extra = self._occ_extra(host_occ)
        ckpt_io.save_checkpoint(
            os.path.join(self.ckpt_path, file_name),
            host_params,
            self.epoch,
            self.global_step,
            self.stats,
            opt_state=host_opt if full else None,
            extra=extra,
        )

    def _load(self, path, model_only=False):
        if not path or not os.path.exists(str(path)):
            self.log(f"[WARN] checkpoint {path} not found.")
            return
        if str(path).endswith(".orbax"):
            if hasattr(self, "_orbax_saver"):
                self._orbax_saver.wait()  # don't read a half-written dir
            params, meta = ckpt_io.load_checkpoint_orbax(str(path),
                                                         self.opt_state)
        else:
            params, meta = ckpt_io.load_checkpoint(
                str(path), self.opt_state,
                conf_channels=2 if self.opt.keyword2 is not None else 1)
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self._host_state_cache = None  # device state replaced → stale cache
        self.log("[INFO] loaded model.")
        # occupancy grid is model state in the reference (buffers restored by
        # load_state_dict, utils_init_nerf.py:854-870) → restore it even for
        # model_only loads (--editing_from, latest_model)
        if meta:
            self._restore_occ_state(meta)
        if model_only or not meta:
            return
        self.epoch = meta.get("epoch", 0)
        self.global_step = meta.get("global_step", 0)
        if meta.get("stats"):
            self.stats = meta["stats"]
        if "opt_state" in meta:
            self.opt_state = meta["opt_state"]
            self.log("[INFO] loaded optimizer.")
        self.log(f"[INFO] load at epoch {self.epoch}, global step {self.global_step}")

    def _restore_occ_state(self, meta):
        """Rebuild self.occ_state from checkpoint meta so resumed/--test/
        --editing_from runs march the TRAINED occupancy grid (reference:
        density_grid/density_bitfield buffers via load_state_dict,
        nerf/utils_init_nerf.py:854-870)."""
        if not self.opt.cuda_ray or meta.get("density_grid") is None:
            return
        from customnerf_tpu.ops.occupancy import OccupancyState, packbits
        grid = jnp.asarray(np.asarray(meta["density_grid"]), jnp.float32)
        g = self.opt.occ_grid_size
        expect = (self.opt.cascade, g ** 3)
        if tuple(grid.shape) != expect:
            self.log(f"[WARN] checkpoint density_grid shape "
                     f"{tuple(grid.shape)} != configured {expect}; "
                     f"keeping the fresh grid.")
            return
        mean_density = jnp.float32(float(meta.get("mean_density", 0.0)))
        iter_density = jnp.int32(int(meta.get("iter_density", 16)))
        bitfield = meta.get("density_bitfield")
        if bitfield is not None:
            bitfield = jnp.asarray(np.asarray(bitfield), jnp.uint8)
        else:  # reference ckpts always carry it, but re-pack if absent
            bitfield = packbits(grid, jnp.minimum(mean_density,
                                                  self.opt.density_thresh))
        self.occ_state = OccupancyState(
            density_grid=grid, bitfield=bitfield, mean_density=mean_density,
            iter_density=iter_density, grid_size=g)
        self.log("[INFO] restored occupancy grid from checkpoint.")


def max_epochs_for(opt, loader_len: int) -> int:
    return int(math.ceil(opt.iters / max(loader_len, 1)))
