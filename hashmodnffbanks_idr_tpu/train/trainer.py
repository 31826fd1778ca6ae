"""IDR training runner — fully jitted train step, device-resident data.

TPU-native re-design of code/training/idr_train.py:13-359:
  * the whole step (pixel gather -> rays -> sphere trace -> second-order
    eikonal -> loss -> clipped Adam update) is ONE jitted function; per-epoch
    scalars (alpha, lr via schedule-on-count) are traced values so nothing
    re-compiles;
  * data is device-resident (uint8 RGB + bool masks), the per-epoch random
    pixel subset is gathered on device (parity: the reference draws one
    subset per epoch shared across images, idr_train.py:278 +
    scene_dataset.py:113-117);
  * trainable cameras use a faithful SparseAdam (per-row moments/step counts,
    idr_train.py:134-139) on the (V, 7) quaternion+translation table;
  * checkpoint/resume, alpha annealing, MultiStep LR, grad-clip 1.0 all
    mirror the reference's semantics.

Multi-chip: `shard_rays` places the pixel axis of each step's minibatch over
the 'data' mesh axis; params are replicated and psum'd implicitly by pjit.
See parallel/sharding.py.
"""

from __future__ import annotations

import os
import time
from datetime import datetime

from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..config.hocon import Config, parse_file
from ..data.scene_dataset import SceneDataset, rgb_to_pm1
from ..models.loss import IDRLossConfig, idr_loss
from ..models.renderer import IDRNetwork
from ..utils.logging import ScalarLogger
from ..utils.sampling import sample_pixels
from . import checkpoints as ckpt
from .schedule import annealed_alpha


# ---------------------------------------------------------------------------
# SparseAdam for camera pose rows (idr_train.py:136-139)
# ---------------------------------------------------------------------------

def sparse_adam_init(pose_vecs: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    return {
        "m": jnp.zeros_like(pose_vecs),
        "v": jnp.zeros_like(pose_vecs),
        "step": jnp.zeros((), dtype=jnp.int32),
    }


def sparse_adam_update(pose_vecs, grads, state, touched_rows, lr,
                       b1=0.9, b2=0.999, eps=1e-8):
    """torch SparseAdam semantics: moments advance only for rows that
    received gradients this step; the bias-correction step count is global
    (incremented every optimizer step) — golden-tested vs
    torch.optim.SparseAdam."""
    V = pose_vecs.shape[0]
    touched = jnp.zeros(V, dtype=bool).at[touched_rows].set(True)
    tcol = touched[:, None]
    step = state["step"] + 1
    m = jnp.where(tcol, b1 * state["m"] + (1 - b1) * grads, state["m"])
    v = jnp.where(tcol, b2 * state["v"] + (1 - b2) * grads**2, state["v"])
    stepf = step.astype(pose_vecs.dtype)
    mhat = m / (1 - b1**stepf)
    vhat = v / (1 - b2**stepf)
    upd = -lr * mhat / (jnp.sqrt(vhat) + eps)
    new_pose = pose_vecs + jnp.where(tcol, upd, 0.0)
    return new_pose, {"m": m, "v": v, "step": step}


# ---------------------------------------------------------------------------
# the jitted train step (shared by the runner and by __graft_entry__)
# ---------------------------------------------------------------------------

def build_train_step(model: IDRNetwork, loss_cfg: IDRLossConfig, optimizer,
                     train_cameras: bool = False, batch_size: int = 1,
                     lr_cam: float = 1e-4, mesh=None):
    """One fused train step: pixel gather -> render -> loss -> clipped Adam.

    When `mesh` is given, per-ray tensors get 'data'-axis sharding constraints
    and XLA SPMD inserts the gradient psums (parallel/sharding.py).
    """
    from ..parallel.sharding import constrain_rays

    B = batch_size

    def loss_fn(params, pose_vecs, scene, img_idx, pixel_idx, rng, alpha):
        uv = scene["uv"][pixel_idx][None].repeat(B, axis=0)        # (B, P, 2)
        mask = scene["mask"][img_idx][:, pixel_idx]                # (B, P)
        rgb_gt = rgb_to_pm1(scene["rgb"][img_idx][:, pixel_idx])   # (B, P, 3)
        if mesh is not None:
            uv = constrain_rays(jnp.swapaxes(uv, 0, 1), mesh).swapaxes(0, 1)
            mask = constrain_rays(jnp.swapaxes(mask, 0, 1), mesh).swapaxes(0, 1)
            rgb_gt = constrain_rays(jnp.swapaxes(rgb_gt, 0, 1), mesh).swapaxes(0, 1)
        if train_cameras:
            pose = pose_vecs[img_idx]                              # (B, 7)
        else:
            pose = scene["pose"][img_idx]                          # (B, 4, 4)
        inputs = {
            "uv": uv,
            "intrinsics": scene["intrinsics"][img_idx],
            "pose": pose,
            "object_mask": mask,
        }
        outputs = model.apply(params, inputs, rng, training=True)
        losses = idr_loss(loss_cfg, outputs, rgb_gt, alpha)
        if loss_cfg.tv_weight > 0.0:
            # grid TV regularizer at the traced surface cells; x only selects
            # cells (stop-grad), grads flow into the hash table — mirrors
            # torch-ngp's grad_total_variation-on-inputs call pattern
            # (gridencoder_torchngp/grid.py:173-196).
            tv = model.implicit_network.tv_loss(
                params["implicit_network"],
                jax.lax.stop_gradient(outputs["points"]))
            if tv is not None:
                losses = dict(losses)
                losses["tv_loss"] = tv
                losses["loss"] = losses["loss"] + loss_cfg.tv_weight * tv
        return losses["loss"], losses

    def step(state, scene, img_idx, pixel_idx, rng, alpha):
        params = state["params"]
        pose_vecs = state.get("pose_vecs")
        if train_cameras:
            (_, losses), (gp, gc) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(params, pose_vecs, scene, img_idx, pixel_idx, rng, alpha)
        else:
            (_, losses), gp = jax.value_and_grad(loss_fn, has_aux=True)(
                params, pose_vecs, scene, img_idx, pixel_idx, rng, alpha
            )
        updates, new_opt = optimizer.update(gp, state["opt_state"], params)
        new_params = optax.apply_updates(params, updates)
        new_state = dict(state)
        new_state["params"] = new_params
        new_state["opt_state"] = new_opt
        if train_cameras:
            new_pose, new_cam_opt = sparse_adam_update(
                pose_vecs, gc, state["cam_opt"], img_idx, lr_cam
            )
            new_state["pose_vecs"] = new_pose
            new_state["cam_opt"] = new_cam_opt
        return new_state, losses

    return jax.jit(step, donate_argnums=(0,))


# ---------------------------------------------------------------------------
# Runner
# ---------------------------------------------------------------------------

class IDRTrainRunner:
    def __init__(
        self,
        conf: str | Config,
        batch_size: int = 1,
        nepochs: int = 2000,
        expname: str = "",
        exps_folder_name: str = "exps",
        train_cameras: bool = False,
        scan_id: int = -1,
        is_continue: bool = False,
        timestamp: str = "latest",
        checkpoint: str = "latest",
        data_root: Optional[str] = None,
        seed: int = 42,
        log_tensorboard: bool = True,
        mesh: Optional[jax.sharding.Mesh] = None,
    ):
        from ..utils.compile_cache import enable_compile_cache

        enable_compile_cache()
        self.conf = parse_file(conf) if isinstance(conf, str) else conf
        self.batch_size = batch_size
        self.nepochs = nepochs
        self.train_cameras = train_cameras
        self.mesh = mesh

        # deviation from idr_train.py:35 (which *appends* kwargs['expname'] to
        # the conf name, yielding e.g. 'headtohead_oursheadtohead_ours_seed1'
        # when callers pass a full name): a non-empty --expname REPLACES the
        # conf expname
        self.expname = expname or self.conf.get_string("train.expname")
        if expname and expname != self.conf.get_string("train.expname"):
            # replacement semantics can silently orphan runs for workflows
            # that used to pass a suffix (ADVICE r4) — make it loud
            print(f"[expname] '--expname {expname}' REPLACES the conf "
                  f"expname '{self.conf.get_string('train.expname')}' "
                  f"(reference idr_train.py:35 would append)")
        if scan_id == -1:
            scan_id = self.conf.get_int("dataset.scan_id", -1)
        if scan_id != -1:
            self.expname += f"_{scan_id}"

        # experiment dirs (idr_train.py:63-90)
        self.exps_folder = exps_folder_name
        self.expdir = os.path.join(exps_folder_name, self.expname)
        resume_dir = None
        if is_continue and timestamp == "latest":
            if os.path.exists(self.expdir):
                stamps = sorted(os.listdir(self.expdir))
                if stamps:
                    resume_dir = os.path.join(self.expdir, stamps[-1])
        elif is_continue:
            resume_dir = os.path.join(self.expdir, timestamp)
        self.timestamp = "{:%Y_%m_%d_%H_%M_%S}".format(datetime.now())
        self.rundir = os.path.join(self.expdir, self.timestamp)
        self.plots_dir = os.path.join(self.rundir, "plots")
        self.checkpoints_path = os.path.join(self.rundir, "checkpoints")
        os.makedirs(self.plots_dir, exist_ok=True)
        os.makedirs(self.checkpoints_path, exist_ok=True)
        with open(os.path.join(self.rundir, "runconf.conf"), "w") as f:
            f.write(self.conf.dump())

        # data
        dataset_conf = dict(self.conf.get_config("dataset").data)
        if scan_id != -1:
            dataset_conf["scan_id"] = scan_id
        self.train_dataset = SceneDataset(train_cameras, data_root=data_root, **dataset_conf)
        self.n_images = len(self.train_dataset)
        self.total_pixels = self.train_dataset.total_pixels
        self.img_res = self.train_dataset.img_res

        # model / loss
        self.model = IDRNetwork(self.conf.get_config("model"))
        loss_conf = self.conf.get_config("loss").data
        self.loss_cfg = IDRLossConfig(
            eikonal_weight=loss_conf["eikonal_weight"],
            mask_weight=loss_conf["mask_weight"],
            alpha=loss_conf["alpha"],
            tv_weight=float(loss_conf.get("tv_weight", 0.0)),
        )

        # schedules
        self.lr = self.conf.get_float("train.learning_rate")
        self.sched_milestones = self.conf.get_list("train.sched_milestones", [])
        self.sched_factor = self.conf.get_float("train.sched_factor", 0.0)
        self.alpha_milestones = self.conf.get_list("train.alpha_milestones", [])
        self.alpha_factor = self.conf.get_float("train.alpha_factor", 0.0)
        self.num_pixels = self.conf.get_int("train.num_pixels")
        self.plot_freq = self.conf.get_int("train.plot_freq")
        self.plot_conf = self.conf.get_config("plot")

        self.steps_per_epoch = max(self.n_images // self.batch_size, 1)
        ms = np.asarray(self.sched_milestones, dtype=np.int64) * self.steps_per_epoch

        def lr_sched(count):
            if len(self.sched_milestones) == 0:
                return self.lr
            n = jnp.sum(count >= jnp.asarray(ms))
            return self.lr * (self.sched_factor ** n)

        self.optimizer = optax.chain(
            optax.clip_by_global_norm(1.0),  # idr_train.py:306
            optax.adam(learning_rate=lr_sched),
        )

        # init state
        key = jax.random.PRNGKey(seed)
        key, k_model = jax.random.split(key)
        self.rng = key
        params = self.model.init(k_model)
        opt_state = self.optimizer.init(params)
        state: Dict[str, Any] = {"params": params, "opt_state": opt_state, "epoch": 0}
        if train_cameras:
            pose_vecs = jnp.asarray(self.train_dataset.get_pose_init())
            state["pose_vecs"] = pose_vecs
            state["cam_opt"] = sparse_adam_init(pose_vecs)
            self.lr_cam = self.conf.get_float("train.learning_rate_cam", 1e-4)

        self.start_epoch = 0
        if resume_dir is not None and ckpt.latest_exists(os.path.join(resume_dir, "checkpoints")):
            loaded = ckpt.load_checkpoint(
                os.path.join(resume_dir, "checkpoints"), checkpoint, template=state
            )
            self.start_epoch = int(loaded.pop("epoch", 0))
            state.update({k: loaded[k] for k in loaded if k in state or k in ("pose_vecs", "cam_opt")})
        self.state = state

        # device-resident scene tensors
        self.scene = {k: jnp.asarray(v) for k, v in self.train_dataset.device_arrays().items()}

        self.logger = ScalarLogger(os.path.join(self.rundir, "logs"),
                                   use_tensorboard=log_tensorboard)
        self._step_fn = self._build_step()

    # ------------------------------------------------------------------
    def _build_step(self):
        return build_train_step(
            self.model, self.loss_cfg, self.optimizer,
            train_cameras=self.train_cameras, batch_size=self.batch_size,
            lr_cam=getattr(self, "lr_cam", 1e-4), mesh=self.mesh,
        )

    # ------------------------------------------------------------------
    def run(self):
        print(f"training {self.expname} for {self.nepochs} epochs "
              f"({self.steps_per_epoch} steps/epoch, {self.num_pixels} rays/step)")
        state = self.state
        step_count = self.start_epoch * self.steps_per_epoch
        for epoch in range(self.start_epoch, self.nepochs + 1):
            alpha = annealed_alpha(self.loss_cfg.alpha, self.alpha_milestones,
                                   self.alpha_factor, epoch)
            if epoch % 25 == 0:
                ckpt.save_checkpoint(self.checkpoints_path, epoch, state)
            if self.plot_freq and epoch % self.plot_freq == 0 and epoch > 0:
                try:
                    self._plot(state, epoch)
                except Exception as e:  # plotting must never kill training
                    print(f"[plot @{epoch}] failed: {e}")

            # one pixel subset per epoch (idr_train.py:278); sample_pixels is
            # the fast exact equivalent of randperm[:n] (utils/sampling.py)
            self.rng, k_pix, k_perm = jax.random.split(self.rng, 3)
            pixel_idx = sample_pixels(k_pix, self.total_pixels, self.num_pixels)
            order = np.asarray(jax.random.permutation(k_perm, self.n_images))

            t0 = time.time()
            losses = None
            for i in range(self.steps_per_epoch):
                img_idx = jnp.asarray(order[i * self.batch_size:(i + 1) * self.batch_size],
                                      dtype=jnp.int32)
                self.rng, k_step = jax.random.split(self.rng)
                state, losses = self._step_fn(
                    state, self.scene, img_idx, pixel_idx, k_step,
                    jnp.asarray(alpha, dtype=jnp.float32),
                )
                step_count += 1
                if i % 8 == 7:
                    # periodic host readback: keeps the async queue shallow
                    # (very deep unsynced queues degrade this runtime)
                    float(losses["loss"])
            if losses is not None:
                # one batched device->host transfer: per-scalar float(v)
                # costs a full tunnel round-trip EACH on this remote-TPU
                # runtime (~0.5 s/epoch of pure RTT at 6 scalars)
                host_losses = {k: float(v)
                               for k, v in jax.device_get(losses).items()}
                dt = time.time() - t0
                rays_per_s = self.steps_per_epoch * self.num_pixels / dt
                self.logger.log(epoch, rays_per_s=rays_per_s, alpha=alpha, **host_losses)
                if epoch % 10 == 0:
                    print(f"[{epoch}] loss={host_losses['loss']:.5f} "
                          f"rgb={host_losses['rgb_loss']:.5f} "
                          f"eik={host_losses['eikonal_loss']:.5f} "
                          f"mask={host_losses['mask_loss']:.6f} "
                          f"rays/s={rays_per_s:.0f}")
        ckpt.save_checkpoint(self.checkpoints_path, self.nepochs, state)
        self.state = state
        self.logger.close()
        return state

    # ------------------------------------------------------------------
    def validation_loss_slope(self, out_path: Optional[str] = None):
        """Mean-loss-per-epoch slope plot (idr_train.py:340-359 role), from
        the run's scalars.jsonl; falls back to printing when matplotlib is
        unavailable."""
        import json as _json

        log_path = os.path.join(self.rundir, "logs", "scalars.jsonl")
        rows = [(_json.loads(l)) for l in open(log_path)] if os.path.exists(log_path) else []
        if not rows:
            return None
        steps = [r["step"] for r in rows]
        losses = [r.get("loss", float("nan")) for r in rows]
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            embed_type = self.conf.get_string("model.embedding_network.embed_type", "none")
            plt.figure()
            plt.plot(steps, losses,
                     label=f"IDR with {embed_type} Embedding Network Loss")
            plt.xlabel("Epochs")
            plt.ylabel("Loss")
            plt.legend()
            out = out_path or os.path.join(
                self.plots_dir, f"loss_plot_{embed_type}_EpochStamp{steps[-1]}.png")
            plt.savefig(out)
            plt.close()
            return out
        except ImportError:
            print("validation slope:", list(zip(steps[-10:], losses[-10:])))
            return None

    # ------------------------------------------------------------------
    def _plot(self, state, epoch):
        """Per-plot-epoch artifacts (idr_train.py:231-273 role)."""
        from ..eval.evaluator import Evaluator
        from ..eval.plots import plot_epoch

        ev = getattr(self, "_plot_ev", None)
        if ev is None:
            ev = Evaluator(
                self.conf, state["params"], train_cameras=self.train_cameras,
                pose_vecs=state.get("pose_vecs"),
                dataset=self.train_dataset, tile=32768,
            )
            self._plot_ev = ev  # reuse the jitted render across plot epochs
        ev.params = state["params"]
        ev.pose_vecs = state.get("pose_vecs")
        # pick the plot view from the run RNG stream (stays reproducible
        # under resume because the stream is reseeded per epoch in run())
        self.rng, k_plot = jax.random.split(self.rng)
        idx = int(jax.random.randint(k_plot, (), 0, self.n_images))
        view = ev.render_view(idx)
        p_impl = state["params"]["implicit_network"]
        sdf_fn = lambda x: self.model.implicit_network.sdf(p_impl, x)
        plot_epoch(self.plots_dir, epoch, view, sdf_fn, self.train_dataset.pose_all,
                   resolution=self.plot_conf.get_int("resolution", 100))
