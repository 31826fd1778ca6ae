#!/usr/bin/env python
"""Head-to-head quality anchor: train the REFERENCE torch framework itself on
a shared scene, then evaluate it with the SAME metric stack used for our
framework (VERDICT round-2 item 1b).

The reference (mounted read-only at /root/reference) hardcodes '../data' /
'../exps' relative to its code/ directory and calls .cuda() throughout, so
this harness

  1. builds a writable sandbox: a symlink farm of code/ plus real data/ and
     exps/ siblings;
  2. installs CPU shims (cuda no-ops) and stubs for the deps absent in this
     environment (pyhocon -> our HOCON parser, skimage.img_as_float32,
     plotly/trimesh/torchvision never reached once plotting is stubbed);
  3. runs the reference's own IDRTrainRunner (training/idr_train.py:218-331)
     unmodified — its dataset, model, loss, optimizer, alpha/lr schedules;
  4. renders every view through the reference model's eval branch
     (evaluation/eval.py:132-205 protocol) and computes PSNR/SSIM/LPIPS with
     OUR metric functions (identical formulas, golden-tested), extracts the
     SDF zero level set with OUR marching-tets extractor, and writes
     metrics + mesh under --out.

Both frameworks are then compared on the same scene / conf / epoch budget /
metric code — only the framework differs.

    python scripts/reference_headtohead.py --scene data/dtu_shaped_small/scan0 \
        --conf hashmodnffbanks_idr_tpu/config/confs/headtohead_ref.conf \
        --nepoch 300 --out evals/headtohead_ref_0
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF_CODE = "/root/reference/code"


# ---------------------------------------------------------------------------
# stubs
# ---------------------------------------------------------------------------

class PyhoconShim(dict):
    """pyhocon ConfigTree API over a plain nested dict (what the reference's
    idr_train.py + model constructors consume).  A dict subclass so
    `**conf.get_config('loss')` and `conf['scan_id'] = v` both work."""

    _MISSING = object()

    def _lookup(self, path, default=_MISSING):
        cur = self
        for part in path.split("."):
            if not isinstance(cur, dict) or part not in cur:
                if default is not self._MISSING:
                    return default
                raise KeyError(path)
            cur = cur[part]
        return cur

    def get_string(self, path, default=_MISSING):
        return str(self._lookup(path, default))

    def get_int(self, path, default=_MISSING):
        return int(self._lookup(path, default))

    def get_float(self, path, default=_MISSING):
        return float(self._lookup(path, default))

    def get_bool(self, path, default=_MISSING):
        return bool(self._lookup(path, default))

    def get_list(self, path, default=_MISSING):
        return list(self._lookup(path, default))

    def get_config(self, path, default=_MISSING):
        v = self._lookup(path, default)
        return PyhoconShim(v) if isinstance(v, dict) else v


def install_stubs(code_path: str = REF_CODE):
    """Make the reference's import graph resolve in this environment."""
    if code_path not in sys.path:
        sys.path.insert(0, code_path)

    # pyhocon -> our HOCON parser (swept over the reference's confs in
    # tests/test_hocon.py)
    if "pyhocon" not in sys.modules:
        from hashmodnffbanks_idr_tpu.config import hocon

        m = types.ModuleType("pyhocon")

        class ConfigFactory:
            @staticmethod
            def parse_file(path):
                return PyhoconShim(hocon.parse_file(path).data)

        m.ConfigFactory = ConfigFactory
        sys.modules["pyhocon"] = m

    # skimage: only img_as_float32 is reached (utils/rend_util.py:9-22)
    try:
        import skimage  # noqa: F401
    except ImportError:
        import numpy as np

        m = types.ModuleType("skimage")

        def img_as_float32(img):
            img = np.asarray(img)
            if img.dtype == np.uint8:
                return (img / 255.0).astype(np.float32)
            if img.dtype == np.uint16:
                return (img / 65535.0).astype(np.float32)
            return img.astype(np.float32)

        m.img_as_float32 = img_as_float32
        # utils/plots.py does `from skimage import measure`; plotting itself
        # is stubbed, so an empty submodule suffices
        meas = types.ModuleType("skimage.measure")
        m.measure = meas
        sys.modules["skimage"] = m
        sys.modules["skimage.measure"] = meas

    # plotting deps: utils/plots.py imports these at module scope, but the
    # plot() call itself is replaced below (plot_freq rendering is not part
    # of the benchmark protocol)
    import importlib.machinery

    for name in ("plotly", "plotly.graph_objs", "plotly.offline", "trimesh",
                 "torchvision"):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                m = types.ModuleType(name)
                # a None __spec__ breaks importlib.util.find_spec probes in
                # unrelated libraries (e.g. datasets/config.py)
                m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
                sys.modules[name] = m
    if hasattr(sys.modules["plotly"], "graph_objs") is False:
        sys.modules["plotly"].graph_objs = sys.modules["plotly.graph_objs"]
        sys.modules["plotly"].offline = sys.modules["plotly.offline"]

    if "tinycudann" not in sys.modules:
        try:
            import tinycudann  # noqa: F401
        except ImportError:
            t = types.ModuleType("tinycudann")
            t.Encoding = object
            sys.modules["tinycudann"] = t

    # CPU shims: the reference calls .cuda()/torch.cuda.* unconditionally
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.cuda.empty_cache = lambda: None
    torch.cuda.manual_seed = lambda *a, **k: None
    torch.cuda.manual_seed_all = lambda *a, **k: None


def build_sandbox(sandbox: str, scene_dir: str, data_dir_name: str,
                  scan_id: int):
    """<sandbox>/code -> symlink farm of the reference code; data/ + exps/
    writable siblings (the reference resolves both relative to code/)."""
    code = os.path.join(sandbox, "code")
    if not os.path.isdir(code):
        os.makedirs(sandbox, exist_ok=True)
        # two-level farm: '..'-relative paths resolve to the sandbox (the
        # kernel resolves cwd physically, so a single symlinked code/ dir
        # would escape back to the read-only reference checkout).  Top-level
        # package dirs become REAL dirs with an __init__.py so they are
        # regular packages — the reference's namespace-package `datasets`
        # otherwise loses the sys.path scan to the installed HuggingFace
        # `datasets` (regular packages shadow namespace portions).
        os.makedirs(code)
        for entry in os.listdir(REF_CODE):
            src = os.path.join(REF_CODE, entry)
            dst = os.path.join(code, entry)
            if os.path.isdir(src):
                os.makedirs(dst)
                for sub in os.listdir(src):
                    os.symlink(os.path.join(src, sub), os.path.join(dst, sub))
                init = os.path.join(dst, "__init__.py")
                if not os.path.exists(init):
                    with open(init, "w"):
                        pass
            else:
                os.symlink(src, dst)
    dst = os.path.join(sandbox, "data", data_dir_name, f"scan{scan_id}")
    if not os.path.isdir(dst):
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copytree(scene_dir, dst)
    os.makedirs(os.path.join(sandbox, "exps"), exist_ok=True)
    return code


# ---------------------------------------------------------------------------
# evaluation with OUR metric stack
# ---------------------------------------------------------------------------

def eval_reference_model(runner, out_dir: str, mesh_resolution: int,
                         views=None):
    import numpy as np
    import torch

    sys.path.insert(0, REPO)
    from hashmodnffbanks_idr_tpu.eval.surface import get_surface_mesh
    from hashmodnffbanks_idr_tpu.eval.plots import write_ply
    from hashmodnffbanks_idr_tpu.models.metrics import (
        lpips_or_none, masked_psnr, ssim)

    import utils.general as utils  # reference

    os.makedirs(os.path.join(out_dir, "metrics"), exist_ok=True)
    model = runner.model
    model.eval()
    ds = runner.train_dataset
    ds.change_sampling_idx(-1)
    total_pixels = ds.total_pixels
    H, W = ds.img_res

    view_ids = list(views) if views else list(range(len(ds)))
    psnrs, ssims, lpipss = [], [], []
    for idx in view_ids:
        _, model_input, ground_truth = ds.collate_fn([ds[idx]])
        split = utils.split_input(model_input, total_pixels)
        outs = []
        # NO torch.no_grad(): the reference's eval forward itself calls
        # autograd.grad for surface normals (impl..._renderer.py:323,120)
        for s in split:
            out = model(s)
            outs.append({"rgb_values": out["rgb_values"].detach()})
        res = utils.merge_output(outs, total_pixels, 1)
        rgb = res["rgb_values"].reshape(H, W, 3).numpy()
        gt = ground_truth["rgb"].reshape(H, W, 3).numpy()
        mask = model_input["object_mask"].reshape(H, W).numpy() > 0.5
        # our evaluator's metric convention (reference eval.py:164-185):
        # [0,1], mask-multiplied, PSNR renormalized by mask count
        m3 = mask[..., None].astype(np.float32)
        rgb01 = (rgb + 1.0) / 2.0 * m3
        gt01 = (gt + 1.0) / 2.0 * m3
        psnrs.append(masked_psnr(rgb01, gt01, mask, data_range=1.0))
        ssims.append(ssim(rgb01, gt01, data_range=1.0))
        lp = lpips_or_none(rgb01, gt01)
        lpipss.append(lp if lp is not None else float("nan"))
        print(f"view {idx}: psnr={psnrs[-1]:.2f} ssim={ssims[-1]:.4f}")

    import csv

    for name, vals in (("psnrs", psnrs), ("ssims", ssims), ("lpips", lpipss)):
        with open(os.path.join(out_dir, "metrics", f"{name}.csv"), "w",
                  newline="") as f:
            w = csv.writer(f)
            for i, v in zip(view_ids, vals):
                w.writerow([i, v])

    def sdf_np(pts):
        with torch.no_grad():
            t = torch.from_numpy(np.ascontiguousarray(pts, dtype=np.float32))
            return model.implicit_network(t)[:, 0].detach().numpy()

    verts, faces = get_surface_mesh(sdf_np, resolution=mesh_resolution,
                                    keep_largest=False, jit=False)
    mesh_path = os.path.join(out_dir, "surface_world_coordinates_ref.ply")
    write_ply(mesh_path, verts, faces)

    from hashmodnffbanks_idr_tpu.models.lpips import weights_source

    summary = {
        "psnr_mean": float(np.nanmean(psnrs)),
        "ssim_mean": float(np.nanmean(ssims)),
        "lpips_mean": float(np.nanmean(lpipss)),
        "lpips_weights": weights_source(),
        "mesh": mesh_path,
        "views": view_ids,
        "n_views": len(ds),
    }
    with open(os.path.join(out_dir, "metrics", "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    return summary


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--scene", required=True, help="shared scene dir (scanN)")
    p.add_argument("--conf", required=True, help="reference-style conf")
    p.add_argument("--nepoch", type=int, default=300)
    p.add_argument("--sandbox", default="/tmp/refrun")
    p.add_argument("--out", default=None,
                   help="metrics/mesh output dir (default evals/<expname>)")
    p.add_argument("--data-dir-name", default=None,
                   help="dataset.data_dir in the conf (default: read conf)")
    p.add_argument("--scan-id", type=int, default=0)
    p.add_argument("--mesh-resolution", type=int, default=200)
    p.add_argument("--views", type=int, nargs="+", default=None,
                   help="render only these view ids (CPU rendering is slow); "
                        "compare ours on the same subset")
    p.add_argument("--timing-only", type=int, default=0, metavar="N",
                   help="run N epochs, print s/step, skip eval")
    p.add_argument("--eval-only", action="store_true",
                   help="resume the latest checkpoint in the sandbox and run "
                        "only the evaluation")
    args = p.parse_args(argv)

    from hashmodnffbanks_idr_tpu.config import hocon

    conf = hocon.parse_file(args.conf)
    data_dir_name = args.data_dir_name or conf.get_string("dataset.data_dir")
    expname = conf.get_string("train.expname")
    out_dir = args.out or os.path.join(REPO, "evals", f"{expname}_{args.scan_id}")
    conf_abs = os.path.abspath(args.conf)
    scene_abs = os.path.abspath(args.scene)

    code = build_sandbox(args.sandbox, scene_abs, data_dir_name, args.scan_id)
    install_stubs(code)
    os.chdir(code)

    import training.idr_train as it

    # plotting is not part of the protocol; the epoch-0 full render + plotly
    # mesh dump would dominate CPU time
    it.plt = types.SimpleNamespace(plot=lambda *a, **k: None)

    nepochs = args.timing_only or args.nepoch
    runner = it.IDRTrainRunner(
        conf=conf_abs,
        batch_size=1,
        nepochs=nepochs,
        exps_folder_name="exps",
        gpu_index="ignore",
        train_cameras=False,
        expname="",
        scan_id=args.scan_id,
        is_continue=args.eval_only,
        timestamp="latest",
        checkpoint="latest",
        validation_slope_print=False,
    )
    # reference bug: with validation_slope_print=False, run() still reads
    # self.eval_epochs (idr_train.py:322) which is only assigned when the
    # flag is True -> AttributeError at the end of every epoch.  A sentinel
    # that never equals an epoch index restores the intended no-op.
    runner.eval_epochs = -1
    # their runner pins torch to 1 thread (idr_train.py:21, a GPU-host
    # resource guard); on this CPU-only host use every core
    import torch

    torch.set_num_threads(os.cpu_count() or 2)
    if not args.eval_only:
        n_steps = nepochs * len(runner.train_dataloader)
        # the plot block (idr_train.py:231-273) renders the FULL image every
        # plot_freq epochs AND at epoch 0 (0 % freq == 0) — plt.plot is
        # already stubbed, but the forward itself would dominate CPU time.
        # Empty the split so the plot-path forward never runs; restore the
        # real split_input for the evaluation below.
        import utils.general as ref_utils

        real_split, real_merge = ref_utils.split_input, ref_utils.merge_output
        it.utils.split_input = lambda model_input, total: []
        it.utils.merge_output = lambda res, total, bs: {}
        t0 = time.time()
        runner.run()
        it.utils.split_input, it.utils.merge_output = real_split, real_merge
        dt = time.time() - t0
        print(f"reference train: {nepochs} epochs / {n_steps} steps in "
              f"{dt:.0f}s ({dt / max(n_steps, 1):.2f} s/step)")
        if args.timing_only:
            return
    else:
        print(f"eval-only: resumed epoch {runner.start_epoch}")

    eval_reference_model(runner, out_dir, args.mesh_resolution,
                         views=args.views)


if __name__ == "__main__":
    main()
