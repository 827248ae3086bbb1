"""Method recipes: map a method name to its training procedure.

The reference packages four forked repos (`fs3dgs_benchmark/{gaussian-
splatting,LGDWT-GS,FSGS,DNGaussian}` + mult-dwtgs); here each method is a
config + a (mostly shared) loop over the same TPU core. Vanilla 3DGS is
LGDWT with the DWT terms disabled (the reference trainers differ only by that
block — SURVEY §2 P4/P5).
"""

from __future__ import annotations

import os
import time

from ..scene import Scene
from ..viewer import network_gui
from .loop import simple_train


def _progress_printer(total):
    state = {"last": time.time(), "ema": 0.0}

    def cb(it, metrics):
        loss = float(metrics["loss"])
        state["ema"] = 0.4 * loss + 0.6 * state["ema"] if state["ema"] else loss
        if it % 100 == 0:
            now = time.time()
            ips = 100 / max(now - state["last"], 1e-9)
            state["last"] = now
            print(f"[{it}/{total}] loss={state['ema']:.5f} "
                  f"({ips:.1f} it/s)", flush=True)

    return cb


def train_method(method: str, dataset, opt, pipe, args) -> None:
    # arm the debug-snapshot facility from --debug_from (reference
    # `LGDWT-GS/train.py` sets pipe.debug at that iteration)
    pipe.debug_from = getattr(args, "debug_from", -1)
    if method in ("3dgs", "lgdwt"):
        use_nir = False
        channels = 3
    elif method == "mult-dwtgs":
        from .nir_loop import train_nir
        return train_nir(dataset, opt, pipe, args)
    elif method == "fsgs":
        from .fsgs_loop import train_fsgs
        return train_fsgs(dataset, opt, pipe, args)
    elif method == "dngaussian":
        from .dng_loop import train_dngaussian
        return train_dngaussian(
            dataset, opt, pipe, args,
            near_range=getattr(args, "near_range", 0.0),
            dataset_type=getattr(args, "dataset_type", "llff"))
    else:
        raise ValueError(method)

    scene = Scene(dataset, sh_degree=dataset.sh_degree, channels=channels,
                  use_nir=use_nir)
    if not getattr(args, "disable_viewer", False):
        network_gui.init(args.ip, args.port)

    trainer, elapsed = simple_train(
        scene, opt, pipe, dataset, method=method,
        testing_iterations=set(args.test_iterations),
        saving_iterations=set(args.save_iterations),
        checkpoint_iterations=set(args.checkpoint_iterations or []),
        quiet=args.quiet,
        progress=_progress_printer(opt.iterations),
        start_checkpoint=getattr(args, "start_checkpoint", None),
        data_parallel=getattr(args, "data_parallel", 1))

    stats = trainer.evaluate(scene.getTestCameras() or
                             scene.getTrainCameras()[:8])
    if stats:
        print(f"\n[ITER {opt.iterations}] Evaluating test: "
              f"L1 {stats['l1']:.4f} PSNR {stats['psnr']:.2f}")
    print(f"Training took {elapsed:.1f}s "
          f"({opt.iterations / max(elapsed, 1e-9):.2f} it/s)")
