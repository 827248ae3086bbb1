import json
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_config(tmp_path, scene_dir, iters=20):
    cfg = {
        "defaults": {
            "env": {"GS_FORCE_CPU": "1",
                    "XLA_FLAGS": "--xla_force_host_platform_device_count=1"},
            "common_args": {"disable_viewer": True, "quiet": True},
            "dataset_root": str(tmp_path / "data"),
            "out_root": str(tmp_path / "bench_runs"),
            "seeds": [42],
            "run_render": True,
            "run_metrics": True,
            "run_desc": "test",
        },
        "scenes": [{"name": "synth", "source_path": scene_dir}],
        "models": [{
            "name": "3dgs",
            "repo_dir": REPO,
            "entry": "./train.py",
            "render_entry": "./render.py",
            "metrics_entry": "./metrics.py",
            "method": "3dgs",
            "arg_map": {
                "source_path": "source_path",
                "model_path": "model_path",
                "sh_degree": "sh_degree",
                "iterations": "iterations",
                "test_iterations": "test_iterations",
                "save_iterations": "save_iterations",
                "eval": "eval",
                "quiet": "quiet",
                "disable_viewer": "disable_viewer",
            },
            "args": {
                "iterations": iters,
                "sh_degree": 1,
                "test_iterations": [iters],
                "save_iterations": [iters],
                "eval": False,
            },
        }],
        "grid": {},
        "overrides": {},
    }
    path = tmp_path / "config.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return str(path)


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    from sparse_view_3dgs_pack_tpu import testing
    root = str(tmp_path_factory.mktemp("bench_scene"))
    testing.write_blender_scene(root, n_train=3, n_test=1, width=32)
    return root


def test_yaml_resolution_and_dry_run(tmp_path, scene_dir, capsys):
    from sparse_view_3dgs_pack_tpu.benchmark.benchmark import main

    cfg_path = _write_config(tmp_path, scene_dir)
    main(["-c", cfg_path, "--dry"])
    out = capsys.readouterr().out
    assert "synth__3dgs__sh1__it20__seed42" in out
    assert "--method 3dgs" in out
    assert "--iterations 20" in out


def test_ref_interpolation():
    from sparse_view_3dgs_pack_tpu.benchmark.benchmark import (deep_merge,
                                                               resolve_refs)

    ctx = {"defaults": {"dataset_root": "/data", "n": 3}}
    obj = {"a": "${defaults.dataset_root}/fern", "b": ["x${defaults.n}"]}
    out = resolve_refs(obj, ctx)
    assert out["a"] == "/data/fern"
    assert out["b"] == ["x3"]
    merged = deep_merge({"a": 1, "c": {"x": 1}}, {"b": 2, "c": {"y": 2}})
    assert merged == {"a": 1, "b": 2, "c": {"x": 1, "y": 2}}


def test_build_cli_args():
    from sparse_view_3dgs_pack_tpu.benchmark.benchmark import build_cli_args

    arg_map = {"iterations": "iterations", "eval": "eval",
               "test_iterations": "test_iterations", "quiet": "quiet"}
    flat = {"iterations": 100, "eval": True, "test_iterations": [5, 10],
            "quiet": False, "seed": 42}
    cli = build_cli_args(arg_map, flat)
    assert cli == ["--iterations", "100", "--eval", "--test_iterations",
                   "5", "10"]


@pytest.mark.slow
def test_harness_end_to_end(tmp_path, scene_dir):
    from sparse_view_3dgs_pack_tpu.benchmark.benchmark import main

    cfg_path = _write_config(tmp_path, scene_dir, iters=20)
    main(["-c", cfg_path])
    run_dirs = list((tmp_path / "bench_runs").iterdir())
    assert len(run_dirs) == 1
    run_root = run_dirs[0]
    summary = (run_root / "summary.csv").read_text()
    assert "synth" in summary and "3dgs" in summary
    result = json.load(open(run_root / "synth__3dgs__sh1__it20__seed42"
                            / "result.json"))
    assert result["exit_code"] == 0, result
    assert (run_root / "tables" / "combined.tex").exists()
    # render stage produced images
    model_dir = run_root / "synth__3dgs__sh1__it20__seed42" / "model"
    renders = model_dir / "train" / "ours_20" / "renders"
    assert renders.exists() and len(list(renders.iterdir())) == 3
    # metrics wrote results.json
    assert (model_dir / "results.json").exists() or result["psnr"] is not None


def test_bench_tables_export(tmp_path):
    from sparse_view_3dgs_pack_tpu.benchmark.bench_tables import BenchTables

    rows = [
        {"tag": "a__m1", "scene": "a", "model": "m1", "seed": 1,
         "psnr": 20.0, "ssim": 0.8, "lpips": 0.3, "duration_sec": 10,
         "exit_code": 0},
        {"tag": "a__m2", "scene": "a", "model": "m2", "seed": 1,
         "psnr": 22.0, "ssim": 0.85, "lpips": 0.25, "duration_sec": 12,
         "exit_code": 0},
    ]
    out = BenchTables(rows).export(tmp_path)
    tex = (out / "psnr.tex").read_text()
    assert "m1" in tex and "m2" in tex
    assert "\\textbf{22.000}" in tex
    assert (out / "combined.tex").exists()


def test_resume_skips_completed_runs(tmp_path, scene_dir, monkeypatch):
    """--resume must skip runs whose result.json shows a finished pipeline
    (metrics block present) without spawning any subprocess, and re-run
    runs that only got through training (crash-resume semantics)."""
    import yaml as _yaml

    from sparse_view_3dgs_pack_tpu.benchmark import benchmark as bm

    cfg_path = _write_config(tmp_path, scene_dir, iters=20)
    cfg = bm.resolve_refs(_yaml.safe_load(open(cfg_path)), {
        "defaults": _yaml.safe_load(open(cfg_path))["defaults"],
        "scenes": {}})
    out_root = tmp_path / "resume_out"
    out_root.mkdir()
    runs = bm.build_runs(cfg, out_root, sys.executable)
    assert len(runs) == 1
    done = {"exit_code": 0, "duration_sec": 1.0, "psnr": 30.0,
            "ssim": 0.9, "lpips": None}
    with open(runs[0]["result_path"], "w") as f:
        json.dump(done, f)

    calls = []
    monkeypatch.setattr(bm, "_subprocess_stage",
                        lambda *a, **k: calls.append(a) or (0, 0.0))
    rows = bm.execute_runs(runs, cfg, out_root, sys.executable, resume=True)
    assert calls == []                      # nothing re-ran
    assert rows and rows[0]["psnr"] == 30.0  # summary row reloaded

    # a train-only result.json (no metrics block) is NOT complete: re-run
    with open(runs[0]["result_path"], "w") as f:
        json.dump({"exit_code": 0, "duration_sec": 1.0}, f)
    rows = bm.execute_runs(runs, cfg, out_root, sys.executable, resume=True)
    assert calls                             # stages ran this time

    # a crashed training whose metrics stage still wrote the block must be
    # retried, not carried forward as "completed" with null metrics
    calls.clear()
    with open(runs[0]["result_path"], "w") as f:
        json.dump({**done, "exit_code": 1, "psnr": None, "ssim": None}, f)
    bm.execute_runs(runs, cfg, out_root, sys.executable, resume=True)
    assert calls                             # failed run re-ran


def test_preprocess_handler_compatibility(tmp_path):
    """Scene-layout gate of the harness preprocessing hook (reference
    `fs3dgs_benchmark/preprocess_handler.py:11-106`)."""
    from sparse_view_3dgs_pack_tpu.benchmark.preprocess_handler import (
        check_dataset_compatibility, handle_dataset_preprocessing)

    blender = tmp_path / "b"
    (blender / "train").mkdir(parents=True)
    (blender / "transforms_train.json").write_text("{}")
    assert check_dataset_compatibility(str(blender))

    colmap = tmp_path / "c"
    (colmap / "images").mkdir(parents=True)
    assert not check_dataset_compatibility(str(colmap))  # no sparse model
    (colmap / "sparse").mkdir()
    assert check_dataset_compatibility(str(colmap))

    with pytest.raises(ValueError):
        handle_dataset_preprocessing({}, {"source_path": str(tmp_path / "x")},
                                     {})
    out = handle_dataset_preprocessing(
        {"args": {"n_views": 3, "point_cloud_type": "dense"}},
        {"source_path": str(blender)}, {})
    assert out == str(blender)   # warns (no dense init) but proceeds
