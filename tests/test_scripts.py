"""Smoke tests for the utility scripts."""

import json
import os
import sys

import numpy as np
import pytest


def test_sweep_gmm_script(tmp_path, monkeypatch, capsys):
    from tests.conftest import make_config

    cfg = make_config(prior="ours", num_epochs=1, sg_pretraining=0,
                      n_MC_samples=2, num_hidden_units=64,
                      num_hidden_units_inner_VAE=16, n_layers_inner_VAE=2,
                      synthetic_n_train=128, synthetic_n_test=128,
                      batch_size=64, enable_plots=0, load_model=0)
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv", [
        "sweep_gmm.py", "-c", str(cfg_path), "--mixtures", "3",
        "--epochs", "1"])

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "sweep_gmm", "/root/repo/scripts/sweep_gmm.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()
    out = capsys.readouterr().out
    line = [ln for ln in out.splitlines() if ln.startswith('{"sweep"')][-1]
    result = json.loads(line)["sweep"]
    assert result[0]["n_mixtures"] == 3
    assert np.isfinite(result[0]["final_val_loss"])


def test_prepare_celeba_script(tmp_path, monkeypatch):
    from PIL import Image

    rng = np.random.default_rng(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(6):
        arr = rng.integers(0, 256, (40, 32, 3)).astype("uint8")
        Image.fromarray(arr).save(str(img_dir / f"{i:03d}.jpg"))

    out_dir = tmp_path / "out"
    monkeypatch.setattr(sys, "argv", [
        "prepare_celeba.py", "--images", str(img_dir), "--out", str(out_dir),
        "--size", "16", "--n-train", "4", "--n-val", "1"])
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "prepare_celeba", "/root/repo/scripts/prepare_celeba.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()

    from ladder_tpu.data.tfrecord import ImageRecordReader
    r = ImageRecordReader(str(out_dir / "celebA_train.tfrecords"), (16, 16, 3))
    assert len(r) == 4
    assert r.read(0).shape == (16, 16, 3)
    r.close()
    r2 = ImageRecordReader(str(out_dir / "celebA_test.tfrecords"), (16, 16, 3))
    assert len(r2) == 1
    r2.close()


def _load_script(name):
    import importlib.util
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", name)
    spec = importlib.util.spec_from_file_location(name[:-3], path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod

def test_verify_real_data_check(tmp_path, monkeypatch):
    """Layout check: actionable failure on empty dir, OK with keras-npz
    mnist and with celebA tfrecords."""
    mod = _load_script("verify_real_data.py")
    import argparse
    cfg_path = tmp_path / "cfg.json"
    from tests.conftest import make_config
    cfg = make_config(prior="standard_gaussian")
    base = {k: v for k, v in cfg.items()
            if isinstance(v, (int, float, str)) and k not in
            ("result_dir", "checkpoint_dir")}
    json.dump(base, open(cfg_path, "w"))
    monkeypatch.chdir(tmp_path)

    ns = argparse.Namespace(config=str(cfg_path),
                            data_dir=str(tmp_path / "nodata"))
    assert mod.check(ns) == 1

    rng = np.random.default_rng(0)
    np.savez(tmp_path / "mnist.npz",
             x_train=rng.integers(0, 255, (12000, 28, 28), dtype=np.uint8),
             y_train=np.tile(np.arange(10), 1200).astype(np.uint8),
             x_test=rng.integers(0, 255, (2000, 28, 28), dtype=np.uint8),
             y_test=np.tile(np.arange(10), 200).astype(np.uint8))
    ns = argparse.Namespace(config=str(cfg_path), data_dir=str(tmp_path))
    assert mod.check(ns) == 0

    # celeba layout
    base2 = dict(base, exp_name="celeba", dim_input_x=128, dim_input_y=128,
                 dim_input_channel=3)
    cfg2_path = tmp_path / "cfg2.json"
    json.dump(base2, open(cfg2_path, "w"))
    from ladder_tpu.data.celeba import ensure_synthetic_tfrecords
    ddir = str(tmp_path / "celeba") + "/"
    ensure_synthetic_tfrecords(ddir, n_train=8, n_val=4, n_test=4)
    ns = argparse.Namespace(config=str(cfg2_path), data_dir=ddir)
    assert mod.check(ns) == 0
    os.remove(os.path.join(ddir, "celebA_val.tfrecords"))
    assert mod.check(ns) == 1


def test_verify_real_data_compare(tmp_path, monkeypatch):
    """Envelope comparison runs against a finished (tiny synthetic) run."""
    mod = _load_script("verify_real_data.py")
    import argparse
    from tests.conftest import make_config
    monkeypatch.chdir(tmp_path)
    from ladder_tpu.data.mnist import DataGenerator
    from ladder_tpu.models.builder import make_model
    from ladder_tpu.training.trainer import MNISTTrainer
    from ladder_tpu.utils.config import create_dirs

    cfg = make_config(num_epochs=2, prior="standard_gaussian",
                      synthetic_n_train=256, synthetic_n_test=128,
                      num_hidden_units=64, enable_plots=0)
    cfg["result_dir"] = str(tmp_path / "result") + "/"
    cfg["checkpoint_dir"] = str(tmp_path / "ckpt") + "/"
    create_dirs([cfg["result_dir"], cfg["checkpoint_dir"]])
    MNISTTrainer(make_model(cfg), DataGenerator(cfg), cfg).train()

    base = {k: v for k, v in cfg.items() if isinstance(v, (int, float, str))}
    cfg_path = tmp_path / "cfg.json"
    json.dump(base, open(cfg_path, "w"))
    # loose envelope: a 2-epoch run only demonstrates the plumbing
    env_path = tmp_path / "env.json"
    json.dump({"checks": {"min_train_loss_drop": 0.0,
                          "final_sigma_max": 1.0,
                          "sigma_monotone_tolerance": 1.0,
                          "val_final_within_train_frac": 10.0}},
              open(env_path, "w"))
    # compare resolves result_dir from the config: patch process_config to
    # return our trained run's dirs
    monkeypatch.setattr(mod, "_load_config", lambda p: cfg)
    ns = argparse.Namespace(config=str(cfg_path), data_dir=None,
                            envelope=str(env_path))
    assert mod.compare(ns) == 0
    # a strict envelope that the tiny run cannot meet fails
    json.dump({"checks": {"min_train_loss_drop": 0.99,
                          "final_sigma_max": 1e-9,
                          "sigma_monotone_tolerance": 1.0,
                          "val_final_within_train_frac": 10.0}},
              open(env_path, "w"))
    assert mod.compare(ns) == 1


def test_bench_repeats_and_streamed_record(monkeypatch, capsys):
    """bench.py end-to-end on CPU at tiny shapes: the repeats statistics
    (median/min/max) and the embedded streamed record must appear in the
    single JSON line (VERDICT r2 item 2's contract)."""
    import importlib.util

    monkeypatch.setattr(sys, "argv", [
        "bench.py", "--steps", "4", "--repeats", "2", "--warmup", "1",
        "--batch", "2", "--hidden", "16", "--code", "8",
        "--steps-per-call", "2", "--streamed-steps", "3",
        "--dtype", "float32"])
    spec = importlib.util.spec_from_file_location(
        "bench", "/root/repo/bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()
    line = [ln for ln in capsys.readouterr().out.splitlines()
            if ln.startswith("{")][-1]
    rec = json.loads(line)
    d = rec["detail"]
    assert d["repeats"] == 2
    assert d["min"] <= d["median"] <= d["max"]
    assert rec["value"] == d["median"]
    assert d["step_ms_min"] <= d["step_ms"] <= d["step_ms_max"]
    assert "streamed" in d and d["streamed"]["steps"] == 3
    assert np.isfinite(d["loss_ae"])


def test_eval_fid_script_encoder_mode(tmp_path, monkeypatch, capsys):
    """scripts/eval_fid.py end-to-end in --network encoder mode: the
    offline-capable FID CLI (reference's compute_FID_score as a script,
    utils.py:141-200) loads the config, restores the encoder checkpoint
    and prints one JSON line with a finite non-negative score."""
    import importlib.util

    import jax

    from ladder_tpu.models.builder import make_model
    from ladder_tpu.utils.checkpoint import CheckpointManager
    from tests.conftest import make_config

    cfg = make_config(prior="standard_gaussian", num_hidden_units=64,
                      code_size=8)
    cfg["checkpoint_dir"] = str(tmp_path / "ckpt") + "/"
    os.makedirs(cfg["checkpoint_dir"], exist_ok=True)
    model = make_model(cfg)
    CheckpointManager(cfg).save(
        {"params": model.init(jax.random.PRNGKey(0))}, model="VAE")
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(
        {k: v for k, v in cfg.items()
         if k not in ("checkpoint_dir", "result_dir", "summary_dir")}))

    rng = np.random.default_rng(7)
    imgs1 = rng.integers(0, 256, (24, 28, 28, 1)).astype(np.float32)
    imgs2 = np.clip(imgs1 / 255.0 + 0.3 * rng.standard_normal(imgs1.shape),
                    0, 1).astype(np.float32)
    f1, f2 = str(tmp_path / "a.npz"), str(tmp_path / "b.npz")
    np.savez(f1, sampled_images=imgs1)
    np.savez(f2, sampled_images=imgs2)

    monkeypatch.chdir(tmp_path)
    spec = importlib.util.spec_from_file_location(
        "eval_fid", "/root/repo/scripts/eval_fid.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rc = mod.main([f1, f2, "--network", "encoder", "-c", str(cfg_path),
                   "--checkpoint-dir", cfg["checkpoint_dir"],
                   "--resize-to", "28"])
    assert rc == 0
    line = [ln for ln in capsys.readouterr().out.splitlines()
            if ln.startswith('{"fid"')][-1]
    rec = json.loads(line)
    assert np.isfinite(rec["fid"]) and rec["fid"] > 0
    assert rec["network"] == "encoder"


def test_bench_watchdog_fails_fast(tmp_path):
    """With LADDER_BENCH_INIT_TIMEOUT set very low, bench.py exits rc 2
    with a one-line stderr error instead of hanging — the fail-fast
    behaviour the driver needs when the TPU tunnel is unreachable."""
    import subprocess

    env = dict(os.environ, LADDER_BENCH_INIT_TIMEOUT="0.2",
               LADDER_BENCH_RETRIES="1", JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "/root/repo/bench.py", "--steps", "2",
         "--repeats", "1", "--batch", "2", "--hidden", "16", "--code", "8",
         "--steps-per-call", "1", "--streamed-steps", "0",
         "--dtype", "float32"],
        capture_output=True, text=True, timeout=300, cwd=str(tmp_path),
        env=env)
    assert proc.returncode == 2, (proc.returncode, proc.stderr[-500:])
    # one in-process restart happened before giving up
    assert "restarting (1 retries left)" in proc.stderr
    assert "tunnel down or unreachable" in proc.stderr


def _run_quality_baseline(argv):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "quality_baseline", "/root/repo/scripts/quality_baseline.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.main(argv)


def test_quality_baseline_mnist_smoke(tmp_path, monkeypatch):
    """The standing quality-record script (VERDICT r3 item 5) end-to-end
    on a tiny MNIST-digit recipe: curve endpoints, sigma trajectory,
    active-mixture count, and the encoder-FID all land in the JSON."""
    monkeypatch.chdir(tmp_path)
    out = tmp_path / "q.json"
    rc = _run_quality_baseline([
        "--config", "/root/repo/codes/mnist_digit_config.json",
        "--out", str(out), "--workdir", str(tmp_path / "wd"),
        "--epochs", "2", "--n-train", "256", "--n-test", "128",
        "--fid-samples", "64",
        "--override", json.dumps({
            "sg_pretraining": 1, "accurate_fit": 1, "batch_size": 64,
            "n_mixtures": 4, "n_MC_samples": 4, "num_hidden_units": 64,
            "num_hidden_units_inner_VAE": 16, "n_layers_inner_VAE": 2})])
    assert rc == 0
    rec = json.loads(out.read_text())
    assert rec["n_curve_points"] >= 2
    for key in ("final_train_neg_elbo", "final_val_neg_elbo",
                "sigma_start", "sigma_final",
                "encoder_fid_generated_vs_test"):
        assert np.isfinite(rec[key]), (key, rec[key])
    assert rec["active_mixtures"] >= 1
    assert rec["overrides"]["n_mixtures"] == 4
    # the FID self-floor (real vs real) must sit at ~0
    assert abs(rec["encoder_fid_self_floor"]) < 1e-6


def test_quality_baseline_celeba_smoke(tmp_path, monkeypatch):
    """Family dispatch: the same script records a CelebA quality baseline
    (CelebATrainer + TFRecord pipeline + uint8 original-set scaling)."""
    monkeypatch.chdir(tmp_path)
    out = tmp_path / "q.json"
    rc = _run_quality_baseline([
        "--config", "/root/repo/codes/celeba_config.json",
        "--out", str(out), "--workdir", str(tmp_path / "wd"),
        "--epochs", "1", "--n-train", "32", "--n-test", "8",
        "--fid-samples", "8",
        "--override", json.dumps({
            "sg_pretraining": 0, "accurate_fit": 1, "batch_size": 8,
            "n_mixtures": 4, "n_MC_samples": 4, "num_hidden_units": 16,
            "code_size": 16, "num_hidden_units_inner_VAE": 16,
            "n_layers_inner_VAE": 2, "synthetic_n_val": 16})])
    assert rc == 0
    rec = json.loads(out.read_text())
    assert rec["recipe"]["exp_name"] == "celeba"
    assert rec["n_curve_points"] >= 1
    assert np.isfinite(rec["final_val_neg_elbo"])
    assert np.isfinite(rec["encoder_fid_generated_vs_test"])
    assert abs(rec["encoder_fid_self_floor"]) < 1e-6


def test_quality_baseline_check_mode(tmp_path):
    """--check regression mode: identical records pass, a shifted ELBO
    endpoint fails, missing keys (family differences) are tolerated."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "quality_baseline_check", "/root/repo/scripts/quality_baseline.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    base = {"final_val_neg_elbo": -1426.26, "final_train_neg_elbo": -1423.8,
            "final_val_recons": 22.4, "final_train_recons": 22.46,
            "sigma_final": 0.0282, "encoder_fid_generated_vs_test": 0.0092,
            "active_mixtures": 23}
    p = tmp_path / "base.json"
    p.write_text(json.dumps(base))
    assert mod.check_against(dict(base), str(p), 0.05) == 0
    assert mod.check_against(
        dict(base, final_val_neg_elbo=-1141.0), str(p), 0.05) == 1
    assert mod.check_against(
        dict(base, active_mixtures=2), str(p), 0.05) == 1
    # a record missing FID (e.g. smoke without a GM fit) still checks
    nofid = dict(base)
    nofid.pop("encoder_fid_generated_vs_test")
    assert mod.check_against(nofid, str(p), 0.05) == 0


def test_bench_input_pipeline_script(tmp_path, monkeypatch, capsys):
    """scripts/bench_input_pipeline.py end-to-end at tiny shapes: the
    host-side streaming evidence (reader img/s for both backends, the
    prefetch-thread rate, and the device-ceiling comparison) appears in
    the single JSON line."""
    import importlib.util

    from ladder_tpu.data.celeba import ensure_synthetic_tfrecords

    ensure_synthetic_tfrecords(str(tmp_path), n_train=128, n_val=1,
                               n_test=1, size=32)
    records = str(tmp_path / "celebA_train.tfrecords")
    monkeypatch.setattr(sys, "argv", [
        "bench_input_pipeline.py", "--records", records, "--size", "32",
        "--batch", "16", "--repeats", "1"])
    spec = importlib.util.spec_from_file_location(
        "bench_input_pipeline", "/root/repo/scripts/bench_input_pipeline.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()
    line = [ln for ln in capsys.readouterr().out.splitlines()
            if ln.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["n_images"] == 128 and rec["batch"] == 16
    for backend in ("python",) + (("native",) if "native" in rec else ()):
        r = rec[backend]
        assert r["img_s"] > 0 and r["mb_s"] > 0 and r["prefetch_img_s"] > 0
    # device ceiling scales with batch: 16 imgs / (12.24 ms * 16/64)
    assert rec["device_ceiling_img_s"] == pytest.approx(5228.8, abs=0.3)
    assert rec["required_transfer_mb_s"] > 0
    assert rec["host_headroom_x"] > 0


def test_memory_report_script(tmp_path, capsys):
    """scripts/memory_report.py on a tiny config: XLA's compiled memory
    stats come back for the single-device, data-mesh and TP-mesh cases,
    and the 4x2 TP mesh reports strictly smaller per-device argument
    bytes than the 8-way data mesh (the params/Adam shards vs replicas)."""
    from tests.conftest import make_config

    cfg = make_config(prior="ours", n_MC_samples=2, num_hidden_units=64,
                      num_hidden_units_inner_VAE=16, n_layers_inner_VAE=2,
                      batch_size=16, fused_train_step=2)
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "memory_report", "/root/repo/scripts/memory_report.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    def run(*argv):
        assert mod.main(["--config", str(cfg_path), *argv]) == 0
        line = capsys.readouterr().out.strip().splitlines()[-1]
        return json.loads(line)

    single = run()
    assert single["n_devices"] == 1
    assert single["state_mb"]["params"] > 0
    c = single["compiled_per_device_mb"]
    assert c["arguments"] > 0 and c["temps"] > 0
    assert single["peak_estimate_mb"] > 0

    dp = run("--mesh", "8")
    tp = run("--mesh", "4,2")
    assert dp["n_devices"] == tp["n_devices"] == 8
    # TP shards the state over the model axis; DP replicates it
    assert (tp["compiled_per_device_mb"]["arguments"]
            < 0.75 * dp["compiled_per_device_mb"]["arguments"])

    multi = run("--steps-per-call", "2", "--unroll", "2")
    assert multi["steps_per_call"] == 2
    assert multi["compiled_per_device_mb"]["arguments"] > 0


def test_quality_check_uses_seed_spread_tolerances(tmp_path):
    """Per-metric tolerances derive from the anchor's measured seed_spread
    (VERDICT r4 item 7): a drift inside 2x the recorded spread passes, one
    beyond it fails even when the old global rtol would have let it by."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "quality_baseline_spread", "/root/repo/scripts/quality_baseline.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    base = {"final_val_neg_elbo": -1426.26, "final_train_neg_elbo": -1423.8,
            "final_val_recons": 22.4, "final_train_recons": 22.46,
            "sigma_final": 0.0282, "encoder_fid_generated_vs_test": 0.0092,
            "active_mixtures": 23,
            "seed_spread": {"seeds": [0, 1, 2],
                            "rel": {"final_val_neg_elbo": 0.004,
                                    "sigma_final": 0.05},
                            "active_mixtures_band": 4}}
    p = tmp_path / "base.json"
    p.write_text(json.dumps(base))
    # 0.6% ELBO drift: inside 2x the 0.4% spread -> pass
    ok = dict(base, final_val_neg_elbo=-1426.26 * 1.006)
    assert mod.check_against(ok, str(p), 0.05) == 0
    # 2% ELBO drift: beyond 2x spread -> fail, though global rtol=5%
    # would have passed it (the calibration's whole point)
    bad = dict(base, final_val_neg_elbo=-1426.26 * 1.02)
    assert mod.check_against(bad, str(p), 0.05) == 1
    # sigma spread is wide (5%): an 8% drift still passes at 2x
    loose = dict(base, sigma_final=0.0282 * 1.08)
    assert mod.check_against(loose, str(p), 0.05) == 0
    # the measured active-mixture band replaces the 30% default
    assert mod.check_against(dict(base, active_mixtures=27),
                             str(p), 0.05) == 0
    assert mod.check_against(dict(base, active_mixtures=28),
                             str(p), 0.05) == 1


def test_mode_parity_combine_script(tmp_path):
    """scripts/mode_parity_combine.py aggregates a mode-1/mode-2 sweep
    into per-metric gap-vs-spread verdicts."""
    import importlib.util

    for m in (1, 2):
        for s in (0, 1, 2):
            rec = {"recipe": {"exp_name": "celeba"}, "overrides": None,
                   "train_wall_s": 100.0 + m + s,
                   "final_val_neg_elbo": -82000.0 - 50 * s - 20 * m,
                   "final_train_neg_elbo": -77000.0 - 40 * s,
                   "final_val_recons": 1600.0 + s,
                   "final_train_recons": 1700.0 + s,
                   "sigma_final": 0.03,
                   # mode gap (10) far beyond seed spread (1)
                   "encoder_fid_generated_vs_test": 29.0 + 0.5 * s + 10 * m,
                   "active_mixtures": 13 + s}
            (tmp_path / f"m{m}_s{s}.json").write_text(json.dumps(rec))
    spec = importlib.util.spec_from_file_location(
        "mode_parity_combine", "/root/repo/scripts/mode_parity_combine.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = tmp_path / "combined.json"
    assert mod.main([str(tmp_path), "--out", str(out)]) == 0
    rec = json.loads(out.read_text())
    v = rec["verdict_gap_within_spread"]
    assert v["final_val_neg_elbo"] is True      # gap 20 <= spread 100
    assert v["final_train_neg_elbo"] is True    # gap 0
    assert v["encoder_fid_generated_vs_test"] is False  # gap 10 > spread 1
    assert rec["all_primary_within_spread"] is True
    m1 = rec["metrics"]["final_val_neg_elbo"]["mode1"]
    assert m1["values"] == [-82020.0, -82070.0, -82120.0]
    # signed direction: mode2's FID mean is 10 above mode1's
    fid = rec["metrics"]["encoder_fid_generated_vs_test"]
    assert fid["mode2_minus_mode1_mean"] == pytest.approx(10.0)
    elbo = rec["metrics"]["final_val_neg_elbo"]
    assert elbo["mode2_minus_mode1_mean"] == pytest.approx(-20.0)
