"""TF1 reference-checkpoint import/export (ladder_tpu/utils/tf1_import.py).

The heart of the parity evidence: the generated name map must line up
1:1 — names AND shapes — with the three checkpoints the reference ships
(pretrained_models/*/; their .index files survive upstream even though
the value blobs were stripped, .MISSING_LARGE_BLOBS). The shipped
checkpoints were trained at different hyper-parameters than the
committed training configs (fashion: h=512/code=32; celeba: t-dim 32),
so the tests override those knobs — exercising that the mapping is
generated from the tree, not from per-family tables.
"""

import json

import jax
import numpy as np
import pytest

from ladder_tpu.models.builder import make_model
from ladder_tpu.utils import tf1_import
from ladder_tpu.utils.config import apply_defaults, validate_config

REF = "/root/reference/pretrained_models"


def _template(config):
    model = make_model(config)
    return jax.eval_shape(model.init, jax.random.PRNGKey(0))


def _load_config(path, **overrides):
    with open(path) as f:
        cfg = apply_defaults(json.load(f))
    cfg.update(overrides)
    return validate_config(cfg)


@pytest.mark.parametrize("config_path,overrides,ref_dir,n_vae,n_prior", [
    ("demo/mnist_digit_config.json", {}, "mnist_digit", 23, 27),
    # the shipped fashion checkpoint was trained at h=512, code 32 — the
    # shipped demo config encodes exactly that architecture
    ("demo/mnist_fashion_config.json", {}, "mnist_fashion", 27, 27),
    # the shipped celeba checkpoint used a 32-D representation space
    ("demo/celeba_config.json", {}, "celeba", 73, 27),
    # override path: the mapping is generated from the tree, not from
    # per-family tables
    ("codes/mnist_fashion_config.json",
     {"num_hidden_units": 512, "code_size": 32}, "mnist_fashion", 27, 27),
])
def test_mapping_covers_shipped_reference_checkpoints(
        config_path, overrides, ref_dir, n_vae, n_prior):
    cfg = _load_config(config_path, **overrides)
    report = tf1_import.check_reference_mapping(
        _template(cfg), cfg, f"{REF}/{ref_dir}")
    for prefix, expected in (("vae-model", n_vae), ("prior-model", n_prior)):
        r = report[prefix]
        assert r["missing_in_checkpoint"] == []
        assert r["unmapped_in_checkpoint"] == []
        assert r["shape_mismatches"] == []
        assert len(r["matched"]) == expected


def test_export_import_roundtrip(tmp_path):
    from tests.conftest import make_config

    cfg = make_config(num_hidden_units=64, code_size=8,
                      num_hidden_units_inner_VAE=16, n_layers_inner_VAE=2)
    model = make_model(cfg)
    params = jax.tree.map(np.asarray,
                          model.init(jax.random.PRNGKey(7)))
    out = str(tmp_path / "tf1")
    written = tf1_import.export_reference_checkpoint(params, cfg, out)
    assert written == ["vae-model", "prior-model"]

    back = tf1_import.import_reference_checkpoint(
        jax.eval_shape(model.init, jax.random.PRNGKey(0)), cfg, out)
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = dict(jax.tree_util.tree_flatten_with_path(back)[0])
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf), flat_b[path])


def test_import_rejects_shape_mismatch(tmp_path):
    from tests.conftest import make_config

    cfg = make_config(num_hidden_units=64, code_size=8,
                      num_hidden_units_inner_VAE=16, n_layers_inner_VAE=2)
    model = make_model(cfg)
    params = jax.tree.map(np.asarray, model.init(jax.random.PRNGKey(7)))
    out = str(tmp_path / "tf1")
    tf1_import.export_reference_checkpoint(params, cfg, out)

    wrong = make_config(num_hidden_units=64, code_size=4,
                        num_hidden_units_inner_VAE=16, n_layers_inner_VAE=2)
    with pytest.raises(ValueError, match="does not line up"):
        tf1_import.import_reference_checkpoint(_template(wrong), wrong, out)


def test_vamp_and_z_std_names():
    from tests.conftest import make_config

    vamp = make_config(prior="vampPrior", num_hidden_units=64, code_size=8)
    m = tf1_import.reference_name_map(_template(vamp), vamp)
    assert m["prior/Variable"] == ("prior", "vamp", "psedeu_input")

    zstd = make_config(num_hidden_units=64, code_size=8,
                       num_hidden_units_inner_VAE=16, n_layers_inner_VAE=2,
                       TRAIN_decoded_z_std=1)
    m = tf1_import.reference_name_map(_template(zstd), zstd)
    # n=2: enc 0-1, mean 2, std 3, dec 4-5, decoded 6, std tower 7-8, head 9
    assert m["prior/dense_6/kernel"] == (
        "prior", "inner_decoder", "decoded_code", "kernel")
    assert m["prior/dense_7/kernel"] == (
        "prior", "inner_decoder", "dec_std_0", "kernel")
    assert m["prior/dense_9/kernel"] == (
        "prior", "inner_decoder", "decoded_code_std", "kernel")


def test_import_cli_roundtrip(tmp_path, monkeypatch):
    """scripts/import_tf1_checkpoint.py end-to-end: export a TF1 pair from
    a trained-at-init msgpack checkpoint, then --check and import it."""
    import importlib.util
    import sys

    from tests.conftest import make_config
    from ladder_tpu.utils.checkpoint import load_msgpack, save_msgpack

    cfg = make_config(num_hidden_units=64, code_size=8,
                      num_hidden_units_inner_VAE=16, n_layers_inner_VAE=2)
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(
        {k: v for k, v in cfg.items()
         if k not in ("summary_dir", "result_dir", "checkpoint_dir")}))

    model = make_model(cfg)
    params = jax.tree.map(np.asarray, model.init(jax.random.PRNGKey(3)))
    ck = tmp_path / "ck"
    ck.mkdir()
    save_msgpack(str(ck / "vae-model.msgpack"),
                 {k: params[k] for k in ("encoder", "decoder", "sigma")})
    save_msgpack(str(ck / "prior-model.msgpack"),
                 {k: params[k] for k in ("prior", "inner_sigma")})

    spec = importlib.util.spec_from_file_location(
        "import_tf1_checkpoint",
        "/root/repo/scripts/import_tf1_checkpoint.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    monkeypatch.chdir(tmp_path)
    tf1_dir = tmp_path / "tf1"
    monkeypatch.setattr(sys, "argv", [
        "import_tf1_checkpoint.py", "--config", str(cfg_path),
        "--src", str(ck), "--export", str(tf1_dir)])
    mod.main()
    assert (tf1_dir / "vae-model.index").is_file()
    assert (tf1_dir / "checkpoint").is_file()

    monkeypatch.setattr(sys, "argv", [
        "import_tf1_checkpoint.py", "--config", str(cfg_path),
        "--src", str(tf1_dir), "--check"])
    with pytest.raises(SystemExit) as e:
        mod.main()
    assert e.value.code == 0

    dst = tmp_path / "imported"
    monkeypatch.setattr(sys, "argv", [
        "import_tf1_checkpoint.py", "--config", str(cfg_path),
        "--src", str(tf1_dir), "--dst", str(dst)])
    mod.main()
    got = load_msgpack(str(dst / "vae-model.msgpack"))
    np.testing.assert_array_equal(
        got["encoder"]["code_mean"]["kernel"],
        params["encoder"]["code_mean"]["kernel"])
    got_p = load_msgpack(str(dst / "prior-model.msgpack"))
    np.testing.assert_array_equal(
        np.asarray(got_p["inner_sigma"]["inner_sigma"]),
        np.asarray(params["inner_sigma"]["inner_sigma"]))
