"""TF1 reference-checkpoint import/export — the migration path.

The reference trains with two ``tf.train.Saver``s — ``vae-model``
(encoder/decoder/sigma variables) and ``prior-model`` (prior/inner_sigma)
— written every epoch (/root/reference/codes/base.py:37-65, 853-857). A
user switching from the reference carries those trained checkpoints; this
module maps every reference variable name onto the ladder_tpu parameter
tree and converts losslessly in either direction:

* No transposes are involved: TF dense kernels are ``[in, out]`` and conv
  kernels ``[kH, kW, in, out]`` — exactly the layouts flax uses; the
  scalars (``sigma/Variable``, ``inner_sigma/Variable``) map 1:1, stored
  raw (both sides apply |.| at use, models.py:152-155).
* The name map is generated from the parameter tree itself plus TF1's
  auto-naming rules (``tf.layers.dense`` numbers unnamed layers ``dense``,
  ``dense_1``, ... per variable scope and per type; explicitly named
  layers such as ``code_mean`` keep their names), so one rule set covers
  all three model families (models.py:46-148, 199-315, 392-598), the
  inner VAE (base.py:127-213, creation order: n encoder denses, mean head,
  std head, n decoder denses, decoded_code, then the optional
  decoded-z-std tower), vampPrior pseudo-inputs (base.py:224-225) and the
  CelebA StyleMod/batch-norm variables.
* ``GM_prior_info.npz`` needs no conversion at all: both sides write the
  same key set (w_active/m_active/K_active/w_full/m_full/K_full,
  base.py:769-777), so a reference-produced accurate fit drops straight
  into ``result_dir`` for serving/demo use.

Name+shape coverage is verified in-env against the three shipped
reference checkpoints' ``.index`` files (which survive upstream even
though the value blobs were stripped): tests/test_tf1_import.py asserts
an exact 1:1 match for mnist_digit, mnist_fashion and celeba.

TensorFlow is imported lazily — only the functions that actually read or
write TF checkpoints need it.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from ladder_tpu.utils.checkpoint import PRIOR_KEYS, VAE_KEYS

GROUP_FILES = (("vae-model", VAE_KEYS), ("prior-model", PRIOR_KEYS))


def _sfx(i):
    """TF1 uniquify suffix: first layer of a type is bare, then _1, _2..."""
    return "" if i == 0 else f"_{i}"


def _tf1_name(path, config):
    """Reference variable name for one parameter-tree leaf path.

    ``path`` is a tuple of string keys into the grouped param tree, e.g.
    ``('decoder', 'style_mod_0', 'style', 'kernel')``. Raises KeyError for
    a path no rule covers — mapping coverage is all-or-nothing.
    """
    group = path[0]
    if group == "sigma":
        return "sigma/Variable"
    if group == "inner_sigma":
        return "inner_sigma/Variable"
    leaf = path[-1]

    if group in ("encoder", "decoder"):
        mod = path[1]
        if mod.startswith("Conv_"):
            name = "conv2d" + _sfx(int(mod[len("Conv_"):]))
        elif mod.startswith("Dense_"):
            name = "dense" + _sfx(int(mod[len("Dense_"):]))
        elif mod.startswith("dlatent_"):
            # CelebA mapping net: created right after the input dense
            # (models.py:501-510), so dlatent_i is the (i+1)-th dense
            name = "dense" + _sfx(int(mod[len("dlatent_"):]) + 1)
        elif mod.startswith("BatchNormTrain_"):
            name = ("batch_normalization"
                    + _sfx(int(mod[len("BatchNormTrain_"):])))
        elif mod.startswith("style_mod_"):
            # StyleMod_N opens its own scope with one dense inside
            # (modules.py:6-10); our subtree is style_mod_N/style/{...}
            name = f"StyleMod_{int(mod[len('style_mod_'):])}/dense"
        elif mod in ("code_mean", "code_std_dev"):
            name = mod
        else:
            raise KeyError(f"no TF1 naming rule for {'/'.join(path)}")
        return f"{group}/{name}/{leaf}"

    if group == "prior":
        sub, mod = path[1], path[2]
        if sub == "vamp":
            # tf.Variable under scope 'prior' (base.py:224-225)
            return "prior/Variable"
        n = config["n_layers_inner_VAE"]
        if sub == "inner_encoder":
            if mod.startswith("enc_"):
                i = int(mod[len("enc_"):])
            elif mod == "representation_mean":
                i = n
            elif mod == "representation_std_dev":
                i = n + 1
            else:
                raise KeyError(f"no TF1 naming rule for {'/'.join(path)}")
        elif sub == "inner_decoder":
            if mod.startswith("dec_std_"):
                i = 2 * n + 3 + int(mod[len("dec_std_"):])
            elif mod.startswith("dec_"):
                i = n + 2 + int(mod[len("dec_"):])
            elif mod == "decoded_code":
                i = 2 * n + 2
            elif mod == "decoded_code_std":
                i = 3 * n + 3
            else:
                raise KeyError(f"no TF1 naming rule for {'/'.join(path)}")
        else:
            raise KeyError(f"no TF1 naming rule for {'/'.join(path)}")
        return f"prior/dense{_sfx(i)}/{leaf}"

    raise KeyError(f"no TF1 naming rule for {'/'.join(path)}")


def _flatten_with_paths(params):
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for keypath, leaf in flat:
        path = tuple(
            k.key if hasattr(k, "key") else str(k) for k in keypath)
        out.append((path, leaf))
    return out


def reference_name_map(params, config):
    """{tf1_variable_name: leaf path tuple} over the whole param tree.

    ``params`` may hold arrays or ShapeDtypeStructs (jax.eval_shape of
    model.init works, so no real initialisation is needed to build or
    check a mapping).
    """
    mapping = {}
    for path, _ in _flatten_with_paths(params):
        name = _tf1_name(path, config)
        if name in mapping:
            raise ValueError(
                f"TF1 name collision: {name} from {'/'.join(path)} and "
                f"{'/'.join(mapping[name])}")
        mapping[name] = path
    return mapping


def _leaf_shape(leaf):
    return tuple(int(d) for d in leaf.shape)


def check_reference_mapping(params, config, src_dir, groups=("VAE", "prior")):
    """Dry-run a reference checkpoint against the generated name map.

    Works with index-only checkpoints (the shipped reference ones have
    their .data blobs stripped): ``tf.train.list_variables`` reads names
    and shapes from the ``.index`` file alone. Returns a report dict per
    group file with ``matched`` / ``missing_in_checkpoint`` /
    ``unmapped_in_checkpoint`` / ``shape_mismatches``.
    """
    import tensorflow as tf  # lazy: only checkpoint I/O needs TF

    mapping = reference_name_map(params, config)
    leaves = dict(_flatten_with_paths(params))
    report = {}
    for prefix, keys in GROUP_FILES:
        if ("VAE" not in groups and prefix == "vae-model") or (
                "prior" not in groups and prefix == "prior-model"):
            continue
        ours = {name: leaves[path] for name, path in mapping.items()
                if path[0] in keys}
        ckpt = dict(tf.train.list_variables(os.path.join(src_dir, prefix)))
        matched, mismatched = [], []
        for name, leaf in sorted(ours.items()):
            if name in ckpt:
                if tuple(ckpt[name]) == _leaf_shape(leaf):
                    matched.append(name)
                else:
                    mismatched.append(
                        (name, tuple(ckpt[name]), _leaf_shape(leaf)))
        report[prefix] = {
            "matched": matched,
            "missing_in_checkpoint": sorted(set(ours) - set(ckpt)),
            "unmapped_in_checkpoint": sorted(set(ckpt) - set(ours)),
            "shape_mismatches": mismatched,
        }
    return report


def import_reference_checkpoint(params_template, config, src_dir,
                                groups=("VAE", "prior")):
    """Read a reference TF1 checkpoint pair into a grouped param tree.

    ``params_template`` supplies the tree structure and expected shapes
    (``jax.eval_shape(model.init, rng)`` is enough — no values are kept).
    Returns {group_key: subtree} of numpy arrays covering exactly the
    groups present in the requested checkpoint files. Strict: any name or
    shape disagreement raises with the full report.
    """
    import tensorflow as tf  # lazy

    report = check_reference_mapping(params_template, config, src_dir,
                                     groups=groups)
    problems = {
        prefix: {k: v for k, v in r.items() if k != "matched" and v}
        for prefix, r in report.items()}
    problems = {k: v for k, v in problems.items() if v}
    if problems:
        raise ValueError(
            f"reference checkpoint at {src_dir} does not line up with this "
            f"config's parameter tree: {problems}")

    mapping = reference_name_map(params_template, config)
    out = {}
    for prefix, keys in GROUP_FILES:
        if ("VAE" not in groups and prefix == "vae-model") or (
                "prior" not in groups and prefix == "prior-model"):
            continue
        reader = tf.train.load_checkpoint(os.path.join(src_dir, prefix))
        for name, path in mapping.items():
            if path[0] not in keys:
                continue
            value = np.asarray(reader.get_tensor(name))
            node = out
            for key in path[:-1]:
                node = node.setdefault(key, {})
            node[path[-1]] = value
    # scalars arrive as 0-d float64-safe numpy; normalise dtype to f32
    return jax.tree.map(lambda x: np.asarray(x, dtype=np.float32), out)


def export_reference_checkpoint(params, config, out_dir,
                                groups=("VAE", "prior")):
    """Write a reference-layout TF1 checkpoint pair from a param tree.

    Produces ``vae-model.{index,data-...}`` / ``prior-model.*`` plus the
    ``checkpoint`` state file, loadable by the reference's two
    ``tf.train.Saver``s (base.py:37-85) — the reverse migration, and the
    round-trip fixture for the import tests.
    """
    import tensorflow as tf  # lazy

    os.makedirs(out_dir, exist_ok=True)
    mapping = reference_name_map(params, config)
    leaves = dict(_flatten_with_paths(params))
    written = []
    for prefix, keys in GROUP_FILES:
        if ("VAE" not in groups and prefix == "vae-model") or (
                "prior" not in groups and prefix == "prior-model"):
            continue
        names = sorted(n for n, p in mapping.items() if p[0] in keys)
        if not names:
            continue
        tensors = [tf.constant(np.asarray(leaves[mapping[n]]))
                   for n in names]
        tf.raw_ops.SaveV2(prefix=os.path.join(out_dir, prefix),
                          tensor_names=names,
                          shape_and_slices=[""] * len(names),
                          tensors=tensors)
        written.append(prefix)
    if written:
        with open(os.path.join(out_dir, "checkpoint"), "w") as f:
            f.write(f'model_checkpoint_path: "{written[-1]}"\n')
            for prefix in written:
                f.write(f'all_model_checkpoint_paths: "{prefix}"\n')
    return written
