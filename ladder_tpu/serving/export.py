"""Ahead-of-time export of LaDDer inference functions via jax.export.

`export_inference` lowers each jitted inference path to StableHLO with the
trained weights baked in as constants and serializes it to
`<dir>/<name>.jaxexport`. The artifacts are self-contained: a consumer
process needs jax (any backend the artifact was lowered for) but NOT the
model-building code, the checkpoint files, or this package — the deployment
story the reference repo (training scripts + notebook only) never had.

Round-trip fidelity is tested in tests/test_serving.py: deserialized
callables reproduce the engine outputs bitwise on the export platform.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jexport


def _spec(x):
    return jax.ShapeDtypeStruct(x.shape, x.dtype)


def export_inference(engine, out_dir, names=None):
    """Serialize the engine's compiled paths. Returns {name: path}.

    names: subset of ('encode', 'decode', 'reconstruct', 'represent');
    defaults to every path the prior supports. Shapes are the engine's
    fixed serve_batch — the same static-shape contract serving uses.
    """
    if engine.mesh is not None:
        raise ValueError(
            "export_inference requires a single-device engine: a concrete "
            "device mesh would be baked into the artifact and bind it to "
            "that device count. Build the engine with mesh_devices=0 for "
            "export; consumers can re-shard the loaded callable themselves.")
    cfg = engine.config
    os.makedirs(out_dir, exist_ok=True)
    b = engine.serve_batch
    img = jax.ShapeDtypeStruct(
        (b, cfg["dim_input_x"], cfg["dim_input_y"],
         cfg["dim_input_channel"]), jnp.float32)
    code = jax.ShapeDtypeStruct((b, cfg["code_size"]), jnp.float32)

    paths = {
        "encode": (engine._encode, img),
        "decode": (engine._decode, code),
        "reconstruct": (engine._reconstruct, img),
    }
    if hasattr(engine, "_represent"):
        paths["represent"] = (engine._represent, img)
        paths["decode_representation"] = (
            engine._decode_representation,
            jax.ShapeDtypeStruct((b, cfg["representation_size"]),
                                 jnp.float32))

    params = engine.params
    written = {}
    for name in (names or paths):
        fn, arg = paths[name]
        baked = jax.jit(lambda x, _fn=fn: _fn(params, x))
        exp = jexport.export(baked)(arg)
        path = os.path.join(out_dir, f"{name}.jaxexport")
        with open(path, "wb") as f:
            f.write(exp.serialize())
        written[name] = path
    return written


def load_exported(path):
    """Deserialize one .jaxexport artifact -> a plain callable.

    Artifacts are traced with float32 inputs (images in [0,1]); the loader
    normalises uint8 inputs to [0,1] before calling so the engine's input
    contract ('uint8 or [0,1] float') holds for exported paths too — the
    graph itself has the uint8 branch baked out."""
    with open(path, "rb") as f:
        exp = jexport.deserialize(f.read())

    def call(x):
        x = jnp.asarray(x)
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) * (1.0 / 255.0)
        return exp.call(x.astype(jnp.float32))

    return call
