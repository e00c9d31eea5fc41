"""Production inference for trained LaDDer models.

The reference repo ends at training + notebook demos; deploying a trained
model means re-driving its TF1 graph by hand. This package is the
TPU-native serving layer the new framework adds on top of the same
artifacts: the two-group msgpack checkpoints (utils/checkpoint.py, mirroring
/root/reference/codes/base.py:37-85's two tf.train.Savers) and the
GM_prior_info.npz hyper-prior fit (base.py:768-777).

- engine.InferenceEngine: fixed-shape jitted encode/decode/reconstruct/
  represent/generate paths with pad-to-batch, optional bf16 and optional
  data-parallel mesh sharding for multi-chip serving.
- export: ahead-of-time jax.export (StableHLO) serialization of the
  inference functions with weights baked in — artifacts a separate process
  (or a later jax version) can run without the model-building code.
- serve.py (repo root): CLI wrapper — batch reconstruction/generation jobs
  and a minimal stdlib HTTP endpoint.
"""

from ladder_tpu.serving.batcher import Batcher
from ladder_tpu.serving.engine import InferenceEngine
from ladder_tpu.serving.export import export_inference, load_exported

__all__ = ["Batcher", "InferenceEngine", "export_inference",
           "load_exported"]
