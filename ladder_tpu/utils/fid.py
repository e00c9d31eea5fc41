"""FID evaluation utility.

The reference's standalone FID tool (/root/reference/codes/utils.py:127-200)
resizes two npz image sets, extracts InceptionV3/VGG16 imagenet features and
computes the Frechet distance via tf.contrib.gan. Here the Frechet distance
itself is exact closed-form numpy/scipy (matrix sqrt of the covariance
product), and the feature extractor is pluggable:

  * pass any feature_fn(images [N,H,W,3] float in [-1,1]) -> [N,D]
  * inception_feature_fn() builds an InceptionV3 extractor from torchvision
    or keras when pretrained weights are available locally, and raises a
    clear error otherwise (this environment has no network egress — FID
    against the standard Inception embedding needs the weights on disk).

The preprocessing pipeline (resize to 64x64 then 140x140, [-1,1] scaling,
clip for generated sets) follows the reference exactly.
"""

from __future__ import annotations

import numpy as np
from scipy import linalg


def preprocess_input_original(x):
    """utils.py:127-131: /255 then [-1,1]."""
    x = x / 255.0
    x = (x - 0.5) * 2.0
    return x


def preprocess_input_generated(x):
    """utils.py:134-138: clip [0,1] then [-1,1]."""
    x = np.clip(x, 0.0, 1.0)
    x = (x - 0.5) * 2.0
    return x


def frechet_distance(mu1, sigma1, mu2, sigma2, eps=1e-6):
    """||mu1-mu2||^2 + Tr(S1 + S2 - 2 (S1 S2)^{1/2}) — the Frechet distance
    between two Gaussians (what tf.contrib.gan.eval computed for the
    reference, utils.py:196-200)."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean = linalg.sqrtm(sigma1.dot(sigma2))
    if isinstance(covmean, tuple):  # older scipy returns (sqrtm, errest)
        covmean = covmean[0]
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * np.trace(covmean))


def fid_from_activations(act1, act2):
    """FID from two activation sets [N,D]."""
    mu1, sigma1 = act1.mean(axis=0), np.cov(act1, rowvar=False)
    mu2, sigma2 = act2.mean(axis=0), np.cov(act2, rowvar=False)
    return frechet_distance(mu1, sigma1, mu2, sigma2)


def resize_images_np(images, size):
    """Bilinear resize (TF1 legacy coordinates) on host via the shared
    matmul formulation."""
    import jax.numpy as jnp

    from ladder_tpu.ops.image import resize_bilinear_tf1
    return np.asarray(resize_bilinear_tf1(jnp.asarray(images), size, size))


def _torchvision_normalize(images_pm1):
    """[-1,1] host arrays (the reference's keras preprocessing convention,
    utils.py:151-162) -> NCHW torch tensors normalised the way the
    torchvision ImageNet weights were trained (per-channel mean/std). The
    keras backbones consumed [-1,1] directly; feeding that distribution to
    torchvision weights would shift every activation, so scores from these
    extractors are standard torchvision-FID numbers rather than
    bit-compatible with the reference's keras-FID (unreproducible offline)."""
    import torch

    mean = np.asarray([0.485, 0.456, 0.406], np.float32)
    std = np.asarray([0.229, 0.224, 0.225], np.float32)
    x01 = (images_pm1 + 1.0) * 0.5
    x = (x01 - mean[None, None, None, :]) / std[None, None, None, :]
    return torch.from_numpy(
        np.transpose(x, (0, 3, 1, 2)).astype(np.float32))


def inception_feature_fn(pooling="avg"):
    """Build an InceptionV3 pool-feature extractor if pretrained weights are
    available locally (torchvision or keras caches). Raises RuntimeError with
    guidance otherwise. pooling: 'avg' (global average, the torchvision
    head) or 'max' (reference's pooling_option, utils.py:169)."""
    try:
        import torch
        import torchvision  # noqa: F401
        from torchvision.models import Inception_V3_Weights, inception_v3

        # transform_input=False: the weights' builder would otherwise remap
        # the (already normalised) channels a second time
        net = inception_v3(weights=Inception_V3_Weights.IMAGENET1K_V1,
                           transform_input=False)
        if pooling == "max":
            net.avgpool = torch.nn.AdaptiveMaxPool2d((1, 1))
        elif pooling != "avg":
            raise ValueError(f"pooling must be 'avg' or 'max': {pooling!r}")
        net.fc = torch.nn.Identity()
        net.eval()

        def feature_fn(images):
            with torch.no_grad():
                return net(_torchvision_normalize(images)).numpy()

        return feature_fn
    except ValueError:
        raise
    except Exception as e:
        raise RuntimeError(
            "No pretrained InceptionV3 available locally (torchvision "
            "missing or weights not cached; this environment has no network "
            "egress). Pass a custom feature_fn to compute_FID_score, or "
            "provide weights on disk. Underlying error: {}".format(e))


def vgg16_feature_fn(pooling="avg"):
    """VGG16 conv-feature extractor matching the reference's
    keras.applications.vgg16.VGG16(include_top=False, pooling=...) option
    (/root/reference/codes/utils.py:183-194): the five conv blocks
    (ending in block5_pool) followed by a global avg/max pool -> [N,512].
    Uses torchvision weights when cached locally; clear error otherwise."""
    try:
        import torch
        from torchvision.models import VGG16_Weights, vgg16

        net = vgg16(weights=VGG16_Weights.IMAGENET1K_V1)
        features = net.features  # conv blocks incl. final MaxPool2d
        features.eval()

        def feature_fn(images):
            with torch.no_grad():
                f = features(_torchvision_normalize(images))  # [N,512,h,w]
                if pooling == "avg":
                    f = f.mean(dim=(2, 3))
                elif pooling == "max":
                    f = f.amax(dim=(2, 3))
                else:
                    raise ValueError(pooling)
                return f.numpy()

        return feature_fn
    except Exception as e:
        raise RuntimeError(
            "No pretrained VGG16 available locally (torchvision missing or "
            "weights not cached; this environment has no network egress). "
            "Pass a custom feature_fn to compute_FID_score, or provide "
            "weights on disk. Underlying error: {}".format(e))


def encoder_feature_fn(config, checkpoint_dir=None):
    """A REAL conv-network extractor that exists in this environment: the
    trained LaDDer encoder's code_mean head as the embedding (a
    model-space FID, not the ImageNet-Inception FID — useful offline and
    as an end-to-end exercise of the full load->preprocess->resize->
    extract->Frechet pipeline; cf. the reference's pluggable extractor
    choice, utils.py:164-194).

    Returns feature_fn(images [N,H,W,C] float in [-1,1]) -> [N, code_size].
    Images are resized to the model's input size and rescaled to the
    encoder's [0,1] convention on device.
    """
    import jax
    import jax.numpy as jnp

    from ladder_tpu.models.builder import make_model
    from ladder_tpu.ops.image import resize_bilinear_tf1
    from ladder_tpu.utils.checkpoint import CheckpointManager

    cfg = dict(config)
    if checkpoint_dir is not None:
        cfg["checkpoint_dir"] = checkpoint_dir
    model = make_model(cfg)
    state = {"params": model.init(jax.random.PRNGKey(0))}
    state = CheckpointManager(cfg).load(state, "VAE")
    params = state["params"]
    h, w = cfg["dim_input_x"], cfg["dim_input_y"]
    c = cfg["dim_input_channel"]

    @jax.jit
    def embed(x):
        x = (x + 1.0) * 0.5                      # [-1,1] -> [0,1]
        if x.shape[1] != h or x.shape[2] != w:
            x = resize_bilinear_tf1(x, h, w)
        if x.shape[3] != c and c == 1:            # grayscale model, RGB npz
            x = jnp.mean(x, axis=3, keepdims=True)
        elif x.shape[3] != c:                     # RGB model, grayscale npz
            x = jnp.broadcast_to(x, x.shape[:3] + (c,))
        return model.encode(params, x)[0]

    def feature_fn(images):
        x = np.asarray(images, np.float32)
        if x.ndim == 3:
            x = x[..., None]
        return np.asarray(embed(jnp.asarray(x)))

    return feature_fn


def compute_FID_score(data_file1, data_file2, feature_fn=None,
                      second_set="generated", key="sampled_images",
                      resize_to=64, feature_size=140,
                      network="inception", pooling="avg"):
    """Reference-compatible entry (utils.py:141-200): load two npz image
    sets, preprocess, resize, extract features, return FID.

    network="inception": resize to 64 then 140, InceptionV3 features
    (utils.py:164-181). network="VGG": the 64x64 sets feed VGG16 directly
    (the reference declares input_shape 128 but predicts on the 64x64
    tensors — include_top=False VGG is fully convolutional, utils.py:
    183-194). An explicit feature_fn overrides both."""
    d1 = np.load(data_file1)[key].astype(np.float32)
    d2 = np.load(data_file2)[key].astype(np.float32)
    d1 = preprocess_input_original(d1)
    d2 = (preprocess_input_generated(d2) if second_set == "generated"
          else preprocess_input_original(d2))
    d1 = resize_images_np(d1, resize_to)
    d2 = resize_images_np(d2, resize_to)
    if feature_fn is None:
        if network == "inception":
            feature_fn = inception_feature_fn(pooling)
            d1 = resize_images_np(d1, feature_size)
            d2 = resize_images_np(d2, feature_size)
        elif network == "VGG":
            feature_fn = vgg16_feature_fn(pooling)
        else:
            raise ValueError(f"unknown FID network: {network!r}")
    act1 = feature_fn(d1)
    act2 = feature_fn(d2)
    score = fid_from_activations(act1, act2)
    print("FID score between {} and {} is:\n{}".format(
        data_file1, data_file2, score))
    return score
