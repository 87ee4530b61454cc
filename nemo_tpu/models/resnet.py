"""Functional ResNet-50 feature extractor (NHWC, inference mode).

Behavioral reference: the torchvision ResNet-50 backbone used by both HMR
(hmr/hmr_model.py:60-207) and VIBE's feature extractor
(VIBE/lib/models/spin.py). Frozen inference component: BatchNorm folds into
an affine from running stats; weights convert from a torchvision/SPIN
checkpoint.

TPU notes: NHWC layout (XLA's preferred conv layout on TPU), bf16-friendly
convs (precision left at the caller's default), all state an explicit
param pytree.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jnp.ndarray]

# ResNet-50 stage structure
STAGE_BLOCKS = (3, 4, 6, 3)
STAGE_CHANNELS = (256, 512, 1024, 2048)


def _conv(x, w, stride=1):
    # Explicit torch-style symmetric padding (kernel//2) — XLA's SAME uses
    # asymmetric padding at even sizes with stride 2, which shifts the grid
    # one pixel relative to torch and breaks weight-conversion parity.
    k = w.shape[0]
    pad = k // 2
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bn(x, p, prefix):
    mean, var = p[f"{prefix}.mean"], p[f"{prefix}.var"]
    gamma, beta = p[f"{prefix}.gamma"], p[f"{prefix}.beta"]
    return (x - mean) * jax.lax.rsqrt(var + 1e-5) * gamma + beta


def _bottleneck(x, p, prefix, stride):
    """1x1 -> 3x3 -> 1x1 bottleneck with optional downsample."""
    out = _conv(x, p[f"{prefix}.conv1.w"])
    out = jax.nn.relu(_bn(out, p, f"{prefix}.bn1"))
    out = _conv(out, p[f"{prefix}.conv2.w"], stride=stride)
    out = jax.nn.relu(_bn(out, p, f"{prefix}.bn2"))
    out = _conv(out, p[f"{prefix}.conv3.w"])
    out = _bn(out, p, f"{prefix}.bn3")
    if f"{prefix}.down.w" in p:
        sc = _conv(x, p[f"{prefix}.down.w"], stride=stride)
        sc = _bn(sc, p, f"{prefix}.downbn")
    else:
        sc = x
    return jax.nn.relu(out + sc)


def resnet50_features(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """(B, 224, 224, 3) -> (B, 2048) pooled features."""
    out = _conv(x, p["conv1.w"], stride=2)
    out = jax.nn.relu(_bn(out, p, "bn1"))
    # 3x3 max pool stride 2 with torch's padding=1 semantics
    out = jax.lax.reduce_window(
        out, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))
    for si, (nblocks, _) in enumerate(zip(STAGE_BLOCKS, STAGE_CHANNELS)):
        for bi in range(nblocks):
            stride = 2 if (bi == 0 and si > 0) else 1
            out = _bottleneck(out, p, f"layer{si + 1}.{bi}", stride)
    return jnp.mean(out, axis=(1, 2))  # global average pool -> (B, 2048)


def init_resnet50(key) -> Params:
    """He-init random weights (for tests; real use converts torch)."""
    p: Params = {}
    keys = jax.random.split(key, 256)
    ki = iter(range(256))

    def conv_init(shape):
        fan_in = shape[0] * shape[1] * shape[2]
        return jax.random.normal(keys[next(ki)], shape) * np.sqrt(2.0 / fan_in)

    def add_bn(prefix, c):
        p[f"{prefix}.mean"] = jnp.zeros(c)
        p[f"{prefix}.var"] = jnp.ones(c)
        p[f"{prefix}.gamma"] = jnp.ones(c)
        p[f"{prefix}.beta"] = jnp.zeros(c)

    p["conv1.w"] = conv_init((7, 7, 3, 64))
    add_bn("bn1", 64)
    in_c = 64
    for si, (nblocks, out_c) in enumerate(zip(STAGE_BLOCKS, STAGE_CHANNELS)):
        mid = out_c // 4
        for bi in range(nblocks):
            pre = f"layer{si + 1}.{bi}"
            p[f"{pre}.conv1.w"] = conv_init((1, 1, in_c, mid))
            add_bn(f"{pre}.bn1", mid)
            p[f"{pre}.conv2.w"] = conv_init((3, 3, mid, mid))
            add_bn(f"{pre}.bn2", mid)
            p[f"{pre}.conv3.w"] = conv_init((1, 1, mid, out_c))
            add_bn(f"{pre}.bn3", out_c)
            if bi == 0:
                p[f"{pre}.down.w"] = conv_init((1, 1, in_c, out_c))
                add_bn(f"{pre}.downbn", out_c)
            in_c = out_c
    return p


def convert_torch_resnet50(sd: dict, prefix: str = "") -> Params:
    """torchvision-layout state dict -> our NHWC param pytree.

    Conv weights transpose OIHW -> HWIO. Accepts an optional key prefix
    (SPIN checkpoints nest the backbone under e.g. '' or 'feature_extractor.').
    """
    def get(k):
        v = sd[prefix + k]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v)

    def conv(k):
        return jnp.asarray(get(k).transpose(2, 3, 1, 0))

    p: Params = {"conv1.w": conv("conv1.weight")}

    def bn(dst, src):
        p[f"{dst}.gamma"] = jnp.asarray(get(f"{src}.weight"))
        p[f"{dst}.beta"] = jnp.asarray(get(f"{src}.bias"))
        p[f"{dst}.mean"] = jnp.asarray(get(f"{src}.running_mean"))
        p[f"{dst}.var"] = jnp.asarray(get(f"{src}.running_var"))

    bn("bn1", "bn1")
    for si, nblocks in enumerate(STAGE_BLOCKS):
        for bi in range(nblocks):
            dst = f"layer{si + 1}.{bi}"
            src = f"layer{si + 1}.{bi}"
            for ci in (1, 2, 3):
                p[f"{dst}.conv{ci}.w"] = conv(f"{src}.conv{ci}.weight")
                bn(f"{dst}.bn{ci}", f"{src}.bn{ci}")
            if f"{prefix}{src}.downsample.0.weight" in sd:
                p[f"{dst}.down.w"] = conv(f"{src}.downsample.0.weight")
                bn(f"{dst}.downbn", f"{src}.downsample.1")
    return p
