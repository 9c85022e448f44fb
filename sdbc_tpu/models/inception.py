"""InceptionV3 pool3 (2048-d) feature extractor for FID — from scratch in JAX.

Replaces the reference's TF1 frozen graph ``classify_image_graph_def.pb``
(fid.py:36-66; the 2015-12-05 inception model, SURVEY.md E10).  The
architecture below is the standard InceptionV3 feature path that graph
computes up to the ``pool_3:0`` tensor: stem convs → 3× 35x35 inception
blocks → grid reduction → 4× 17x17 blocks → grid reduction → 2× 8x8 blocks →
global average pool (2048-d).

Conventions matching the frozen graph:
  - input is raw RGB in [0, 255] (fid.py:74-75 feeds unnormalised uint8 data);
    the graph's preprocessing — bilinear resize to 299x299 and (x-128)/128
    scaling — is applied here inside ``features``.
  - every conv is followed by batch-norm (beta only, no gamma, eps 1e-3) and
    ReLU, as in the 2015 graph.

Weights: random-init by default (zero-egress environment).  For numeric FID
parity with the reference, port the frozen-graph weights to an .npz whose keys
mirror this param tree (``load_npz``) — see eval/fid.py docstring.  FID
*differences* computed with a consistent extractor remain meaningful without
the port; absolute parity requires it (SURVEY.md §7 hard part 3).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sdbc_tpu.ops import nn


@dataclasses.dataclass(frozen=True)
class InceptionConfig:
    image_size: int = 299
    feature_dim: int = 2048
    width_mult: float = 1.0  # tiny test configs scale channel counts

    @staticmethod
    def fid() -> "InceptionConfig":
        return InceptionConfig()

    @staticmethod
    def tiny() -> "InceptionConfig":
        return InceptionConfig(image_size=75, width_mult=0.125)


# ---------------------------------------------------------------------------
# conv + bn + relu unit


def _init_cbr(key, cin, cout, kh, kw):
    return {
        "w": jax.random.normal(key, (kh, kw, cin, cout), jnp.float32)
        * (2.0 / (kh * kw * cin)) ** 0.5,
        "beta": jnp.zeros((cout,), jnp.float32),
        "mean": jnp.zeros((cout,), jnp.float32),
        "var": jnp.ones((cout,), jnp.float32),
    }


def _cbr(p, x, stride=1, padding="SAME"):
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    y = (y - p["mean"]) * jax.lax.rsqrt(p["var"] + 1e-3)
    if "gamma" in p:  # torchvision/pt-inception ports carry a BN scale
        y = y * p["gamma"]
    y = y + p["beta"]
    return jax.nn.relu(y)


def _max_pool(x, k=3, s=2, padding="VALID"):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, k, k, 1), (1, s, s, 1), padding)


def _avg_pool_same(x, k=3):
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, k, k, 1), (1, 1, 1, 1),
                              "SAME")
    ones = jnp.ones_like(x[..., :1])
    c = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, k, k, 1),
                              (1, 1, 1, 1), "SAME")
    return s / c


# ---------------------------------------------------------------------------
# inception blocks (channel specs follow the 2015 InceptionV3 feature path)


def _scale(c, m):
    return max(int(round(c * m)), 8) if m != 1.0 else c


def _init_block35(keys, cin, pool_ch, m):
    k = iter(keys)
    return {
        "b1x1": _init_cbr(next(k), cin, _scale(64, m), 1, 1),
        "b5x5_1": _init_cbr(next(k), cin, _scale(48, m), 1, 1),
        "b5x5_2": _init_cbr(next(k), _scale(48, m), _scale(64, m), 5, 5),
        "b3x3_1": _init_cbr(next(k), cin, _scale(64, m), 1, 1),
        "b3x3_2": _init_cbr(next(k), _scale(64, m), _scale(96, m), 3, 3),
        "b3x3_3": _init_cbr(next(k), _scale(96, m), _scale(96, m), 3, 3),
        "pool": _init_cbr(next(k), cin, _scale(pool_ch, m), 1, 1),
    }


def _block35(p, x):
    b0 = _cbr(p["b1x1"], x)
    b1 = _cbr(p["b5x5_2"], _cbr(p["b5x5_1"], x))
    b2 = _cbr(p["b3x3_3"], _cbr(p["b3x3_2"], _cbr(p["b3x3_1"], x)))
    b3 = _cbr(p["pool"], _avg_pool_same(x))
    return jnp.concatenate([b0, b1, b2, b3], axis=-1)


def _init_block17(keys, cin, mid, m):
    k = iter(keys)
    mid = _scale(mid, m)
    out = _scale(192, m)
    return {
        "b1x1": _init_cbr(next(k), cin, out, 1, 1),
        "b7x7_1": _init_cbr(next(k), cin, mid, 1, 1),
        "b7x7_2": _init_cbr(next(k), mid, mid, 1, 7),
        "b7x7_3": _init_cbr(next(k), mid, out, 7, 1),
        "b7x7d_1": _init_cbr(next(k), cin, mid, 1, 1),
        "b7x7d_2": _init_cbr(next(k), mid, mid, 7, 1),
        "b7x7d_3": _init_cbr(next(k), mid, mid, 1, 7),
        "b7x7d_4": _init_cbr(next(k), mid, mid, 7, 1),
        "b7x7d_5": _init_cbr(next(k), mid, out, 1, 7),
        "pool": _init_cbr(next(k), cin, out, 1, 1),
    }


def _block17(p, x):
    b0 = _cbr(p["b1x1"], x)
    b1 = _cbr(p["b7x7_3"], _cbr(p["b7x7_2"], _cbr(p["b7x7_1"], x)))
    b2 = x
    for name in ("b7x7d_1", "b7x7d_2", "b7x7d_3", "b7x7d_4", "b7x7d_5"):
        b2 = _cbr(p[name], b2)
    b3 = _cbr(p["pool"], _avg_pool_same(x))
    return jnp.concatenate([b0, b1, b2, b3], axis=-1)


def _init_block8(keys, cin, m):
    k = iter(keys)
    return {
        "b1x1": _init_cbr(next(k), cin, _scale(320, m), 1, 1),
        "b3x3_1": _init_cbr(next(k), cin, _scale(384, m), 1, 1),
        "b3x3_2a": _init_cbr(next(k), _scale(384, m), _scale(384, m), 1, 3),
        "b3x3_2b": _init_cbr(next(k), _scale(384, m), _scale(384, m), 3, 1),
        "b3x3d_1": _init_cbr(next(k), cin, _scale(448, m), 1, 1),
        "b3x3d_2": _init_cbr(next(k), _scale(448, m), _scale(384, m), 3, 3),
        "b3x3d_3a": _init_cbr(next(k), _scale(384, m), _scale(384, m), 1, 3),
        "b3x3d_3b": _init_cbr(next(k), _scale(384, m), _scale(384, m), 3, 1),
        "pool": _init_cbr(next(k), cin, _scale(192, m), 1, 1),
    }


def _block8(p, x, pool: str = "avg"):
    b0 = _cbr(p["b1x1"], x)
    b1 = _cbr(p["b3x3_1"], x)
    b1 = jnp.concatenate([_cbr(p["b3x3_2a"], b1), _cbr(p["b3x3_2b"], b1)], -1)
    b2 = _cbr(p["b3x3d_2"], _cbr(p["b3x3d_1"], x))
    b2 = jnp.concatenate([_cbr(p["b3x3d_3a"], b2), _cbr(p["b3x3d_3b"], b2)], -1)
    # the 2015 FID graph max-pools in the LAST 8x8 block (the pt-inception
    # "FIDInceptionE_2" quirk); avg elsewhere
    pooled = _max_pool(x, 3, 1, "SAME") if pool == "max" else _avg_pool_same(x)
    b3 = _cbr(p["pool"], pooled)
    return jnp.concatenate([b0, b1, b2, b3], axis=-1)


# ---------------------------------------------------------------------------
# full model


def init(key, cfg: InceptionConfig = InceptionConfig()):
    m = cfg.width_mult
    ks = iter(jax.random.split(key, 256))

    def nk(n):
        return [next(ks) for _ in range(n)]

    p = {
        "stem": {
            "c1": _init_cbr(next(ks), 3, _scale(32, m), 3, 3),
            "c2": _init_cbr(next(ks), _scale(32, m), _scale(32, m), 3, 3),
            "c3": _init_cbr(next(ks), _scale(32, m), _scale(64, m), 3, 3),
            "c4": _init_cbr(next(ks), _scale(64, m), _scale(80, m), 1, 1),
            "c5": _init_cbr(next(ks), _scale(80, m), _scale(192, m), 3, 3),
        }
    }
    cin = _scale(192, m)
    p["mixed35"] = []
    for pool_ch in (32, 64, 64):
        p["mixed35"].append(_init_block35(nk(7), cin, pool_ch, m))
        cin = _scale(64, m) * 2 + _scale(96, m) + _scale(pool_ch, m)

    # grid reduction 35→17
    p["red17"] = {
        "b3x3": _init_cbr(next(ks), cin, _scale(384, m), 3, 3),
        "b3x3d_1": _init_cbr(next(ks), cin, _scale(64, m), 1, 1),
        "b3x3d_2": _init_cbr(next(ks), _scale(64, m), _scale(96, m), 3, 3),
        "b3x3d_3": _init_cbr(next(ks), _scale(96, m), _scale(96, m), 3, 3),
    }
    cin = cin + _scale(384, m) + _scale(96, m)

    p["mixed17"] = []
    for mid in (128, 160, 160, 192):
        p["mixed17"].append(_init_block17(nk(10), cin, mid, m))
        cin = _scale(192, m) * 4

    # grid reduction 17→8
    p["red8"] = {
        "b3x3_1": _init_cbr(next(ks), cin, _scale(192, m), 1, 1),
        "b3x3_2": _init_cbr(next(ks), _scale(192, m), _scale(320, m), 3, 3),
        "b7x7_1": _init_cbr(next(ks), cin, _scale(192, m), 1, 1),
        "b7x7_2": _init_cbr(next(ks), _scale(192, m), _scale(192, m), 1, 7),
        "b7x7_3": _init_cbr(next(ks), _scale(192, m), _scale(192, m), 7, 1),
        "b7x7_4": _init_cbr(next(ks), _scale(192, m), _scale(192, m), 3, 3),
    }
    cin = cin + _scale(320, m) + _scale(192, m)

    p["mixed8"] = []
    for _ in range(2):
        p["mixed8"].append(_init_block8(nk(9), cin, m))
        cin = (_scale(320, m) + 2 * _scale(384, m) + 2 * _scale(384, m)
               + _scale(192, m))
    return p


def features(params, images, cfg: InceptionConfig = InceptionConfig()):
    """images: (N, H, W, 3) RGB in [0, 255] → pool3 features (N, 2048).

    Applies the frozen graph's own preprocessing: bilinear resize to 299² and
    (x - 128) / 128 scaling.
    """
    x = images.astype(jnp.float32)
    n = x.shape[0]
    if x.shape[1] != cfg.image_size or x.shape[2] != cfg.image_size:
        x = jax.image.resize(x, (n, cfg.image_size, cfg.image_size, 3),
                             method="bilinear")
    x = (x - 128.0) / 128.0

    s = params["stem"]
    x = _cbr(s["c1"], x, stride=2, padding="VALID")
    x = _cbr(s["c2"], x, padding="VALID")
    x = _cbr(s["c3"], x, padding="SAME")
    x = _max_pool(x)
    x = _cbr(s["c4"], x, padding="VALID")
    x = _cbr(s["c5"], x, padding="VALID")
    x = _max_pool(x)

    for blk in params["mixed35"]:
        x = _block35(blk, x)

    r = params["red17"]
    b0 = _cbr(r["b3x3"], x, stride=2, padding="VALID")
    b1 = _cbr(r["b3x3d_1"], x)
    b1 = _cbr(r["b3x3d_2"], b1)
    b1 = _cbr(r["b3x3d_3"], b1, stride=2, padding="VALID")  # reduce on last conv
    b2 = _max_pool(x)
    x = jnp.concatenate([b0, b1, b2], axis=-1)

    for blk in params["mixed17"]:
        x = _block17(blk, x)

    r = params["red8"]
    b0 = _cbr(r["b3x3_2"], _cbr(r["b3x3_1"], x), stride=2, padding="VALID")
    b1 = _cbr(r["b7x7_2"], _cbr(r["b7x7_1"], x))
    b1 = _cbr(r["b7x7_3"], b1)
    b1 = _cbr(r["b7x7_4"], b1, stride=2, padding="VALID")
    b2 = _max_pool(x)
    x = jnp.concatenate([b0, b1, b2], axis=-1)

    for i, blk in enumerate(params["mixed8"]):
        x = _block8(blk, x, pool="max" if i == len(params["mixed8"]) - 1
                    else "avg")

    return jnp.mean(x, axis=(1, 2))  # global average pool → (N, C)


def save_npz(path: str, params) -> None:
    """Flatten the param tree to 'a/b/0/c'-keyed npz (port target format)."""
    flat = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}/{k}" if prefix else str(k))
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, f"{prefix}/{i}")
        else:
            flat[prefix] = np.asarray(node)

    walk(params, "")
    np.savez(path, **flat)


def load_npz(path: str):
    """Load a ported weight archive ('a/b/0/c' flat keys → nested tree)."""
    flat = np.load(path)
    tree: dict = {}
    for key in flat.files:
        parts = key.split("/")
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(flat[key])

    def fix(node):
        if isinstance(node, dict):
            if node and all(k.isdigit() for k in node):
                return [fix(node[str(i)]) for i in range(len(node))]
            return {k: fix(v) for k, v in node.items()}
        return node

    return fix(tree)
