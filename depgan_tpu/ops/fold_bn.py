"""Inference-time BatchNorm folding.

In frozen-statistics mode (all inference paths, and the reference-faithful
WGAN graphs), BatchNorm is the affine ``y = (x - mean)/sqrt(var + eps) *
gamma + beta``. For a BN that directly follows a conv/dense/deconv layer it
folds exactly into that layer's weights:

    W' = W * s,   b' = (b - mean) * s + beta,   s = gamma / sqrt(var + eps)

eliminating every BN elementwise pass over the (B, 256, 256, C) activations
— a pure HBM-bandwidth win on TPU. The fold keeps the variable-tree
structure intact by resetting the BN to an exact identity
(scale=1, bias=0, mean=0, var=1-eps), so the same module code runs
unchanged and outputs are bit-identical up to float rounding.

Applies to every `conv2d_*`/`dense_*`/`deconv2d_*` + `bn_*`/`dense_bn_*`
pair in the generator (models/blocks.py). The critic has no BN.

The fold is pure jnp and therefore **trace-safe**: called inside a jitted
training step on live parameters it stays differentiable, so gradients flow
back to the raw conv kernel AND the BN scale/bias exactly as they do
through the unfolded frozen-BN graph (the training-side fused path,
ops/fast_gen.FusedGenerator, relies on this).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.blocks import KERAS_BN_EPS

# (weight-layer prefix, bn prefix) pairs as built in models/blocks.py.
_PAIRS = (
    ("conv2d_", "bn_"),
    ("dense_", "dense_bn_"),
    ("deconv2d_", "bn_"),
)


def _find_layers(tree: dict, prefix=()):
    """Yield (parent_dict_path, name) for each module dict that holds
    ndarray leaves."""
    for k, v in tree.items():
        if isinstance(v, dict):
            if any(not isinstance(x, dict) for x in v.values()):
                yield prefix, k, v
            else:
                yield from _find_layers(v, prefix + (k,))


def _get(tree, path):
    node = tree
    for k in path:
        node = node[k]
    return node


def fold_batch_norms(variables: dict, eps: float = KERAS_BN_EPS) -> dict:
    """Returns new variables with every conv+BN pair folded (copy)."""
    # tree.map rebuilds every container, so the in-place leaf swaps below
    # never alias the caller's dicts; leaves pass through untouched (numpy
    # arrays, jnp arrays, or tracers alike).
    params = jax.tree.map(lambda a: a, variables["params"])
    stats = jax.tree.map(lambda a: a, variables.get("batch_stats", {}))

    layers = list(_find_layers(params))
    by_parent: dict[tuple, dict[str, dict]] = {}
    for parent, name, leafdict in layers:
        by_parent.setdefault(parent, {})[name] = leafdict

    for parent, siblings in by_parent.items():
        for wprefix, bnprefix in _PAIRS:
            for name, leaves in list(siblings.items()):
                if not name.startswith(wprefix) or "kernel" not in leaves:
                    continue
                suffix = name[len(wprefix):]
                bn_name = bnprefix + suffix
                if bn_name not in siblings:
                    continue
                bn = siblings[bn_name]
                try:
                    bn_stats = _get(stats, parent)[bn_name]
                except (KeyError, TypeError):
                    continue
                gamma, beta = bn["scale"], bn["bias"]
                mean, var = bn_stats["mean"], bn_stats["var"]
                s = gamma / jnp.sqrt(var + eps)

                kernel = jnp.asarray(leaves["kernel"])
                bias = leaves.get("bias")
                bias = jnp.zeros(s.shape, kernel.dtype) if bias is None else jnp.asarray(bias)
                if name.startswith("deconv2d_"):
                    # Keras deconv layout (kh, kw, out, in): scale axis 2.
                    kernel = kernel * s[None, None, :, None]
                else:
                    # conv HWIO / dense (in, out): scale the last axis.
                    kernel = kernel * s
                bias = (bias - mean) * s + beta

                leaves["kernel"] = kernel.astype(jnp.float32)
                leaves["bias"] = bias.astype(jnp.float32)
                # Reset BN to exact identity: (x-0)/sqrt((1-eps)+eps)*1+0 = x.
                bn["scale"] = jnp.ones_like(gamma)
                bn["bias"] = jnp.zeros_like(beta)
                bn_stats["mean"] = jnp.zeros_like(mean)
                bn_stats["var"] = jnp.full_like(var, 1.0 - eps)

    out = dict(variables)
    out["params"] = params
    out["batch_stats"] = stats
    return out
