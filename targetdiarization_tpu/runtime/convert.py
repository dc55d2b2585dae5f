"""Weight-conversion harness: torch / ONNX checkpoints → JAX param trees.

SURVEY.md §7.2 step 2 ("torch→jax converter harness") and §5.4: when the
reference model weights are available (none ship in this environment —
checkpoints/ contains only .gitkeep), these utilities convert them into
this framework's orbax/npz checkpoints once, after which everything
loads through runtime.registry.from_pretrained.

Layout conventions handled automatically:
  torch nn.Linear weight (out, in)      → flax Dense kernel (in, out)
  torch nn.Conv1d  weight (out, in, k)  → flax Conv kernel (k, in, out)
  torch nn.Conv2d  weight (o, i, h, w)  → flax Conv kernel (h, w, i, o)
  torch depthwise conv (C, 1, k)        → flax kernel (k, 1, C)
  norm weight/bias                       → scale/bias (名 mapped by rule)
"""

from __future__ import annotations

import re

import numpy as np


def to_numpy(x):
    """torch tensor / np array → np array (torch optional)."""
    if hasattr(x, "detach"):
        return x.detach().cpu().numpy()
    return np.asarray(x)


def convert_linear(weight, bias=None):
    """torch Linear → {'kernel', 'bias'} flax Dense params."""
    out = {"kernel": to_numpy(weight).T}
    if bias is not None:
        out["bias"] = to_numpy(bias)
    return out


def convert_conv1d(weight, bias=None, depthwise: bool = False):
    """torch Conv1d (O, I/g, K) → flax Conv kernel (K, I/g, O)."""
    w = to_numpy(weight)
    out = {"kernel": np.transpose(w, (2, 1, 0))}
    if bias is not None:
        out["bias"] = to_numpy(bias)
    return out


def convert_conv2d(weight, bias=None):
    """torch Conv2d (O, I/g, H, W) → flax Conv kernel (H, W, I/g, O)."""
    w = to_numpy(weight)
    out = {"kernel": np.transpose(w, (2, 3, 1, 0))}
    if bias is not None:
        out["bias"] = to_numpy(bias)
    return out


def convert_norm(weight=None, bias=None):
    """torch LayerNorm/BatchNorm affine → flax {'scale', 'bias'}."""
    out = {}
    if weight is not None:
        out["scale"] = to_numpy(weight)
    if bias is not None:
        out["bias"] = to_numpy(bias)
    return out


def convert_embedding(weight):
    return {"embedding": to_numpy(weight)}


class ConversionRules:
    """Declarative state-dict → param-tree mapping.

    rules: list of (regex, target_path_template, converter_kind) where
    converter_kind ∈ {linear, conv1d, conv2d, norm, embedding, raw}.
    Weight/bias pairs are grouped by the stripped parameter stem.
    """

    KIND_FNS = {
        "linear": convert_linear,
        "conv1d": convert_conv1d,
        "conv2d": convert_conv2d,
        "norm": convert_norm,
        "embedding": lambda w, b=None: convert_embedding(w),
        "raw": lambda w, b=None: {"value": to_numpy(w)},
    }

    def __init__(self, rules: list):
        self.rules = [(re.compile(p), tgt, kind) for p, tgt, kind in rules]

    def convert(self, state_dict: dict) -> dict:
        """torch state_dict → nested flax-style param dict."""
        # group {stem: {'weight': t, 'bias': t}}
        groups: dict = {}
        for key, tensor in state_dict.items():
            stem, _, leaf = key.rpartition(".")
            if leaf in ("weight", "bias", "running_mean", "running_var",
                        "gamma", "beta"):
                groups.setdefault(stem, {})[leaf] = tensor
            else:
                groups.setdefault(key, {})["weight"] = tensor
        tree: dict = {}
        unmatched = []
        for stem, parts in groups.items():
            placed = False
            for pattern, target, kind in self.rules:
                m = pattern.fullmatch(stem)
                if not m:
                    continue
                path = target.format(*m.groups())
                converted = self.KIND_FNS[kind](
                    parts.get("weight"), parts.get("bias"))
                node = tree
                keys = path.split("/")
                for k in keys[:-1]:
                    node = node.setdefault(k, {})
                node[keys[-1]] = converted if kind != "raw" else converted["value"]
                placed = True
                break
            if not placed:
                unmatched.append(stem)
        if unmatched:
            raise KeyError(f"no conversion rule for: {sorted(unmatched)[:10]}")
        return tree


def verify_tree_shapes(converted: dict, template: dict, path: str = ""):
    """Assert the converted tree matches a model-init template's shapes;
    returns the list of checked leaf paths."""
    checked = []
    for key, val in template.items():
        sub = f"{path}/{key}" if path else key
        if key not in converted:
            raise KeyError(f"missing converted param: {sub}")
        if isinstance(val, dict):
            checked += verify_tree_shapes(converted[key], val, sub)
        else:
            got = np.asarray(converted[key]).shape
            want = tuple(val.shape)
            if got != want:
                raise ValueError(f"shape mismatch at {sub}: {got} vs {want}")
            checked.append(sub)
    return checked
