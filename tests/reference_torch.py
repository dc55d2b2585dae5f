"""Import the reference's torch model code for golden-activation parity
tests (SURVEY.md §4 plan item 1: numerical parity vs recorded reference
activations).

The reference tree at /root/reference is available read-only in this
environment and torch (cpu) is installed, so conversion tests can build
the *actual* reference modules at tiny geometry, serialize their state
dicts, convert with runtime/port_rules.py, and diff forwards. Everything
here is import scaffolding — no reference code is copied.

`rotary_embedding_torch` (lucidrains) is not installed; `_RotaryStub`
reimplements its `rotate_queries_or_keys` contract (interleaved-pair
rotation, theta 10000, applied to the first `dim` channels) so the
reference modules import. The stub is validated against this framework's
`rope_rotate` inside the parity tests themselves.
"""

from __future__ import annotations

import sys

REFERENCE_ROOT = "/root/reference"


def _install_rotary_stub():
    import torch
    from torch import nn

    class RotaryEmbedding(nn.Module):
        def __init__(self, dim, theta=10000):
            super().__init__()
            freqs = 1.0 / (
                theta ** (torch.arange(0, dim, 2).float() / dim))
            self.register_buffer("freqs", freqs)

        def rotate_queries_or_keys(self, x, seq_dim=-2):
            n = x.shape[seq_dim]
            t = torch.arange(n, dtype=self.freqs.dtype,
                             device=x.device)
            angles = torch.einsum("i,j->ij", t, self.freqs)  # (n, d/2)
            # interleave-duplicate: (n, d/2) -> (n, d) as a1 a1 a2 a2 ...
            angles = angles.repeat_interleave(2, dim=-1)
            rot_dim = angles.shape[-1]
            x_rot, x_pass = x[..., :rot_dim], x[..., rot_dim:]
            x1 = x_rot[..., 0::2]
            x2 = x_rot[..., 1::2]
            rotated = torch.stack((-x2, x1), dim=-1).reshape(x_rot.shape)
            out = x_rot * angles.cos() + rotated * angles.sin()
            return torch.cat((out, x_pass), dim=-1)

    mod = type(sys)("rotary_embedding_torch")
    mod.RotaryEmbedding = RotaryEmbedding
    sys.modules.setdefault("rotary_embedding_torch", mod)


def _install_torch_complex_stub():
    """dptnet.py imports torch_complex's ComplexTensor only for an
    isinstance check on complex spectra (its audio path never builds
    one); a minimal stand-in lets the module import."""
    import torch

    class ComplexTensor:  # never instantiated by the audio path
        pass

    tc = type(sys)("torch_complex")
    tc.functional = type(sys)("torch_complex.functional")
    tensor_mod = type(sys)("torch_complex.tensor")
    tensor_mod.ComplexTensor = ComplexTensor
    tc.tensor = tensor_mod
    sys.modules.setdefault("torch_complex", tc)
    sys.modules.setdefault("torch_complex.functional", tc.functional)
    sys.modules.setdefault("torch_complex.tensor", tensor_mod)


def load_reference_models():
    """→ the reference `look2hear.models` modules dict, or None if the
    reference tree / torch are unavailable (tests skip then)."""
    import importlib
    import os

    if not os.path.isdir(REFERENCE_ROOT):
        return None
    try:
        import torch  # noqa: F401
    except ImportError:
        return None
    _install_rotary_stub()
    _install_torch_complex_stub()
    # librosa is absent in-image; stft_tfgn.py only touches it on the
    # no-MKL fallback path which modern torch never takes — an empty
    # module lets TFGNet.py import.
    sys.modules.setdefault("librosa", type(sys)("librosa"))
    # synthetic package entries with __path__ pointing into the reference
    # tree: submodules import normally (relative imports work) without
    # executing look2hear/__init__.py, which drags in unavailable deps
    # (torch_complex, fast_bss_eval, pytorch_lightning, ...)
    for pkg, path in (
        ("look2hear", os.path.join(REFERENCE_ROOT, "look2hear")),
        ("look2hear.models",
         os.path.join(REFERENCE_ROOT, "look2hear", "models")),
        ("look2hear.utils",
         os.path.join(REFERENCE_ROOT, "look2hear", "utils")),
        ("look2hear.layers",
         os.path.join(REFERENCE_ROOT, "look2hear", "layers")),
    ):
        if pkg not in sys.modules:
            mod = type(sys)(pkg)
            mod.__path__ = [path]
            mod.__package__ = pkg
            sys.modules[pkg] = mod
    # TFGNet.py does `from ..layers import Stft`; expose it on the
    # synthetic package without executing layers/__init__.py (which
    # imports librosa-backed modules wholesale)
    if not hasattr(sys.modules["look2hear.layers"], "Stft"):
        stft_tfgn = importlib.import_module("look2hear.layers.stft_tfgn")
        sys.modules["look2hear.layers"].Stft = stft_tfgn.Stft
    mods = {}
    for name in ("mossformer2", "mossformer_block", "fsmn", "conv_module",
                 "apollo", "ConvTasnet", "dprnn", "dptnet", "bsrnn",
                 "sudormrf", "afrcnn", "tdanet", "skim", "TFGNet"):
        mods[name] = importlib.import_module(f"look2hear.models.{name}")
    return mods
