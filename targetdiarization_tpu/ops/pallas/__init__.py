"""Pallas TPU kernels for the hot compute paths."""

from .flash import (  # noqa: F401
    flash_gated_attention,
    flash_gated_attention_reference,
    flash_group_attention,
    flash_group_attention_reference,
)
