"""Pallas TPU kernels for the hot compute paths."""

from .flash import flash_group_attention, flash_group_attention_reference  # noqa: F401
