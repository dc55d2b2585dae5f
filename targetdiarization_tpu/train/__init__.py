"""Training stack: losses, data mixing, optimizers, DP trainer, metrics.

Parity with the reference's look2hear training system (SURVEY.md §2.2):
Lightning module + PIT/MixIT losses + dynamic-mixing data module +
optimizer/scheduler factories — re-designed as pure JAX/optax with data
parallelism via jax.sharding over a device mesh (the TPU-native
replacement for Lightning-DDP/NCCL, SURVEY.md §2.4).
"""

from .losses import (  # noqa: F401
    si_sdr,
    sd_sdr,
    snr,
    pairwise_neg_si_sdr,
    freq_mae_wav_l1,
    pit_loss,
    mixit_loss,
)
from .trainer import SeparationTrainer, TrainConfig  # noqa: F401
