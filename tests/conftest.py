"""Test configuration: force CPU with a virtual 8-device mesh.

Tests never require TPU hardware; multi-chip sharding paths are
exercised on 8 virtual CPU devices (SURVEY.md §2.4 TPU-native plan).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The sandbox's sitecustomize force-registers the TPU backend regardless of
# JAX_PLATFORMS; jax.config wins over it.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

ASSETS = "/root/reference/assets"


@pytest.fixture(scope="session")
def chat_mix():
    from targetdiarization_tpu.utils.audio_io import read_audio

    audio, sr = read_audio(os.path.join(ASSETS, "chat_mix.wav"))
    return np.asarray(audio), sr


@pytest.fixture(scope="session")
def female_a():
    from targetdiarization_tpu.utils.audio_io import read_audio

    audio, sr = read_audio(os.path.join(ASSETS, "female_a.wav"))
    return np.asarray(audio), sr


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
