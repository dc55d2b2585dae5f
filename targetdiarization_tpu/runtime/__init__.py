"""Runtime layer: shape discipline, parameter store, model registry, config.

This is the TPU-native replacement for the reference's ad-hoc dynamic-shape
model invocation (every stage there takes arbitrary-length tensors; see
SURVEY.md §7.1): here every device call goes through a bucket ladder with
padding + masks so each (stage, bucket) pair compiles exactly once.
"""

from .buckets import (  # noqa: F401
    BucketLadder,
    pad_to,
    pad_to_bucket,
    length_mask,
    DEFAULT_AUDIO_LADDER,
)
from .params import (  # noqa: F401
    save_checkpoint,
    load_checkpoint,
    param_count,
    tree_cast,
)
from .registry import register_model, get_model_cls, list_models, from_pretrained  # noqa: F401
from .config import FrameworkConfig, env_config  # noqa: F401
