"""Utility substrate (reference parity: big_vision/utils.py, split into modules)."""

from small_vision_tpu.utils.trees import (  # noqa: F401
    tree_flatten_with_names,
    tree_map_with_names,
    tree_map_with_regex,
    tree_get,
    recover_tree,
    tree_broadcast,
    make_mask_trees,
    tree_size,
)
from small_vision_tpu.utils.schedules import (  # noqa: F401
    steps,
    create_learning_rate_schedule,
)
from small_vision_tpu.utils.misc import (  # noqa: F401
    itstime,
    hms,
    onehot,
    make_grid,
    sync,
    pad_shard_unpad,
    accumulate_gradient,
    startstop_prof,
)
from small_vision_tpu.utils.chrono import Chrono, chrono  # noqa: F401
from small_vision_tpu.utils.metrics import MetricWriter  # noqa: F401
