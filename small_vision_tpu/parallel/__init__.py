"""Distributed runtime: mesh construction, sharding inference, collectives."""

from small_vision_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    init_distributed,
    batch_sharding,
    replicated_sharding,
)
from small_vision_tpu.parallel.sharding import (  # noqa: F401
    infer_sharding,
    reshard,
)
from small_vision_tpu.parallel.collectives import (  # noqa: F401
    gather_metrics,
    broadcast_one_to_all,
    process_allgather,
)
from small_vision_tpu.parallel.explicit_step import (  # noqa: F401
    make_explicit_update_fn,
)
from small_vision_tpu.parallel.pipeline import (  # noqa: F401
    pipeline_apply,
    stage_params,
    unstage_params,
)
