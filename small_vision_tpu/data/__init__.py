"""Data sources and the host→device input pipeline."""

from small_vision_tpu.data.core import DataSource, get  # noqa: F401
