from dynamicscaler_tpu.parallel.mesh import (
    make_mesh,
    window_sharding,
    constrain_window_batch,
)

__all__ = ["make_mesh", "window_sharding", "constrain_window_batch"]
