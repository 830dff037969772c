from dynamicscaler_tpu.ops.ddim import (
    DDIMSchedule,
    make_beta_schedule,
    make_ddim_schedule,
    ddim_step,
    re_noise,
    q_sample,
)
from dynamicscaler_tpu.ops.ring import (
    wrap_slice_indices,
    get_ring_window,
    set_ring_window,
    add_ring_window,
)
from dynamicscaler_tpu.ops.blend import mix_with_mask

__all__ = [
    "DDIMSchedule",
    "make_beta_schedule",
    "make_ddim_schedule",
    "ddim_step",
    "re_noise",
    "q_sample",
    "wrap_slice_indices",
    "get_ring_window",
    "set_ring_window",
    "add_ring_window",
    "mix_with_mask",
]
