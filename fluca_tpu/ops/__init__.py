from fluca_tpu.ops.banded import AxisStencil, apply_axis_stencil, shifted
from fluca_tpu.ops.fdcoeffs import fd_weights
