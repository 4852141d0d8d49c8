from fluca_tpu.utils import config
from fluca_tpu.utils.options import Options
from fluca_tpu.utils.registry import Registry
