from fluca_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from fluca_tpu.io.cgns import CGNSWriter, read_cgns
