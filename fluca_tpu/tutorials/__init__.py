from fluca_tpu.tutorials import fd as fd_tutorials
