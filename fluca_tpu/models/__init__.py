from fluca_tpu.models.tgv import taylor_green_2d_exact, setup_taylor_green_2d
from fluca_tpu.models.cavity import setup_cavity_2d
