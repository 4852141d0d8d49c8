from fluca_tpu.ibm.delta import delta_peskin4, delta_roma3
from fluca_tpu.ibm.markers import MarkerSet, circle_markers
from fluca_tpu.ibm.forcing import DirectForcingIBM
