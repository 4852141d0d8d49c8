from fluca_tpu.ns.bc import BCType, BoundaryCondition
from fluca_tpu.ns.ns import NS
