from fluca_tpu.solvers.krylov import (
    KrylovResult,
    bicgstab,
    cg,
    fgmres,
    tree_axpy,
    tree_dot,
    tree_norm,
)
