from fluca_tpu.mesh.cart import BoundaryLoc, CartMesh
