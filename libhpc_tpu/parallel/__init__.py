from libhpc_tpu.parallel.mesh import make_mesh_1d, make_mesh_2d  # noqa: F401
from libhpc_tpu.parallel import halo, dist_spmv, dist_stencil, collectives  # noqa: F401
